#!/usr/bin/env python
"""CLI parity with the reference's shipped example
(`FileWordCounter [dirPath] [num_of_threads]`, README.md:45):
count space-delimited words across all regular files in a directory,
polling job progress and printing "The word X appeared N time(s)".

Usage: python examples/file_word_counter.py DIR [PARALLELISM]

The reference's thread count maps to local Spark parallelism; on a
cluster, drop the master override and submit normally.
"""

from __future__ import annotations

import sys
from pathlib import Path

_REPO = Path(__file__).resolve().parents[1]
if str(_REPO) not in sys.path:
    sys.path.insert(0, str(_REPO))

from map_reduce_library_spark.core.job import (  # noqa: E402
    start_map_reduce_job,
    wait_with_progress,
)
from map_reduce_library_spark.operators.wordcount import (  # noqa: E402
    format_word_counts,
)
from map_reduce_library_spark.session import get_session  # noqa: E402
from map_reduce_library_spark.sources.readers import (  # noqa: E402
    wordcount_directory,
)


def main() -> None:
    if len(sys.argv) < 2:
        print(__doc__)
        raise SystemExit(2)
    dir_path = sys.argv[1]
    par = sys.argv[2] if len(sys.argv) > 2 else "*"

    spark = get_session(
        app_name="file-word-counter", master=f"local[{par}]"
    )
    spark.sparkContext.setLogLevel("ERROR")

    wc = format_word_counts(wordcount_directory(spark, dir_path))
    handle = start_map_reduce_job(spark, wc.collect)
    lines, _states = wait_with_progress(
        handle,
        on_change=lambda s: print(f"stage {s.stage.name} {s.percentage:.0f}%"),
    )
    for row in sorted(r.line for r in lines):
        print(row)


if __name__ == "__main__":
    main()
