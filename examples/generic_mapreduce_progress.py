#!/usr/bin/env python
"""The reference's async driver loop, end-to-end on the generic path:
start a MapReduce job over an input vector, poll ``get_job_state()``
while it runs, print each stage transition, then the output bag.

Unlike ``file_word_counter.py`` (DataFrame path, per-task progress
shim), this uses ``run_map_reduce_async`` — the JobState percentages
carry the reference's PAIR-LEVEL denominators (map = input pairs
processed / input total, shuffle/reduce = pairs against emitted
intermediate pairs; MapReduceFramework.cpp:13,104,141,157) via
accumulator-backed ``PairCounters``.

Usage: python examples/generic_mapreduce_progress.py [N_PAIRS]
"""

from __future__ import annotations

import sys
from pathlib import Path

_REPO = Path(__file__).resolve().parents[1]
if str(_REPO) not in sys.path:
    sys.path.insert(0, str(_REPO))

from map_reduce_library_spark import run_map_reduce_async  # noqa: E402
from map_reduce_library_spark.core.job import wait_with_progress  # noqa: E402
from map_reduce_library_spark.session import get_session  # noqa: E402


def main() -> None:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 100_000
    spark = get_session(app_name="generic-mr-progress")
    spark.sparkContext.setLogLevel("ERROR")

    data = [(None, i) for i in range(n)]

    def map_fn(_k, v):  # flat-map: 1-2 emits per input pair
        yield (v % 100, 1)
        if v % 3 == 0:
            yield (v % 100, 1)

    def reduce_fn(k, vals):  # holistic: sees every value for the key
        yield (k, sum(vals))

    handle = run_map_reduce_async(
        spark, data, map_fn, reduce_fn, num_partitions=16
    )
    out, _log = wait_with_progress(
        handle,
        on_change=lambda s: print(
            f"stage {s.stage.name} {s.percentage:.1f}%"
        ),
    )
    c = handle.counters
    print(
        f"pairs: {c.mapped.value} in -> {c.emitted.value} intermediate "
        f"-> {c.keys.value} keys"
    )
    for k, total in sorted(out)[:5]:
        print(f"key {k}: {total}")

    # Same job with the reference's EXACT key-weighted REDUCE
    # denominator (MapReduceFramework.cpp:190-195): one distinct-key
    # count at the shuffle->reduce flip buys reduce %% = keys reduced
    # / key total instead of the default pair-weighted sweep.
    handle = run_map_reduce_async(
        spark, data, map_fn, reduce_fn, num_partitions=16,
        exact_reduce_keys=True,
    )
    _out, _log = wait_with_progress(
        handle,
        on_change=lambda s: print(
            f"[exact keys] stage {s.stage.name} {s.percentage:.1f}%"
        ),
    )
    c = handle.counters
    print(f"exact reduce denominator: {c.key_total} distinct keys")


if __name__ == "__main__":
    main()
