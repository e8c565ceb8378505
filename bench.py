#!/usr/bin/env python
"""Benchmark harness: run the full declared query corpus at
$SPARK_GRAFT_SF_DIR (default sf0.1) on local[$SPARK_GRAFT_CPUS] and
print ONE JSON line with per-query wall seconds.

Queries are materialized with the noop sink (full computation, no
driver collect, no sink I/O) — the number is the engine, not the
pipe. ``ngram_jaccard_pairs`` (the deliberately quadratic ground-truth
variant) is excluded from the headline set; its scale path
``minhash_lsh_pairs`` is benched instead.
"""

from __future__ import annotations

import json
import os
import sys
import time
from pathlib import Path

_REPO = Path(__file__).resolve().parent
if str(_REPO) not in sys.path:
    sys.path.insert(0, str(_REPO))

from map_reduce_library_spark.queries import QUERIES  # noqa: E402
from map_reduce_library_spark.session import get_session  # noqa: E402

# Ground-truth-only variants, excluded from the headline benchmark.
SKIP = {"ngram_jaccard_pairs"}


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = float(Path(sf_dir).name.removeprefix("sf") or "0")
    spark = get_session(app_name="mrls-bench")
    spark.sparkContext.setLogLevel("ERROR")

    # Warm up the JVM / parquet footers / Python-UDF workers so the
    # first query isn't charged for one-time initialization.
    spark.read.parquet(f"{sf_dir}/region.parquet").count()
    spark.range(100).mapInPandas(lambda it: it, "id long").write.format(
        "noop"
    ).mode("overwrite").save()

    # Two passes; report the min (steady-state engine speed, not
    # first-run JIT compilation of each query's generated code).
    times: dict[str, float] = {}
    t_all = time.time()
    for _pass in range(2):
        for name, fn in QUERIES.items():
            if name in SKIP:
                continue
            t0 = time.time()
            fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
            dt = round(time.time() - t0, 3)
            times[name] = min(times.get(name, dt), dt)
    total = round(sum(times.values()), 3)

    print(
        json.dumps(
            {
                "metric": "headline query suite wall time",
                "value": total,
                "unit": "sec",
                "queries": times,
                "sf": sf,
            }
        )
    )


if __name__ == "__main__":
    main()
