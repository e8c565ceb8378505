#!/usr/bin/env python
"""Benchmark harness: run the full declared query corpus at
$SPARK_GRAFT_SF_DIR (default sf0.1) on local[$SPARK_GRAFT_CPUS] and
print ONE JSON line with per-query wall seconds.

Queries are materialized with the noop sink (full computation, no
driver collect, no sink I/O) — the number is the engine, not the
pipe. ``ngram_jaccard_pairs`` (the deliberately quadratic ground-truth
variant) is excluded from the headline set; its scale path
``minhash_lsh_pairs`` is benched instead.

Output budget: the driver retains only the LAST 2000 bytes of stdout
(BENCH_r01.json proved this by truncating the 4.6 KB round-1 line to
an unparseable tail), so the stdout JSON lists the slowest queries
individually — as many as fit under the budget — and folds the rest
into ``others_sec``/``others_n``. The untruncated per-query map goes
to ``BENCH_LOCAL.json`` in the repo.
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

# Ground-truth-only variants, excluded from the headline benchmark —
# each exists to pin an oracle/accuracy bound for a scalable headline
# twin and is deliberately unscalable by design:
#   * quadratic all-pairs oracles for the LSH-bucketed scale paths
#     (emb_dedup_recall embeds the quadratic exact side, so it is
#     excluded with them);
#   * single-buffer holistic percentile() twins, documented "correct
#     only at oracle scale" — their scale paths are the
#     approx_percentile sketch variants (equi_depth_price_histogram,
#     approx_quantiles_price), which stay benched (VERDICT r6 §3:
#     the SKIP policy applied consistently).
# The exact COUNT(DISTINCT) twins (approx_distinct_users_exact,
# hll_sketch_rollup_daily_exact) stay benched: two-phase hash
# distinct is a scalable plan, not a ground-truth-only crutch.
SKIP = {
    "ngram_jaccard_pairs",
    "embedding_cosine_dups",
    "emb_dedup_recall",
    "equi_depth_price_histogram_exact",
    "approx_quantiles_price_exact",
    "exact_percentiles",
}


def _warm_python_datasource(spark) -> None:
    """Warm the Python DataSource machinery (plan-time Python worker +
    executor-side datasource runners) with a one-row throwaway source,
    mirroring the Python-UDF warmup in main(): the corpus' datasource
    query should measure the engine path, not one-time worker
    spin-up."""
    from pyspark.sql.datasource import DataSource, DataSourceReader

    class _WarmReader(DataSourceReader):
        def read(self, partition):
            yield (1,)

    class _WarmSource(DataSource):
        @classmethod
        def name(cls):
            return "benchwarm"

        def schema(self):
            return "id bigint"

        def reader(self, schema):
            return _WarmReader()

    spark.dataSource.register(_WarmSource)
    spark.read.format("benchwarm").load().write.format("noop").mode(
        "overwrite"
    ).save()


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    try:  # custom-named dirs report sf=None, never abort the bench
        sf = float(Path(sf_dir).name.removeprefix("sf") or "0")
    except ValueError:
        sf = None
    spark = get_session(app_name="mrls-bench")
    spark.sparkContext.setLogLevel("ERROR")

    # Warm up the JVM / parquet footers / Python-UDF workers so the
    # first query isn't charged for one-time initialization.
    spark.read.parquet(f"{sf_dir}/region.parquet").count()
    spark.range(100).mapInPandas(lambda it: it, "id long").write.format(
        "noop"
    ).mode("overwrite").save()
    _warm_python_datasource(spark)

    # Two passes; report the min (steady-state engine speed, not
    # first-run JIT compilation of each query's generated code).
    times: dict[str, float] = {}
    t_all = time.time()
    loadavg_start = list(os.getloadavg())
    for _pass in range(2):
        for name, fn in QUERIES.items():
            if name in SKIP:
                continue
            t0 = time.time()
            fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
            dt = round(time.time() - t0, 3)
            times[name] = min(times.get(name, dt), dt)
    # Third pass for the current tail only: host-VM timing noise
    # (documented in BASELINE.md, observed up to ~1.5x between runs)
    # concentrates its damage in the slowest queries' minimums, so
    # giving just those one more sample stabilizes the headline sum
    # at ~1/7th the cost of a full extra pass.
    for name in sorted(times, key=times.get, reverse=True)[:15]:
        t0 = time.time()
        QUERIES[name](spark, sf_dir).write.format("noop").mode(
            "overwrite"
        ).save()
        dt = round(time.time() - t0, 3)
        times[name] = min(times[name], dt)
    total = round(sum(times.values()), 3)
    wall = round(time.time() - t_all, 3)

    # Self-documenting artifact (VERDICT r13 item 7): carry the host
    # window's load and the measured same-source run-to-run swing
    # INSIDE the JSON, so a reader comparing two BENCH artifacts
    # cannot misread window noise as a code regression without also
    # seeing the calibration that says otherwise.
    (_REPO / "BENCH_LOCAL.json").write_text(
        json.dumps(
            {
                "metric": "headline query suite wall time",
                "value": total,
                "unit": "sec",
                "wall_2pass": wall,
                "queries": times,
                "sf": sf,
                "host": {
                    "cpus": os.cpu_count(),
                    "loadavg_start": loadavg_start,
                    "loadavg_end": list(os.getloadavg()),
                },
                "window_calibration": {
                    "note": (
                        "host timing windows swing SAME-SOURCE suite "
                        "sums by up to ~1.2-1.5x (BASELINE.md "
                        "'same-source bench range': identical source "
                        "measured 121.7-145.1 s across windows); "
                        "judge regressions by per-query medians "
                        "across runs, not by suite-sum deltas"
                    ),
                    "same_source_swing_observed_sec": [121.7, 145.1],
                    "swing_source": "BASELINE.md round-11 table, "
                    "re-confirmed round-12/13",
                },
            },
            indent=1,
        )
        + "\n"
    )

    # stdout line: slowest-first per-query times until the serialized
    # doc would exceed the driver's 2000-byte stdout retention.
    budget = 1800
    doc = {
        "metric": "headline query suite wall time",
        "value": total,
        "unit": "sec",
        "queries": {},
        "sf": sf,
        "n_queries": len(times),
        "others_sec": total,
        "others_n": len(times),
    }
    for name in sorted(times, key=times.get, reverse=True):
        trial = dict(doc["queries"], **{name: times[name]})
        probe = dict(doc, queries=trial)
        probe["others_sec"] = round(total - sum(trial.values()), 3)
        probe["others_n"] = len(times) - len(trial)
        if len(json.dumps(probe, separators=(",", ":"))) > budget:
            break
        doc = probe
    print(json.dumps(doc, separators=(",", ":")))


if __name__ == "__main__":
    main()
