"""Round-14 optimization probe: isolate named queries, time them with
the noop sink (guide §1.4 — computation only, no sink I/O), and dump
``.explain("formatted")`` for the plan audit trail.

Usage:
    python tools/perf_probe.py QUERY [QUERY ...] [--passes N]
        [--plans-dir plans/r14] [--suffix before|after] [--json OUT]

Per query: builds the DataFrame fresh each pass (plan + analysis cost
included, same as bench.py), writes it to the noop sink, and prints
every pass's wall seconds plus the min. Job descriptions are set so a
UI/event-log reader can attribute stages (guide §1.5). The formatted
plan for the FIRST build is written to
``<plans-dir>/<query>_<suffix>.txt`` when --suffix is given.
"""

from __future__ import annotations

import argparse
import json
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parents[1]
sys.path.insert(0, str(REPO))

from map_reduce_library_spark.queries import QUERIES  # noqa: E402
from map_reduce_library_spark.session import get_session  # noqa: E402


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("queries", nargs="+")
    ap.add_argument("--passes", type=int, default=3)
    ap.add_argument("--plans-dir", default=str(REPO / "plans" / "r14"))
    ap.add_argument("--suffix", default=None)
    ap.add_argument("--json", dest="json_out", default=None)
    ap.add_argument("--sf-dir", default="/root/testdata/sf0.1")
    args = ap.parse_args()

    spark = get_session(app_name="mrls-perf-probe")
    spark.sparkContext.setLogLevel("ERROR")

    # Same warmups as bench.py so pass-1 isn't charged for one-time
    # JVM/Python-worker spin-up.
    spark.read.parquet(f"{args.sf_dir}/region.parquet").count()
    spark.range(100).mapInPandas(lambda it: it, "id long").write.format(
        "noop"
    ).mode("overwrite").save()

    plans_dir = Path(args.plans_dir)
    results: dict[str, dict] = {}
    for name in args.queries:
        fn = QUERIES[name]
        times = []
        for p in range(args.passes):
            spark.sparkContext.setJobDescription(f"{name} pass {p}")
            t0 = time.time()
            df = fn(spark, args.sf_dir)
            t_build = time.time() - t0
            if p == 0 and args.suffix:
                plans_dir.mkdir(parents=True, exist_ok=True)
                plan = df._sc._jvm.PythonSQLUtils.explainString(
                    df._jdf.queryExecution(), "formatted"
                )
                (plans_dir / f"{name}_{args.suffix}.txt").write_text(plan)
            df.write.format("noop").mode("overwrite").save()
            dt = time.time() - t0
            times.append(round(dt, 3))
            spark.sparkContext.setJobDescription(None)
            if p == 0:
                results.setdefault(name, {})["build_sec_p0"] = round(
                    t_build, 3
                )
        results[name].update(
            {"passes": times, "min": min(times), "min_warm": min(times[1:])}
        )
        print(json.dumps({name: results[name]}))
    if args.json_out:
        Path(args.json_out).write_text(json.dumps(results, indent=1) + "\n")


if __name__ == "__main__":
    main()
