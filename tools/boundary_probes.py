"""Package-boundary probes — step 2 of the verify recipe
(.claude/skills/verify/SKILL.md): exercise the public MapReduce API
exactly the way an external user would, from a fresh interpreter,
asserting the reference-parity behaviors that the DuckDB differential
cannot see (async lifecycle, argument validation, double-close).

Run:  PYTHONPATH=/root/repo python tools/boundary_probes.py
Exits nonzero on the first failed probe; prints one PROBE line each.

Contract points exercised (SURVEY.md §2A/§2B):
  * run_map_reduce over a real DataFrame — map_fn is (key, value) ->
    pairs, value rows arrive with key=None (the reference consumes
    input positionally and passes nullptr keys,
    FileWordCounter.cpp:221).
  * empty input -> empty output, no error.
  * plain-list input without spark= raises ValueError (a list has no
    session to derive).
  * bad key_mode raises ValueError.
  * async: start_map_reduce_job(spark, thunk) -> JobHandle;
    get_job_state mid-flight, wait_for_job returns the result,
    close_job_handle is idempotent (double close, the reference's
    closeJobHandle contract).
"""
import sys

sys.path.insert(0, "/root/repo")


def main() -> int:
    from pyspark.sql import SparkSession

    spark = (
        SparkSession.builder.master("local[8]")
        .config("spark.sql.shuffle.partitions", "8")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    from map_reduce_library_spark import (
        run_map_reduce,
        start_map_reduce_job,
    )

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")

    out = run_map_reduce(
        docs.select("doc_id", "text"),
        lambda k, row: [(w, 1) for w in row.text.split(" ")],
        lambda k, vs: [(k, sum(vs))],
        spark=spark,
    )
    n = out.count()
    assert n > 0, "wordcount produced no rows"
    print(f"PROBE run_map_reduce rows: {n}")

    empty = docs.where("doc_id < 0").select("doc_id", "text")
    e = run_map_reduce(
        empty,
        lambda k, r: [(r.text, 1)],
        lambda k, vs: [(k, len(vs))],
        spark=spark,
    )
    assert e.count() == 0
    print("PROBE empty input -> empty output")

    try:
        run_map_reduce(
            [(None, "a b")], lambda k, r: [(r, 1)], lambda k, v: [(k, len(v))]
        )
        raise AssertionError("list input without spark= must raise")
    except ValueError:
        print("PROBE list input without spark= raises ValueError")

    try:
        run_map_reduce(
            docs.select("doc_id", "text"),
            lambda k, r: [(1, 1)],
            lambda k, v: [(k, 1)],
            spark=spark,
            key_mode="bogus",
        )
        raise AssertionError("bad key_mode must raise")
    except ValueError:
        print("PROBE bad key_mode raises ValueError")

    job = start_map_reduce_job(
        spark,
        lambda: run_map_reduce(
            docs.select("doc_id", "text"),
            lambda k, row: [(w, 1) for w in row.text.split(" ")],
            lambda k, vs: [(k, sum(vs))],
            spark=spark,
        ).collect(),
    )
    st = job.get_job_state()
    print(f"PROBE mid-flight state: {st}")
    res = job.wait_for_job()
    assert len(res) == n
    print(f"PROBE async result rows: {len(res)}")
    job.close_job_handle()
    job.close_job_handle()  # idempotent, the reference contract
    print("PROBE double close ok")

    # pair-level progress (round 12): the reference's JobState
    # denominators on the generic-MR path
    from map_reduce_library_spark import run_map_reduce_async

    data = [(None, i) for i in range(60)]
    h = run_map_reduce_async(
        spark,
        data,
        lambda k, v: [(v % 6, 1)],
        lambda k, vs: [(k, sum(vs))],
        num_partitions=4,
    )
    out = h.wait_for_job()
    assert sorted(out) == [(k, 10) for k in range(6)]
    c = h.counters
    assert (c.input_total, c.mapped.value, c.emitted.value) == (60, 60, 60)
    assert (c.shuffled.value, c.reduced.value, c.keys.value) == (60, 60, 6)
    st = h.get_job_state()
    assert st.stage.name == "REDUCE" and st.percentage == 100.0
    print("PROBE pair-level counters exact (60 in / 60 emitted / 6 keys)")
    print("PROBES ALL GREEN")
    return 0


if __name__ == "__main__":
    sys.exit(main())
