"""Python UDTF + custom Python DataSource."""

from conftest import SF_CORRECTNESS, assert_oracle_match

from map_reduce_library_spark.queries import QUERIES


def test_udtf_token_stats_oracle(spark):
    assert_oracle_match(spark, "udtf_token_stats")


def test_python_datasource_oracle(spark):
    assert_oracle_match(spark, "python_datasource_scan")


def test_python_datasource_is_partition_parallel(spark):
    df = QUERIES["python_datasource_scan"](spark, SF_CORRECTNESS)
    assert df.rdd.getNumPartitions() == 4
    assert df.count() == 200


def test_python_datasource_sink_roundtrip(spark, tmp_path):
    """Custom Python DataSource WRITER (Spark 4 write path): every
    partition streams to its own part file, commit writes a _SUCCESS
    manifest whose row counts must sum to the input size, and the
    data round-trips through spark.read.json exactly."""
    import json

    from map_reduce_library_spark.sources.pysink import JsonLinesSink

    spark.dataSource.register(JsonLinesSink)
    out = str(tmp_path / "sinkdir")
    df = spark.range(100).selectExpr(
        "id", "concat('w', CAST(id % 7 AS STRING)) AS word"
    ).repartition(4)
    df.write.format("jsonlines_sink").option("path", out).mode(
        "append"
    ).save()

    manifest = json.loads((tmp_path / "sinkdir" / "_SUCCESS").read_text())
    assert manifest["total_rows"] == 100
    assert len(manifest["parts"]) == 4
    # Read via the manifest's committed-part list, per the sink's
    # reader contract — a glob would also pick up orphans from task
    # attempts that died before reporting their commit message.
    committed = [f"{out}/{name}" for name in manifest["parts"]]
    back = spark.read.json(committed)
    assert back.count() == 100
    assert {tuple(sorted(r.asDict().items())) for r in back.collect()} == {
        tuple(sorted(r.asDict().items())) for r in df.collect()
    }


def test_python_datasource_sink_commit_without_writes(tmp_path):
    """A zero-partition write plan runs no write tasks, so commit is
    the first thing to touch the target dir — it must create it and
    write an empty manifest instead of crashing with
    FileNotFoundError (ADVICE r4). Driven at the writer-API level
    because that's the only way to guarantee zero write() calls."""
    import json

    from map_reduce_library_spark.sources.pysink import JsonLinesWriter

    out = tmp_path / "emptydir"
    writer = JsonLinesWriter({"path": str(out)})
    writer.commit([])  # no write task ever ran; dir must not exist yet
    manifest = json.loads((out / "_SUCCESS").read_text())
    assert manifest == {"parts": {}, "total_rows": 0}
