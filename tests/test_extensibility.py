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
    writer = JsonLinesWriter({"path": str(out)}, overwrite=False)
    writer.commit([])  # no write task ever ran; dir must not exist yet
    manifest = json.loads((out / "_SUCCESS").read_text())
    assert manifest == {"parts": {}, "total_rows": 0}


def test_sink_append_merges_manifest_overwrite_replaces(spark, tmp_path):
    """Save modes must be honored in the manifest protocol: append
    merges the new parts into the existing _SUCCESS (prior rows stay
    in the read contract); overwrite replaces the manifest and deletes
    the stale committed parts it named (code-review r6 finding: the
    old commit always rewrote the manifest with only the current job's
    parts, silently dropping every previously appended row)."""
    import json
    import os

    from map_reduce_library_spark.sources.pysink import JsonLinesSink

    spark.dataSource.register(JsonLinesSink)
    out = str(tmp_path / "modes")

    def save(lo, hi, mode):
        spark.range(lo, hi).coalesce(1).write.format(
            "jsonlines_sink"
        ).option("path", out).mode(mode).save()

    def manifest():
        return json.loads((tmp_path / "modes" / "_SUCCESS").read_text())

    save(0, 40, "append")
    save(40, 100, "append")
    m = manifest()
    assert m["total_rows"] == 100 and len(m["parts"]) == 2
    committed = [os.path.join(out, p) for p in m["parts"]]
    assert spark.read.json(committed).count() == 100

    save(0, 10, "overwrite")
    m2 = manifest()
    assert m2["total_rows"] == 10 and len(m2["parts"]) == 1
    # stale parts named by the old manifest are gone from disk
    for p in m["parts"]:
        assert not os.path.exists(os.path.join(out, p))
    committed = [os.path.join(out, p) for p in m2["parts"]]
    assert spark.read.json(committed).count() == 10


def test_sink_serializes_nested_structs_with_field_names(spark, tmp_path):
    """Row is a tuple subclass: non-recursive asDict() serialized
    nested structs as positional arrays, dropping field names
    (code-review r6 finding)."""
    import json

    from map_reduce_library_spark.sources.pysink import JsonLinesSink

    spark.dataSource.register(JsonLinesSink)
    out = tmp_path / "nested"
    spark.sql(
        "SELECT 1 AS id, named_struct('x', 10, 'y', 'z') AS s"
    ).coalesce(1).write.format("jsonlines_sink").option(
        "path", str(out)
    ).mode("append").save()
    manifest = json.loads((out / "_SUCCESS").read_text())
    (part,) = manifest["parts"]
    row = json.loads((out / part).read_text().strip())
    assert row["s"] == {"x": 10, "y": "z"}


def test_jsonlines_sink_rejects_non_append_stream_modes(spark, tmp_path):
    """code-review r8: complete/update output modes would re-emit the
    full snapshot every epoch while manifest readers UNION epochs —
    the sink must refuse, not double-count."""
    import pytest
    from pyspark.errors import StreamingQueryException

    src = str(tmp_path / "in")
    spark.range(10).selectExpr("id", "id % 2 AS g").write.parquet(src)
    stream = (
        spark.readStream.schema("id long, g long").parquet(src)
        .groupBy("g").count()
    )
    with pytest.raises(StreamingQueryException, match="append-only"):
        (
            stream.writeStream.format("jsonlines_sink")
            .option("path", str(tmp_path / "out"))
            .option("checkpointLocation", str(tmp_path / "ckpt"))
            .outputMode("complete")
            .trigger(availableNow=True)
            .start()
            .awaitTermination()
        )
