"""Corrupt-input tolerance: a 100-TB crawl ALWAYS contains garbage;
the engine must quarantine it, not crash."""

from pyspark.sql import functions as F


def test_permissive_json_quarantines_corrupt_records(spark, tmp_path):
    p = tmp_path / "data.jsonl"
    p.write_text(
        '{"id": 1, "v": 10.5}\n'
        "THIS IS NOT JSON\n"
        '{"id": 2, "v": null}\n'
        '{"id": 3, "v": "not-a-number"}\n'
    )
    df = (
        spark.read.schema("id long, v double, _corrupt_record string")
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", "_corrupt_record")
        .json(str(p))
    )
    rows = df.collect()
    good = {r.id: r.v for r in rows if r._corrupt_record is None}
    bad = [r for r in rows if r._corrupt_record is not None]
    assert good == {1: 10.5, 2: None}
    # the non-JSON line and the type-mismatched line are quarantined
    assert len(bad) == 2
    assert any("NOT JSON" in r._corrupt_record for r in bad)


def test_dropmalformed_csv(spark, tmp_path):
    p = tmp_path / "data.csv"
    p.write_text("id,v\n1,10.5\n2,oops\n3,30.0\n")
    df = (
        spark.read.schema("id long, v double")
        .option("header", True)
        .option("mode", "DROPMALFORMED")
        .csv(str(p))
    )
    assert {(r.id, r.v) for r in df.collect()} == {(1, 10.5), (3, 30.0)}


def test_get_json_object_null_on_garbage(spark):
    df = spark.createDataFrame(
        [("{}",), ("not json",), (None,), ('{"k": 5}',)], ["props"]
    )
    out = [r.k for r in df.select(F.get_json_object("props", "$.k").alias("k")).collect()]
    assert out == [None, None, None, "5"]
