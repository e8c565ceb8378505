"""Sources: directory-scan parity with the reference workload, and
format round-trips."""

import os

from conftest import SF_SMOKE

from map_reduce_library_spark.operators.wordcount import word_counts
from map_reduce_library_spark.sources.readers import (
    scan_directory,
    wordcount_directory,
    write_read_csv,
    write_read_json,
    write_read_parquet,
    write_read_xml,
)


def _write_corpus_as_files(spark, tmpdir) -> int:
    docs = spark.read.parquet(f"{SF_SMOKE}/documents.parquet").collect()
    for r in docs:
        with open(os.path.join(tmpdir, f"doc_{r.doc_id}.txt"), "w") as f:
            f.write(r.text)
    return len(docs)


def test_directory_wordcount_matches_parquet_wordcount(spark, tmp_path):
    """End-to-end reference workload (C1-C8): a directory of text
    files must produce the same word counts as the parquet corpus."""
    n = _write_corpus_as_files(spark, tmp_path)
    want = {
        (r.word, r.cnt)
        for r in word_counts(
            spark.read.parquet(f"{SF_SMOKE}/documents.parquet")
        ).collect()
    }
    got = {(r.word, r.cnt) for r in wordcount_directory(spark, str(tmp_path)).collect()}
    assert n > 0 and got == want


def test_scan_directory_whole_files(spark, tmp_path):
    """C1/C2 parity: one row per regular file, full content."""
    (tmp_path / "a.txt").write_text("hello world")
    (tmp_path / "b.txt").write_text("foo")
    sub = tmp_path / "subdir"
    sub.mkdir()  # directories are not regular files; must be skipped
    rows = scan_directory(spark, str(tmp_path)).collect()
    contents = {os.path.basename(r.path): r.content for r in rows}
    assert contents == {"a.txt": "hello world", "b.txt": "foo"}


def test_format_round_trips(spark, tmp_path):
    df = spark.read.parquet(f"{SF_SMOKE}/orders.parquet").limit(100)
    want = sorted(tuple(r) for r in df.collect())
    for name, fn in [
        ("csv", write_read_csv),
        ("json", write_read_json),
        ("parquet", write_read_parquet),
        ("xml", write_read_xml),
    ]:
        back = fn(df, str(tmp_path / name))
        assert sorted(tuple(r) for r in back.collect()) == want, name
        assert back.schema == df.schema, name


def test_register_views_sql_surface(spark):
    from map_reduce_library_spark.tables import register_views

    register_views(spark, SF_SMOKE)
    row = spark.sql(
        """
        SELECT r_name, count(*) AS n
        FROM nation JOIN region ON n_regionkey = r_regionkey
        GROUP BY r_name ORDER BY r_name LIMIT 1
        """
    ).first()
    assert row.n > 0


def test_csv_round_trip_embedded_newline_and_empty_string(
    spark, tmp_path
):
    """code-review r8: the CSV round-trip must survive the two
    classic lossy defaults — a quoted value containing '\\n' (needs
    multiLine on the read) and ''-vs-NULL (both default nullValue to
    the empty string)."""
    df = spark.createDataFrame(
        [(1, "line1\nline2"), (2, ""), (3, None), (4, "plain")],
        "id bigint, text string",
    )
    back = write_read_csv(df, str(tmp_path / "tricky_csv"))
    got = {r.id: r.text for r in back.collect()}
    assert got == {1: "line1\nline2", 2: "", 3: None, 4: "plain"}
