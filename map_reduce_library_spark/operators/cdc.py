"""Content-defined chunking (CDC) — insertion-robust chunk-level
duplicate detection for an LLM training-data pipeline.

Fixed-size chunking (``operators/pipeline.py::chunk_documents``)
breaks on the classic rsync/LBFS observation: inserting one token
near the start of a document shifts every later fixed-window
boundary, so two documents sharing 95% of their text produce almost
no identical chunks. CDC (Muthitacharoen et al., "A Low-bandwidth
Network File System", SOSP 2001 — the same idea behind restic/borg
dedup) instead cuts at CONTENT positions: a token is a cut point iff
a hash of the token value lands in a fixed residue class. An
insertion only perturbs the chunks it touches; every other boundary
re-synchronizes, so shared spans keep producing byte-identical
chunks wherever they sit in the document.

Design (engine-native, zero UDF, zero shuffle for the chunking
itself):

- The cut predicate uses the corpus's portable digest convention
  (``operators/pipeline.py::hash_bucket``: top 60 bits of md5 mod
  divisor — identical integer in DuckDB), so chunk boundaries are
  engine-independent and the whole operator hash-oracles.
- Chunk assembly is ONE ``aggregate()`` fold projection per document
  over the shared token-array relation: the fold carries
  (finished-chunks, current-chunk) and the finish lambda flushes the
  tail — a scan projection, no explode/window/groupBy shuffle. The
  DuckDB oracle derives the same chunks RELATIONALLY (position
  unnest + window prefix-sum + ordered string_agg); two independent
  formalizations agreeing is the differential, the BPE pattern.
- Mean chunk length = CDC_DIVISOR tokens (geometric); MIN_TOKENS
  floors the *report* (tiny chunks are noise for dedup, and the
  no-min/max variant keeps the cut predicate purely per-token —
  real min/max clamps would make boundaries sequential state, which
  is exactly what the declarative form avoids).

At 100 TB: the chunking is a corpus scan; the dedup report shuffles
(chunk_hash) keys only — fixed-width md5 strings, never chunk text
(the text is hashed in the same projection that builds it).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

CDC_DIVISOR = 8
CDC_MIN_TOKENS = 3


def _cut_sql(tok_expr: str, divisor: int) -> str:
    """SQL fragment: true iff `tok_expr` is a CDC cut token. The hash
    is the 60-bit md5 prefix in its Spark-SQL-string spelling — MUST
    stay byte-synchronized with ``operators/hashing.py::md5_prefix60``
    (the Column-form single definition; this is the one operator that
    needs the expression inside a higher-order-function lambda, where
    only expr strings go)."""
    return (
        f"cast(conv(substring(md5({tok_expr}), 1, 15), 16, 10)"
        f" AS bigint) % {divisor} = 0"
    )


def cdc_chunk_arrays(
    token_arrays: DataFrame,
    id_col: str = "doc_id",
    divisor: int = CDC_DIVISOR,
) -> DataFrame:
    """(id, chunks array<string>): content-defined chunks per doc.
    A cut token ENDS its chunk; the finish lambda flushes the final
    partial chunk. One codegen'd fold projection — no shuffle."""
    fold = F.expr(
        "aggregate(toks,"
        " named_struct('done', cast(array() AS array<string>),"
        "              'cur', cast(array() AS array<string>)),"
        " (acc, x) -> IF("
        + _cut_sql("x", divisor)
        + ",  named_struct('done', concat(acc.done,"
        "             array(concat_ws(' ', concat(acc.cur, array(x))))),"
        "            'cur', cast(array() AS array<string>)),"
        "     named_struct('done', acc.done,"
        "                  'cur', concat(acc.cur, array(x)))),"
        " acc -> IF(size(acc.cur) > 0,"
        "           concat(acc.done, array(concat_ws(' ', acc.cur))),"
        "           acc.done))"
    )
    return token_arrays.select(id_col, fold.alias("chunks"))


def cdc_chunks(
    token_arrays: DataFrame,
    id_col: str = "doc_id",
    divisor: int = CDC_DIVISOR,
) -> DataFrame:
    """(id, chunk_pos, chunk_text, n_tokens): exploded chunk rows.
    chunk_pos is 0-based document order."""
    return cdc_chunk_arrays(token_arrays, id_col, divisor).select(
        id_col,
        F.posexplode("chunks").alias("chunk_pos", "chunk_text"),
    ).withColumn("n_tokens", F.size(F.split("chunk_text", " ", -1)))


def cdc_duplicate_chunks(
    token_arrays: DataFrame | None = None,
    id_col: str = "doc_id",
    divisor: int = CDC_DIVISOR,
    min_tokens: int = CDC_MIN_TOKENS,
    min_docs: int = 2,
    chunks: DataFrame | None = None,
) -> DataFrame:
    """Cross-document duplicated spans: chunks (≥ min_tokens tokens)
    whose text occurs in ≥ min_docs distinct documents — boilerplate
    and shared-span detection that survives insertions. Groups on the
    md5 of the chunk text so the shuffle moves fixed-width keys.

    ``chunks``: optionally pass a precomputed (and ideally
    checkpointed) ``cdc_chunks`` relation instead of
    ``token_arrays`` — a caller that also consumes the chunk rows
    (e.g. the duplicated-span-mass gate in
    examples/training_data_pipeline.py) then runs the fold exactly
    once. A precomputed ``chunk_hash`` column is honored (so callers
    may drop the chunk text after hashing); otherwise the hash is
    derived from ``chunk_text`` here."""
    if (token_arrays is None) == (chunks is None):
        raise ValueError(
            "pass exactly one of token_arrays or chunks"
        )
    ch = (
        chunks
        if chunks is not None
        else cdc_chunks(token_arrays, id_col, divisor)
    )
    key = (
        F.col("chunk_hash")
        if "chunk_hash" in ch.columns
        else F.md5("chunk_text").alias("chunk_hash")
    )
    return (
        ch.where(F.col("n_tokens") >= min_tokens)
        .groupBy(key)
        .agg(
            F.count_distinct(id_col).alias("n_docs"),
            F.count(F.lit(1)).alias("n_occurrences"),
            F.min("n_tokens").alias("n_tokens"),
        )
        .where(F.col("n_docs") >= min_docs)
    )
