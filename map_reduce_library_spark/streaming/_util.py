"""Shared plumbing for the incremental-ingest streaming pipelines
(`ingest_dedup`, `emb_ingest`). Extracted so the bootstrap and
trigger semantics live in ONE place — the two pipelines are semantic
twins, and a fix to either behavior must not silently diverge
(code-review r8).
"""

from __future__ import annotations

from typing import Callable

from pyspark.sql import DataFrame, SparkSession


def read_or_empty(spark: SparkSession, path: str, schema: str) -> DataFrame:
    """First-tick bootstrap: empty relation when the index table does
    not exist yet. Existence is probed by ATTEMPTING the read, not by
    a driver-local os.path check — on s3://-style work dirs isdir is
    always False and every tick would silently probe an empty index
    (code-review r6 finding)."""
    from pyspark.errors import AnalysisException

    try:
        df = spark.read.schema(schema).parquet(path)
        df.schema  # force path resolution now, inside the try
        return df
    except AnalysisException:
        return spark.createDataFrame([], schema)


def drain_one_file_per_tick(
    spark: SparkSession,
    chunks_dir: str,
    checkpoint: str,
    tick: Callable[[DataFrame, int], None],
) -> None:
    """Replay ``chunks_dir`` (one parquet file per micro-batch)
    through ``tick`` and stop: ``availableNow`` + ``maxFilesPerTrigger
    =1`` drains the backlog with checkpoint-tracked batch ids, so a
    restarted run resumes (and re-fires the cadence schedule) exactly
    where it stopped. The same code runs unbounded against a live
    landing directory or Kafka by swapping the trigger."""
    schema = spark.read.parquet(chunks_dir).schema
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(chunks_dir)
    )
    q = (
        stream.writeStream.foreachBatch(tick)
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
