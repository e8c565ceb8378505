"""The (session, sf_dir)-keyed shared-intermediate memoizer.

Several query families materialize an expensive relation once per
(SparkSession, scale factor) and let every consumer read the
checkpointed partitions — the "write the table to parquet once, read
it N times" production pattern in miniature (LSH candidate pairs,
SimHash fingerprints, banded embedding signatures, BPE merges, …).
The idiom used to be copy-pasted per family; one copy had already
drifted (a non-eager checkpoint). This helper is the single
definition: eager localCheckpoint, applicationId in the key so a
restarted session never reuses another session's RDDs.
"""

from __future__ import annotations

from typing import Callable

from pyspark.sql import DataFrame, SparkSession


def shared_checkpoint(
    cache: dict,
    spark: SparkSession,
    sf_dir: str,
    build: Callable[[], DataFrame],
) -> DataFrame:
    key = (spark.sparkContext.applicationId, sf_dir)
    df = cache.get(key)
    if df is None:
        df = build().localCheckpoint(eager=True)
        cache[key] = df
    return df
