"""Core MapReduce capability layer: generic map/shuffle/reduce with the
reference's semantics, plus the async job lifecycle (JobHandle,
JobState 4-stage progress)."""

from map_reduce_library_spark.core.mapreduce import (
    PairCounters,
    map_reduce_df,
    run_map_reduce,
)
from map_reduce_library_spark.core.job import (
    JobHandle,
    JobState,
    Stage,
    run_map_reduce_async,
    start_map_reduce_job,
)

__all__ = [
    "run_map_reduce",
    "map_reduce_df",
    "PairCounters",
    "JobHandle",
    "JobState",
    "Stage",
    "run_map_reduce_async",
    "start_map_reduce_job",
]
