"""map_reduce_library_spark — a PySpark-native analytics engine.

A from-scratch re-expression of the capabilities of the reference
MapReduce library (IdoSagiv/map-reduce-library): generic flat-map over
typed rows, grouped key-sorted shuffle, holistic per-group reduce with
multi-emit, and an async job lifecycle with 4-stage progress — plus a
relational query corpus and large-scale training-data-pipeline
operators (dedup, similarity search, text analysis, multimodal
plumbing), all built Spark-first on the DataFrame/SQL API so Catalyst
and Tungsten pick the physical strategy.

Reference semantics are documented in SURVEY.md; docstrings cite
reference files (file:line) for parity checking. No reference code is
copied — the reference is a single-machine C++ pthreads engine, and
this package is a declarative Spark design.
"""

from map_reduce_library_spark.core.job import (
    JobHandle,
    JobState,
    Stage,
    run_map_reduce_async,
    start_map_reduce_job,
)
from map_reduce_library_spark.core.mapreduce import PairCounters, run_map_reduce
from map_reduce_library_spark.session import get_session
from map_reduce_library_spark.tables import TABLE_NAMES, load_table, load_tables

__all__ = [
    "get_session",
    "TABLE_NAMES",
    "load_table",
    "load_tables",
    # MapReduce capability layer — the reference's whole user API
    # (MapReduceFramework.h: startMapReduceJob/waitForJob/getJobState/
    # closeJobHandle) surfaces at the package top level just like the
    # reference's single include.
    "run_map_reduce",
    "run_map_reduce_async",
    "PairCounters",
    "start_map_reduce_job",
    "JobHandle",
    "JobState",
    "Stage",
]

__version__ = "0.1.0"
