"""Custom STREAMING connector via the Python DataSource API
(SimpleDataSourceStreamReader) — the streaming counterpart of the
batch source/sink pair in ``pysource``/``pysink``.

A deterministic bounded tick feed: rows (i, payload) for i in
[0, limit), emitted ``batch`` rows per micro-batch. The reader is the
minimal correct offset protocol:

- ``initialOffset`` → {"i": 0}
- ``read(start)`` → rows [start, min(start+batch, limit)) and the next
  offset — called on the DRIVER (simple-reader contract; the
  partition-planning variant, DataSourceStreamReader, distributes
  reads but needs offset->partition planning)
- ``readBetweenOffsets(start, end)`` → deterministic replay for
  recovery, which is exactly why the payload must be a pure function
  of i.

Offsets commit through the checkpoint like any Spark source, so a
drained query restarted on the same checkpoint continues where it
stopped — ``tests/test_pystream.py`` drains the feed through repeated
``availableNow`` starts and asserts exactly-once delivery across
restarts. At scale the same protocol fronts any cursored external
system (an HTTP feed, a change-log API): ``read`` advances the
cursor, ``readBetweenOffsets`` replays a committed range.
"""

from __future__ import annotations

from pyspark.sql.datasource import (
    DataSource,
    SimpleDataSourceStreamReader,
)

TICK_SCHEMA = "i bigint, payload string"


class _TickStreamReader(SimpleDataSourceStreamReader):
    def __init__(self, batch: int, limit: int):
        self._batch = batch
        self._limit = limit

    def initialOffset(self):
        return {"i": 0}

    @staticmethod
    def _row(i: int):
        return (i, f"tick-{i:05d}")

    def read(self, start):
        i = int(start["i"])
        # Never regress the committed offset: if a restart lowered the
        # configured limit below an already-committed cursor, emitting
        # nothing is correct — committing min(i+batch, limit) < i
        # would re-deliver rows [limit, i) after a later limit raise,
        # breaking the exactly-once contract (code-review r6 finding).
        end = max(i, min(i + self._batch, self._limit))
        return iter([self._row(j) for j in range(i, end)]), {"i": end}

    def readBetweenOffsets(self, start, end):
        return iter(
            [self._row(j) for j in range(int(start["i"]), int(end["i"]))]
        )


class TickStreamSource(DataSource):
    """``spark.readStream.format("tickstream").option("batch", 10)
    .option("limit", 50).load()``"""

    @classmethod
    def name(cls):
        return "tickstream"

    def schema(self):
        return TICK_SCHEMA

    def simpleStreamReader(self, schema):
        return _TickStreamReader(
            int(self.options.get("batch", 10)),
            int(self.options.get("limit", 50)),
        )


def register_tick_stream(spark) -> None:
    spark.dataSource.register(TickStreamSource)
