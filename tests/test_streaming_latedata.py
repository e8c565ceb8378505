"""Watermark semantics with genuinely late data (append mode).

Spark ≥3.4 keeps TWO watermarks (SPARK-40925): state EVICTION uses the
current batch's watermark, but LATE-EVENT filtering uses the previous
batch's — so a row is only guaranteed dropped when the watermark
already exceeded its window in the batch BEFORE it arrives.

Timeline (4 micro-batches, watermark delay 1h):
  b0: events 10:15, 10:45   → wm epoch
  b1: event 13:00           → eviction wm after b1 = 12:00; the
                              [10:00,11:00) window is finalized+emitted
                              (n=2) in the batch where eviction wm
                              passes its end
  b2: event 13:10           → late-event wm advances past 11:00
  b3: LATE 10:05 + 13:30    → late-event wm during b3 = 12:00 > window
                              end → the late row is DROPPED
"""

import os
import time
from datetime import datetime

from pyspark.sql import functions as F


def test_watermark_drops_late_event_append_mode(spark, tmp_path):
    src = str(tmp_path / "stream")
    os.makedirs(src, exist_ok=True)

    def mk(rows):
        rows = [(i, datetime.fromisoformat(t), v) for i, t, v in rows]
        return spark.createDataFrame(
            rows, "event_id long, ts timestamp, value double"
        )

    batches = [
        [(1, "2024-01-01 10:15:00", 1.0), (2, "2024-01-01 10:45:00", 1.0)],
        [(3, "2024-01-01 13:00:00", 1.0)],
        [(6, "2024-01-01 13:10:00", 1.0)],
        [(4, "2024-01-01 10:05:00", 1.0), (5, "2024-01-01 13:30:00", 1.0)],
    ]
    for i, rows in enumerate(batches):
        mk(rows).coalesce(1).write.mode("append").parquet(src)
        time.sleep(1.1)  # distinct mod times → deterministic order

    stream = (
        spark.readStream.schema("event_id long, ts timestamp, value double")
        .option("maxFilesPerTrigger", "1")
        .parquet(src)
    )
    agg = (
        stream.withWatermark("ts", "1 hour")
        .groupBy(F.window("ts", "1 hour").alias("w"))
        .agg(F.count(F.lit(1)).alias("n"))
        .select(F.col("w.start").alias("ws"), "n")
    )
    q = (
        agg.writeStream.format("memory")
        .queryName("late_append")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()

    finalized = {r.ws.strftime("%H:%M"): r.n for r in spark.table("late_append").collect()}
    # Only the 10:00 window finalized, WITHOUT the late event.
    assert finalized == {"10:00": 2}, finalized

    dropped = sum(
        (p["stateOperators"][0].get("numRowsDroppedByWatermark", 0) or 0)
        for p in q.recentProgress
        if p["stateOperators"]
    )
    assert dropped == 1, f"expected exactly the late row dropped, got {dropped}"
