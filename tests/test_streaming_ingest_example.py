"""Integration test for the streaming ingest example pipeline."""

import sys
from pathlib import Path

from conftest import SF_SMOKE

sys.path.insert(0, str(Path(__file__).resolve().parents[1] / "examples"))

from map_reduce_library_spark.tables import load_table


def test_streaming_ingest_pipeline_end_to_end(spark, tmp_path):
    from streaming_ingest_pipeline import run

    result = run(spark, SF_SMOKE, str(tmp_path))
    events = load_table(spark, SF_SMOKE, "events")
    # Every event landed exactly once (dedup kept the stream clean)
    # and carried its enrichment column through compaction.
    assert result.count() == events.count()
    assert "c_mktsegment" in result.columns
    assert result.select("event_id").distinct().count() == events.count()
