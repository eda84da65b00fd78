"""Streaming/batch parity: the windowed streaming aggregation over a
closed file source equals the batch aggregation on the same data."""

from __future__ import annotations

import shutil

from parallel_connected_components_spark.streaming import (
    batch_event_counts,
    streaming_event_counts,
)
from parallel_connected_components_spark.streaming.events import run_stream_to_completion

SRC = "/root/testdata/sf0.001/events.parquet"


def test_stream_equals_batch(spark, tmp_path):
    src_dir = str(tmp_path / "events_in")
    shutil.copytree(SRC, src_dir) if False else None
    # parquet "file" from the driver is a single file; file source wants a dir
    import os

    os.makedirs(src_dir, exist_ok=True)
    shutil.copy(SRC, os.path.join(src_dir, "part-0.parquet"))

    events = spark.read.parquet(SRC)
    batch = batch_event_counts(events)
    stream_df = streaming_event_counts(spark, src_dir, schema_from=SRC)
    # checkpointLocation-free memory sink with availableNow
    got = run_stream_to_completion(spark, stream_df, "evt_counts")
    assert got.count() == batch.count()
    assert got.exceptAll(batch).count() == 0
    assert batch.exceptAll(got).count() == 0
