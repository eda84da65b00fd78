"""Structured Streaming counterpart for the events table.

The reference has no streaming surface (SURVEY.md §2.11) — this module
exists because the engine's target environment (continuous crawls) makes
the events/pages tables naturally unbounded. Semantics contract: the
streaming aggregation must equal the batch aggregation over the same
closed input — tested by running the file-source stream to completion
(``availableNow``) and diffing against the batch plan.

Pattern: readStream (file source, schema pinned) → event-time windowed
count with watermark for late data → append/complete sink. At scale the
same plan runs against a Kafka source unchanged.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F


def batch_event_counts(events: DataFrame, window: str = "1 hour") -> DataFrame:
    """Per-(window, event_type) counts + value sum — the batch truth."""
    events = events.withColumn("ts", F.col("ts").cast("timestamp"))
    return (
        events.groupBy(F.window("ts", window).alias("w"), "event_type")
        .agg(F.count("*").alias("n_events"), F.sum("value").alias("sum_value"))
        .select(
            F.col("w.start").alias("window_start"),
            "event_type",
            "n_events",
            "sum_value",
        )
    )


def streaming_event_counts(
    spark: SparkSession,
    source_dir: str,
    schema_from: str,
    window: str = "1 hour",
    watermark: str = "2 hours",
) -> DataFrame:
    """readStream over a parquet directory → windowed counts with a
    watermark bounding state for late events. Returns the streaming
    DataFrame; callers attach a sink (tests use availableNow + memory)."""
    schema = spark.read.parquet(schema_from).schema
    stream = spark.readStream.schema(schema).parquet(source_dir)
    # watermarks require TIMESTAMP (not NTZ); session TZ is pinned UTC so
    # the cast is lossless and batch/stream stay comparable
    stream = stream.withColumn("ts", F.col("ts").cast("timestamp"))
    return (
        stream.withWatermark("ts", watermark)
        .groupBy(F.window("ts", window).alias("w"), "event_type")
        .agg(F.count("*").alias("n_events"), F.sum("value").alias("sum_value"))
        .select(
            F.col("w.start").alias("window_start"),
            "event_type",
            "n_events",
            "sum_value",
        )
    )


def run_stream_to_completion(
    spark: SparkSession, streaming_df: DataFrame, query_name: str, timeout_sec: int = 120
) -> DataFrame:
    """Drain all available input (availableNow trigger) into a memory
    sink and return the result as a batch DataFrame."""
    q = (
        streaming_df.writeStream.format("memory")
        .queryName(query_name)
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(timeout_sec)
    return spark.table(query_name)


def batch_session_counts(events: DataFrame, gap: str = "30 minutes") -> DataFrame:
    """Per-(user, session) event counts with session windows — the batch
    truth for :func:`streaming_session_counts` (same `session_window`
    expression, so stream == batch over a closed input)."""
    events = events.withColumn("ts", F.col("ts").cast("timestamp"))
    return (
        events.groupBy(
            F.session_window("ts", gap).alias("w"), F.col("user_id")
        )
        .agg(F.count("*").alias("n_events"))
        .select(
            "user_id",
            F.col("w.start").alias("session_start"),
            F.col("w.end").alias("session_end"),
            "n_events",
        )
    )


def streaming_session_counts(
    spark: SparkSession,
    source_dir: str,
    schema_from: str,
    gap: str = "30 minutes",
    watermark: str = "2 hours",
) -> DataFrame:
    """Event-time SESSION windows (dynamic-gap windows merge as events
    arrive — state Spark manages natively; the watermark closes sessions
    and bounds state). This is the streaming twin of the entry's
    `events_sessions` sessionization."""
    schema = spark.read.parquet(schema_from).schema
    stream = spark.readStream.schema(schema).parquet(source_dir)
    stream = stream.withColumn("ts", F.col("ts").cast("timestamp"))
    return (
        stream.withWatermark("ts", watermark)
        .groupBy(F.session_window("ts", gap).alias("w"), F.col("user_id"))
        .agg(F.count("*").alias("n_events"))
        .select(
            "user_id",
            F.col("w.start").alias("session_start"),
            F.col("w.end").alias("session_end"),
            "n_events",
        )
    )


def streaming_exact_dedup(
    spark: SparkSession,
    source_dir: str,
    schema_from: str,
    id_col: str = "doc_id",
    text_col: str = "text",
    watermark_col: str | None = None,
    watermark: str = "1 hour",
) -> DataFrame:
    """Streaming exact deduplication of a document stream by normalized-
    text fingerprint — the unbounded-ingest form of
    operators.dedup.exact_dedup. Without a watermark column the dedup
    state is global (exactly-once per fingerprint, state grows with
    distinct docs — the batch-parity semantics); with one,
    ``dropDuplicatesWithinWatermark`` bounds state for true continuous
    ingest at the cost of only-within-horizon dedup."""
    from ..functions.textstats import fingerprint_col

    schema = spark.read.parquet(schema_from).schema
    stream = spark.readStream.schema(schema).parquet(source_dir)
    stream = stream.withColumn("fingerprint", fingerprint_col(text_col))
    if watermark_col is not None:
        stream = stream.withColumn(
            watermark_col, F.col(watermark_col).cast("timestamp")
        ).withWatermark(watermark_col, watermark)
        return stream.dropDuplicatesWithinWatermark(["fingerprint"])
    return stream.dropDuplicates(["fingerprint"])
