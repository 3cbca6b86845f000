"""Structured Streaming adapters.

The reference is batch-only BSP (SURVEY.md §2.4: no streaming), so this
module is an engine extension, not a parity item: it lets the same
co-occurrence/edge math run incrementally over an event stream —
watermarked windowed rollups, and a streaming edge-count accumulator
feeding the batch analytics' edge-table contract.

Tested with the file source over the driver-provided events parquet
(readStream on a directory is the sandbox stand-in for Kafka; the
transformations are source-agnostic).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def read_event_stream(spark: SparkSession, path: str, schema=None) -> DataFrame:
    """File-source event stream (one parquet dir). For Kafka, swap the
    reader; downstream is identical."""
    if schema is None:
        schema = spark.read.parquet(path).schema
    return spark.readStream.schema(schema).parquet(path)


def streaming_event_rollup(
    events: DataFrame,
    window: str = "1 hour",
    watermark: str = "2 hours",
) -> DataFrame:
    """Watermarked windowed aggregate: events per (window, event_type)
    with value stats. Late rows beyond the watermark are dropped —
    state is bounded, the requirement for an unbounded run."""
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.window("ts", window).alias("win"), "event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum("value").alias("sum_value"),
            F.approx_count_distinct("user_id").alias("approx_users"),
        )
        .select(
            F.col("win.start").alias("window_start"),
            "event_type",
            "n_events",
            "sum_value",
            "approx_users",
        )
    )


def streaming_edge_counts(
    events: DataFrame,
    watermark: str = "2 hours",
) -> DataFrame:
    """Incremental co-occurrence edge accumulation: users co-acting in
    the same (window, event_type) become weighted edges — the streaming
    twin of the batch repo/commit co-occurrence builder. Emits per-window
    pair counts; a downstream batch job folds windows into the edge
    table."""
    keyed = events.withWatermark("ts", watermark).select(
        F.window("ts", "1 hour").alias("win"), "event_type", "user_id"
    )
    a = keyed.alias("a")
    b = keyed.alias("b")
    return (
        a.join(
            b,
            (F.col("a.win") == F.col("b.win"))
            & (F.col("a.event_type") == F.col("b.event_type"))
            & (F.col("a.user_id") < F.col("b.user_id")),
        )
        .select(
            F.col("a.win.start").alias("window_start"),
            F.col("a.user_id").alias("src"),
            F.col("b.user_id").alias("dst"),
        )
        .groupBy("window_start", "src", "dst")
        .agg(F.count(F.lit(1)).alias("weight"))
    )
