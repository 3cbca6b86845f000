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

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def read_event_stream(spark: SparkSession, path: str, schema=None) -> DataFrame:
    """File-source event stream (one parquet dir). For Kafka, swap the
    reader; downstream is identical.

    The streaming file source only accepts directories; a single-file
    path is read via its parent directory + a pathGlobFilter on the
    file name (the driver testdata ships one file per table)."""
    if schema is None:
        schema = spark.read.parquet(path).schema
    reader = spark.readStream.schema(schema)
    if os.path.isfile(path):
        parent, fname = os.path.split(path)
        return reader.option("pathGlobFilter", fname).parquet(parent)
    return reader.parquet(path)


def _instant_ts(events: DataFrame, col: str = "ts") -> DataFrame:
    """Watermarks require an instant (TIMESTAMP) event-time column;
    parquet sources often carry TIMESTAMP_NTZ — cast it (session-TZ
    interpretation, UTC in this engine's sessions)."""
    if dict(events.dtypes).get(col) == "timestamp_ntz":
        return events.withColumn(col, F.col(col).cast("timestamp"))
    return events


def streaming_event_rollup(
    events: DataFrame,
    window: str = "1 hour",
    watermark: str = "2 hours",
) -> DataFrame:
    """Watermarked windowed aggregate: events per (window, event_type)
    with value stats. Late rows beyond the watermark are dropped —
    state is bounded, the requirement for an unbounded run."""
    events = _instant_ts(events)
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


def batch_edge_counts(events: DataFrame, window: str = "1 hour") -> DataFrame:
    """Batch twin of streaming_edge_counts: the same per-(window,
    event_type) user co-occurrence pairs, computed over a bounded
    table. Rows equal the union of the streaming accumulator's
    finalized-window emissions (weight-1 deltas, src < dst).

    Plan shape for scale: distinct on (window, event_type, user) is a
    partial-aggregated shuffle on the group key, and the pair
    explosion is a self-join co-partitioned on that same key — both
    legs arrive hash-partitioned on (window_start, event_type), so the
    join itself adds no exchange, and AQE's skew split covers hot
    windows. No collect_set row-width ceiling on the batch path."""
    trunc = {"1 hour": "hour", "1 minute": "minute", "1 day": "day"}.get(window)
    if trunc is None:
        raise ValueError(
            f"batch_edge_counts supports calendar-aligned windows "
            f"('1 hour'/'1 minute'/'1 day'), got {window!r}"
        )
    du = (
        _instant_ts(events)
        .select(
            F.date_trunc(trunc, "ts").alias("window_start"),
            "event_type",
            "user_id",
        )
        .distinct()
    )
    a, b = du.alias("a"), du.alias("b")
    return (
        a.join(b, ["window_start", "event_type"])
        .where(F.col("a.user_id") < F.col("b.user_id"))
        .select(
            "window_start",
            "event_type",
            F.col("a.user_id").alias("src"),
            F.col("b.user_id").alias("dst"),
            F.lit(1).cast("long").alias("weight"),
        )
    )


def streaming_edge_counts(
    events: DataFrame,
    watermark: str = "2 hours",
    window: str = "1 hour",
) -> DataFrame:
    """Incremental co-occurrence edge accumulation: users co-acting in
    the same (window, event_type) become edges — the streaming twin of
    the batch repo/commit co-occurrence builder.

    One stateful operator only: a watermarked windowed ``collect_set``
    (bounded state, finalized windows emit in append mode), then a
    stateless pair explosion — far cheaper than the naive stream-stream
    self-join, whose state would hold every event twice for the full
    watermark horizon. Emits per-(window, event_type) co-occurrence
    pairs (weight 1 deltas); a downstream batch job folds windows into
    the edge table."""
    keyed = _instant_ts(events).withWatermark("ts", watermark)
    grouped = keyed.groupBy(
        F.window("ts", window).alias("win"), "event_type"
    ).agg(F.sort_array(F.collect_set("user_id")).alias("users"))
    return (
        grouped.select(
            F.col("win.start").alias("window_start"),
            "event_type",
            F.explode("users").alias("src"),
            "users",
        )
        .select(
            "window_start", "event_type", "src", F.explode("users").alias("dst")
        )
        .where(F.col("src") < F.col("dst"))
        .select(
            "window_start",
            "event_type",
            "src",
            "dst",
            F.lit(1).cast("long").alias("weight"),
        )
    )
