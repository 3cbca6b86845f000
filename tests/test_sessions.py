"""Sessionization: shared-kernel vs native session_window, batch vs
streaming finalized emissions, max-duration cap semantics."""

import pandas as pd
import pytest
from pyspark.sql import functions as F

from distributed_graph_analytics_spark.streaming.events import (
    read_event_stream,
)
from distributed_graph_analytics_spark.streaming.sessions import (
    _fold_sessions,
    _parse_interval_us,
    batch_sessionize,
    batch_sessionize_custom,
    streaming_sessionize,
    streaming_sessionize_custom,
)

SF_DIR = "/root/testdata/sf0.001"
GAP_US = 12 * 3600 * 1_000_000


def events(spark):
    return spark.read.parquet(f"{SF_DIR}/events.parquet")


def test_parse_interval_us():
    assert _parse_interval_us("12 hours") == GAP_US
    assert _parse_interval_us("30 minutes") == 1800 * 1_000_000
    assert _parse_interval_us("1 day") == 86400 * 1_000_000
    assert _parse_interval_us("45 seconds") == 45 * 1_000_000


def test_fold_sessions_kernel():
    # gap 10us: [0,5,14] one session (5→14 joins: 9 < 10); 25 splits
    closed, cur = _fold_sessions([0, 5, 14, 25], [1.0, 2.0, 3.0, 4.0], 10, None, None)
    assert closed == [(0, 24, 3, 6.0)]
    assert cur == (25, 25, 1, 4.0)
    # max-duration 12: event at 14 is within gap of 5 but spans >= 12 from 0
    closed, cur = _fold_sessions([0, 5, 14], [1.0, 2.0, 3.0], 10, 12, None)
    assert closed == [(0, 15, 2, 3.0)]
    assert cur == (14, 14, 1, 3.0)
    # state carry-in + out-of-order row inside open-session span merges
    closed, cur = _fold_sessions([3], [1.0], 10, None, (0, 5, 2, 2.0))
    assert closed == []
    assert cur == (0, 5, 3, 3.0)


def test_custom_kernel_matches_native_session_window(spark):
    b = sorted(map(tuple, batch_sessionize(events(spark)).collect()))
    c = sorted(map(tuple, batch_sessionize_custom(events(spark)).collect()))
    assert len(b) > 0
    assert b == c


def test_max_duration_cap_splits_long_sessions(spark):
    plain = batch_sessionize_custom(events(spark)).toPandas()
    capped = batch_sessionize_custom(
        events(spark), max_duration="1 day"
    ).toPandas()
    # capping can only split → at least as many sessions, same event total
    assert len(capped) > len(plain)
    assert capped["n_events"].sum() == plain["n_events"].sum()
    # every capped session's events span < 1 day (end includes +gap slack)
    span = capped["session_end_us"] - capped["session_start_us"] - GAP_US
    assert (span < 86400 * 1_000_000).all()


@pytest.mark.parametrize("variant", ["native", "custom"])
def test_streaming_matches_finalized_batch(spark, tmp_path, variant):
    ev = events(spark)
    max_ts_us = ev.agg(
        F.unix_micros(F.max(F.col("ts").cast("timestamp")))
    ).first()[0]
    wm_us = max_ts_us - 3600 * 1_000_000
    want = sorted(
        t
        for t in map(tuple, batch_sessionize(ev).collect())
        if t[2] < wm_us  # watermark passed session_end → finalized
    )
    es = read_event_stream(spark, f"{SF_DIR}/events.parquet")
    sdf = (
        streaming_sessionize(es, watermark="1 hour")
        if variant == "native"
        else streaming_sessionize_custom(es, watermark="1 hour")
    )
    q = (
        sdf.writeStream.format("memory")
        .queryName(f"sess_{variant}")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / f"ck_{variant}"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)
    got = sorted(
        map(tuple, spark.sql(f"select * from sess_{variant}").collect())
    )
    assert len(got) > 0
    assert got == want


def test_streaming_custom_state_carries_across_batches(spark, tmp_path):
    # split one user's session across two files (two micro-batches) —
    # the open-session state must merge them into ONE session
    ev = pd.DataFrame(
        {
            "ts": pd.to_datetime(
                ["2024-01-01 00:00:00", "2024-01-01 01:00:00",
                 "2024-01-01 02:00:00", "2024-01-10 00:00:00"]
            ),
            "user_id": [7, 7, 7, 7],
            "value": [1.0, 2.0, 3.0, 4.0],
        }
    )
    src = tmp_path / "ev"
    src.mkdir()
    spark.createDataFrame(ev.iloc[:2]).coalesce(1).write.parquet(
        str(src / "b1")
    )
    spark.createDataFrame(ev.iloc[2:]).coalesce(1).write.parquet(
        str(src / "b2")
    )
    schema = spark.read.parquet(str(src / "b1")).schema
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .option("recursiveFileLookup", "true")
        .parquet(str(src))
    )
    sdf = streaming_sessionize_custom(stream, gap="12 hours", watermark="0 seconds")
    q = (
        sdf.writeStream.format("memory")
        .queryName("sess_carry")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ck_carry"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = sorted(map(tuple, spark.sql("select * from sess_carry").collect()))
    base = pd.Timestamp("2024-01-01 00:00:00").value // 1000
    # first session: 3 events across the two batches, end = 02:00 + gap
    assert (7, base, base + 2 * 3600 * 1_000_000 + GAP_US, 3, 6.0) in got


def test_dominant_user_gap_aligned_presplit(spark):
    """One user owns (nearly) the whole event log: the batch custom
    path pre-splits their history at every >= gap silence, so the fold
    runs per (user, segment) instead of one unbounded Arrow batch —
    and the output is identical to the unsplit semantics (pinned
    against the native session_window on the gap-only config)."""
    from distributed_graph_analytics_spark.streaming.sessions import (
        batch_sessionize,
        batch_sessionize_custom,
    )

    # 50 sessions of 3 events each, separated by exactly-gap silences
    gap_us = 3_600_000_000  # 1 hour
    rows = []
    t = 1_000_000
    for s in range(50):
        for k in range(3):
            rows.append((7, t + k * 1_000_000, 1.0))
        t += 3 * 1_000_000 + gap_us  # next burst exactly gap after last
    rows.append((8, 5_000_000, 2.0))  # one other tiny user
    df = spark.createDataFrame(rows, ["user_id", "ts_us", "value"]).select(
        "user_id",
        (F.col("ts_us") / 1_000_000).cast("timestamp").alias("ts"),
        "value",
    )
    native = {
        tuple(r) for r in batch_sessionize(df, gap="1 hour").collect()
    }
    custom = {
        tuple(r)
        for r in batch_sessionize_custom(df, gap="1 hour").collect()
    }
    assert custom == native
    assert len([r for r in custom if r[0] == 7]) == 50
