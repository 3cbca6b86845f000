"""As-of join and bucketized interval join."""

from distributed_graph_analytics_spark.operators.temporal import (
    asof_join,
    interval_join,
)


def test_asof_backward_match_and_ties(spark):
    l = spark.createDataFrame(
        [(1, 100, 10), (1, 200, 11), (2, 50, 12)],
        ["user_id", "ts", "event_id"],
    )
    r = spark.createDataFrame(
        [(1, 90, 7, 1.5), (1, 150, 8, 2.5), (1, 150, 9, 3.5), (2, 60, 5, 9.9)],
        ["user_id", "ts", "event_id", "value"],
    )
    out = {
        r_["event_id"]: (r_["right_event_id"], r_["right_value"])
        for r_ in asof_join(
            l, r, on="ts", by=("user_id",),
            right_cols=("event_id", "value"), tiebreak="event_id",
        ).collect()
    }
    assert out[10] == (7, 1.5)       # only the ts=90 purchase precedes
    assert out[11] == (9, 3.5)       # equal-ts tie -> larger tiebreak id
    assert out[12] == (None, None)   # user 2 has no prior right row


def test_asof_equal_ts_matches(spark):
    l = spark.createDataFrame([(1, 100, 1)], ["user_id", "ts", "event_id"])
    r = spark.createDataFrame(
        [(1, 100, 2, 5.0)], ["user_id", "ts", "event_id", "value"]
    )
    out = asof_join(
        l, r, on="ts", by=("user_id",),
        right_cols=("event_id", "value"), tiebreak="event_id",
    ).collect()[0]
    assert out["right_event_id"] == 2  # right sorts before left at equal ts


def test_interval_join_buckets_and_bounds(spark):
    pts = spark.createDataFrame(
        [(1, 150, 100), (1, 200, 101), (1, 250, 102), (2, 150, 103)],
        ["user_id", "ts_us", "pid"],
    )
    ivs = spark.createDataFrame(
        [(1, 100, 200, 77), (1, 200, 300, 88)],
        ["user_id", "start_us", "end_us", "sid"],
    )
    # bucket smaller than the intervals: replicas must still dedupe to
    # one match per containing interval (end exclusive, start inclusive)
    got = {
        (r["pid"], r["sid"])
        for r in interval_join(pts, ivs, bucket_us=30).collect()
    }
    assert got == {(100, 77), (101, 88), (102, 88)}
    # user 2's point matches nothing (no intervals for that key)


def _exchanges(df):
    plan = df._jdf.queryExecution().executedPlan().toString()
    return [
        ln.strip()
        for ln in plan.splitlines()
        if "Exchange" in ln and "Reused" not in ln
    ]


def test_asof_join_single_exchange(spark):
    """The as-of plan promise: ONE exchange (hash by the key), however
    far back matches reach — never an inequality join."""
    from pyspark.sql import functions as F

    ev = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
    clicks = ev.where("event_type='click'").select(
        "event_id",
        F.unix_micros(F.col("ts").cast("timestamp")).alias("ts_us"),
        "user_id",
    )
    purch = ev.where("event_type='purchase'").select(
        "event_id",
        F.unix_micros(F.col("ts").cast("timestamp")).alias("ts_us"),
        "user_id",
        "value",
    )
    out = asof_join(
        clicks, purch, on="ts_us", right_cols=("event_id", "value"),
        tiebreak="event_id",
    )
    ex = _exchanges(out)
    assert len(ex) == 1 and "user_id" in ex[0], ex


def test_sessionize_single_exchange(spark):
    from distributed_graph_analytics_spark.streaming.sessions import (
        batch_sessionize,
    )

    ev = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
    ex = _exchanges(batch_sessionize(ev))
    assert len(ex) == 1 and "user_id" in ex[0], ex


def test_asof_tiebreak_requires_integral_dtype(spark):
    """A non-numeric tiebreak used to silently cast to NULL, quietly
    losing the determinism guarantee — now it raises."""
    import pytest as _pytest

    from distributed_graph_analytics_spark.operators.temporal import asof_join

    left = spark.createDataFrame([(1, 10)], ["user_id", "ts"])
    right = spark.createDataFrame(
        [(1, 5, "k1", 1.0)], ["user_id", "ts", "event_key", "value"]
    )
    with _pytest.raises(ValueError, match="integral"):
        asof_join(
            left, right, right_cols=("value",), tiebreak="event_key"
        )
