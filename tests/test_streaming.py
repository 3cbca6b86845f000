import time

from pyspark.sql import functions as F

from distributed_graph_analytics_spark.streaming.events import (
    read_event_stream,
    streaming_edge_counts,
    streaming_event_rollup,
)

SF_DIR = "/root/testdata/sf0.001"


def _run_to_completion(stream_df, tmp_path, name):
    q = (
        stream_df.writeStream.format("memory")
        .queryName(name)
        .outputMode("append" if name == "noop" else "complete")
        .option("checkpointLocation", str(tmp_path / f"ckpt_{name}"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    return q


def test_streaming_rollup_matches_batch(spark, tmp_path):
    events = read_event_stream(spark, f"{SF_DIR}/events.parquet")
    rollup = streaming_event_rollup(events, window="1 hour", watermark="100 hours")
    q = (
        rollup.writeStream.format("memory")
        .queryName("rollup")
        .outputMode("complete")
        .option("checkpointLocation", str(tmp_path / "ck1"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = {
        (r["window_start"], r["event_type"]): r["n_events"]
        for r in spark.sql("select * from rollup").collect()
    }
    batch = (
        spark.read.parquet(f"{SF_DIR}/events.parquet")
        .groupBy(F.window("ts", "1 hour").alias("win"), "event_type")
        .agg(F.count(F.lit(1)).alias("n"))
        .select(F.col("win.start").alias("ws"), "event_type", "n")
        .collect()
    )
    want = {(r["ws"], r["event_type"]): r["n"] for r in batch}
    assert got == want
    assert len(got) > 0


def test_streaming_edge_counts_runs(spark, tmp_path):
    # append mode: windows finalized by the watermark emit exactly once;
    # the 1-hour lag leaves only the trailing hour of the 30-day event
    # range unemitted
    events = read_event_stream(spark, f"{SF_DIR}/events.parquet")
    edges = streaming_edge_counts(events, watermark="1 hour")
    q = (
        edges.writeStream.format("memory")
        .queryName("sedges")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ck2"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)
    rows = spark.sql("select * from sedges").collect()
    assert len(rows) > 0
    assert all(r["src"] < r["dst"] for r in rows)
    assert all(r["weight"] >= 1 for r in rows)


def test_batch_edge_counts_matches_streaming(spark, tmp_path):
    # the batch twin must emit exactly the streaming accumulator's
    # finalized-window rows (same pairs, same windows); restrict the
    # comparison to windows the 1-hour watermark finalized
    from distributed_graph_analytics_spark.streaming.events import (
        batch_edge_counts,
    )

    events = read_event_stream(spark, f"{SF_DIR}/events.parquet")
    edges = streaming_edge_counts(events, watermark="1 hour")
    q = (
        edges.writeStream.format("memory")
        .queryName("sedges_twin")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ck3"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)
    got = {
        (r["window_start"], r["event_type"], r["src"], r["dst"], r["weight"])
        for r in spark.sql("select * from sedges_twin").collect()
    }
    finalized = {w for (w, _t, _s, _d, _w) in got}
    batch = batch_edge_counts(
        spark.read.parquet(f"{SF_DIR}/events.parquet"), window="1 hour"
    ).collect()
    want = {
        (r["window_start"], r["event_type"], r["src"], r["dst"], r["weight"])
        for r in batch
        if r["window_start"] in finalized
    }
    assert len(got) > 0
    assert got == want


def test_batch_edge_counts_rejects_unaligned_window(spark):
    import pytest as _pytest

    from distributed_graph_analytics_spark.streaming.events import (
        batch_edge_counts,
    )

    ev = spark.read.parquet(f"{SF_DIR}/events.parquet")
    with _pytest.raises(ValueError, match="calendar-aligned"):
        batch_edge_counts(ev, window="90 minutes")
