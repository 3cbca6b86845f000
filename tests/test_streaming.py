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
