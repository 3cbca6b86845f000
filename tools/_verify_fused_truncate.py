"""Empirical check: does `persist -> observe -> localCheckpoint(eager)`
(ONE job) capture REAL InMemoryRelation stats (bounded digits across a
join loop) like the two-job truncate(), and does Observation.get return
the metric? Prints per-iteration sizeInBytes digit count + timing.

Run: python tools/_verify_fused_truncate.py
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark import StorageLevel
from pyspark.sql import Observation
from pyspark.sql import functions as F

from distributed_graph_analytics_spark.session import get_spark


def size_digits(df):
    stats = df._jdf.queryExecution().optimizedPlan().stats()
    return len(str(stats.sizeInBytes()))


def main():
    spark = get_spark("verify-fused", master="local[4]", shuffle_partitions=4)
    spark.sparkContext.setLogLevel("ERROR")
    edges = spark.range(0, 20000).select(
        (F.col("id") % 2000).alias("src"), ((F.col("id") * 7) % 2000).alias("dst")
    )
    edges = edges.persist(StorageLevel.MEMORY_AND_DISK)
    edges.count()

    state = spark.range(0, 2000).select(F.col("id"), F.col("id").alias("lbl"))
    # seed with a localCheckpoint so iteration 1 starts from a LogicalRDD
    state = state.localCheckpoint(eager=True)
    for i in range(1, 9):
        msgs = (
            edges.join(state.hint("shuffle_hash"), edges["src"] == state["id"])
            .select(F.col("dst").alias("id"), F.col("lbl").alias("cand"))
            .groupBy("id")
            .agg(F.max("cand").alias("cand"))
        )
        new_state = (
            state.select("id", "lbl")
            .join(msgs.hint("shuffle_hash"), "id", "left_outer")
            .select("id", F.greatest("lbl", F.coalesce("cand", F.lit(0))).alias("lbl"))
        )
        t0 = time.time()
        obs = Observation()
        cached = new_state.persist(StorageLevel.MEMORY_AND_DISK)
        out = cached.observe(obs, F.max("lbl").alias("m")).localCheckpoint(eager=True)
        metric = obs.get["m"]
        cached.unpersist()
        state = out
        print(
            f"iter {i}: digits={size_digits(state)} metric={metric} "
            f"sec={time.time() - t0:.3f}",
            flush=True,
        )
    spark.stop()


if __name__ == "__main__":
    main()
