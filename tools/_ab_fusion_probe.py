"""A/B probe: fused Observation materialize vs two-job persist+agg+checkpoint.

Diagnoses the ~2x PR/WCC regression seen after commit a40fb30. Runs the
same PageRank superstep body with both materialization strategies in one
JVM (order A,B,A,B to cancel warm-up) and prints per-iteration seconds.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark import StorageLevel
from pyspark.sql import functions as F, Observation


def main():
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "4"))
    replicate = int(os.environ.get("SPARK_GRAFT_REPLICATE", "8"))
    iters = int(os.environ.get("AB_ITERS", "5"))

    from distributed_graph_analytics_spark.session import get_spark
    from distributed_graph_analytics_spark.plans.join_strategy import maybe_broadcast
    from distributed_graph_analytics_spark.sources.edges import vertices_of
    from _scaling_worker import replicated_edges

    spark = get_spark(f"ab-fusion-{cpus}", master=f"local[{cpus}]", shuffle_partitions=cpus)
    spark.sparkContext.setLogLevel("ERROR")
    n_part = cpus

    edges = replicated_edges(spark, sf_dir, replicate).persist(StorageLevel.MEMORY_AND_DISK)
    edges.count()

    e_parted = edges.select("src", "dst").repartition(n_part, "src")
    out_deg = e_parted.groupBy("src").agg(F.count(F.lit(1)).alias("out_deg"))
    adj = (
        e_parted.join(out_deg.hint("shuffle_hash"), "src")
        .groupBy("src", "out_deg")
        .agg(F.collect_list("dst").alias("dsts"))
        .select("src", "dsts", (F.lit(1.0) / F.col("out_deg")).alias("inv_deg"))
        .repartition(n_part, "src")
        .persist(StorageLevel.MEMORY_AND_DISK)
    )
    adj.count()
    vertices = vertices_of(edges).persist(StorageLevel.MEMORY_AND_DISK)
    n = vertices.count()
    teleport = 0.15 / n

    def superstep_plan(state):
        bstate = maybe_broadcast(state, n)
        contribs = (
            adj.join(bstate, adj["src"] == bstate["id"])
            .select(F.explode("dsts").alias("id"), (F.col("rank") * F.col("inv_deg")).alias("c"))
            .groupBy("id")
            .agg(F.sum("c").alias("msg_sum"))
        )
        return (
            state.withColumnRenamed("rank", "old_rank")
            .join(maybe_broadcast(contribs, n), "id", "left_outer")
            .select(
                "id",
                (F.lit(teleport) + F.lit(0.85) * F.coalesce("msg_sum", F.lit(0.0))).alias("rank"),
                "old_rank",
            )
        )

    def run_variant(name, fused):
        state = vertices.select("id", F.lit(1.0 / n).alias("rank")).localCheckpoint(eager=True)
        times = []
        for i in range(iters):
            t0 = time.time()
            ns = superstep_plan(state)
            if fused == "obs_count":
                # SQL action carries the metrics + fills cache (AQE on);
                # checkpoint then scans the cache (cheap)
                cached = ns.persist(StorageLevel.MEMORY_AND_DISK)
                obs = Observation()
                observed = cached.observe(
                    obs,
                    F.max(F.abs(F.col("rank") - F.col("old_rank")) / F.col("old_rank")).alias("d"),
                )
                t_ck0 = time.time()
                observed.count()
                _ = dict(obs.get)["d"]
                t_ck = time.time() - t_ck0
                t_obs0 = time.time()
                out = cached.select("id", "rank").localCheckpoint(eager=True)
                t_obs = time.time() - t_obs0
                cached.unpersist()
            elif fused:
                cached = ns.persist(StorageLevel.MEMORY_AND_DISK)
                obs = Observation()
                observed = cached.observe(
                    obs,
                    F.max(F.abs(F.col("rank") - F.col("old_rank")) / F.col("old_rank")).alias("d"),
                )
                t_ck0 = time.time()
                out = observed.select("id", "rank").localCheckpoint(eager=True)
                t_ck = time.time() - t_ck0
                t_obs0 = time.time()
                _ = dict(obs.get)["d"]
                t_obs = time.time() - t_obs0
                cached.unpersist()
            else:
                cached = ns.persist(StorageLevel.MEMORY_AND_DISK)
                t_ck0 = time.time()
                _ = cached.agg(
                    F.max(F.abs(F.col("rank") - F.col("old_rank")) / F.col("old_rank"))
                ).first()[0]
                t_ck = time.time() - t_ck0
                t_obs0 = time.time()
                out = cached.select("id", "rank").localCheckpoint(eager=True)
                t_obs = time.time() - t_obs0
                cached.unpersist()
            state.unpersist()
            state = out
            times.append((round(time.time() - t0, 3), round(t_ck, 3), round(t_obs, 3)))
        print(f"{name}: per-iter (total, job1, job2/obs) = {times}", flush=True)
        return times

    for rnd in range(2):
        run_variant(f"fused#{rnd}", fused=True)
        run_variant(f"twojob#{rnd}", fused=False)
        run_variant(f"obscount#{rnd}", fused="obs_count")
    spark.stop()


if __name__ == "__main__":
    main()
