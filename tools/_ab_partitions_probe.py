"""Within-JVM A/B probe: shuffle/adjacency partition count = cpus
(the scaling bench's historical choice) vs a tasks-per-core multiplier
(n_part = k*cpus, the standard cluster sizing: 2-3 waves of tasks per
core smooth stage-tail idle).

Motivation: the pinned scaling decomposition shows pr_steps at ~0.73
phase efficiency — the largest and worst phase. One candidate cause is
coarse tasking: with n_part == cpus == 4 every stage is exactly one
wave of 4 tasks, so any duration skew leaves cores idle at the stage
tail; at cpus == 1 there is no tail to lose. If the multiplier buys
the 4-core leg more than the 1-core leg, it is a legitimate
ratio-improving kernel change (then: fresh campaign, accumulation
reset); if it buys both sides equally or costs the 4-core side, it
dies here.

Measures, per variant, in ONE JVM (cross-JVM wall clock is
meaningless on this host): the localCheckpoint-materialized PR build
(same quantity as the decomposition's pr_build) and 4 PR supersteps
against that adjacency (the decomposition's pr_steps shape, fixed
iteration count so variants compare like-for-like).

Usage: SPARK_GRAFT_CPUS=4 SPARK_GRAFT_REPLICATE=64 AB_ROUNDS=2 \
       AB_MULT=3 [taskset -c 0-3] python tools/_ab_partitions_probe.py
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark import StorageLevel
from pyspark.sql import functions as F


def main():
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "4"))
    replicate = int(os.environ.get("SPARK_GRAFT_REPLICATE", "64"))
    rounds = int(os.environ.get("AB_ROUNDS", "2"))
    mult = int(os.environ.get("AB_MULT", "3"))
    steps = int(os.environ.get("AB_STEPS", "4"))

    from _scaling_worker import replicated_edges

    from distributed_graph_analytics_spark.operators.pagerank import (
        build_out_adjacency,
    )
    from distributed_graph_analytics_spark.plans.iteration import (
        aqe_off,
        hash_agg_pack,
        materialize,
    )
    from distributed_graph_analytics_spark.plans.join_strategy import (
        maybe_broadcast,
    )
    from distributed_graph_analytics_spark.session import get_spark

    spark = get_spark(
        f"ab-partitions-{cpus}", master=f"local[{cpus}]", shuffle_partitions=cpus
    )
    spark.sparkContext.setLogLevel("ERROR")
    edges = replicated_edges(spark, sf_dir, replicate).persist(
        StorageLevel.MEMORY_AND_DISK
    )
    print(f"edges = {edges.count():,}  cpus={cpus}  mult={mult}", flush=True)

    def run_variant(n_part: int, tag: str, rnd: int):
        spark.conf.set("spark.sql.shuffle.partitions", str(n_part))
        t0 = time.time()
        adj = build_out_adjacency(edges, n_part)
        with aqe_off(spark), hash_agg_pack(spark):
            adj = adj.localCheckpoint(eager=True)
        n_rows = adj.count()
        build_sec = time.time() - t0

        vertices = (
            adj.select(F.col("src").alias("id"))
            .unionByName(edges.select(F.col("dst").alias("id")))
            .distinct()
            .persist(StorageLevel.MEMORY_AND_DISK)
        )
        n = vertices.count()
        state = vertices.select("id", F.lit(1.0 / n).alias("rank"))
        with aqe_off(spark):
            state = state.localCheckpoint(eager=True)
        t0 = time.time()
        for _ in range(steps):
            bstate = maybe_broadcast(state, n)
            contribs = (
                adj.join(bstate, adj["src"] == bstate["id"])
                .select(
                    F.explode("dsts").alias("_nb"),
                    (F.col("rank") * F.col("inv_deg")).alias("c"),
                )
                .select(F.col("_nb").cast("long").alias("id"), "c")
                .groupBy("id")
                .agg(F.sum("c").alias("msg_sum"))
            )
            new_state = (
                state.withColumnRenamed("rank", "old_rank")
                .join(maybe_broadcast(contribs, n), "id", "left_outer")
                .select(
                    "id",
                    (
                        F.lit(0.15 / n)
                        + F.lit(0.85) * F.coalesce("msg_sum", F.lit(0.0))
                    ).alias("rank"),
                )
            )
            prev = state
            state, _ = materialize(new_state)
            prev.unpersist()
        steps_sec = time.time() - t0
        print(
            f"{tag}#{rnd}: build={build_sec:.1f}s "
            f"steps({steps})={steps_sec:.1f}s rows={n_rows:,}",
            flush=True,
        )
        vertices.unpersist()
        adj._jdf.rdd().unpersist(False)
        state._jdf.rdd().unpersist(False)
        spark._jvm.System.gc()

    for rnd in range(rounds):
        for n_part, tag in ((cpus, "base"), (mult * cpus, f"x{mult}")):
            run_variant(n_part, tag, rnd)
    spark.stop()


if __name__ == "__main__":
    main()
