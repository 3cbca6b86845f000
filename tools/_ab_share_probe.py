"""Within-JVM A/B probe: standalone symmetric WCC adjacency build vs
the ShuffleGraph pipeline derivation (plans/adjacency.py).

The pinned fixed-layout decomposition (BENCH/BASELINE.md) has
wcc_build as the worst-scaling phase (0.58-0.60): a 2|E|-row union
exchanged and packed from scratch — even though the PR stage of the
same job already exchanged and packed the out direction. Variant B is
the pipeline view: given the out pack (paid by PR), derive the IN pack
from its checkpointed array rows (|E| flat rows through one exchange,
half the pack values) and run WCC supersteps over the two packs.

Measures per round, in ONE JVM (cross-JVM wall clock is meaningless on
this host):
  A: build_sym_adjacency (2|E| union -> pack -> checkpoint) + vertex
     distinct+count from it, then AB_STEPS WCC supersteps over it;
  B: ShuffleGraph.in_adjacency derivation (out pack prebuilt, shared),
     then AB_STEPS WCC supersteps over the two packs.

Usage: SPARK_GRAFT_CPUS=4 SPARK_GRAFT_REPLICATE=64 AB_ROUNDS=2 \
       [taskset -c 0-3] python tools/_ab_share_probe.py
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
    steps = int(os.environ.get("AB_STEPS", "2"))
    parts = int(os.environ.get("SPARK_GRAFT_PARTS", "12"))

    from _scaling_worker import replicated_edges

    from distributed_graph_analytics_spark.operators.wcc import build_sym_adjacency
    from distributed_graph_analytics_spark.plans.adjacency import ShuffleGraph
    from distributed_graph_analytics_spark.plans.iteration import (
        aqe_off,
        hash_agg_pack,
        materialize,
    )
    from distributed_graph_analytics_spark.plans.join_strategy import maybe_broadcast
    from distributed_graph_analytics_spark.session import get_spark

    spark = get_spark(
        f"ab-share-{cpus}", master=f"local[{cpus}]", shuffle_partitions=parts
    )
    spark.sparkContext.setLogLevel("ERROR")
    edges = replicated_edges(spark, sf_dir, replicate).persist(
        StorageLevel.MEMORY_AND_DISK
    )
    print(f"edges = {edges.count():,}  cpus={cpus}  parts={parts}", flush=True)

    # shared precondition for B (the PR stage of the pipeline pays this)
    g = ShuffleGraph(edges, num_partitions=parts)
    t0 = time.time()
    g.out_adjacency()
    n = g.n
    print(f"out pack + vertices (paid by PR in the pipeline): "
          f"{time.time() - t0:.1f}s  n={n:,}", flush=True)

    def run_steps(nbr_tables, vertices, tag, rnd):
        init = vertices.select(
            "id", (F.col("id") + F.lit(1)).alias("component"),
            F.lit(True).alias("changed"),
        )
        state, _ = materialize(init)
        t0 = time.time()
        for _ in range(steps):
            frontier = state.where("changed").select(
                F.col("id").alias("v"), "component"
            )
            parts_df = [
                t.join(maybe_broadcast(frontier, n), "v").select(
                    F.explode("us").alias("_nb"),
                    F.col("component").alias("cand"),
                )
                for t in nbr_tables
            ]
            flat = parts_df[0]
            for p in parts_df[1:]:
                flat = flat.unionByName(p)
            msgs = (
                flat.select(F.col("_nb").cast("long").alias("id"), "cand")
                .groupBy("id")
                .agg(F.max("cand").alias("cand"))
            )
            new_state = (
                state.select("id", "component")
                .join(maybe_broadcast(msgs, n), "id", "left_outer")
                .select(
                    "id",
                    F.greatest("component", "cand").alias("component"),
                    F.coalesce(
                        F.col("cand") > F.col("component"), F.lit(False)
                    ).alias("changed"),
                )
            )
            prev = state
            state, _ = materialize(new_state)
            prev.unpersist()
        sec = time.time() - t0
        state.unpersist()
        print(f"{tag}#{rnd}: steps({steps})={sec:.1f}s", flush=True)
        return sec

    for rnd in range(rounds):
        # A: standalone symmetric pack (the current recorded kernel)
        t0 = time.time()
        nbrs = build_sym_adjacency(edges, parts, edges_canonical=True)
        with aqe_off(spark), hash_agg_pack(spark):
            nbrs = nbrs.localCheckpoint(eager=True)
        verts_a = (
            nbrs.select(F.col("v").alias("id"))
            .distinct()
            .persist(StorageLevel.MEMORY_AND_DISK)
        )
        verts_a.count()
        build_a = time.time() - t0
        print(f"A#{rnd}: wcc_build(sym 2|E|)={build_a:.1f}s", flush=True)
        run_steps([nbrs], verts_a, "A-steps", rnd)
        verts_a.unpersist()

        # B: pipeline derivation (out pack + vertices already shared)
        g._in = None  # force a fresh derivation each round
        t0 = time.time()
        in_adj = g.in_adjacency()
        build_b = time.time() - t0
        print(f"B#{rnd}: wcc_build(derive in |E|)={build_b:.1f}s", flush=True)
        out_view = g.out_adjacency().select(
            F.col("src").alias("v"), F.col("dsts").alias("us")
        )
        run_steps([out_view, in_adj], g.vertices(), "B-steps", rnd)
        spark.sparkContext._jvm.System.gc()

    spark.stop()


if __name__ == "__main__":
    main()
