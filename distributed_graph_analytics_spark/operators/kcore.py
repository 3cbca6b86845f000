"""k-core decomposition — core numbers via synchronous h-index
propagation (Montresor, De Pellegrini, Miorandi, "Distributed k-core
decomposition", 2013).

Engine extension (no reference analog — the reference's analytics stop
at WCC/PR/LC/Louvain/HBSE; k-core is the standard next link-graph
primitive for influence/robustness pruning).

Algorithm: every vertex starts at its degree; each superstep sets
``core(v) = min(core(v), H({core(u) : u ∈ N(v)}))`` where H is the
h-index (the largest h such that at least h neighbors currently hold
value ≥ h). Estimates are integers, decrease monotonically, and the
fixed point is exactly the core number — convergence is a zero-changed
count, and (unlike the float kernels) the trajectory is bit-exact, so
a fixed-round SQL unroll is a precise oracle at any scale.

Spark-first plan, same discipline as WCC (operators/wcc.py):
- one packed symmetric adjacency (CSR-style array rows, hub-split,
  hash(v)-clustered, localCheckpoint'ed under aqe_off) — no exchange
  on the packed side, ever;
- per superstep: one join + explode to deliver neighbor values, a
  ``row_number`` window partitioned by the receiver (narrow rows —
  no per-vertex value arrays, hubs don't blow a row), the prefix
  count = h-index, and the fused materialize/Observation job for the
  changed metric.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from pyspark import StorageLevel

from distributed_graph_analytics_spark.operators.wcc import build_sym_adjacency
from distributed_graph_analytics_spark.plans.iteration import (
    IterationController,
    IterationStats,
    aqe_off,
    hash_agg_pack,
    materialize,
)
from distributed_graph_analytics_spark.plans.join_strategy import maybe_broadcast


def core_numbers(
    edges: DataFrame,
    max_iterations: int = 100,
    checkpoint_manager=None,
    checkpoint_every: int = 10,
    num_partitions: int | None = None,
    edges_canonical: bool = False,
) -> tuple[DataFrame, IterationStats]:
    """Returns (cores(id LONG, core LONG), stats). ``core`` is the
    vertex's core number; isolated vertices never appear (the edge
    list defines the vertex set, as in WCC)."""
    spark = edges.sparkSession
    n_part = num_partitions or int(spark.conf.get("spark.sql.shuffle.partitions"))
    nbrs = build_sym_adjacency(edges, n_part, edges_canonical=edges_canonical)
    with aqe_off(spark), hash_agg_pack(spark):
        nbrs = nbrs.localCheckpoint(eager=True)
    # degree from the packed rows: size-sum per v — already
    # hash(v)-clustered, the groupBy adds no exchange (hub-split rows
    # re-aggregate here)
    deg = (
        nbrs.select("v", F.size("us").alias("d"))
        .groupBy("v")
        .agg(F.sum("d").alias("core"))
        .persist(StorageLevel.MEMORY_AND_DISK)
    )
    n = deg.count()
    init = deg.select(F.col("v").alias("id"), F.col("core").cast("long"))

    w = Window.partitionBy("id").orderBy(F.desc("nval"), F.desc("sender"))

    def step(state: DataFrame, i: int) -> tuple[DataFrame, dict]:
        # deliver each vertex's current value to all neighbors
        msgs = nbrs.join(maybe_broadcast(state, n), nbrs["v"] == state["id"]).select(
            F.col("v").alias("sender"),
            F.explode("us").alias("id"),
            F.col("core").alias("nval"),
        )
        # h-index: with values sorted descending, positions where
        # value >= position form a prefix, so the count IS the h-index
        h = (
            msgs.withColumn("rn", F.row_number().over(w))
            .where(F.col("nval") >= F.col("rn"))
            .groupBy("id")
            .agg(F.count(F.lit(1)).alias("h"))
        )
        new_state = state.join(maybe_broadcast(h, n), "id").select(
            "id",
            F.least("core", "h").alias("core"),
            (F.col("h") < F.col("core")).alias("changed"),
        )
        new_state, m = materialize(
            new_state,
            metrics={"changed": F.sum(F.col("changed").cast("long"))},
        )
        return new_state, {"changed": int(m["changed"] or 0)}

    controller = IterationController(
        max_iterations=max_iterations,
        checkpoint_manager=checkpoint_manager,
        checkpoint_every=checkpoint_every,
        step_materializes=True,
    )
    final, stats = controller.run(
        init, step, converged=lambda m, i: m["changed"] == 0, name="kcore"
    )
    deg.unpersist()
    return final.select("id", "core"), stats
