"""PageRank — Giraph semantics (the reference's canonical formulation).

Per superstep every vertex recomputes
``rank = (1-d)/N + d * Σ(incoming rank/out_edges)``
and redistributes ``rank / out_edges`` along its out-edges
(dga-giraph PageRankComputation.java:51-81; out_edges counts parallel
edges, weights are ignored). Convergence: max over vertices of
``|rank - old| / old`` < ε after at least two updates
(PageRankMasterCompute.java:40-53, ε = 0.001 default). Dangling
vertices (no out-edges) send nothing and keep receiving the teleport
term — identical to Giraph, where sendMessageToAllEdges over zero edges
is a no-op.

Spark-first design:
- out-degree is joined into the edge table ONCE before the loop, so the
  per-superstep work is exactly one shuffle join (edges ⋈ ranks on src)
  + one partial-aggregated groupBy(dst) + one left join back to the
  vertex set — three exchanges, two of which reuse the same hash
  partitioning on the vertex id;
- the convergence scalar piggybacks on the state materialization
  (single agg over the new state), the DataFrame analog of Giraph's
  DoubleMax aggregator;
- everything is native column expressions → whole-stage codegen; no
  Python in the loop body.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark import StorageLevel

from distributed_graph_analytics_spark.plans.iteration import (
    IterationController,
    IterationStats,
)
from distributed_graph_analytics_spark.plans.join_strategy import maybe_broadcast
from distributed_graph_analytics_spark.sources.edges import vertices_of


def pagerank(
    edges: DataFrame,
    damping: float = 0.85,
    epsilon: float = 0.001,
    max_iterations: int = 100,
    checkpoint_manager=None,
    checkpoint_every: int = 10,
    num_partitions: int | None = None,
) -> tuple[DataFrame, IterationStats]:
    """Returns (ranks(id LONG, rank DOUBLE), stats)."""
    spark = edges.sparkSession
    n_part = num_partitions or int(spark.conf.get("spark.sql.shuffle.partitions"))

    out_deg = edges.groupBy("src").agg(F.count(F.lit(1)).alias("out_deg"))
    # contribution edges: (src, dst, 1/out_deg) — built once and persisted
    contrib_edges = edges.select("src", "dst").join(out_deg, "src").select(
        "src", "dst", (F.lit(1.0) / F.col("out_deg")).alias("inv_deg")
    )
    vertices = vertices_of(edges).persist(StorageLevel.MEMORY_AND_DISK)
    n = vertices.count()
    # pin the persisted loop-invariant table to n_part partitions keyed by
    # the superstep join key: (a) AQE would otherwise coalesce the cached
    # table to a handful of partitions (sized for one-shot reads), capping
    # every superstep's parallelism; (b) when the state side is too big to
    # broadcast, the shuffle-hash join reuses this exact layout
    contrib_edges = contrib_edges.repartition(n_part, "src").persist(
        StorageLevel.MEMORY_AND_DISK
    )
    teleport = (1.0 - damping) / n
    init = vertices.select("id", F.lit(1.0 / n).alias("rank"))

    def step(state: DataFrame, i: int) -> tuple[DataFrame, dict]:
        # broadcast-or-shuffle: state is a stats-less LogicalRDD, so the
        # decision is made explicitly from the known vertex count
        bstate = maybe_broadcast(state, n)
        contribs = (
            contrib_edges.join(bstate, contrib_edges["src"] == bstate["id"])
            .select(F.col("dst").alias("id"), (F.col("rank") * F.col("inv_deg")).alias("c"))
            .groupBy("id")
            .agg(F.sum("c").alias("msg_sum"))
        )
        new_state = (
            state.withColumnRenamed("rank", "old_rank")
            .join(maybe_broadcast(contribs, n), "id", "left_outer")
            .select(
                "id",
                (
                    F.lit(teleport)
                    + F.lit(damping) * F.coalesce("msg_sum", F.lit(0.0))
                ).alias("rank"),
                "old_rank",
            )
        )
        # two jobs per superstep, stats-safe: the convergence agg
        # materializes the cache (real sizes), then the checkpoint
        # captures THOSE stats instead of the compounding estimates a
        # bare localCheckpoint would carry (see plans.iteration.truncate)
        cached = new_state.persist(StorageLevel.MEMORY_AND_DISK)
        max_delta = cached.agg(
            F.max(F.abs(F.col("rank") - F.col("old_rank")) / F.col("old_rank"))
        ).first()[0]
        out = cached.select("id", "rank").localCheckpoint(eager=True)
        cached.unpersist()
        return out, {"max_delta": float(max_delta)}

    controller = IterationController(
        max_iterations=max_iterations,
        checkpoint_manager=checkpoint_manager,
        checkpoint_every=checkpoint_every,
        step_materializes=True,
    )
    final, stats = controller.run(
        init,
        step,
        converged=lambda m, i: i >= 2 and m["max_delta"] < epsilon,
        name="pagerank",
    )
    contrib_edges.unpersist()
    vertices.unpersist()
    return final, stats
