"""Label Propagation — community assignment by synchronous label voting.

The north rule lists label propagation alongside WCC. The reference's
WCC *is* max-label propagation run to fixed point (SURVEY.md §7.1 step
5 factors the kernel); this module is the classic community-detection
variant: each vertex adopts the label held by the (weighted) majority
of its neighbors, ties broken deterministically by the larger label —
synchronous updates, a fixed iteration budget (synchronous LPA can
oscillate on bipartite structures, so it is iteration-capped, not
fixed-point-gated).

Each superstep: one join (neighbors ⋈ labels) + one two-level groupBy
(count votes per (vertex, label), then argmax per vertex via a single
max(struct) — no window, no second shuffle beyond the vertex key).
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
from distributed_graph_analytics_spark.sources.edges import undirected_view, vertices_of


def label_propagation(
    edges: DataFrame,
    max_iterations: int = 10,
    weighted: bool = True,
    num_partitions: int | None = None,
) -> tuple[DataFrame, IterationStats]:
    """Returns (labels(id LONG, label LONG), stats)."""
    spark = edges.sparkSession
    n_part = num_partitions or int(spark.conf.get("spark.sql.shuffle.partitions"))
    nbrs = (
        undirected_view(edges)
        .groupBy("u", "v")
        .agg(F.sum("weight").alias("w"))
        .repartition(n_part, "v")  # pin parallelism of the cached table
        .persist(StorageLevel.MEMORY_AND_DISK)
    )
    vertices = vertices_of(edges).persist(StorageLevel.MEMORY_AND_DISK)
    n = vertices.count()
    init = vertices.select("id", F.col("id").alias("label"))
    vote = F.sum("w") if weighted else F.count(F.lit(1))

    def step(state: DataFrame, i: int) -> tuple[DataFrame, dict]:
        bstate = maybe_broadcast(state, n)
        votes = (
            nbrs.join(bstate, nbrs["v"] == bstate["id"])
            .groupBy(F.col("u").alias("vid"), "label")
            .agg(vote.alias("votes"))
        )
        # argmax by (votes, label): one aggregate, no window shuffle
        best = votes.groupBy("vid").agg(
            F.max(F.struct("votes", "label")).alias("best")
        ).select(F.col("vid").alias("id"), F.col("best.label").alias("new_label"))
        new_state = state.join(maybe_broadcast(best, n), "id", "left_outer").select(
            "id",
            F.coalesce("new_label", "label").alias("label"),
            (F.coalesce("new_label", "label") != F.col("label")).alias("changed"),
        )
        # stats-safe truncation (see plans.iteration.truncate): the
        # changed-count materializes the cache, the checkpoint then
        # captures real sizes instead of compounding estimates
        cached = new_state.persist(StorageLevel.MEMORY_AND_DISK)
        changed = cached.where("changed").count()
        new_state = cached.localCheckpoint(eager=True)
        cached.unpersist()
        return new_state.select("id", "label"), {"changed": changed}

    controller = IterationController(
        max_iterations=max_iterations, step_materializes=True
    )
    final, stats = controller.run(
        init, step, converged=lambda m, i: m["changed"] == 0, name="lpa"
    )
    nbrs.unpersist()
    return final.select("id", "label"), stats
