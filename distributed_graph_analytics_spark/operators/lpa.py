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
    strategy: str = "auto",
) -> tuple[DataFrame, IterationStats]:
    """Returns (labels(id LONG, label LONG), stats).

    ``strategy``: "auto" picks the broadcast-gather kernel when |V| ≤
    the tier cap (plans/gather.py ``gather_lpa_votes``: one
    shuffle-free vectorized vote-argmax pass per superstep over the
    merged receiver-keyed weighted blobs; integer vote sums and the
    (max votes, max label) tie-break make per-round labels, changed
    counts, and the halt identical to the join kernel), else the
    join-agg kernel below; "gather"/"shuffle" force a tier."""
    if strategy not in ("auto", "gather", "shuffle"):
        raise ValueError(f"unknown lpa strategy {strategy!r}")
    spark = edges.sparkSession
    n_part = num_partitions or int(spark.conf.get("spark.sql.shuffle.partitions"))
    if strategy != "shuffle":
        from distributed_graph_analytics_spark.plans.gather import (
            GatherGraph,
            gather_tier_applies,
            integral_weight,
            max_gather_vertices,
        )

        # fractional weights route to the shuffle kernel in auto mode:
        # the weighted blob pack stores int64 and would silently
        # truncate (forced "gather" raises in the builder instead)
        weight_ok = (not weighted) or integral_weight(edges)
        if strategy == "gather" or (weight_ok and gather_tier_applies(edges)):
            g = GatherGraph.build(edges)
            if strategy == "gather" or g.n <= max_gather_vertices():
                return _lpa_gather(
                    g,
                    max_iterations=max_iterations,
                    weighted=weighted,
                    n_part=n_part,
                )
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


def _lpa_gather(
    g, max_iterations: int, weighted: bool, n_part: int
) -> tuple[DataFrame, IterationStats]:
    """Gather-tier LPA: the merged undirected vote view (parallel
    edges weight-merged, both directions) becomes receiver-keyed
    weighted blobs; each superstep is ONE shuffle-free
    ``gather_lpa_votes`` pass. Labels live in original-id space, so
    the (votes, label) tie-break compares the same values as the join
    kernel — integer-exact parity round for round."""
    import time

    import numpy as np

    from distributed_graph_analytics_spark.plans.gather import (
        _LPA_NONE,
        gather_lpa_votes,
        vector_to_df,
    )

    t0 = time.time()
    spark = g.edges.sparkSession
    stats = IterationStats(kernel="gather")
    n = g.n
    if n == 0:
        stats.converged = True
        empty = np.empty(0, dtype=np.int64)
        return vector_to_df(spark, empty, empty, "label", "long"), stats
    # weighted: merged edge weight per (u, v); unweighted: each
    # DISTINCT neighbor casts exactly ONE vote (the join kernel's
    # count(1) over the merged view — NOT the parallel multiplicity)
    view = undirected_view(g.edges).groupBy("u", "v").agg(
        (F.sum("weight") if weighted else F.lit(1).cast("long")).alias("w")
    )
    adj = g.receiver_weighted_adjacency(view, n_part)
    L = g.orig_id.copy()
    for i in range(1, max_iterations + 1):
        t_iter = time.time()
        best = gather_lpa_votes(adj, L, n)
        new = np.where(best != _LPA_NONE, best, L)
        changed = int(np.count_nonzero(new != L))
        L = new
        stats.iterations = i
        stats.history.append(
            {"changed": changed, "sec": round(time.time() - t_iter, 3)}
        )
        if changed == 0:
            stats.converged = True
            break
    out = vector_to_df(spark, g.orig_id, L, "label", "long")
    g.release()
    stats.wall_seconds = time.time() - t0
    return out, stats
