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

Spark-first plan, same discipline as WCC (operators/wcc.py) plus two
scale properties the first cut lacked:

- **frontier** (the Pregel active set): estimates are monotone, so a
  vertex's h-index can only change if a NEIGHBOR's estimate dropped
  last superstep. Each round recomputes only the "dirty" receivers
  (neighbors of changed vertices) by PULLING their full neighborhood
  values — per-superstep traffic is Σ deg(dirty), which tracks the
  shrinking frontier instead of a flat 2|E| explode for an iteration
  count that grows with scale (10 rounds at sf0.001 → 38 at sf0.1);
- **skew-safe h-index**: neighbor values are capped at the receiver's
  current estimate (``least(nval, cur)`` — exact: for thresholds
  t ≤ cur the ≥t counts are unchanged, and H ≥ cur collapses to cur),
  then histogrammed by ``groupBy(id, capped_value)`` — a map-side
  combined hash aggregate a hub cannot skew — and the h-index falls
  out of the distinct-value cumulative counts:
  ``H = max over values d of min(d, count(values ≥ d))``. No
  per-receiver ``row_number`` sort over raw message rows, so a
  10M-degree hub costs one combinable aggregate, not one task sorting
  10M rows per superstep (the round-2 plan's weak spot).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

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
    strategy: str = "auto",
    gather_graph=None,
) -> tuple[DataFrame, IterationStats]:
    """Returns (cores(id LONG, core LONG), stats). ``core`` is the
    vertex's core number; isolated vertices never appear (the edge
    list defines the vertex set, as in WCC).

    ``stats.history[i]["recomputed"]`` records the dirty-receiver count
    per superstep — the frontier size the round's cost tracks.

    ``strategy``: "auto" picks the broadcast-gather kernel when |V| ≤
    SPARK_GRAFT_GATHER_MAX_V (plans/gather.py — one shuffle-free
    h-index pass per superstep over the merged deduped sym-adjacency
    blobs; estimates are integers, so the per-round values, changed
    counts, and halt are identical to the shuffle kernel, pinned by
    tests/test_gather_tier.py), else the frontier shuffle kernel
    below; "gather"/"shuffle" force a tier. ``gather_graph``: a
    prebuilt plans.gather.GatherGraph over the same edges (implies the
    gather tier; caller keeps ownership/release). The gather tier
    recomputes every vertex per round instead of the dirty frontier —
    a full h-index pass is one stage over the blobs, and a clean
    receiver recomputes its old value, so the trajectory is
    unchanged."""
    if strategy not in ("auto", "gather", "shuffle"):
        raise ValueError(f"unknown kcore strategy {strategy!r}")
    spark = edges.sparkSession
    n_part = num_partitions or int(spark.conf.get("spark.sql.shuffle.partitions"))
    if strategy != "shuffle":
        from distributed_graph_analytics_spark.plans.gather import (
            GatherGraph,
            gather_tier_applies,
            max_gather_vertices,
        )

        g = gather_graph
        if g is None and (strategy == "gather" or gather_tier_applies(edges)):
            g = GatherGraph.build(edges)
        if g is not None and (
            gather_graph is not None
            or strategy == "gather"
            or g.n <= max_gather_vertices()
        ):
            return _kcore_gather(
                g,
                max_iterations=max_iterations,
                checkpoint_manager=checkpoint_manager,
                checkpoint_every=checkpoint_every,
                n_part=n_part,
                owned=gather_graph is None,
            )
    nbrs = build_sym_adjacency(edges, n_part, edges_canonical=edges_canonical)
    with aqe_off(spark), hash_agg_pack(spark):
        nbrs = nbrs.localCheckpoint(eager=True)
    # degree from the packed rows: size-sum per v — already
    # hash(v)-clustered, the groupBy adds no exchange (hub-split rows
    # re-aggregate here)
    deg = nbrs.select("v", F.size("us").alias("d")).groupBy("v").agg(
        F.sum("d").alias("core")
    )
    init = deg.select(
        F.col("v").alias("id"),
        F.col("core").cast("long"),
        F.lit(True).alias("changed"),  # superstep 1 recomputes everyone
    )
    n = nbrs.select(F.countDistinct("v")).first()[0]

    # cumulative neighbor count per receiver, walking capped values
    # descending — input is the (id, value)-collapsed histogram, so the
    # sort is over distinct values per receiver, not raw messages
    w_cum = (
        Window.partitionBy("id")
        .orderBy(F.desc("cv"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )

    def step(state: DataFrame, i: int) -> tuple[DataFrame, dict]:
        # frontier: receivers adjacent to a vertex whose estimate
        # dropped last superstep (state is hash(id)-partitioned and
        # nbrs hash(v) — the join adds no exchange on either side)
        changed_senders = state.where("changed").select(F.col("id").alias("v"))
        dirty = (
            nbrs.join(maybe_broadcast(changed_senders, n), "v")
            .select(F.explode("us").alias("id"))
            .distinct()
        )
        # pull the FULL neighborhood values of just the dirty receivers,
        # carrying each receiver's current estimate for the value cap
        pulls = (
            dirty.join(state.select("id", F.col("core").alias("cur")), "id")
            .select(F.col("id").alias("v"), "cur")
            .join(nbrs, "v")
            .select(F.col("v").alias("id"), "cur", F.explode("us").alias("u"))
        )
        vals = pulls.join(
            state.select(F.col("id").alias("u"), F.col("core").alias("nval")),
            "u",
        )
        # capped-value histogram: hash aggregate, map-side combined —
        # a hub's messages collapse to its distinct neighbor values
        hist = (
            vals.select("id", F.least("nval", "cur").alias("cv"))
            .groupBy("id", "cv")
            .agg(F.count(F.lit(1)).alias("cnt"))
        )
        # H = max over distinct values d of min(d, count(values >= d))
        h = (
            hist.withColumn("cum", F.sum("cnt").over(w_cum))
            .select("id", F.least("cv", "cum").alias("hc"))
            .groupBy("id")
            .agg(F.max("hc").alias("h"))
        )
        new_state = state.join(maybe_broadcast(h, n), "id", "left_outer").select(
            "id",
            F.least("core", F.coalesce("h", F.col("core"))).alias("core"),
            F.coalesce(F.col("h") < F.col("core"), F.lit(False)).alias("changed"),
            F.col("h").isNotNull().alias("_recomputed"),
        )
        new_state, m = materialize(
            new_state,
            metrics={
                "changed": F.sum(F.col("changed").cast("long")),
                "recomputed": F.sum(F.col("_recomputed").cast("long")),
            },
            project=["id", "core", "changed"],
        )
        return new_state, {
            "changed": int(m["changed"] or 0),
            "recomputed": int(m["recomputed"] or 0),
        }

    controller = IterationController(
        max_iterations=max_iterations,
        checkpoint_manager=checkpoint_manager,
        checkpoint_every=checkpoint_every,
        step_materializes=True,
    )
    final, stats = controller.run(
        init, step, converged=lambda m, i: m["changed"] == 0, name="kcore"
    )
    return final.select("id", "core"), stats


def _kcore_gather(
    g,
    max_iterations: int,
    checkpoint_manager,
    checkpoint_every: int,
    n_part: int,
    owned: bool = True,
) -> tuple[DataFrame, IterationStats]:
    """Gather-tier k-core (plans/gather.py): identical h-index
    semantics and iteration trajectory as the shuffle kernel — integer
    estimates, the same cap (``min(nval, cur)``) and the same
    ``min(core, H)`` update, recomputed for every vertex each round
    (clean receivers reproduce their old value, so changed counts and
    the halt match the frontier kernel exactly). Each superstep is ONE
    shuffle-free vectorized pass (``gather_hindex``) over the merged,
    deduped sym-adjacency blobs; degrees fall out of one
    ``gather_sum`` of ones over the same blobs. Checkpoints save/resume
    the same (id, core, changed) state as the shuffle tier."""
    import time

    import numpy as np

    from distributed_graph_analytics_spark.plans.gather import (
        gather_hindex,
        gather_sum,
        vector_to_df,
    )

    t0 = time.time()
    spark = g.edges.sparkSession
    stats = IterationStats(kernel="gather")
    n = g.n
    if n == 0:
        stats.converged = True
        return (
            vector_to_df(
                spark,
                np.empty(0, dtype=np.int64),
                np.empty(0, dtype=np.int64),
                "core",
                "long",
            ),
            stats,
        )
    sym = g.sym_adjacency_merged(n_part)
    # degree = deduped undirected neighbor count: Σ 1 per key over the
    # merged blobs (exact in float64 far beyond the tier cap)
    core = gather_sum(sym, np.ones(n, dtype=np.float64), n).astype(np.int64)
    start_iter = 0
    if checkpoint_manager is not None:
        resumed = checkpoint_manager.try_resume("kcore")
        if resumed is not None:
            state_df, start_iter = resumed
            pdf = state_df.select("id", "core").toPandas()
            core[g.cid_of(pdf["id"].to_numpy())] = pdf["core"].to_numpy()
    for i in range(start_iter + 1, max_iterations + 1):
        t_iter = time.time()
        new = gather_hindex(sym, core, n)
        changed = int(np.count_nonzero(new < core))
        core = new
        stats.iterations = i
        metrics = {
            "changed": changed,
            "recomputed": n,
            "sec": round(time.time() - t_iter, 3),
        }
        stats.history.append(metrics)
        if checkpoint_manager is not None and i % checkpoint_every == 0:
            checkpoint_manager.save(
                "kcore",
                vector_to_df(spark, g.orig_id, core, "core", "long").withColumn(
                    "changed", F.lit(True)
                ),
                i,
                metrics,
            )
        if changed == 0:
            stats.converged = True
            break
    out = vector_to_df(spark, g.orig_id, core, "core", "long")
    if checkpoint_manager is not None and stats.converged:
        # keep the cross-tier (id, core, changed) state shape: a
        # shuffle-tier run resuming from this checkpoint filters on
        # `changed`, so the converged save must carry the column too
        # (all False — nothing moved in the final superstep)
        checkpoint_manager.save(
            "kcore",
            out.withColumn("changed", F.lit(False)),
            stats.iterations,
            {"converged": True},
        )
    if owned:
        g.release()
    stats.wall_seconds = time.time() - t0
    return out, stats
