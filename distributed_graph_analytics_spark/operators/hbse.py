"""High-Betweenness Set Extraction — Brandes betweenness approximated
by pivot batches (Chong), re-expressed as DataFrame loops.

Reference: dga-graphx hbse/HighBetweennessCore.scala:94-648 and the
Giraph state machine HBSEComputation.java:72-323. Per pivot batch the
reference runs (a) multi-source weighted shortest paths with per-pivot
predecessor/path-count maps (ShortestPathList.scala:30-90), then
(b) ping-predecessor / find-successor / dependency-run supersteps that
back-propagate Brandes partial dependencies
(HBSEComputation.java:133-219), then (c) accumulates betweenness and
checks top-K set stability (HighBetweennessCore.scala:139-186).

DataFrame re-expression (same math, set-at-a-time):
- the per-vertex HashMaps become long tables
  ``dist(pivot, id, dist)`` and ``preds(pivot, id, pred, npaths)``
  where npaths = σ(pred), exactly ShortestPathList's
  predecessorPathCountMap semantics;
- SSSP is a Bellman-Ford-style frontier loop: changed vertices push
  (dist + w, σ) along out-edges; min-distance merge replaces or merges
  predecessor sets (shorter replaces, equal upserts — the reference's
  update rule verbatim);
- dependency accumulation replaces the ping/successor message dance
  with a reverse frontier over the shortest-path DAG (settle a vertex
  once all its successors settled): exactly the reverse-topological
  order the message protocol discovers dynamically, so
  δ(p) += (σ_p / σ_w) · (1 + δ(w)) visits identical edges with
  identical values, in rounds bounded by DAG depth;
- betweenness += Σ_pivots δ, pivot excluded; top-K stability identical
  (orderBy desc value, asc id → set diff vs previous batch,
  HighBetweennessCore.scala:60-82,180-186).

With pivot coverage = all vertices this is exact directed Brandes (the
fixtures assert exact values); with sampled batches it is the
reference's approximation.

Documented divergence: the reference's Pregel combiner keeps only the
strictly-smaller distance per (vertex, pivot) when merging messages
(mergeMapMessage, HighBetweennessCore.scala:625-648), so equal-distance
messages from different predecessors arriving in the same superstep
lose all but one predecessor — σ undercounts and the survivor depends
on merge order (its golden 2.0/1.0 on HighBetweennessCoreTest.scala:39
vs exact Brandes 2.5/0.5). We merge equal-distance predecessors
(ShortestPathList.update semantics applied set-at-a-time), i.e. exact
Brandes — deterministic and independently verifiable.
"""

from __future__ import annotations

import time
from dataclasses import dataclass, field

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark import StorageLevel

from distributed_graph_analytics_spark.plans.iteration import truncate
from distributed_graph_analytics_spark.sources.edges import vertices_of


@dataclass
class HBSEStats:
    batches: int = 0
    pivots_used: int = 0
    stability_runs: list[int] = field(default_factory=list)
    wall_seconds: float = 0.0
    strategy: str = ""
    #: BSP-equivalent rounds: SSSP frontier + dependency frontier rounds
    #: for the dataframe strategy; 1 per batch for the pivot-parallel
    #: broadcast kernel (which has no distributed supersteps)
    supersteps: int = 0
    # run-configuration echo for the stats.csv artifact
    n_vertices: int = 0
    pivot_batch_size: int = 0
    stability_cutoff: int = 0
    stability_counter: int = 1


def _checkpoint(df: DataFrame) -> DataFrame:
    # materialized truncation — resets the carried size estimates that
    # compound per loop round (see plans.iteration.truncate)
    return truncate(df)


def _shortest_paths(edges: DataFrame, pivots: DataFrame, max_iter: int = 10_000):
    """Multi-source SSSP with path counting.

    Returns (dist(pivot,id,dist), preds(pivot,id,pred,npaths), rounds).
    Weighted: edge weight is the distance (reference semantics —
    PathData carries distance + edgeWeight, HBSEComputation.java:120).
    """
    spark = edges.sparkSession
    e = edges.groupBy("src", "dst").agg(F.min("weight").alias("w"))
    e = e.persist(StorageLevel.MEMORY_AND_DISK)

    dist = pivots.select(
        F.col("id").alias("pivot"), F.col("id"), F.lit(0).cast("long").alias("dist")
    )
    dist = _checkpoint(dist)
    preds = _checkpoint(
        spark.createDataFrame([], "pivot long, id long, pred long, npaths long")
    )
    # frontier: (pivot, id) whose dist or σ changed last round
    frontier = dist.select("pivot", "id")

    rounds = 0
    for _ in range(max_iter):
        rounds += 1
        # σ for frontier vertices: pivot itself has σ=1, else Σ preds
        sigma = (
            preds.join(frontier, ["pivot", "id"], "left_semi")
            .groupBy("pivot", "id")
            .agg(F.sum("npaths").alias("sigma"))
        )
        fr = (
            frontier.join(dist, ["pivot", "id"])
            .join(sigma, ["pivot", "id"], "left_outer")
            .select(
                "pivot",
                "id",
                "dist",
                F.coalesce(
                    "sigma", F.when(F.col("pivot") == F.col("id"), F.lit(1))
                ).alias("sigma"),
            )
            .where(F.col("sigma").isNotNull())
        )
        msgs = (
            fr.join(e, fr["id"] == e["src"])
            .select(
                "pivot",
                F.col("dst").alias("id"),
                (F.col("dist") + F.col("w")).alias("nd"),
                F.col("src").alias("pred"),
                F.col("sigma").alias("npaths"),
            )
        )
        best = msgs.groupBy("pivot", "id").agg(F.min("nd").alias("nd"))
        cand = msgs.join(best, ["pivot", "id", "nd"])  # only min-distance msgs
        merged = cand.join(
            dist.withColumnRenamed("dist", "cur"), ["pivot", "id"], "left_outer"
        )
        improved = merged.where(F.col("cur").isNull() | (F.col("nd") < F.col("cur")))
        equal = merged.where(F.col("nd") == F.col("cur"))

        imp_keys = improved.select("pivot", "id").distinct()
        new_dist = _checkpoint(
            dist.join(imp_keys, ["pivot", "id"], "left_anti").unionByName(
                improved.select("pivot", "id", F.col("nd").alias("dist")).distinct()
            )
        )
        # preds: replaced for improved; upserted for equal-distance
        upserts = improved.select("pivot", "id", "pred", "npaths").unionByName(
            equal.select("pivot", "id", "pred", "npaths")
        )
        changed_sigma = (
            upserts.join(
                preds.withColumnRenamed("npaths", "old_npaths"),
                ["pivot", "id", "pred"],
                "left_outer",
            )
            .where(
                F.col("old_npaths").isNull()
                | (F.col("old_npaths") != F.col("npaths"))
            )
            .select("pivot", "id")
            .distinct()
        )
        new_preds = _checkpoint(
            preds.join(imp_keys, ["pivot", "id"], "left_anti")
            .join(
                upserts.select("pivot", "id", "pred").distinct(),
                ["pivot", "id", "pred"],
                "left_anti",
            )
            .unionByName(upserts)
        )
        # checkpoint the frontier as well: it feeds every plan of the
        # next round, and an unmaterialized frontier would embed the
        # whole previous round's dataflow → exponential recomputation
        new_frontier = _checkpoint(imp_keys.unionByName(changed_sigma).distinct())
        n_changed = new_frontier.count()
        dist, preds, frontier = new_dist, new_preds, new_frontier
        if n_changed == 0:
            break
    e.unpersist()
    return dist, preds, rounds


def _dependencies(dist: DataFrame, preds: DataFrame, max_iter: int = 10_000) -> DataFrame:
    """Brandes back-propagation as a reverse frontier over the
    shortest-path DAG (Kahn's topological order, reversed).

    A vertex's δ is final once every DAG-successor's δ is final, so
    each round the newly-settled vertices w push
    (σ_pred / σ_w) · (1 + δ(w)) along their predecessor links and
    decrement the receivers' unsettled-successor counters; counters
    hitting zero form the next frontier. Rounds are bounded by DAG
    depth — NOT by the number of distinct distance values, which on a
    weighted graph is O(|V|·W) and would degenerate the level-sweep
    formulation into an unbounded driver-side loop.

    Returns (delta(pivot, id, dep), rounds) for non-pivot vertices
    (leaves settle with dep = 0.0; downstream Σ-by-id is unaffected by
    the zero rows).
    """
    preds = preds.persist(StorageLevel.MEMORY_AND_DISK)
    sigma = preds.groupBy("pivot", "id").agg(F.sum("npaths").alias("sigma"))
    # unsettled-successor counter: #DAG-out-edges = #preds rows naming
    # this vertex as pred (each settles exactly once → one decrement)
    succ = preds.groupBy("pivot", F.col("pred").alias("id")).agg(
        F.count(F.lit(1)).alias("n_succ")
    )
    state = _checkpoint(
        dist.select("pivot", "id")
        .join(succ, ["pivot", "id"], "left_outer")
        .join(sigma, ["pivot", "id"], "left_outer")
        .select(
            "pivot",
            "id",
            F.coalesce("n_succ", F.lit(0)).alias("remaining"),
            "sigma",  # null only for the pivot row itself (no preds)
            F.lit(0.0).alias("dep"),
        )
    )
    frontier = _checkpoint(state.where(F.col("remaining") == 0))
    state = _checkpoint(state.where(F.col("remaining") > 0))
    settled = [frontier.select("pivot", "id", "dep")]
    rounds = 0
    for _ in range(max_iter):
        if frontier.where(F.col("pivot") != F.col("id")).limit(1).count() == 0:
            break
        rounds += 1
        contribs = (
            frontier.join(preds, ["pivot", "id"])
            .groupBy("pivot", F.col("pred").alias("id"))
            .agg(
                F.sum(
                    (F.col("npaths").cast("double") / F.col("sigma"))
                    * (F.lit(1.0) + F.col("dep"))
                ).alias("c"),
                F.count(F.lit(1)).alias("dec"),
            )
        )
        updated = _checkpoint(
            state.join(contribs, ["pivot", "id"], "left_outer").select(
                "pivot",
                "id",
                (F.col("remaining") - F.coalesce("dec", F.lit(0))).alias("remaining"),
                "sigma",
                (F.col("dep") + F.coalesce("c", F.lit(0.0))).alias("dep"),
            )
        )
        frontier = _checkpoint(updated.where(F.col("remaining") == 0))
        state = _checkpoint(updated.where(F.col("remaining") > 0))
        settled.append(frontier.select("pivot", "id", "dep"))
    out = settled[0]
    for s in settled[1:]:
        out = out.unionByName(s)
    out = out.where(F.col("pivot") != F.col("id"))
    preds.unpersist()
    return out, rounds


def _single_source_deps(adj: dict, s: int, dep_out: dict) -> None:
    """Weighted single-source Brandes (Dijkstra order): accumulate
    δ_s(w) for w != s into dep_out. Pure-Python kernel executed inside
    the Arrow-batched worker; positive long weights."""
    import heapq

    dist = {s: 0}
    sigma = {s: 1}
    preds: dict = {}
    done = set()
    order = []
    pq = [(0, s)]
    while pq:
        d, v = heapq.heappop(pq)
        if v in done:
            continue
        done.add(v)
        order.append(v)
        sv = sigma[v]
        for w, wt in adj.get(v, ()):
            nd = d + wt
            dw = dist.get(w)
            if dw is None or nd < dw:
                dist[w] = nd
                sigma[w] = sv
                preds[w] = [v]
                heapq.heappush(pq, (nd, w))
            elif nd == dw and w not in done:
                sigma[w] += sv
                preds[w].append(v)
    delta: dict = {}
    for w in reversed(order):
        dw = delta.get(w, 0.0)
        coef = (1.0 + dw) / sigma[w]
        for p in preds.get(w, ()):
            delta[p] = delta.get(p, 0.0) + sigma[p] * coef
        if w != s and dw:
            dep_out[w] = dep_out.get(w, 0.0) + dw


def _batch_dependencies_broadcast(
    pivots: DataFrame, adj_bc, n_part: int
) -> DataFrame:
    """Pivot-parallel Brandes: pivots are hash-grouped into n_part
    tasks; each task runs the per-source kernel against the broadcast
    adjacency and emits its partial (id, dep) sums, merged by one
    groupBy. Sources are independent, so this scales linearly in the
    pivot budget; it requires the (deduped) adjacency to fit in executor
    memory — the dispatch in hbse() falls back to the DataFrame-loop
    strategy above when it doesn't."""
    import pandas as pd

    def run(pdf: pd.DataFrame) -> pd.DataFrame:
        adj = adj_bc.value
        dep: dict = {}
        for s in pdf["id"]:
            _single_source_deps(adj, int(s), dep)
        return pd.DataFrame(
            {"id": pd.array(list(dep), dtype="int64"),
             "dep": pd.array(list(dep.values()), dtype="float64")}
        )

    grouped = pivots.withColumn(
        "_g", F.pmod(F.xxhash64("id"), F.lit(n_part)).cast("int")
    )
    parts = grouped.groupBy("_g").applyInPandas(run, "id long, dep double")
    return parts.groupBy("id").agg(F.sum("dep").alias("dep"))


def hbse(
    edges: DataFrame,
    k: int = 10,
    pivot_batch_size: int | None = None,
    stability_cutoff: int = 0,
    stability_counter: int = 1,
    pivot_budget: int | None = None,
    seed: int = 42,
    strategy: str = "auto",
    broadcast_max_edges: int = 2_000_000,
    pivot_hash_family: str = "xxhash64",
) -> tuple[DataFrame, DataFrame, HBSEStats]:
    """Returns (betweenness(id, betweenness), top_k_set(id, betweenness),
    stats).

    Defaults mirror the Giraph analytic defaults
    (DGARunner.java:114-118: maxSize=10, pivot.batch.size and
    vertex.count scaled to the graph here). pivot_batch_size=None →
    all vertices in one batch (exact Brandes, the fixture mode).

    ``strategy``: "broadcast" runs one Brandes per pivot inside an
    Arrow-batched applyInPandas task against a broadcast adjacency —
    pivot-parallel, the fast path whenever the deduped edge list fits
    in executor memory (mirrors how the reference keeps the whole graph
    partition-resident per worker). "dataframe" is the set-at-a-time
    BSP loop (_shortest_paths/_dependencies) that scales past memory.
    "auto" picks by edge count vs ``broadcast_max_edges``. Both
    strategies compute identical exact-Brandes values (pinned by
    tests/test_hbse.py parity test).

    Driver-memory note: the broadcast path materializes the deduped
    adjacency on the driver (as ~|V| pre-grouped array rows) before
    broadcasting, costing roughly 50-100 bytes/edge — the 2M-edge
    default is ~150-200 MB transient, sized for the default 16g driver;
    lower ``broadcast_max_edges`` (or pass strategy="dataframe") on a
    smaller driver.
    """
    t0 = time.time()
    stats = HBSEStats()
    spark = edges.sparkSession
    vertices = vertices_of(edges).persist(StorageLevel.MEMORY_AND_DISK)
    n = vertices.count()
    batch = pivot_batch_size or n
    budget = min(pivot_budget or n, n)

    dedup = edges.groupBy("src", "dst").agg(F.min("weight").alias("w")).persist(
        StorageLevel.MEMORY_AND_DISK
    )
    if strategy == "auto":
        strategy = (
            "broadcast" if dedup.count() <= broadcast_max_edges else "dataframe"
        )
    stats.strategy = strategy
    if strategy == "broadcast":
        # collect pre-grouped array rows (~|V| rows), not |E| Row objects:
        # the per-edge structure is built executor-side by collect_list
        # and lands on the driver as one array per source vertex
        # (hash_agg_pack: keep the pack hash-based past 128 keys — the
        # session no longer raises the ObjectHashAggregate threshold
        # globally; this path is already gated <= broadcast_max_edges)
        from distributed_graph_analytics_spark.plans.iteration import hash_agg_pack

        with hash_agg_pack(spark):
            adj = {
                r["src"]: list(zip(r["dsts"], r["ws"]))
                for r in dedup.groupBy("src")
                .agg(
                    F.collect_list("dst").alias("dsts"),
                    F.collect_list("w").alias("ws"),
                )
                .collect()
            }
        adj_bc = spark.sparkContext.broadcast(adj)
        n_part = int(spark.conf.get("spark.sql.shuffle.partitions"))

        def batch_dep_fn(pivots: DataFrame) -> DataFrame:
            stats.supersteps += 1
            return _batch_dependencies_broadcast(pivots, adj_bc, n_part)

    else:

        def batch_dep_fn(pivots: DataFrame) -> DataFrame:
            dist, preds, sssp_rounds = _shortest_paths(edges, pivots)
            delta, dep_rounds = _dependencies(dist, preds)
            stats.supersteps += sssp_rounds + dep_rounds
            return delta.groupBy("id").agg(F.sum("dep").alias("dep"))

    dedup.unpersist()

    betweenness = _checkpoint(
        vertices.select("id", F.lit(0.0).alias("betweenness"))
    )
    used = _checkpoint(spark.createDataFrame([], "id long"))
    prev_set: set | None = None
    run_count = 0
    while stats.pivots_used < budget:
        remaining = vertices.join(used, "id", "left_anti")
        # deterministic pseudo-random pivot order; the sha2 family makes
        # the sample reproducible in DuckDB (driver oracle) exactly like
        # the dedup/similarity hash families
        from distributed_graph_analytics_spark.functions.dedup import _hash64

        pivots = _checkpoint(
            remaining.orderBy(
                _hash64(
                    F.col("id"),
                    F.lit(seed),
                    F.lit(stats.batches),
                    family=pivot_hash_family,
                )
            )
            .limit(min(batch, budget - stats.pivots_used))
            .select("id")
        )
        n_pivots = pivots.count()
        if n_pivots == 0:
            break
        batch_dep = batch_dep_fn(pivots)
        betweenness = _checkpoint(
            betweenness.join(batch_dep, "id", "left_outer").select(
                "id",
                (F.col("betweenness") + F.coalesce("dep", F.lit(0.0))).alias(
                    "betweenness"
                ),
            )
        )
        used = _checkpoint(used.unionByName(pivots))
        stats.batches += 1
        stats.pivots_used += n_pivots
        top = {
            r["id"]
            for r in betweenness.orderBy(
                F.desc("betweenness"), F.asc("id")
            ).limit(k).collect()
        }
        if prev_set is not None:
            delta_set = len(prev_set - top)
            stats.stability_runs.append(delta_set)
            if delta_set <= stability_cutoff:
                run_count += 1
                if run_count >= stability_counter:
                    prev_set = top
                    break
            else:
                run_count = 0
        prev_set = top
    top_k = betweenness.orderBy(F.desc("betweenness"), F.asc("id")).limit(k)
    vertices.unpersist()
    stats.wall_seconds = time.time() - t0
    stats.n_vertices = n
    stats.pivot_batch_size = batch
    stats.stability_cutoff = stability_cutoff
    stats.stability_counter = stability_counter
    return betweenness, top_k, stats


def save_hbse_run(
    output_dir: str,
    betweenness: DataFrame,
    top_k: DataFrame,
    stats: HBSEStats,
    delimiter: str = ",",
) -> None:
    """The reference run's three output artifacts (S12):

    - ``<output_dir>/betweenness/`` — ``id<d>betweenness`` lines per
      vertex (HDFSHBSERunner.scala:55-69's graph save), distributed
      text write;
    - ``<output_dir>/final_set.csv`` — the stabilized top-K ids, one
      per line (HBSEMasterCompute.writeHighBetweennessSet:416-439);
    - ``<output_dir>/stats.csv`` — the run-statistics key:value lines
      (HBSEMasterCompute.writeStats:377-410, including its
      'supsersteps' spelling for artifact parity). Both small files
      are driver-side writes, exactly like the reference's
      master-compute emits.
    """
    import os

    from distributed_graph_analytics_spark.sinks import write_vertex_sink

    os.makedirs(output_dir, exist_ok=True)
    write_vertex_sink(
        betweenness, os.path.join(output_dir, "betweenness"), delimiter=delimiter
    )
    ids = [r["id"] for r in top_k.collect()]
    with open(os.path.join(output_dir, "final_set.csv"), "w") as f:
        for vid in ids:
            f.write(f"{vid}\n")
    pct = stats.pivots_used / stats.n_vertices if stats.n_vertices else 0.0
    with open(os.path.join(output_dir, "stats.csv"), "w") as f:
        f.write(f"k: {len(ids)}\n")
        f.write(f"delta p: {stats.pivot_batch_size}\n")
        f.write(f"cutoff: {stats.stability_cutoff}\n")
        f.write(f"counter: {stats.stability_counter}\n")
        f.write(f"pivots selected: {stats.pivots_used}\n")
        f.write(f"percent of graph selected: {pct}\n")
        f.write(f"supsersteps: {stats.supersteps}\n")
        f.write(f"cycles: {stats.batches}\n")
        f.write(f"run time: {int(stats.wall_seconds)}\n")
