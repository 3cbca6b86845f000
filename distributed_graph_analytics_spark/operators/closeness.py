"""Pivot-sampled closeness / harmonic centrality — engine extension
(no reference analog; the reference's only distance analytic is the
SSSP inside HBSE pivot batches, HighBetweennessCore.java's pivot
selection being the model for the sampling here).

Eppstein–Wang-style estimator: run one unweighted multi-source BFS
from K hash-chosen pivot vertices and aggregate, per vertex v, the
distances d(p, v) over the pivots that reach it:

- ``reached``   — number of pivots with a finite distance to v,
- ``sum_dist``  — Σ d(p, v) (closeness ≈ reached / sum_dist),
- ``harmonic``  — Σ 1/d(p, v) over d > 0 (harmonic centrality).

Determinism: pivots are the K smallest (H(id, seed), id) vertices —
a distributed sort-limit (TakeOrderedAndProject), never a global
row_number window — so the DuckDB oracle selects the identical set
with the sha2 family and replays the BFS closure exactly; the integer
outputs are exact and ``harmonic`` rounds to 9 decimals on both sides
(the summation-order convention every float oracle here uses).

Scale shape: frontier rows are bounded by K·|V| total across all
rounds (each (pivot, vertex) pair enters the frontier at most once);
each round is one join of the frontier against the chunked CSR pack
(hub rows pre-split to ADJ_CHUNK — no unbounded explode), a map-side
combined min-aggregate, and one anti-join against the visited set.
Round count = graph diameter (small for co-occurrence graphs; the
same bound WCC's superstep count rides on). All column expressions,
no Python.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from distributed_graph_analytics_spark.functions.dedup import _hash64
from distributed_graph_analytics_spark.operators.walks import (
    _pack_sorted_adjacency,
)
from distributed_graph_analytics_spark.plans.iteration import materialize, truncate
from distributed_graph_analytics_spark.sources.edges import canonicalize_edges


def closeness_centrality(
    edges: DataFrame,
    num_pivots: int = 8,
    seed: int = 42,
    hash_family: str = "xxhash64",
    max_rounds: int = 64,
    num_partitions: int | None = None,
) -> DataFrame:
    """Returns (id LONG, reached BIGINT, sum_dist BIGINT,
    harmonic DOUBLE) for every vertex, aggregating BFS distances from
    ``num_pivots`` hash-sampled pivot vertices (unreached vertices get
    reached=0, sum_dist=0, harmonic=0.0)."""
    spark = edges.sparkSession
    n_part = num_partitions or int(
        spark.conf.get("spark.sql.shuffle.partitions")
    )
    if "weight" not in edges.columns:
        edges = edges.withColumn("weight", F.lit(1).cast("long"))
    canon = canonicalize_edges(edges).select("src", "dst")
    sym = canon.select(F.col("src").alias("v"), F.col("dst").alias("nb")).union(
        canon.select(F.col("dst").alias("v"), F.col("src").alias("nb"))
    )
    packed = _pack_sorted_adjacency(sym, n_part)
    verts = packed.select("v").distinct()

    h = _hash64(F.col("v"), F.lit(seed), family=hash_family)
    pivots = (
        verts.select(F.col("v").alias("p"), h.alias("h"))
        .orderBy("h", "p")
        .limit(num_pivots)
        .select("p")
    )

    # BFS loop discipline (SURVEY §4 "lineage truncation", the repo's
    # own rule for every iterative loop): each round's hop is
    # materialized through plans.iteration.materialize — ONE job that
    # fills the cache, truncates lineage AND statistics to a LogicalRDD
    # leaf, and delivers the emptiness scalar via Observation. The
    # visited set is a plain union of the checkpointed hop leaves (a
    # width-r union of leaves, not an O(rounds)-deep join lineage), so
    # plan analysis stays O(rounds) shallow on high-diameter graphs
    # (path/road topologies) and each (pivot, vertex) row is cached
    # exactly once — the old per-round ``visited`` persists duplicated
    # every prior row into each round's cache and leaked all of them
    # past return (tests/test_closeness.py pins the high-diameter
    # path-graph case).
    frontier = truncate(
        pivots.select("p", F.col("p").alias("v"), F.lit(0).cast("int").alias("d"))
    )
    visited = frontier
    for r in range(1, max_rounds + 1):
        hop = (
            frontier.join(
                packed.select(F.col("v").alias("_v"), "nbrs"),
                F.col("v") == F.col("_v"),
            )
            .select("p", F.explode("nbrs").alias("v"), (F.col("d") + 1).alias("d"))
            .groupBy("p", "v")
            .agg(F.min("d").alias("d"))
            .join(visited.select("p", "v"), ["p", "v"], "left_anti")
        )
        hop, m = materialize(hop, metrics={"rows": F.count(F.lit(1))})
        if int(m["rows"] or 0) == 0:
            break
        visited = visited.unionByName(hop)
        frontier = hop

    agg = visited.groupBy("v").agg(
        F.count(F.when(F.col("d") > 0, 1)).alias("reached_pos"),
        F.sum("d").alias("sum_dist"),
        F.sum(F.when(F.col("d") > 0, 1.0 / F.col("d")).otherwise(0.0)).alias(
            "harmonic"
        ),
    )
    return (
        verts.join(agg, "v", "left_outer")
        .select(
            F.col("v").alias("id"),
            F.coalesce("reached_pos", F.lit(0)).cast("long").alias("reached"),
            F.coalesce("sum_dist", F.lit(0)).cast("long").alias("sum_dist"),
            F.coalesce("harmonic", F.lit(0.0)).alias("harmonic"),
        )
    )
