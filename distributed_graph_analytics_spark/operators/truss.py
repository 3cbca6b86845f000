"""k-truss decomposition — engine extension (the edge analog of
k-core: the maximal subgraph where every edge sits in ≥ k−2
triangles; Cohen 2008). Extracts cohesive community cores from the
co-occurrence graph, complementing `operators/kcore.py`.

Peel semantics: each round computes every surviving edge's support
(triangles it participates in, within the surviving subgraph) and
drops edges with support < k−2. FIXED-ROUND contract for the driver
oracle (like `louvain_move_fixed4`): exactly ``rounds`` peels are
replayed — once the peel reaches its fixed point, further rounds are
no-ops on both engines, so `rounds` ≥ the measured cascade depth makes
the result the true k-truss.

Scale shape: each round is the degree-ordered oriented wedge join
(each triangle enumerated exactly once at its lowest-degree corner —
hub-safe, O(m^1.5) wedges total), one explode to the 3 member edges,
a map-side combined count, and a broadcast-or-shuffle semi-join back
onto the surviving edge list. Early-out: when a round drops no edges
the loop stops (the remaining rounds are provably no-ops).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark import StorageLevel

from distributed_graph_analytics_spark.sources.edges import canonicalize_edges


def _edge_support(canon: DataFrame) -> DataFrame:
    """(src, dst, support) for every canonical edge: the number of
    triangles of the canonical graph the edge belongs to (0 rows are
    NOT included — left-join + coalesce at the caller)."""
    deg = (
        canon.select(F.col("src").alias("id"))
        .union(canon.select(F.col("dst").alias("id")))
        .groupBy("id")
        .agg(F.count(F.lit(1)).alias("deg"))
    )
    with_deg = (
        canon.join(deg.withColumnRenamed("id", "src"), "src")
        .withColumnRenamed("deg", "src_deg")
        .join(deg.withColumnRenamed("id", "dst"), "dst")
        .withColumnRenamed("deg", "dst_deg")
    )
    lower_first = (F.col("src_deg") < F.col("dst_deg")) | (
        (F.col("src_deg") == F.col("dst_deg")) & (F.col("src") < F.col("dst"))
    )
    o = with_deg.select(
        F.when(lower_first, F.col("src")).otherwise(F.col("dst")).alias("lo"),
        F.when(lower_first, F.col("dst")).otherwise(F.col("src")).alias("hi"),
    ).persist(StorageLevel.MEMORY_AND_DISK)
    a, b = o.alias("a"), o.alias("b")
    wedges = a.join(
        b, (F.col("a.lo") == F.col("b.lo")) & (F.col("a.hi") < F.col("b.hi"))
    ).select(
        F.col("a.lo").alias("apex"),
        F.col("a.hi").alias("x"),
        F.col("b.hi").alias("y"),
    )
    closing = o.select(
        F.least("lo", "hi").alias("cx"), F.greatest("lo", "hi").alias("cy")
    )
    tris = wedges.select(
        "apex", F.least("x", "y").alias("cx"), F.greatest("x", "y").alias("cy")
    ).join(closing, ["cx", "cy"], "inner")
    member_edges = tris.select(
        F.explode(
            F.array(
                F.struct(
                    F.least("apex", "cx").alias("src"),
                    F.greatest("apex", "cx").alias("dst"),
                ),
                F.struct(
                    F.least("apex", "cy").alias("src"),
                    F.greatest("apex", "cy").alias("dst"),
                ),
                F.struct(F.col("cx").alias("src"), F.col("cy").alias("dst")),
            )
        ).alias("e")
    ).select("e.src", "e.dst")
    out = member_edges.groupBy("src", "dst").agg(
        F.count(F.lit(1)).alias("support")
    )
    o.unpersist()
    return out


def k_truss(edges: DataFrame, k: int = 4, rounds: int = 6) -> DataFrame:
    """Surviving canonical edges (src, dst) after ``rounds`` support
    peels at threshold k−2; equals the true k-truss when the peel
    converges within ``rounds`` (early-out on a no-drop round)."""
    if k < 2:
        raise ValueError("k must be >= 2")
    cur = (
        canonicalize_edges(edges)
        .select("src", "dst")
        .persist(StorageLevel.MEMORY_AND_DISK)
    )
    thresh = k - 2
    for _ in range(rounds):
        n_before = cur.count()
        sup = _edge_support(cur)
        nxt = (
            cur.join(sup, ["src", "dst"], "left_outer")
            .where(F.coalesce("support", F.lit(0)) >= thresh)
            .select("src", "dst")
            .localCheckpoint(eager=True)
        )
        if nxt.count() == n_before:
            cur = nxt
            break
        cur = nxt
    return cur
