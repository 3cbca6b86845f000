"""Triangle counting — engine addition (not in the reference; required
by the north rule, SURVEY.md §2.3-G).

Degree-ordered orientation, the standard skew-robust formulation: every
undirected edge is oriented from its lower-degree endpoint to its
higher-degree endpoint (ties broken by id), so each wedge is
enumerated exactly once at its lowest-degree corner and hub vertices
never fan out — the wedge join's fan-out is bounded by
O(m^1.5) total instead of O(max_degree²) at a hub.

Plan: canonical edges → degrees → orient → self-join on the wedge
apex → semi-join the closing edge. Three shuffles total; AQE skew-join
splits any residual hot key.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark import StorageLevel

from distributed_graph_analytics_spark.sources.edges import canonicalize_edges


def _oriented(edges: DataFrame) -> DataFrame:
    """Canonical undirected edges oriented low-degree → high-degree."""
    canon = canonicalize_edges(edges).select("src", "dst")
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
    return with_deg.select(
        F.when(lower_first, F.col("src")).otherwise(F.col("dst")).alias("lo"),
        F.when(lower_first, F.col("dst")).otherwise(F.col("src")).alias("hi"),
    )


def triangle_count(edges: DataFrame) -> int:
    """Total number of distinct triangles in the undirected graph."""
    o = _oriented(edges).persist(StorageLevel.MEMORY_AND_DISK)
    a, b = o.alias("a"), o.alias("b")
    wedges = a.join(
        b, (F.col("a.lo") == F.col("b.lo")) & (F.col("a.hi") < F.col("b.hi"))
    ).select(F.col("a.hi").alias("x"), F.col("b.hi").alias("y"))
    closing = o.select(
        F.least("lo", "hi").alias("cx"), F.greatest("lo", "hi").alias("cy")
    )
    n = (
        wedges.select(F.least("x", "y").alias("cx"), F.greatest("x", "y").alias("cy"))
        .join(closing, ["cx", "cy"], "inner")
        .count()
    )
    o.unpersist()
    return int(n)


def clustering_coefficient(edges: DataFrame) -> DataFrame:
    """Per-vertex local clustering coefficient over the undirected
    simple graph: cc(v) = 2·T(v) / (d(v)·(d(v)−1)), with T(v) the
    triangles through v and d(v) the simple (canonical-edge) degree;
    cc = 0 when d < 2.

    Engine addition on top of the degree-ordered triangle kernel — the
    natural derived analytic next to total/per-vertex triangle counts
    (reference scope: SURVEY.md §2.3-G). Plan shape: the wedge
    enumeration dominates (O(m^1.5) oriented wedges); the degree join
    is one extra hash aggregate + broadcast-or-shuffle join on id, and
    the division is a codegen column expression — nothing here adds a
    driver-side step, so the 100 TB story is the triangle kernel's.

    Returns DataFrame(id LONG, triangles LONG, degree LONG, cc DOUBLE).
    """
    canon = canonicalize_edges(edges).select("src", "dst")
    deg = (
        canon.select(F.col("src").alias("id"))
        .union(canon.select(F.col("dst").alias("id")))
        .groupBy("id")
        .agg(F.count(F.lit(1)).alias("degree"))
    )
    tri = triangle_count_per_vertex(edges)
    return tri.join(deg, "id", "left_outer").select(
        "id",
        "triangles",
        F.coalesce("degree", F.lit(0)).alias("degree"),
        F.when(
            F.coalesce("degree", F.lit(0)) >= 2,
            2.0
            * F.col("triangles")
            / (F.col("degree") * (F.col("degree") - 1.0)),
        )
        .otherwise(F.lit(0.0))
        .alias("cc"),
    )


def triangle_count_per_vertex(edges: DataFrame) -> DataFrame:
    """Per-vertex triangle counts (each triangle credits all 3 corners).

    Returns DataFrame(id LONG, triangles LONG) covering every vertex
    (zero-triangle vertices included).
    """
    o = _oriented(edges).persist(StorageLevel.MEMORY_AND_DISK)
    a, b = o.alias("a"), o.alias("b")
    wedges = a.join(
        b, (F.col("a.lo") == F.col("b.lo")) & (F.col("a.hi") < F.col("b.hi"))
    ).select(
        F.col("a.lo").alias("apex"), F.col("a.hi").alias("x"), F.col("b.hi").alias("y")
    )
    closing = o.select(
        F.least("lo", "hi").alias("cx"), F.greatest("lo", "hi").alias("cy")
    )
    tris = wedges.select(
        "apex", F.least("x", "y").alias("cx"), F.greatest("x", "y").alias("cy")
    ).join(closing, ["cx", "cy"], "inner")
    corner_counts = (
        tris.select(F.explode(F.array("apex", "cx", "cy")).alias("id"))
        .groupBy("id")
        .agg(F.count(F.lit(1)).alias("triangles"))
    )
    # vertex universe from the ORIGINAL edges, not the oriented view —
    # a vertex whose only edges are self-loops still gets a 0 row
    from distributed_graph_analytics_spark.sources.edges import vertices_of

    out = vertices_of(edges).join(corner_counts, "id", "left_outer").select(
        "id", F.coalesce("triangles", F.lit(0)).alias("triangles")
    )
    return out
