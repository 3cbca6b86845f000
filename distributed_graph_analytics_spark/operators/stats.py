"""Graph summary statistics — one-row corpus health check (engine
extension): vertex/edge counts, degree stats, wedge count, triangle
count and the global clustering coefficient 3T/W.

Everything is a scan + two aggregates over the canonical edge table
except triangles, which reuses the skew-robust degree-ordered
orientation from operators/triangle.py (per-vertex counts summed / 3).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from distributed_graph_analytics_spark.operators.triangle import (
    triangle_count_per_vertex,
)
from distributed_graph_analytics_spark.sources.edges import canonicalize_edges


def graph_summary(edges: DataFrame) -> DataFrame:
    """One row: (n_vertices, n_edges, avg_degree, max_degree, wedges,
    triangles, global_clustering)."""
    if "weight" not in edges.columns:
        edges = edges.withColumn("weight", F.lit(1).cast("long"))
    canon = canonicalize_edges(edges).select("src", "dst")
    deg = (
        canon.select(F.col("src").alias("id"))
        .union(canon.select(F.col("dst").alias("id")))
        .groupBy("id")
        .agg(F.count(F.lit(1)).alias("deg"))
    )
    dstats = deg.agg(
        F.count(F.lit(1)).alias("n_vertices"),
        F.sum("deg").alias("deg_sum"),
        F.max("deg").alias("max_degree"),
        (F.sum(F.col("deg") * (F.col("deg") - 1)) / 2).cast("long").alias("wedges"),
    )
    n_edges = canon.count()
    tri_total = (
        triangle_count_per_vertex(edges)
        .agg((F.sum("triangles") / 3).cast("long").alias("triangles"))
    )
    return dstats.crossJoin(tri_total).select(
        "n_vertices",
        F.lit(n_edges).alias("n_edges"),
        F.round(F.col("deg_sum") / F.col("n_vertices"), 6).alias("avg_degree"),
        "max_degree",
        "wedges",
        "triangles",
        F.when(
            F.col("wedges") > 0,
            F.round(F.lit(3.0) * F.col("triangles") / F.col("wedges"), 6),
        ).alias("global_clustering"),  # NULL when no wedges (undefined)
    )


def degree_assortativity(edges: DataFrame) -> DataFrame:
    """Degree assortativity coefficient (Newman, PRL 2002) of the
    undirected simple graph — one row.

    Over the m canonical edges with endpoint degrees (j, k):

        mean_jk  = Σ jk / m
        mean_deg = Σ (j + k) / (2m)
        mean_sq  = Σ (j² + k²) / (2m)
        r = (mean_jk − mean_deg²) / (mean_sq − mean_deg²)

    The three Σ terms are EXACT integer sums, so the final doubles are
    a fixed tree of IEEE-correctly-rounded divisions/multiplies —
    bit-identical across engines (the same exactness trick
    tfidf_top_terms uses); r is NULL for degree-regular graphs
    (denominator 0). Scale shape: one degree aggregate, two
    broadcast-or-shuffle joins of the degree table onto the edge list,
    one global aggregate — all map-side combined, no windows.

    Returns (m BIGINT, sum_jk BIGINT, sum_deg BIGINT, sum_sq BIGINT,
    assortativity DOUBLE rounded to 9).
    """
    canon = canonicalize_edges(edges).select("src", "dst")
    deg = (
        canon.select(F.col("src").alias("id"))
        .union(canon.select(F.col("dst").alias("id")))
        .groupBy("id")
        .agg(F.count(F.lit(1)).alias("deg"))
    )
    with_deg = (
        canon.join(deg.withColumnRenamed("id", "src"), "src")
        .withColumnRenamed("deg", "j")
        .join(deg.withColumnRenamed("id", "dst"), "dst")
        .withColumnRenamed("deg", "k")
    )
    sums = with_deg.agg(
        F.count(F.lit(1)).alias("m"),
        F.sum(F.col("j") * F.col("k")).alias("sum_jk"),
        F.sum(F.col("j") + F.col("k")).alias("sum_deg"),
        F.sum(F.col("j") * F.col("j") + F.col("k") * F.col("k")).alias("sum_sq"),
    )
    mean_jk = F.col("sum_jk") / F.col("m")
    mean_deg = F.col("sum_deg") / (F.lit(2.0) * F.col("m"))
    mean_sq = F.col("sum_sq") / (F.lit(2.0) * F.col("m"))
    num = mean_jk - mean_deg * mean_deg
    den = mean_sq - mean_deg * mean_deg
    return sums.select(
        "m",
        "sum_jk",
        "sum_deg",
        "sum_sq",
        F.round(
            F.when(den != 0, num / den).otherwise(F.lit(None).cast("double")), 9
        ).alias("assortativity"),
    )
