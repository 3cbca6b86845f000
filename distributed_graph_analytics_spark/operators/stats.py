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
