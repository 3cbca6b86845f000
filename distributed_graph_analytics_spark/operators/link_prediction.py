"""Link prediction — common-neighbor similarity scores (engine
extension; the reference stops at community/centrality analytics, this
is the standard next step for recommend-an-edge workloads on the same
co-occurrence graphs).

For non-adjacent pairs (u, v) with at least ``min_common`` common
neighbors: common-neighbor count, Jaccard
``|N(u)∩N(v)| / |N(u)∪N(v)|``, and Adamic-Adar
``Σ_{w∈N(u)∩N(v)} 1/ln(deg(w))`` (every common neighbor has deg ≥ 2,
so the log never vanishes).

Scale notes: wedge enumeration at an apex w fans out deg(w)² — that is
inherent to the scores (a hub really does connect all its neighbor
pairs), so the operator applies a ``max_apex_degree`` stop-word cut
BY DEFAULT (10_000): super-hub apexes are dropped from wedge
enumeration, the standard cut for similarity mining (hubs contribute
~0 Adamic-Adar weight anyway: 1/ln(deg) → 0, and a single 10M-degree
hub would otherwise be a 10¹⁴-wedge cartesian). ``None`` is the
explicit opt-out for exact scores on hub-free graphs. The wedge join
is one self-join co-partitioned on the apex; AQE's skew split covers
residual hot apexes; the candidate-pair aggregate and the anti-join
against existing edges shuffle on the (u, v) pair key.

Semantics under the cut: ``common``/``adamic_adar`` count only wedges
through apexes with deg ≤ max_apex_degree, while the ``jaccard``
denominator keeps the GLOBAL endpoint degrees — i.e. hub-mediated
co-occurrence is treated as no evidence (numerator) but the endpoints'
true neighborhood sizes still normalize the score (denominator). That
makes the cut strictly conservative: every score is a lower bound on
its uncut value.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark import StorageLevel

from distributed_graph_analytics_spark.sources.edges import canonicalize_edges


DEFAULT_MAX_APEX_DEGREE = 10_000


def common_neighbor_scores(
    edges: DataFrame,
    min_common: int = 2,
    max_apex_degree: int | None = DEFAULT_MAX_APEX_DEGREE,
) -> DataFrame:
    """Returns (u, v, common, jaccard, adamic_adar) with u < v, pairs
    not already adjacent, common >= min_common (over apexes with
    deg <= max_apex_degree; pass ``None`` to enumerate every wedge —
    deg(w)² per apex, safe only on hub-free graphs)."""
    if "weight" not in edges.columns:  # canonicalize_edges expects it
        edges = edges.withColumn("weight", F.lit(1).cast("long"))
    canon = canonicalize_edges(edges).select("src", "dst").persist(
        StorageLevel.MEMORY_AND_DISK
    )
    sym = canon.select(F.col("src").alias("x"), F.col("dst").alias("w")).union(
        canon.select(F.col("dst").alias("x"), F.col("src").alias("w"))
    )
    deg = sym.groupBy("x").agg(F.count(F.lit(1)).alias("deg"))
    # neighbor lists keyed by the apex, with the apex degree attached
    nb = sym.join(
        deg.select(F.col("x").alias("w"), F.col("deg").alias("w_deg")), "w"
    )
    if max_apex_degree is not None:
        nb = nb.where(F.col("w_deg") <= max_apex_degree)
    a, b = nb.alias("a"), nb.alias("b")
    pair_scores = (
        a.join(
            b,
            (F.col("a.w") == F.col("b.w")) & (F.col("a.x") < F.col("b.x")),
        )
        .select(
            F.col("a.x").alias("u"),
            F.col("b.x").alias("v"),
            (F.lit(1.0) / F.log(F.col("a.w_deg"))).alias("aa_w"),
        )
        .groupBy("u", "v")
        .agg(
            F.count(F.lit(1)).alias("common"),
            F.sum("aa_w").alias("adamic_adar"),
        )
        .where(F.col("common") >= min_common)
    )
    # drop already-adjacent pairs (u < v matches the canonical edge key)
    candidates = pair_scores.join(
        canon.select(F.col("src").alias("u"), F.col("dst").alias("v")),
        ["u", "v"],
        "left_anti",
    )
    du = deg.select(F.col("x").alias("u"), F.col("deg").alias("du"))
    dv = deg.select(F.col("x").alias("v"), F.col("deg").alias("dv"))
    out = candidates.join(du, "u").join(dv, "v").select(
        "u",
        "v",
        "common",
        (
            F.col("common") / (F.col("du") + F.col("dv") - F.col("common"))
        ).alias("jaccard"),
        "adamic_adar",
    )
    return out
