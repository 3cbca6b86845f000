"""Single-source shortest paths — frontier Bellman-Ford over the
weighted undirected co-occurrence graph (engine extension; the
reference runs SSSP only inside HBSE's pivot batches,
HighBetweennessCore.scala — this exposes it as a first-class
analytic).

Distances over integer edge weights stay integral, monotonically
decrease, and the relaxation operator is idempotent at the fixed
point — so (like k-core) a fixed-round SQL unroll with rounds ≥ the
convergence count is an EXACT oracle.

Plan: packed (v, array<struct(nb, w)>) adjacency rows, hub-chunked and
hash(v)-clustered like WCC's (localCheckpoint under aqe_off — no
exchange on the packed side); per round only the CHANGED frontier
joins the adjacency (Pregel active-set pruning: a settled vertex
re-sends nothing), candidates min-combine map-side, and the state
updates through one fused materialize/Observation job.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark import StorageLevel

from distributed_graph_analytics_spark.operators.pagerank import ADJ_CHUNK
from distributed_graph_analytics_spark.plans.iteration import (
    IterationController,
    IterationStats,
    aqe_off,
    hash_agg_pack,
    materialize,
)
from distributed_graph_analytics_spark.plans.join_strategy import maybe_broadcast
from distributed_graph_analytics_spark.sources.edges import canonicalize_edges


def _packed_weighted(sym: DataFrame, n_part: int) -> DataFrame:
    """(v, nbs ARRAY<STRUCT<nb,w>>) hub-chunked, hash(v)-clustered."""
    return (
        sym.repartition(n_part, "v")
        .groupBy("v")
        .agg(F.collect_list(F.struct("nb", "w")).alias("all_nbs"))
        .select(
            "v",
            F.explode(
                F.transform(
                    F.sequence(
                        F.lit(0),
                        ((F.size("all_nbs") - F.lit(1)) / F.lit(ADJ_CHUNK)).cast(
                            "int"
                        ),
                    ),
                    lambda i: F.slice(
                        F.col("all_nbs"), i * F.lit(ADJ_CHUNK) + F.lit(1), ADJ_CHUNK
                    ),
                )
            ).alias("nbs"),
        )
    )


def sssp(
    edges: DataFrame,
    source: int,
    max_iterations: int = 200,
    num_partitions: int | None = None,
) -> tuple[DataFrame, IterationStats]:
    """Returns (dists(id LONG, dist LONG), stats) for vertices
    reachable from ``source`` (unreachable vertices are absent, like
    the HBSE internal SSSP). Edge weights are the canonical-merged
    co-occurrence counts (LONG ≥ 1)."""
    spark = edges.sparkSession
    n_part = num_partitions or int(spark.conf.get("spark.sql.shuffle.partitions"))
    if "weight" not in edges.columns:
        edges = edges.withColumn("weight", F.lit(1).cast("long"))
    canon = canonicalize_edges(edges).select(
        "src", "dst", F.col("weight").cast("long").alias("w")
    )
    sym = canon.select(
        F.col("src").alias("v"), F.col("dst").alias("nb"), "w"
    ).union(canon.select(F.col("dst").alias("v"), F.col("src").alias("nb"), "w"))
    nbrs = _packed_weighted(sym, n_part)
    with aqe_off(spark), hash_agg_pack(spark):
        nbrs = nbrs.localCheckpoint(eager=True)
    n = nbrs.select("v").distinct().count()

    init = spark.createDataFrame(
        [(int(source), 0, True)], "id LONG, dist LONG, changed BOOLEAN"
    )

    def step(state: DataFrame, i: int) -> tuple[DataFrame, dict]:
        frontier = state.where("changed").select("id", "dist")
        cands = (
            nbrs.join(maybe_broadcast(frontier, n), nbrs["v"] == frontier["id"])
            .select(
                F.explode("nbs").alias("e"),
                F.col("dist").alias("d0"),
            )
            .select(F.col("e.nb").alias("id"), (F.col("d0") + F.col("e.w")).alias("cand"))
            .groupBy("id")
            .agg(F.min("cand").alias("cand"))
        )
        new_state = (
            state.select("id", "dist")
            .join(maybe_broadcast(cands, n), "id", "full_outer")
            .select(
                "id",
                F.least(
                    F.coalesce("dist", F.lit(None)), F.coalesce("cand", F.col("dist"))
                ).alias("dist"),
                (
                    F.col("dist").isNull()
                    | (F.col("cand") < F.col("dist"))
                ).alias("changed_raw"),
            )
            .select(
                "id",
                "dist",
                F.coalesce("changed_raw", F.lit(False)).alias("changed"),
            )
        )
        new_state, m = materialize(
            new_state,
            metrics={"changed": F.sum(F.col("changed").cast("long"))},
        )
        return new_state, {"changed": int(m["changed"] or 0)}

    controller = IterationController(
        max_iterations=max_iterations, step_materializes=True
    )
    final, stats = controller.run(
        init, step, converged=lambda m, i: m["changed"] == 0, name="sssp"
    )
    return final.select("id", "dist"), stats
