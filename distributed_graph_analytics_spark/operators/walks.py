"""Deterministic random walks — the graph-embedding input primitive
(DeepWalk/node2vec-style corpora; engine extension, no reference
analog).

One walker starts at every vertex and takes ``walk_length`` steps over
the symmetrized graph. Neighbor choice is a seeded hash, not an RNG:
``idx = H(walk_id, step, seed) mod deg(cur)`` over the neighbor list
sorted by id — so walks are exactly reproducible across runs,
partitionings, AND engines (the DuckDB oracle replays them bit-for-bit
with the sha2 hash family), while remaining uniform per step in the
hash's randomness.

Scale shape: the sorted neighbor lists are packed ONCE into chunked
CSR-style array rows keyed by (v, chunk) — a walker reads ONE array
element per step (element_at), never exploding the adjacency; hubs are
sliced to ADJ_CHUNK so no row is unbounded. Each step is two
hash-joins on the walker frontier (|V| rows): degree lookup → chunk
lookup. All column expressions, no Python.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark import StorageLevel

from distributed_graph_analytics_spark.functions.dedup import _hash64
from distributed_graph_analytics_spark.operators.pagerank import ADJ_CHUNK
from distributed_graph_analytics_spark.plans.iteration import hash_agg_pack
from distributed_graph_analytics_spark.sources.edges import canonicalize_edges


def random_walks(
    edges: DataFrame,
    walk_length: int = 4,
    seed: int = 42,
    hash_family: str = "xxhash64",
    num_partitions: int | None = None,
) -> DataFrame:
    """Returns (walk_id LONG, step INT, vertex LONG) with one walk per
    vertex, steps 0..walk_length (step 0 = the start vertex)."""
    spark = edges.sparkSession
    n_part = num_partitions or int(spark.conf.get("spark.sql.shuffle.partitions"))
    if "weight" not in edges.columns:
        edges = edges.withColumn("weight", F.lit(1).cast("long"))
    canon = canonicalize_edges(edges).select("src", "dst")
    sym = canon.select(F.col("src").alias("v"), F.col("dst").alias("nb")).union(
        canon.select(F.col("dst").alias("v"), F.col("src").alias("nb"))
    )
    # sorted neighbor arrays, chunk-split with the chunk INDEX kept so a
    # walker can address position idx via (v, idx // ADJ_CHUNK) and
    # element_at(nbrs, idx % ADJ_CHUNK + 1)
    packed = (
        sym.repartition(n_part, "v")
        .groupBy("v")
        .agg(F.sort_array(F.collect_list("nb")).alias("all_nbs"))
        .select(
            "v",
            F.size("all_nbs").alias("deg"),
            F.posexplode(
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
            ).alias("chunk", "nbrs"),
        )
        .persist(StorageLevel.MEMORY_AND_DISK)
    )
    # force the pack job under the scoped ObjectHashAggregate raise
    # (plans.iteration.hash_agg_pack): the collect_list pack would
    # otherwise fall back to sort-based aggregation at 128 keys —
    # the config must be set when the job RUNS, and persist is lazy
    with hash_agg_pack(spark):
        packed.count()
    degs = packed.select("v", "deg").distinct()

    walkers = packed.select(F.col("v").alias("walk_id")).distinct().select(
        "walk_id", F.col("walk_id").alias("cur")
    )
    out = walkers.select(
        "walk_id", F.lit(0).alias("step"), F.col("cur").alias("vertex")
    )
    for t in range(1, walk_length + 1):
        h = _hash64(
            F.col("walk_id"), F.lit(t), F.lit(seed), family=hash_family
        )
        idx = F.pmod(h, F.col("deg"))
        hop = (
            walkers.join(degs, walkers["cur"] == degs["v"])
            .select(
                "walk_id",
                "cur",
                idx.alias("idx"),
            )
            .join(
                packed.select("v", "chunk", "nbrs"),
                (F.col("cur") == F.col("v"))
                & ((F.col("idx") / ADJ_CHUNK).cast("int") == F.col("chunk")),
            )
            .select(
                "walk_id",
                F.element_at(
                    "nbrs", (F.pmod(F.col("idx"), F.lit(ADJ_CHUNK)) + 1).cast("int")
                ).alias("cur"),
            )
        )
        # persist each frontier: the output union references every
        # step's walkers, and without this each union branch would
        # recompute the whole chain of prior hops (O(L²) joins)
        walkers = hop.persist(StorageLevel.MEMORY_AND_DISK)
        out = out.unionByName(
            walkers.select(
                "walk_id", F.lit(t).alias("step"), F.col("cur").alias("vertex")
            )
        )
    return out
