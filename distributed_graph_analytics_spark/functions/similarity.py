"""Similarity search over an embedding column (array<float>).

- brute_force_cosine_topk: exact top-k neighbors per query — the
  baseline. Cross join is bounded by broadcasting the (small) query
  side; the dot product is `F.zip_with` + `F.aggregate`, all JVM-side.
- lsh_bucketed_cosine_topk: the scale path — random-hyperplane LSH
  buckets (sign bits of h random projections) shrink the candidate set;
  exact cosine re-rank within buckets. At 100 TB the bucket join is the
  only shuffle and each bucket is small; multiple hash tables raise
  recall.
- embedding_near_duplicates: all pairs above a cosine threshold among
  LSH-bucket candidates (embedding-based near-dup dedup).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _norm(col):
    return F.sqrt(F.aggregate(col, F.lit(0.0), lambda acc, x: acc + x * x))


def _dot(a, b):
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y), F.lit(0.0), lambda acc, x: acc + x
    )


def cosine(a, b):
    return _dot(a, b) / (_norm(a) * _norm(b))


def brute_force_cosine_topk(
    vectors: DataFrame,
    queries: DataFrame,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
) -> DataFrame:
    """Exact top-k by cosine. `queries(query_id, embedding)` is expected
    to be small → broadcast; result: (query_id, vec_id, cos) ranked.
    """
    q = F.broadcast(
        queries.select(
            F.col(query_id_col).alias("query_id"), F.col(vec_col).alias("q_vec")
        )
    )
    v = vectors.select(F.col(id_col).alias("vec_id"), F.col(vec_col).alias("v_vec"))
    scored = q.crossJoin(v).select(
        "query_id",
        "vec_id",
        cosine(F.col("q_vec"), F.col("v_vec")).alias("cos"),
    )
    # per-query top-k: single aggregate of a bounded sorted buffer —
    # no global sort, no window over the full cross product
    topk = (
        scored.groupBy("query_id")
        .agg(
            F.slice(
                F.sort_array(
                    F.collect_list(F.struct(F.col("cos"), F.col("vec_id"))),
                    asc=False,
                ),
                1,
                k,
            ).alias("top")
        )
        .select(
            "query_id",
            F.posexplode("top").alias("rank0", "t"),
        )
        .select(
            "query_id",
            (F.col("rank0") + 1).alias("rank"),
            F.col("t.vec_id").alias("vec_id"),
            F.round(F.col("t.cos"), 9).alias("cos"),
        )
    )
    return topk


def hyperplane_buckets(
    vectors: DataFrame,
    num_planes: int = 8,
    seed: int = 42,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """(id, bucket): sign-bit LSH bucket from `num_planes` pseudo-random
    hyperplanes. The planes are derived deterministically from
    xxhash64(seed, plane, dim) — no driver-side random state, fully
    reproducible across cluster sizes.
    """
    dim_idx = F.sequence(F.lit(0), F.size(F.col(vec_col)) - 1)

    def _plane_projection(p: int):
        # pseudo-random ±1 plane component per dimension; p is captured
        # in a closure (a default arg would add a 3rd lambda parameter,
        # which zip_with rejects)
        comp = F.zip_with(
            F.col(vec_col),
            dim_idx,
            lambda x, i: x
            * F.when(
                F.pmod(F.xxhash64(F.lit(seed), F.lit(p), i), F.lit(2)) == 0, 1.0
            ).otherwise(-1.0),
        )
        return F.aggregate(comp, F.lit(0.0), lambda acc, x: acc + x)

    bits = []
    for p in range(num_planes):
        proj = _plane_projection(p)
        bits.append(F.when(proj >= 0, F.lit(1)).otherwise(F.lit(0)) * F.lit(2 ** p))
    bucket = sum(bits)
    return vectors.select(F.col(id_col).alias("vec_id"), F.col(vec_col).alias("v_vec"), bucket.alias("bucket"))


def lsh_bucketed_cosine_topk(
    vectors: DataFrame,
    queries: DataFrame,
    k: int = 10,
    num_planes: int = 8,
    seed: int = 42,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
) -> DataFrame:
    """Approximate top-k: exact cosine re-rank within matching LSH
    buckets only. Recall < 1 by construction; scale path for when the
    vector side no longer broadcasts."""
    v_b = hyperplane_buckets(vectors, num_planes, seed, id_col, vec_col)
    q_b = hyperplane_buckets(
        queries, num_planes, seed, query_id_col, vec_col
    ).select(
        F.col("vec_id").alias("query_id"),
        F.col("v_vec").alias("q_vec"),
        "bucket",
    )
    scored = q_b.join(v_b, "bucket").select(
        "query_id",
        "vec_id",
        cosine(F.col("q_vec"), F.col("v_vec")).alias("cos"),
    )
    return (
        scored.groupBy("query_id")
        .agg(
            F.slice(
                F.sort_array(
                    F.collect_list(F.struct(F.col("cos"), F.col("vec_id"))),
                    asc=False,
                ),
                1,
                k,
            ).alias("top")
        )
        .select("query_id", F.posexplode("top").alias("rank0", "t"))
        .select(
            "query_id",
            (F.col("rank0") + 1).alias("rank"),
            F.col("t.vec_id").alias("vec_id"),
            F.round(F.col("t.cos"), 9).alias("cos"),
        )
    )


def embedding_near_duplicates(
    vectors: DataFrame,
    threshold: float = 0.95,
    num_planes: int = 8,
    seed: int = 42,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """(id_a, id_b, cos) for pairs with cosine >= threshold among
    LSH-bucket candidates (id_a < id_b)."""
    b = hyperplane_buckets(vectors, num_planes, seed, id_col, vec_col)
    a, c = b.alias("a"), b.alias("b")
    return (
        a.join(
            c,
            (F.col("a.bucket") == F.col("b.bucket"))
            & (F.col("a.vec_id") < F.col("b.vec_id")),
        )
        .select(
            F.col("a.vec_id").alias("id_a"),
            F.col("b.vec_id").alias("id_b"),
            cosine(F.col("a.v_vec"), F.col("b.v_vec")).alias("cos"),
        )
        .where(F.col("cos") >= threshold)
        .select("id_a", "id_b", F.round("cos", 9).alias("cos"))
    )
