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

from pyspark.sql import DataFrame, Window
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
    shuffle_buckets: int | None = None,
) -> DataFrame:
    """Exact top-k by cosine. `queries(query_id, embedding)` is expected
    to be small → broadcast; result: (query_id, vec_id, cos) ranked.

    ``shuffle_buckets``: two-phase global top-k for corpora past ~10^8
    vectors — see _window_topk. Any value produces the identical exact
    result; it only bounds the per-task row count.
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
    return _window_topk(scored, k, shuffle_buckets=shuffle_buckets)


def _window_topk(
    scored: DataFrame, k: int, shuffle_buckets: int | None = None
) -> DataFrame:
    """Per-query top-k via row_number window (tie-break cos DESC then
    vec_id DESC, matching sort_array(struct(cos, vec_id)) desc order).

    Why a window and not collect_list+slice: an aggregate that collects
    the whole per-query scored set builds one unbounded multi-GB row per
    query at 100 TB. The window sorts within the query's partition but
    emits bounded rows per task; with `spark.sql.execution.topKSortFallbackThreshold`
    Spark's rank-limit pushes a per-partition top-k before the shuffle
    (WindowGroupLimit in the physical plan).

    ``shuffle_buckets=B`` adds an explicit pre-aggregation level for the
    10^8+-vectors-per-query regime where the rank-limit pushdown alone
    still funnels input_partitions×k survivor rows into ONE final
    per-query partition: rows are salted by hash(vec_id) into B
    sub-groups, the same top-k runs per (query, salt) group — B parallel
    bounded tasks — and only B×k survivors per query reach the final
    window. Exactness: every member of the global top-k ranks ≤ k inside
    its own salt bucket, so the survivor set contains the global top-k
    (classic two-level tournament reduction). Output is bit-identical to
    the single-phase path (pinned by tests/test_similarity.py).
    """
    order = [F.desc("cos"), F.desc("vec_id")]
    if shuffle_buckets and shuffle_buckets > 1:
        wb = Window.partitionBy("query_id", "_salt").orderBy(*order)
        scored = (
            scored.withColumn(
                "_salt", F.pmod(F.xxhash64("vec_id"), F.lit(shuffle_buckets))
            )
            .withColumn("_brank", F.row_number().over(wb))
            .where(F.col("_brank") <= k)
            .drop("_salt", "_brank")
        )
    w = Window.partitionBy("query_id").orderBy(*order)
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select(
            "query_id",
            "rank",
            "vec_id",
            F.round(F.col("cos"), 9).alias("cos"),
        )
    )


def hyperplane_buckets(
    vectors: DataFrame,
    num_planes: int = 8,
    seed: int = 42,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    hash_family: str = "xxhash64",
) -> DataFrame:
    """(id, bucket): sign-bit LSH bucket from `num_planes` pseudo-random
    hyperplanes. The planes are derived deterministically from
    hash(seed, plane, dim) — no driver-side random state, fully
    reproducible across cluster sizes. hash_family "xxhash64" is the
    production path; "sha2" derives the ±1 component from a sha256 hex
    digit so any engine with sha256 (the DuckDB oracle) reproduces the
    identical buckets. Projections are rounded to 6 decimals before the
    sign test so cross-engine float summation-order noise cannot flip a
    bucket bit.
    """
    dim_idx = F.sequence(F.lit(0), F.size(F.col(vec_col)) - 1)

    def _plane_projection(p: int):
        # pseudo-random ±1 plane component per dimension; p is captured
        # in a closure (a default arg would add a 3rd lambda parameter,
        # which zip_with rejects)
        if hash_family == "xxhash64":
            def bit(i):
                return F.pmod(F.xxhash64(F.lit(seed), F.lit(p), i), F.lit(2))
        elif hash_family == "sha2":
            def bit(i):
                return (
                    F.conv(
                        F.substring(
                            F.sha2(F.concat_ws(":", F.lit(seed), F.lit(p), i), 256),
                            1,
                            1,
                        ),
                        16,
                        10,
                    ).cast("int")
                    % 2
                )
        else:
            raise ValueError(f"unknown hash family: {hash_family!r}")
        comp = F.zip_with(
            F.col(vec_col),
            dim_idx,
            lambda x, i: x * F.when(bit(i) == 0, 1.0).otherwise(-1.0),
        )
        return F.aggregate(comp, F.lit(0.0), lambda acc, x: acc + x)

    bits = []
    for p in range(num_planes):
        proj = F.round(_plane_projection(p), 6)
        bits.append(F.when(proj >= 0, F.lit(1)).otherwise(F.lit(0)) * F.lit(2 ** p))
    bucket = sum(bits)
    return vectors.select(F.col(id_col).alias("vec_id"), F.col(vec_col).alias("v_vec"), bucket.alias("bucket"))


def _bucket_rows(
    vectors: DataFrame,
    num_planes: int,
    seed: int,
    id_col: str,
    vec_col: str,
    hash_family: str,
    num_tables: int,
) -> DataFrame:
    """Narrow (vec_id, table, bucket) rows over ``num_tables``
    independent hyperplane sets (table t reseeds the planes). Multiple
    tables raise recall multiplicatively — a pair missed by one table's
    buckets is recalled if ANY table agrees — at the cost of one extra
    scan per table; candidates are deduped before the (expensive)
    exact re-rank."""
    frames = [
        hyperplane_buckets(
            vectors, num_planes, seed + 1_000_003 * t, id_col, vec_col, hash_family
        ).select("vec_id", F.lit(t).alias("table"), "bucket")
        for t in range(num_tables)
    ]
    out = frames[0]
    for f in frames[1:]:
        out = out.unionByName(f)
    return out


def lsh_bucketed_cosine_topk(
    vectors: DataFrame,
    queries: DataFrame,
    k: int = 10,
    num_planes: int = 8,
    seed: int = 42,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
    hash_family: str = "xxhash64",
    num_tables: int = 1,
) -> DataFrame:
    """Approximate top-k: exact cosine re-rank within matching LSH
    buckets only. Recall < 1 by construction (raise ``num_tables`` to
    recover it); scale path for when the vector side no longer
    broadcasts. The bucket join carries only (id, table, bucket) —
    vectors are joined back AFTER candidate dedup, so the shuffle
    moves narrow rows, not embeddings."""
    v_keyed = vectors.select(F.col(id_col).alias("vec_id"), F.col(vec_col).alias("v_vec"))
    q_keyed = queries.select(
        F.col(query_id_col).alias("query_id"), F.col(vec_col).alias("q_vec")
    )
    v_b = _bucket_rows(vectors, num_planes, seed, id_col, vec_col, hash_family, num_tables)
    q_b = _bucket_rows(
        queries, num_planes, seed, query_id_col, vec_col, hash_family, num_tables
    ).select(F.col("vec_id").alias("query_id"), "table", "bucket")
    cand = q_b.join(v_b, ["table", "bucket"]).select("query_id", "vec_id").distinct()
    scored = (
        cand.join(F.broadcast(q_keyed), "query_id")
        .join(v_keyed, "vec_id")
        .select(
            "query_id",
            "vec_id",
            cosine(F.col("q_vec"), F.col("v_vec")).alias("cos"),
        )
    )
    return _window_topk(scored, k)


def ivf_cosine_topk(
    vectors: DataFrame,
    queries: DataFrame,
    k: int = 10,
    num_centroids: int = 16,
    nprobe: int = 4,
    seed: int = 42,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
    hash_family: str = "xxhash64",
) -> DataFrame:
    """IVF-style approximate top-k: coarse-quantize the corpus into
    ``num_centroids`` cells (centroids = a deterministic hash-ordered
    sample of corpus vectors, assignment = argmax cosine), probe each
    query's ``nprobe`` nearest cells, exact cosine re-rank within the
    probed cells only.

    Scale path vs the LSH variant: the centroid table is tiny and
    broadcast; assignment is one corpus scan (broadcast nested loop, C
    cosines per row, all JVM-side); the candidate join moves narrow
    (cell, id) rows hash-partitioned on the cell id; the re-rank
    touches ~nprobe/num_centroids of the corpus per query. Cells
    PARTITION the corpus (assignment is unique per vector), so
    candidates need no dedup pass. Raise nprobe for recall, raise
    num_centroids to shrink cells — standard IVF tuning.

    Assignment/probe cosines are rounded to 6 decimals before the
    argmax so cross-engine float summation noise cannot flip a cell
    choice (the same device hyperplane_buckets uses before its sign
    test); ties break toward the larger centroid id. hash_family
    "sha2" reproduces the centroid sample in the DuckDB oracle.
    """
    from distributed_graph_analytics_spark.functions.dedup import _hash64

    v = vectors.select(F.col(id_col).alias("vec_id"), F.col(vec_col).alias("v_vec"))
    q = queries.select(
        F.col(query_id_col).alias("query_id"), F.col(vec_col).alias("q_vec")
    )
    cent = F.broadcast(
        v.orderBy(_hash64(F.col("vec_id"), F.lit(seed), family=hash_family))
        .limit(num_centroids)
        .select(F.col("vec_id").alias("cid"), F.col("v_vec").alias("c_vec"))
    )
    c_cos = F.round(cosine(F.col("v_vec"), F.col("c_vec")), 6)
    assign = (
        v.crossJoin(cent)
        .select("vec_id", F.struct(c_cos.alias("cos"), F.col("cid")).alias("s"))
        .groupBy("vec_id")
        .agg(F.max("s").getField("cid").alias("cid"))
    )
    q_cos = F.round(cosine(F.col("q_vec"), F.col("c_vec")), 6)
    w = Window.partitionBy("query_id").orderBy(F.desc("ccos"), F.desc("cid"))
    probes = (
        q.crossJoin(cent)
        .select("query_id", "cid", q_cos.alias("ccos"))
        .withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") <= nprobe)
        .select("query_id", "cid")
    )
    cand = probes.join(assign, "cid").select("query_id", "vec_id")
    scored = (
        cand.join(F.broadcast(q), "query_id")
        .join(v, "vec_id")
        .select(
            "query_id",
            "vec_id",
            cosine(F.col("q_vec"), F.col("v_vec")).alias("cos"),
        )
    )
    return _window_topk(scored, k)


def embedding_centroids(
    vectors: DataFrame,
    group_col: str = "label",
    vec_col: str = "embedding",
) -> DataFrame:
    """Per-group mean embedding in LONG format: (group, pos, centroid,
    n) — one row per (group, dimension). Positional explode + one
    partial-aggregated groupBy((group, pos)): rows scale as |V|·dim but
    stay 4 columns wide, the shuffle combines map-side, and no row ever
    holds a whole vector — the layout that survives billions of
    vectors. Re-pack to arrays downstream with
    ``sort_array(collect_list(struct(pos, centroid)))`` if needed."""
    ex = vectors.select(
        F.col(group_col).alias("group"),
        F.posexplode(
            F.transform(F.col(vec_col), lambda x: x.cast("double"))
        ).alias("pos", "val"),
    )
    return ex.groupBy("group", "pos").agg(
        F.avg("val").alias("centroid"), F.count(F.lit(1)).alias("n")
    )


def embedding_near_duplicates(
    vectors: DataFrame,
    threshold: float = 0.95,
    num_planes: int = 8,
    seed: int = 42,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    hash_family: str = "xxhash64",
    num_tables: int = 1,
) -> DataFrame:
    """(id_a, id_b, cos) for pairs with cosine >= threshold among
    LSH-bucket candidates (id_a < id_b); candidate pairs from ANY of
    ``num_tables`` hyperplane tables, deduped before the exact cosine."""
    keyed = vectors.select(F.col(id_col).alias("vec_id"), F.col(vec_col).alias("v_vec"))
    b = _bucket_rows(vectors, num_planes, seed, id_col, vec_col, hash_family, num_tables)
    a, c = b.alias("a"), b.alias("b")
    cand = (
        a.join(
            c,
            (F.col("a.table") == F.col("b.table"))
            & (F.col("a.bucket") == F.col("b.bucket"))
            & (F.col("a.vec_id") < F.col("b.vec_id")),
        )
        .select(F.col("a.vec_id").alias("id_a"), F.col("b.vec_id").alias("id_b"))
        .distinct()
    )
    return (
        cand.join(keyed.select(F.col("vec_id").alias("id_a"), F.col("v_vec").alias("va")), "id_a")
        .join(keyed.select(F.col("vec_id").alias("id_b"), F.col("v_vec").alias("vb")), "id_b")
        .select("id_a", "id_b", cosine(F.col("va"), F.col("vb")).alias("cos"))
        .where(F.col("cos") >= threshold)
        .select("id_a", "id_b", F.round("cos", 9).alias("cos"))
    )
