"""Deduplication operators over the ``documents`` table.

Four families, all shuffle-architected for 100 TB:

- exact: hash-groupBy on a normalized content hash — one shuffle on the
  hash key, map-side combine shrinks it first;
- MinHash + LSH: shingles → per-(doc, seed) min-hash → band buckets →
  candidate pairs via a bucket self-join. The join key is
  (band, band_hash), so hot buckets are bounded by banding; the giant
  all-pairs comparison never materializes;
- SimHash: 64-bit-class bitwise-majority signature per doc (63 data
  bits, sign bit clear; explode tokens → unpack bits → groupBy doc,
  one aggregate over the per-bit sum columns);
- n-gram Jaccard: candidate pairs (from LSH or exact-band buckets) are
  verified by exact shingle-set Jaccard — a join + two aggregates.

Everything is built-in column functions; the only shuffle-heavy step
(pair generation) is capped by band bucketing.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _normalized(text_col):
    return F.regexp_replace(F.lower(text_col), r"\s+", " ")


def _hash64(*cols, family: str = "xxhash64"):
    """Deterministic 64-bit-class integer hash of the given columns.

    - "xxhash64": Spark's built-in (fastest; JVM codegen) — the default
      and the production path.
    - "sha2": 60 bits from the first 15 hex chars of
      sha256(concat_ws(':', cols)). Slower, but reproducible in ANY
      engine with sha256 — the DuckDB oracles use this family so the
      driver can hash-compare LSH/simhash results (xxhash64 has no
      DuckDB twin). Statistically equivalent for min-hash/banding.
    """
    if family == "xxhash64":
        return F.xxhash64(*cols)
    if family == "sha2":
        return F.conv(
            F.substring(F.sha2(F.concat_ws(":", *cols), 256), 1, 15), 16, 10
        ).cast("long")
    raise ValueError(f"unknown hash family: {family!r}")


def exact_duplicates(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Groups of byte-identical (normalized) documents.

    Returns (content_sha256, n_dups, doc_ids, keep_id) for groups with
    more than one member; keep_id = min doc id (deterministic survivor).
    """
    return (
        docs.select(
            F.col("doc_id"), F.sha2(_normalized(F.col(text_col)), 256).alias("content_sha256")
        )
        .groupBy("content_sha256")
        .agg(
            F.count(F.lit(1)).alias("n_dups"),
            F.sort_array(F.collect_list("doc_id")).alias("doc_ids"),
            F.min("doc_id").alias("keep_id"),
        )
        .where(F.col("n_dups") > 1)
    )


def shingles(docs: DataFrame, text_col: str = "text", k: int = 5) -> DataFrame:
    """(doc_id, shingle) — distinct k-word shingles of the normalized text."""
    toks = F.split(_normalized(F.col(text_col)), " ")
    n = F.size(toks)
    idx = F.sequence(F.lit(1), F.greatest(n - (k - 1), F.lit(1)))
    shingle = F.transform(
        idx, lambda i: F.concat_ws(" ", F.slice(toks, i, k))
    )
    return (
        docs.select("doc_id", F.explode(shingle).alias("shingle"))
        .distinct()
    )


def minhash_signatures(
    docs: DataFrame,
    text_col: str = "text",
    k: int = 5,
    num_hashes: int = 32,
    hash_family: str = "xxhash64",
) -> DataFrame:
    """(doc_id, seed, minhash): num_hashes independent min-hashes per doc.

    Hash family: hash(shingle, seed) — one explode, one groupBy
    (map-side combined min). See _hash64 for the family choice."""
    sh = shingles(docs, text_col, k)
    seeds = F.explode(F.sequence(F.lit(0), F.lit(num_hashes - 1))).alias("seed")
    return (
        sh.select("doc_id", "shingle", seeds)
        .select(
            "doc_id",
            "seed",
            _hash64(F.col("shingle"), F.col("seed"), family=hash_family).alias("h"),
        )
        .groupBy("doc_id", "seed")
        .agg(F.min("h").alias("minhash"))
    )


def minhash_lsh_candidates(
    docs: DataFrame,
    text_col: str = "text",
    k: int = 5,
    num_hashes: int = 32,
    bands: int = 8,
    hash_family: str = "xxhash64",
) -> DataFrame:
    """Candidate near-duplicate pairs via banded LSH over the MinHash
    signature (rows = num_hashes / bands per band). Returns distinct
    (doc_a, doc_b) with doc_a < doc_b.
    """
    sigs = minhash_signatures(docs, text_col, k, num_hashes, hash_family)
    rows_per_band = num_hashes // bands
    banded = (
        sigs.withColumn("band", (F.col("seed") / rows_per_band).cast("int"))
        .groupBy("doc_id", "band")
        .agg(
            _hash64(
                F.concat_ws(
                    ",",
                    F.sort_array(F.collect_list(F.concat_ws(":", "seed", "minhash"))),
                ),
                family=hash_family,
            ).alias("band_hash")
        )
    )
    a = banded.alias("a")
    b = banded.alias("b")
    return (
        a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.band_hash") == F.col("b.band_hash"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b"))
        .distinct()
    )


def ngram_jaccard_pairs(
    docs: DataFrame,
    candidates: DataFrame | None = None,
    text_col: str = "text",
    k: int = 3,
    threshold: float = 0.8,
) -> DataFrame:
    """Exact n-gram Jaccard similarity for candidate pairs.

    With candidates=None an all-pairs shingle join is used (correct at
    test scale; at 100 TB always pass LSH candidates — the all-pairs
    join is the O(n²) path this operator family exists to avoid).
    Returns (doc_a, doc_b, jaccard) with jaccard >= threshold.
    """
    sh = shingles(docs, text_col, k).persist()
    sizes = sh.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n_sh"))
    a = sh.alias("a")
    b = sh.alias("b")
    inter = (
        a.join(
            b,
            (F.col("a.shingle") == F.col("b.shingle"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .groupBy(
            F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b")
        )
        .agg(F.count(F.lit(1)).alias("n_inter"))
    )
    if candidates is not None:
        inter = inter.join(
            candidates.select(
                F.col("doc_a").alias("ca"), F.col("doc_b").alias("cb")
            ),
            (F.col("doc_a") == F.col("ca")) & (F.col("doc_b") == F.col("cb")),
            "left_semi",
        )
    out = (
        inter.join(sizes.select(F.col("doc_id").alias("doc_a"), F.col("n_sh").alias("sa")), "doc_a")
        .join(sizes.select(F.col("doc_id").alias("doc_b"), F.col("n_sh").alias("sb")), "doc_b")
        .select(
            "doc_a",
            "doc_b",
            (
                F.col("n_inter")
                / (F.col("sa") + F.col("sb") - F.col("n_inter"))
            ).alias("jaccard"),
        )
        .where(F.col("jaccard") >= threshold)
    )
    return out


def simhash_signatures(
    docs: DataFrame, text_col: str = "text", bits: int = 64, hash_family: str = "xxhash64"
) -> DataFrame:
    """(doc_id, simhash): bitwise-majority fingerprint over token hashes,
    packed into the low ``bits - 1`` bits of a signed long (the sign bit
    is kept clear so signatures sort/compare as non-negative integers —
    a 64-bit *class* signature with 63 data bits; with the "sha2" hash
    family the token hash itself carries 60 bits, so bits 60-62 are
    constant-zero by construction in every engine).

    Near-duplicates differ in few bits (compare via popcount of xor).
    Implementation: explode tokens → token hash → per-bit ±1 votes via
    an aggregate over shifted masks — stays in codegen, no Python.
    """
    toks = (
        docs.select(
            "doc_id",
            F.explode(F.split(_normalized(F.col(text_col)), " ")).alias("tok"),
        )
        .where(F.col("tok") != "")
        .select("doc_id", _hash64(F.col("tok"), family=hash_family).alias("h"))
    )
    votes = [
        F.sum(
            F.when(F.shiftright(F.col("h"), i).bitwiseAND(F.lit(1)) == 1, 1).otherwise(-1)
        ).alias(f"b{i}")
        for i in range(bits)
    ]
    agg = toks.groupBy("doc_id").agg(*votes)
    sig = sum(
        (F.when(F.col(f"b{i}") > 0, F.lit(1).cast("long")).otherwise(F.lit(0).cast("long")) * F.lit(2 ** i).cast("long"))
        for i in range(bits - 1)  # keep sign bit clear: 63 data bits
    )
    return agg.select("doc_id", sig.alias("simhash"))
