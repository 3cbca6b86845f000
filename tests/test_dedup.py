from pyspark.sql import functions as F

from distributed_graph_analytics_spark.functions.dedup import (
    exact_duplicates,
    minhash_lsh_candidates,
    minhash_signatures,
    ngram_jaccard_pairs,
    shingles,
    simhash_signatures,
)


def corpus(spark):
    base = "the quick brown fox jumps over the lazy dog near the old river bank every day"
    near = base.replace("old", "ancient")  # 1-word change → high jaccard
    far = "completely different text about spark dataframes and shuffle partitions at scale"
    return spark.createDataFrame(
        [
            (1, base),
            (2, base),                      # exact dup of 1
            (3, "The  Quick brown fox jumps over the lazy dog near the old river bank every day"),  # normalized dup
            (4, near),                      # near dup
            (5, far),
        ],
        "doc_id long, text string",
    )


def test_exact_duplicates(spark):
    groups = exact_duplicates(corpus(spark)).collect()
    assert len(groups) == 1
    g = groups[0]
    assert g["doc_ids"] == [1, 2, 3]
    assert g["keep_id"] == 1
    assert g["n_dups"] == 3


def test_shingles_count(spark):
    df = spark.createDataFrame([(1, "a b c d e f")], "doc_id long, text string")
    assert shingles(df, k=5).count() == 2  # "a b c d e", "b c d e f"


def test_minhash_identical_docs_share_signature(spark):
    sigs = minhash_signatures(corpus(spark), num_hashes=16).collect()
    by_doc = {}
    for r in sigs:
        by_doc.setdefault(r["doc_id"], {})[r["seed"]] = r["minhash"]
    assert by_doc[1] == by_doc[2] == by_doc[3]
    assert by_doc[1] != by_doc[5]


def test_lsh_candidates_find_near_dups(spark):
    pairs = {
        (r["doc_a"], r["doc_b"])
        for r in minhash_lsh_candidates(corpus(spark), num_hashes=16, bands=8).collect()
    }
    assert (1, 2) in pairs and (1, 3) in pairs and (2, 3) in pairs
    assert (1, 4) in pairs  # near-dup shares most shingles → some band collides
    assert not any(5 in p for p in pairs)


def test_ngram_jaccard_exact_verification(spark):
    out = {
        (r["doc_a"], r["doc_b"]): r["jaccard"]
        for r in ngram_jaccard_pairs(corpus(spark), k=3, threshold=0.5).collect()
    }
    assert out[(1, 2)] == 1.0
    assert out[(1, 3)] == 1.0
    assert 0.5 <= out[(1, 4)] < 1.0
    assert (1, 5) not in out


def test_simhash_near_dups_close_in_hamming(spark):
    sigs = {r["doc_id"]: r["simhash"] for r in simhash_signatures(corpus(spark)).collect()}
    assert sigs[1] == sigs[2] == sigs[3]

    def hamming(a, b):
        return bin((a ^ b) & ((1 << 63) - 1)).count("1")

    assert hamming(sigs[1], sigs[4]) < hamming(sigs[1], sigs[5])
    assert hamming(sigs[1], sigs[4]) <= 12
