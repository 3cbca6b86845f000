"""corpus_disposition / clean_corpus: crafted-fixture semantics plus
partition-invariant checks on the testdata corpus."""

from pyspark.sql import functions as F

from distributed_graph_analytics_spark.functions.pipeline import (
    clean_corpus,
    corpus_disposition,
)

SF_DIR = "/root/testdata/sf0.001"

_GOOD = (
    "the quick brown fox jumps over the lazy dog and runs to the river "
    "where the water flows down from the hills of the north country in "
    "spring and the birds sing songs of the morning light while children "
    "play in the fields near the old mill and farmers tend to their crops "
    "with care and patience as the sun rises over the quiet valley town "
    "bringing warmth and hope to all of the people who live and work there"
)


def _docs(spark):
    rows = [
        (1, _GOOD),                      # kept
        (2, _GOOD.replace(" ", "  ")),   # exact dup of 1 (normalizes equal)
        (3, _GOOD + " tomorrow"),        # near dup of 1 (one appended token)
        (4, "zzz !!!"),                  # junk -> filtered
    ]
    return spark.createDataFrame(rows, ["doc_id", "text"])


def test_disposition_crafted_fixture(spark):
    got = {
        r["doc_id"]: r["status"]
        for r in corpus_disposition(_docs(spark)).collect()
    }
    assert got == {1: "kept", 2: "exact_dup", 3: "near_dup", 4: "filtered"}


def test_clean_corpus_keeps_survivors_with_all_columns(spark):
    docs = _docs(spark).withColumn("extra", F.lit("x"))
    out = clean_corpus(docs).collect()
    assert [r["doc_id"] for r in out] == [1]
    assert out[0]["extra"] == "x"  # original columns survive the semi-join


def test_disposition_partitions_the_corpus(spark):
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet").select(
        "doc_id", "text"
    )
    disp = corpus_disposition(docs).toPandas()
    # exactly one disposition per input doc
    assert len(disp) == docs.count()
    assert disp["doc_id"].is_unique
    assert set(disp["status"]) <= {"kept", "exact_dup", "near_dup", "filtered"}
    # the gate actually gates and the corpus isn't empty
    assert (disp["status"] == "kept").sum() > 0
    assert (disp["status"] == "filtered").sum() > 0
    # clean_corpus == the kept set
    kept = set(disp[disp["status"] == "kept"]["doc_id"])
    assert {
        r["doc_id"] for r in clean_corpus(docs).select("doc_id").collect()
    } == kept


def test_deterministic_sample_stable_and_proportional(spark):
    from distributed_graph_analytics_spark.functions.pipeline import (
        deterministic_sample,
    )

    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    a = {r["doc_id"] for r in deterministic_sample(docs, 0.3).collect()}
    b = {r["doc_id"] for r in deterministic_sample(docs, 0.3).collect()}
    assert a == b  # rerun-stable
    n = docs.count()
    assert 0.15 * n < len(a) < 0.45 * n  # roughly proportional
    # nested property: a smaller fraction selects a subset
    c = {r["doc_id"] for r in deterministic_sample(docs, 0.1).collect()}
    assert c <= a


def test_stratified_sample_drops_unlisted_strata(spark):
    from distributed_graph_analytics_spark.functions.pipeline import (
        stratified_sample,
    )

    rows = [(i, "en" if i % 2 else "de") for i in range(200)]
    df = spark.createDataFrame(rows, ["doc_id", "lang"])
    out = stratified_sample(
        df, fractions={"en": 1.0}, strata_col="lang"
    ).collect()
    assert len(out) == 100  # every 'en', no 'de'
    assert all(r["lang"] == "en" for r in out)


def test_duplicate_clusters_transitive(spark):
    from distributed_graph_analytics_spark.functions.pipeline import (
        duplicate_clusters,
    )

    base = (
        "the quick brown fox jumps over the lazy dog and runs far away "
        "to the green hills where rivers flow gently through the valley "
        "and birds sing in the tall trees every single morning in spring"
    )
    rows = [
        (1, base),
        (2, base + " extra"),          # ~ 1
        (3, base + " extra words"),    # ~ 2 (and transitively 1)
        (10, "completely different text about winter snow and ice and "
             "mountains covered in white powder where skiers race down "
             "the steep slopes under a pale blue morning sky in january"),
    ]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    got = {
        r["doc_id"]: r["cluster"]
        for r in duplicate_clusters(df, jaccard_threshold=0.7).collect()
    }
    # 1,2,3 form ONE cluster labeled by the max member; 10 is absent
    assert set(got) == {1, 2, 3}
    assert set(got.values()) == {3}
    # cluster diameter bound the driver oracle relies on (<= 6 rounds)
    # holds trivially here; the sf0.01 clusters are pairs/triples too
