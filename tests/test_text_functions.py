import hashlib

from pyspark.sql import functions as F

from distributed_graph_analytics_spark.functions.text import (
    analyze_documents,
    fingerprint_documents,
)

SF_DIR = "/root/testdata/sf0.001"


def docs(spark):
    return spark.read.parquet(f"{SF_DIR}/documents.parquet")


def test_analyze_documents_schema_and_ranges(spark):
    out = analyze_documents(docs(spark)).collect()
    assert len(out) == 500
    for r in out[:50]:
        assert r["ws_tokens"] >= 1
        assert r["bpe_tokens"] >= r["ws_tokens"] - 1  # regex splits punctuation too
        assert 0.0 <= r["quality"] <= 1.0
        assert r["lang_guess"] in ("en", "de", "fr", "es", "und")


def test_token_count_exact(spark):
    df = spark.createDataFrame([(1, "hello world, foo bar!")], "doc_id long, text string")
    r = analyze_documents(df).collect()[0]
    assert r["ws_tokens"] == 4
    # hello/world/,/foo/bar/! → 6
    assert r["bpe_tokens"] == 6


def test_fingerprint_stability_and_normalization(spark):
    df = spark.createDataFrame(
        [(1, "Hello  World"), (2, "hello world"), (3, "different")],
        "doc_id long, text string",
    )
    out = {r["doc_id"]: (r["fingerprint"], r["content_sha256"]) for r in fingerprint_documents(df).collect()}
    assert out[1] == out[2]  # whitespace/case normalized
    assert out[1] != out[3]
    assert out[1][1] == hashlib.sha256(b"hello world").hexdigest()


def test_quality_monotonic_on_garbage(spark):
    df = spark.createDataFrame(
        [
            (1, "the quick brown fox jumps over the lazy dog and runs to the hills in a day"),
            (2, "!!! ### $$$ %%% ^^^ &&&"),
        ],
        "doc_id long, text string",
    )
    q = {r["doc_id"]: r["quality"] for r in analyze_documents(df).collect()}
    assert q[1] > q[2]


def test_repetition_ratio(spark):
    from distributed_graph_analytics_spark.functions.text import (
        repetition_ratio,
    )
    from pyspark.sql import functions as F

    rows = [
        (1, "a b c d e f"),          # all 3-grams distinct -> 0
        (2, "x y z x y z x y z"),    # looped text -> high
        (3, "a b"),                  # shorter than n -> 0
        (4, ""),                     # empty -> 0
    ]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    got = {
        r["doc_id"]: r["rep"]
        for r in df.select(
            "doc_id", F.round(repetition_ratio(F.col("text")), 6).alias("rep")
        ).collect()
    }
    assert got[1] == 0.0
    # 7 grams total, 3 distinct ("x y z","y z x","z x y") -> 1 - 3/7
    assert abs(got[2] - (1 - 3 / 7)) < 1e-6
    assert got[3] == 0.0
    assert got[4] == 0.0


def test_scrub_pii(spark):
    from distributed_graph_analytics_spark.functions.text import scrub_pii
    from pyspark.sql import functions as F

    rows = [
        (1, "reach me at a.b@x.io or +1-555-123-4567, server 10.0.0.1"),
        (2, "no pii here"),
    ]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    got = {
        r["doc_id"]: r
        for r in df.select("doc_id", scrub_pii(F.col("text")).alias("s"))
        .select("doc_id", "s.*")
        .collect()
    }
    assert got[1]["n_email"] == 1
    assert got[1]["n_phone"] == 1
    assert got[1]["n_ipv4"] == 1
    assert "<EMAIL>" in got[1]["clean"]
    assert "a.b@x.io" not in got[1]["clean"]
    assert "555" not in got[1]["clean"]
    assert got[2]["clean"] == "no pii here"
    assert got[2]["n_email"] == got[2]["n_phone"] == got[2]["n_ipv4"] == 0


def test_tfidf_top_terms(spark):
    from distributed_graph_analytics_spark.functions.text import tfidf_top_terms

    docs = spark.createDataFrame(
        [
            (1, "the cat sat on the mat"),
            (2, "the dog sat on the log"),
            (3, "cat and dog and bird"),
        ],
        "doc_id long, text string",
    )
    rows = tfidf_top_terms(docs, k=2, min_term_len=3).collect()
    by_doc = {}
    for r in rows:
        by_doc.setdefault(r["doc_id"], []).append(r)
    # every doc gets <= k rows, ranks are 1..k with descending scores
    for doc_id, rs in by_doc.items():
        rs.sort(key=lambda r: r["rank"])
        assert [r["rank"] for r in rs] == list(range(1, len(rs) + 1))
        assert all(
            rs[i]["score"] >= rs[i + 1]["score"] for i in range(len(rs) - 1)
        )
    # doc 1's most characteristic term: "mat" (df=1) over "the"/"sat" (df>=2);
    # "cat" also df=2. Terms < 3 chars ("on") are excluded entirely.
    top1 = by_doc[1][0]
    assert top1["term"] == "mat"
    # exact linear-IDF score: tf=1, doclen=5 (the cat sat the mat), N=3, df=1
    assert abs(top1["score"] - (1 / 5) * (3 / 1)) < 1e-15
    assert all(len(r["term"]) >= 3 for r in rows)


def test_tfidf_tiebreak_is_term_ascending(spark):
    from distributed_graph_analytics_spark.functions.text import tfidf_top_terms

    # two terms with identical tf and df tie on score -> term asc order
    docs = spark.createDataFrame(
        [(1, "zebra apple"), (2, "zebra apple")], "doc_id long, text string"
    )
    rows = sorted(
        tfidf_top_terms(docs, k=2).collect(), key=lambda r: (r["doc_id"], r["rank"])
    )
    assert [r["term"] for r in rows] == ["apple", "zebra", "apple", "zebra"]
