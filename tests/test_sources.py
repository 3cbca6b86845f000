import hashlib

import duckdb
import pytest

from distributed_graph_analytics_spark.sources.edges import (
    canonicalize_edges,
    decode_delimiter,
    dense_string_ids,
    encode_string_edge_list,
    merge_parallel_edges,
    read_edge_list,
    reverse_duplicate,
    vertices_of,
)
from distributed_graph_analytics_spark.sources.repo_table import (
    EDGE_BUILD_ORACLE_SQL,
    edges_from_repo_table,
    ingest_repo_table,
    synthesize_repo_table,
)

SF_DIR = "/root/testdata/sf0.001"


def test_decode_delimiter():
    assert decode_delimiter(",") == ","
    assert decode_delimiter("\\x01") == "\x01"
    assert decode_delimiter("\t") == "\t"


def test_read_edge_list_weights_and_defaults(spark, tmp_path):
    p = tmp_path / "edges.csv"
    p.write_text("1,2\n2,3,5\n 3 , 4 , 7 \n")
    df = read_edge_list(spark, str(p))
    rows = {(r["src"], r["dst"]): r["weight"] for r in df.collect()}
    assert rows == {(1, 2): 1, (2, 3): 5, (3, 4): 7}


def test_read_edge_list_hex_delimiter_and_reverse(spark, tmp_path):
    p = tmp_path / "edges.hive"
    p.write_text("1\x012\n2\x013\x019\n")
    df = read_edge_list(spark, str(p), delimiter="\\x01", reverse=True)
    rows = sorted((r["src"], r["dst"], r["weight"]) for r in df.collect())
    assert rows == [(1, 2, 1), (2, 1, 1), (2, 3, 9), (3, 2, 9)]


def test_read_edge_list_ignore_third(spark, tmp_path):
    p = tmp_path / "e.csv"
    p.write_text("1,2,99\n")
    df = read_edge_list(spark, str(p), ignore_third_column=True)
    assert df.collect()[0]["weight"] == 1


def test_vertices_and_merge(spark):
    df = spark.createDataFrame(
        [(1, 2, 1), (1, 2, 3), (2, 1, 1)], "src long, dst long, weight long"
    )
    assert {r["id"] for r in vertices_of(df).collect()} == {1, 2}
    merged = {(r["src"], r["dst"]): r["weight"] for r in merge_parallel_edges(df).collect()}
    assert merged == {(1, 2): 4, (2, 1): 1}
    canon = {(r["src"], r["dst"]): r["weight"] for r in canonicalize_edges(df).collect()}
    assert canon == {(1, 2): 5}
    assert reverse_duplicate(df).count() == 6


def test_dense_string_ids_deterministic_and_dense(spark):
    names = spark.createDataFrame([(f"n{i:03d}",) for i in range(57)], "name string")
    ids1 = {r["name"]: r["id"] for r in dense_string_ids(names).collect()}
    ids2 = {r["name"]: r["id"] for r in dense_string_ids(names).collect()}
    assert ids1 == ids2  # deterministic
    assert sorted(ids1.values()) == list(range(57))  # dense 0..n-1
    # order-preserving within the sort order
    assert ids1["n000"] < ids1["n056"]


def test_encode_string_edge_list(spark):
    df = spark.createDataFrame(
        [("a", "b"), ("b", "c"), ("a", "c")], "src string, dst string"
    )
    enc, dictionary = encode_string_edge_list(df)
    d = {r["name"]: r["id"] for r in dictionary.collect()}
    got = {(r["src"], r["dst"]) for r in enc.collect()}
    assert got == {(d["a"], d["b"]), (d["b"], d["c"]), (d["a"], d["c"])}
    assert enc.schema["weight"].dataType.simpleString() == "bigint"


def test_ingest_sha256_invariant(spark):
    repo = synthesize_repo_table(spark, SF_DIR)
    ingested = ingest_repo_table(repo)
    sample = (
        repo.limit(50).collect(),
        ingested.limit(50).collect(),
    )
    # per-row invariant: sha256(content) preserved through ingest
    raw = {
        (r["repo"], r["path"], r["commit"]): hashlib.sha256(
            r["content"].encode()
        ).hexdigest()
        for r in sample[0]
    }
    for r in sample[1]:
        assert r["content_sha256"] == raw[(r["repo"], r["path"], r["commit"])]
        assert f"f{r['file_id']}." in r["path"]


def test_edge_build_matches_duckdb_oracle(spark):
    got = (
        edges_from_repo_table(synthesize_repo_table(spark, SF_DIR))
        .orderBy("src", "dst")
        .collect()
    )
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW lineitem AS SELECT * FROM read_parquet('{SF_DIR}/lineitem.parquet')"
    )
    want = con.execute(EDGE_BUILD_ORACLE_SQL + " ORDER BY 1, 2").fetchall()
    assert [(r["src"], r["dst"], r["weight"]) for r in got] == [
        (int(a), int(b), int(c)) for a, b, c in want
    ]
    assert len(got) > 100


def test_read_repo_table_catalog_path(spark):
    from distributed_graph_analytics_spark.sources.repo_table import (
        edges_from_repo_table,
        read_repo_table,
        synthesize_repo_table,
    )

    synthesize_repo_table(spark, "/root/testdata/sf0.001").createOrReplaceTempView(
        "repos_view"
    )
    df = read_repo_table(spark, "repos_view")
    assert df.columns == ["repo", "path", "commit", "lang", "content"]
    # the catalog path feeds the same edge builder
    assert edges_from_repo_table(df).count() > 0

    spark.createDataFrame([(1,)], ["x"]).createOrReplaceTempView("bad_view")
    import pytest as _pytest

    with _pytest.raises(ValueError, match="missing required columns"):
        read_repo_table(spark, "bad_view")
