from tests.conftest import edges_df
from tests import fixture_graphs as G
from tests.oracles import triangle_oracle

from distributed_graph_analytics_spark.operators.triangle import (
    triangle_count,
    triangle_count_per_vertex,
)


def test_single_triangle(spark):
    assert triangle_count(edges_df(spark, G.TRI_CYCLE)) == 1


def test_two_cliques(spark):
    edges = edges_df(spark, G.TWO_CLIQUES_BRIDGED)
    assert triangle_count(edges) == G.TWO_CLIQUES_TRIANGLES
    assert triangle_count(edges) == triangle_oracle(G.TWO_CLIQUES_BRIDGED)


def test_oracle_on_messy_graph(spark):
    # duplicates, reverse edges, self loops
    messy = G.PR_EQUAL3 + [(1, 1), (3, 2), (2, 3)] + G.WCC_BIG
    assert triangle_count(edges_df(spark, messy)) == triangle_oracle(messy)


def test_per_vertex_counts(spark):
    edges = edges_df(spark, G.TWO_CLIQUES_BRIDGED)
    got = {r["id"]: r["triangles"] for r in triangle_count_per_vertex(edges).collect()}
    # clique members: C(4,2)=6 each; bridge vertex 6: 0
    for v in range(1, 6):
        assert got[v] == 6
    assert got[6] == 0
    # sum of per-vertex counts = 3 * total triangles
    assert sum(got.values()) == 3 * G.TWO_CLIQUES_TRIANGLES


def test_self_loop_only_vertex_gets_zero_row(spark):
    df = spark.createDataFrame(
        [(1, 1, 1), (2, 3, 1)], "src long, dst long, weight long"
    )
    got = {r["id"]: r["triangles"] for r in triangle_count_per_vertex(df).collect()}
    assert got == {1: 0, 2: 0, 3: 0}


def test_clustering_coefficient(spark):
    from distributed_graph_analytics_spark.operators.triangle import (
        clustering_coefficient,
    )

    # triangle 1-2-3 plus pendant 3-4: cc = 1, 1, 1/3, 0
    df = spark.createDataFrame(
        [(1, 2, 1), (2, 3, 1), (1, 3, 1), (3, 4, 1)],
        "src long, dst long, weight long",
    )
    rows = {r["id"]: r for r in clustering_coefficient(df).collect()}
    assert {v: rows[v]["degree"] for v in rows} == {1: 2, 2: 2, 3: 3, 4: 1}
    assert {v: rows[v]["triangles"] for v in rows} == {1: 1, 2: 1, 3: 1, 4: 0}
    assert abs(rows[1]["cc"] - 1.0) < 1e-12
    assert abs(rows[2]["cc"] - 1.0) < 1e-12
    assert abs(rows[3]["cc"] - 1.0 / 3.0) < 1e-12
    assert rows[4]["cc"] == 0.0


def test_clustering_coefficient_clique(spark):
    from distributed_graph_analytics_spark.operators.triangle import (
        clustering_coefficient,
    )

    edges = edges_df(spark, G.TWO_CLIQUES_BRIDGED)
    rows = {r["id"]: r for r in clustering_coefficient(edges).collect()}
    # interior clique members (not on the bridge): cc = 1
    full = [v for v in rows if rows[v]["degree"] == 4 and rows[v]["triangles"] == 6]
    assert full and all(abs(rows[v]["cc"] - 1.0) < 1e-12 for v in full)
    # bridge vertex: connects the two cliques, no closing edges
    assert any(rows[v]["cc"] == 0.0 and rows[v]["triangles"] == 0 for v in rows)


def test_graph_summary_fixture(spark):
    from distributed_graph_analytics_spark.operators.stats import graph_summary

    # triangle 1-2-3 plus pendant 3-4: V=4, E=4, degrees 2,2,3,1
    df = spark.createDataFrame(
        [(1, 2), (2, 3), (1, 3), (3, 4)], ["src", "dst"]
    )
    r = graph_summary(df).collect()[0]
    assert r["n_vertices"] == 4
    assert r["n_edges"] == 4
    assert r["max_degree"] == 3
    # wedges = sum d(d-1)/2 = (1+1+3+0) = 5; one triangle; C = 3/5
    assert r["wedges"] == 5
    assert r["triangles"] == 1
    assert abs(r["global_clustering"] - 0.6) < 1e-9
    assert abs(r["avg_degree"] - 2.0) < 1e-9


def test_graph_summary_degenerate_inputs(spark):
    from distributed_graph_analytics_spark.operators.stats import graph_summary

    # single edge: 0 wedges -> clustering undefined (NULL), no crash
    single = spark.createDataFrame([(1, 2, 1)], "src long, dst long, weight long")
    r = graph_summary(single).collect()[0]
    assert r["n_vertices"] == 2 and r["wedges"] == 0
    assert r["global_clustering"] is None


def test_degree_assortativity_known_values(spark):
    from distributed_graph_analytics_spark.operators.stats import (
        degree_assortativity,
    )

    # star: every edge joins the hub (deg n) to a leaf (deg 1) -> r = -1
    star = spark.createDataFrame(
        [(i, 99, 1) for i in range(1, 4)], "src long, dst long, weight long"
    )
    r = degree_assortativity(star).collect()[0]
    assert r["m"] == 3 and abs(r["assortativity"] + 1.0) < 1e-12

    # path 1-2-3: also perfectly disassortative (r = -1)
    path = spark.createDataFrame(
        [(1, 2, 1), (2, 3, 1)], "src long, dst long, weight long"
    )
    assert abs(degree_assortativity(path).collect()[0]["assortativity"] + 1.0) < 1e-12

    # cycle: degree-regular -> denominator 0 -> NULL
    cyc = spark.createDataFrame(
        [(1, 2, 1), (2, 3, 1), (3, 1, 1)], "src long, dst long, weight long"
    )
    assert degree_assortativity(cyc).collect()[0]["assortativity"] is None


def test_degree_assortativity_python_twin(spark):
    from distributed_graph_analytics_spark.operators.stats import (
        degree_assortativity,
    )
    import collections

    pairs = [(1, 2), (2, 3), (1, 3), (3, 4), (4, 5), (5, 6), (4, 6), (6, 7)]
    deg = collections.Counter()
    for u, v in pairs:
        deg[u] += 1
        deg[v] += 1
    m = len(pairs)
    sjk = sum(deg[u] * deg[v] for u, v in pairs)
    sd = sum(deg[u] + deg[v] for u, v in pairs)
    ss = sum(deg[u] ** 2 + deg[v] ** 2 for u, v in pairs)
    mean_deg = sd / (2.0 * m)
    want = (sjk / m - mean_deg**2) / (ss / (2.0 * m) - mean_deg**2)
    df = spark.createDataFrame(
        [(u, v, 1) for u, v in pairs], "src long, dst long, weight long"
    )
    r = degree_assortativity(df).collect()[0]
    assert (r["m"], r["sum_jk"], r["sum_deg"], r["sum_sq"]) == (m, sjk, sd, ss)
    assert abs(r["assortativity"] - round(want, 9)) < 1e-12
