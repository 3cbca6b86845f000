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
