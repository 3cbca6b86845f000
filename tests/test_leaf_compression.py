import pytest

from tests.conftest import edges_df
from tests import fixture_graphs as G

from distributed_graph_analytics_spark.operators.leaf_compression import (
    leaf_compression,
)


def surviving(spark, edge_list):
    verts, edges, stats = leaf_compression(edges_df(spark, edge_list))
    return {r["id"] for r in verts.collect()}, stats


@pytest.mark.parametrize(
    "edge_list,expect",
    [
        (G.LC_CHAIN, G.LC_CHAIN_EXPECT),
        (G.LC_CORE3, G.LC_CORE3_EXPECT),
        (G.LC_CORE5, G.LC_CORE5_EXPECT),
        (G.LC_MULTI, G.LC_MULTI_EXPECT),
    ],
)
def test_leaf_compression_exact(spark, edge_list, expect):
    got, stats = surviving(spark, edge_list)
    assert got == expect
    assert stats.converged


from distributed_graph_analytics_spark.operators.leaf_compression import (  # noqa: E402
    leaf_compression_giraph,
)
from tests.oracles import giraph_lc_oracle  # noqa: E402


def run_giraph(spark, edge_list):
    verts, edges, stats = leaf_compression_giraph(edges_df(spark, edge_list))
    return (
        {r["id"]: r["value"] for r in verts.collect()},
        {(r["src"], r["dst"]) for r in edges.collect()},
        stats,
    )


@pytest.mark.parametrize(
    "edge_list,expect_ids,expect_values",
    [
        (G.LC_GIRAPH_GOOD, G.LC_GIRAPH_GOOD_EXPECT, G.LC_GIRAPH_GOOD_VALUES),
        (G.LC_GIRAPH_PAIRS, G.LC_GIRAPH_PAIRS_EXPECT, G.LC_GIRAPH_PAIRS_VALUES),
    ],
)
def test_giraph_lc_reference_goldens(spark, edge_list, expect_ids, expect_values):
    values, edges, stats = run_giraph(spark, edge_list)
    assert set(values) == expect_ids
    assert values == expect_values
    assert stats.converged


def test_giraph_lc_text_nodes_dangling_edge(spark):
    # Jane keeps a dangling edge to deleted Gregory (Giraph parity)
    values, edges, stats = run_giraph(spark, G.LC_GIRAPH_TEXT)
    assert set(values) == G.LC_GIRAPH_TEXT_EXPECT
    assert edges == G.LC_GIRAPH_TEXT_EDGES
    assert values[5] == 1  # Straxx absorbed Gregory


@pytest.mark.parametrize(
    "edge_list",
    [G.LC_GIRAPH_GOOD, G.LC_GIRAPH_PAIRS, G.LC_GIRAPH_TEXT, G.LC_CORE5, G.LC_MULTI],
)
def test_giraph_lc_matches_python_twin(spark, edge_list):
    values, edges, _ = run_giraph(spark, edge_list)
    o_values, o_edges = giraph_lc_oracle(edge_list)
    assert values == o_values
    assert edges == o_edges
