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
