import math

import pytest

from tests.conftest import edges_df
from tests import fixture_graphs as G
from tests.louvain_oracle import louvain_oracle

from distributed_graph_analytics_spark.operators.louvain import louvain

# 9-node README example (dga-graphx/README.md:108-123, examples/small_edges.tsv):
# level 0 → communities {4: {1..5}, 8: {6..9}}, Q = 0.4134948096885813
EXAMPLE9 = [
    (1, 2), (1, 3), (1, 4), (1, 5), (1, 6), (2, 3), (2, 4), (2, 5),
    (3, 4), (3, 5), (4, 5), (6, 7), (6, 8), (6, 9), (7, 8), (7, 9), (8, 9),
]


def run_louvain(spark, edge_list):
    res = louvain(edges_df(spark, edge_list))
    level0 = {r["id"]: r["community"] for r in res.level0.collect()}
    final = {r["id"]: r["community"] for r in res.final.collect()}
    return res, level0, final


def test_example9_reference_golden(spark):
    res, level0, final = run_louvain(spark, EXAMPLE9)
    assert level0 == {1: 4, 2: 4, 3: 4, 4: 4, 5: 4, 6: 8, 7: 8, 8: 8, 9: 8}
    assert math.isclose(res.levels[0].q, 0.4134948096885813, rel_tol=1e-9)


@pytest.mark.parametrize(
    "edge_list",
    [G.LOUVAIN_CHAIN, G.LOUVAIN_TWO_HUBS, EXAMPLE9],
    ids=["chain", "two_hubs", "example9"],
)
def test_louvain_matches_oracle(spark, edge_list):
    el = [(e[0], e[1], e[2] if len(e) > 2 else 1) for e in edge_list]
    want_l0, want_final, want_qs = louvain_oracle(el)
    res, level0, final = run_louvain(spark, edge_list)
    assert level0 == want_l0
    assert final == want_final
    assert len(res.levels) == len(want_qs)
    for lv, wq in zip(res.levels, want_qs):
        assert math.isclose(lv.q, wq, rel_tol=1e-9, abs_tol=1e-12), (lv.level, lv.q, wq)


def test_two_hubs_reference_expected_sizes(spark):
    # LouvainCoreTest.scala testLouvainMultipleCommunities golden:
    # communities {1: 2, 4: 2, 5: 2, 10: 7} (level-0 labels)
    _, level0, _ = run_louvain(spark, G.LOUVAIN_TWO_HUBS)
    sizes = {}
    for c in level0.values():
        sizes[c] = sizes.get(c, 0) + 1
    assert sizes == {1: 2, 4: 2, 5: 2, 10: 7}


def test_multi_component_reference_expected_sizes(spark):
    # LouvainCoreTest.scala testLouvainMultipleComponents golden (level 0)
    el = [(e[0], e[1], 1) for e in G.LC_MULTI]
    _, level0, _ = run_louvain(spark, el)
    sizes = {}
    for c in level0.values():
        sizes[c] = sizes.get(c, 0) + 1
    assert sizes == {
        13: 2, 15: 2, 4: 2, 25: 3, 11: 3, 0: 2, 655: 2, 1: 3, 33: 2, 7: 3, 44: 2
    }
