"""Link-prediction scores: hand-computed fixture + a brute-force
python twin on the testdata graph."""

import collections
import math

from distributed_graph_analytics_spark.operators.link_prediction import (
    common_neighbor_scores,
)


def brute_scores(pairs, min_common):
    adj = collections.defaultdict(set)
    for u, v in pairs:
        adj[u].add(v)
        adj[v].add(u)
    out = {}
    verts = sorted(adj)
    for i, u in enumerate(verts):
        for v in verts[i + 1:]:
            if v in adj[u]:
                continue
            cm = adj[u] & adj[v]
            if len(cm) < min_common:
                continue
            aa = sum(1.0 / math.log(len(adj[w])) for w in cm)
            jac = len(cm) / len(adj[u] | adj[v])
            out[(u, v)] = (len(cm), jac, aa)
    return out


def test_fixture_scores_exact(spark):
    # 1-2 both adjacent to {3,4}; 1-2 NOT adjacent -> candidate with
    # common=2; deg(3)=deg(4)=2 -> adamic_adar = 2/ln(2)
    pairs = [(1, 3), (1, 4), (2, 3), (2, 4)]
    df = spark.createDataFrame(pairs, ["src", "dst"])
    got = common_neighbor_scores(df, min_common=2).collect()
    assert len(got) == 2  # (1,2) and (3,4) are symmetric candidates
    by_pair = {(r["u"], r["v"]): r for r in got}
    r = by_pair[(1, 2)]
    assert r["common"] == 2
    assert math.isclose(r["jaccard"], 2 / 2)  # N(1)∪N(2) = {3,4}
    assert math.isclose(r["adamic_adar"], 2 / math.log(2), rel_tol=1e-12)


def test_testdata_matches_brute_force(spark):
    from __spark_entry__ import load_edges

    e = load_edges(spark, "/root/testdata/sf0.001")
    pairs = [(r["src"], r["dst"]) for r in e.select("src", "dst").collect()]
    got = {
        (r["u"], r["v"]): (r["common"], r["jaccard"], r["adamic_adar"])
        for r in common_neighbor_scores(e, min_common=24).collect()
    }
    want = brute_scores(pairs, min_common=24)
    assert set(got) == set(want)
    assert len(got) > 0
    for k, (c, j, a) in want.items():
        gc, gj, ga = got[k]
        assert gc == c
        assert math.isclose(gj, j, rel_tol=1e-9)
        assert math.isclose(ga, a, rel_tol=1e-9)


def test_max_apex_degree_drops_hub_wedges(spark):
    # star hub 0 connected to 1..5 plus the 1-2 edge: with the hub
    # allowed, (1,2) is adjacent (skipped) but (3,4),(3,5),(4,5),(1,3)...
    # get common=1 via the hub; capping apex degree below 5 removes them
    pairs = [(0, i) for i in range(1, 6)] + [(1, 2)]
    df = spark.createDataFrame(pairs, ["src", "dst"])
    with_hub = common_neighbor_scores(df, min_common=1).count()
    without = common_neighbor_scores(
        df, min_common=1, max_apex_degree=4
    ).count()
    assert with_hub > 0
    assert without < with_hub


def test_default_hub_cut_is_on(spark):
    """The stop-word cut defaults ON (max_apex_degree=10_000): a
    super-hub above the cut contributes NO wedges by default — the
    deg(w)^2 cartesian a 100-TB co-occurrence hub would otherwise
    explode into. None is the explicit opt-out (covered by the brute
    twin above on hub-free graphs)."""
    from distributed_graph_analytics_spark.operators.link_prediction import (
        DEFAULT_MAX_APEX_DEGREE,
    )

    assert DEFAULT_MAX_APEX_DEGREE == 10_000
    star = [(0, i) for i in range(1, DEFAULT_MAX_APEX_DEGREE + 3)]
    df = spark.createDataFrame(star, ["src", "dst"])
    # every candidate pair's only wedge runs through the super-hub
    assert common_neighbor_scores(df, min_common=1).count() == 0
