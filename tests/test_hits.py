"""HITS hubs/authorities: numpy twin replay, structural sanity on
known graphs, all-vertex coverage."""

import collections


def _twin(pairs, iterations):
    verts = sorted({v for e in pairs for v in e})
    out = collections.defaultdict(set)
    for u, v in pairs:
        if u != v:
            out[u].add(v)
    hub = {v: 1.0 for v in verts}
    auth = {}
    for _ in range(iterations):
        auth = {v: 0.0 for v in verts}
        for u in out:
            for v in out[u]:
                auth[v] += hub[u]
        tot = sum(auth.values())
        auth = {v: x / tot for v, x in auth.items()}
        hub = {v: 0.0 for v in verts}
        for u in out:
            for v in out[u]:
                hub[u] += auth[v]
        tot = sum(hub.values())
        hub = {v: x / tot for v, x in hub.items()}
    return hub, auth


def test_hits_matches_python_twin(spark):
    from distributed_graph_analytics_spark.operators.hits import hits

    pairs = [(1, 2), (1, 3), (2, 3), (4, 3), (3, 5), (5, 1), (4, 2)]
    df = spark.createDataFrame(
        [(u, v, 1) for u, v in pairs], "src long, dst long, weight long"
    )
    got = {r["id"]: (r["hub"], r["authority"]) for r in hits(df, 10).collect()}
    hub, auth = _twin(pairs, 10)
    assert set(got) == set(hub)
    for v in hub:
        assert abs(got[v][0] - hub[v]) < 1e-9
        assert abs(got[v][1] - auth[v]) < 1e-9


def test_hits_star_graph(spark):
    from distributed_graph_analytics_spark.operators.hits import hits

    # all spokes point at the center: center is the only authority
    # (authority 1.0), spokes are equal hubs, center's hub is 0
    df = spark.createDataFrame(
        [(i, 99, 1) for i in range(1, 6)], "src long, dst long, weight long"
    )
    got = {r["id"]: r for r in hits(df, 5).collect()}
    assert abs(got[99]["authority"] - 1.0) < 1e-12
    assert got[99]["hub"] == 0.0
    for i in range(1, 6):
        assert abs(got[i]["hub"] - 0.2) < 1e-12
        assert got[i]["authority"] == 0.0


def test_hits_parallel_edges_and_self_loops_ignored(spark):
    from distributed_graph_analytics_spark.operators.hits import hits

    base = [(1, 2, 1), (2, 3, 1)]
    messy = base + [(1, 2, 5), (1, 1, 9)]
    a = sorted(map(tuple, hits(
        spark.createDataFrame(base, "src long, dst long, weight long"), 4
    ).collect()))
    b = sorted(map(tuple, hits(
        spark.createDataFrame(messy, "src long, dst long, weight long"), 4
    ).collect()))
    assert a == b


def _wpr_twin(pairs_w, iterations=10, damping=0.85):
    import collections

    out = collections.defaultdict(dict)
    verts = set()
    for u, v, w in pairs_w:
        if u != v:
            out[u][v] = out[u].get(v, 0) + w
            verts |= {u, v}
    n = len(verts)
    rank = {v: 1.0 / n for v in verts}
    base = (1.0 - damping) / n
    for _ in range(iterations):
        msg = {v: 0.0 for v in verts}
        for u in out:
            sw = sum(out[u].values())
            for v, w in out[u].items():
                msg[v] += rank[u] * w / sw
        rank = {v: base + damping * msg[v] for v in verts}
    return rank


def test_weighted_pagerank_twin(spark):
    from distributed_graph_analytics_spark.operators.hits import weighted_pagerank

    pairs = [(1, 2, 3), (1, 3, 1), (2, 3, 2), (3, 1, 5), (4, 1, 1), (1, 2, 2)]
    df = spark.createDataFrame(pairs, "src long, dst long, weight long")
    got = {r["id"]: r["rank"] for r in weighted_pagerank(df, 10).collect()}
    want = _wpr_twin(pairs, 10)
    assert set(got) == set(want)
    for v in want:
        assert abs(got[v] - want[v]) < 1e-9


def test_weighted_pagerank_uniform_weights_match_unweighted_split(spark):
    from distributed_graph_analytics_spark.operators.hits import weighted_pagerank

    # equal weights: the proportional split degenerates to rank/out_deg
    pairs = [(1, 2, 7), (1, 3, 7), (2, 3, 7), (3, 1, 7)]
    df = spark.createDataFrame(pairs, "src long, dst long, weight long")
    got = {r["id"]: r["rank"] for r in weighted_pagerank(df, 6).collect()}
    want = _wpr_twin([(u, v, 1) for u, v, _ in pairs], 6)
    for v in want:
        assert abs(got[v] - want[v]) < 1e-12
