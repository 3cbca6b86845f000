"""Deterministic random walks: python-twin replay (sha2), edge
validity, reproducibility across hash families."""

import collections
import hashlib

from distributed_graph_analytics_spark.operators.walks import random_walks


def _sha60(s):
    return int(hashlib.sha256(s.encode()).hexdigest()[:15], 16)


def _adj(pairs):
    adj = collections.defaultdict(set)
    for u, v in pairs:
        adj[u].add(v)
        adj[v].add(u)
    return adj


def _twin(pairs, walk_length, seed):
    adj = _adj(pairs)
    want = {}
    for v0 in adj:
        cur = v0
        want[(v0, 0)] = v0
        for t in range(1, walk_length + 1):
            nbrs = sorted(adj[cur])
            cur = nbrs[_sha60(f"{v0}:{t}:{seed}") % len(nbrs)]
            want[(v0, t)] = cur
    return want


def test_walks_replay_sha2_twin(spark):
    from __spark_entry__ import load_edges

    e = load_edges(spark, "/root/testdata/sf0.001")
    pairs = [(r["src"], r["dst"]) for r in e.select("src", "dst").collect()]
    got = {
        (r["walk_id"], r["step"]): r["vertex"]
        for r in random_walks(e, walk_length=4, hash_family="sha2").collect()
    }
    assert got == _twin(pairs, 4, 42)


def test_walk_steps_follow_edges_any_family(spark):
    # xxhash64 (production default) walks aren't replayed by the twin,
    # but every consecutive pair must still be a graph edge
    pairs = [(1, 2), (2, 3), (3, 4), (4, 1), (1, 3)]
    df = spark.createDataFrame(pairs, ["src", "dst"])
    adj = _adj(pairs)
    rows = random_walks(df, walk_length=6).collect()
    by_walk = collections.defaultdict(dict)
    for r in rows:
        by_walk[r["walk_id"]][r["step"]] = r["vertex"]
    assert len(by_walk) == 4
    for wid, steps in by_walk.items():
        assert steps[0] == wid
        assert len(steps) == 7
        for t in range(1, 7):
            assert steps[t] in adj[steps[t - 1]]


def _n2v_twin(pairs, walk_length, p, q, seed):
    """Python twin of node2vec_walks with the sha2 family: step 1
    uniform; steps >= 2 integer-weighted cumulative draw in id order."""
    adj = _adj(pairs)
    want = {}
    for v0 in adj:
        want[(v0, 0)] = v0
        nbrs = sorted(adj[v0])
        cur = nbrs[_sha60(f"{v0}:1:{seed}") % len(nbrs)]
        prev = v0
        want[(v0, 1)] = cur
        for t in range(2, walk_length + 1):
            cands = sorted(adj[cur])
            wts = [
                q if x == prev else (p * q if x in adj[prev] else p)
                for x in cands
            ]
            r = _sha60(f"{v0}:{t}:{seed}") % sum(wts)
            cum = 0
            for x, w in zip(cands, wts):
                if cum <= r < cum + w:
                    prev, cur = cur, x
                    break
                cum += w
            want[(v0, t)] = cur
    return want


def test_node2vec_replay_sha2_twin(spark):
    from distributed_graph_analytics_spark.operators.walks import node2vec_walks

    pairs = [(1, 2), (2, 3), (3, 4), (4, 1), (1, 3), (4, 5), (5, 6), (6, 4)]
    df = spark.createDataFrame(pairs, ["src", "dst"])
    got = {
        (r["walk_id"], r["step"]): r["vertex"]
        for r in node2vec_walks(
            df, walk_length=5, p=2, q=3, seed=42, hash_family="sha2"
        ).collect()
    }
    assert got == _n2v_twin(pairs, 5, 2, 3, 42)


def test_node2vec_uniform_degenerates_to_random_walks(spark):
    # p=q=1: every candidate weight is 1, so the cumulative draw equals
    # the uniform index draw and walks match random_walks exactly
    from distributed_graph_analytics_spark.operators.walks import node2vec_walks

    pairs = [(1, 2), (2, 3), (3, 1), (3, 4), (4, 5)]
    df = spark.createDataFrame(pairs, ["src", "dst"])
    a = sorted(
        map(tuple, node2vec_walks(df, walk_length=4, p=1, q=1, seed=9).collect())
    )
    b = sorted(map(tuple, random_walks(df, walk_length=4, seed=9).collect()))
    assert a == b


def test_node2vec_return_bias(spark):
    # path graph 1-2-3: from cur=2 the candidates are {1 (=prev), 3}.
    # With p=1, q=100 the scaled weights are (return=100, out=1): the
    # walker almost always backtracks; with p=100, q=1 (return=1,
    # out=100) it almost never does. Compare backtrack frequencies.
    from distributed_graph_analytics_spark.operators.walks import node2vec_walks

    pairs = [(i, i + 1) for i in range(1, 40)]
    df = spark.createDataFrame(pairs, ["src", "dst"])

    def backtracks(rows):
        by_walk = collections.defaultdict(dict)
        for r in rows:
            by_walk[r["walk_id"]][r["step"]] = r["vertex"]
        n = 0
        for steps in by_walk.values():
            for t in range(2, len(steps)):
                if steps[t] == steps[t - 2]:
                    n += 1
        return n

    ret = backtracks(node2vec_walks(df, walk_length=4, p=1, q=100).collect())
    out = backtracks(node2vec_walks(df, walk_length=4, p=100, q=1).collect())
    assert ret > out


def test_walks_deterministic_across_runs(spark):
    pairs = [(1, 2), (2, 3), (3, 1)]
    df = spark.createDataFrame(pairs, ["src", "dst"])
    a = sorted(map(tuple, random_walks(df, walk_length=5, seed=7).collect()))
    b = sorted(map(tuple, random_walks(df, walk_length=5, seed=7).collect()))
    c = sorted(map(tuple, random_walks(df, walk_length=5, seed=8).collect()))
    assert a == b
    assert a != c  # a different seed picks different branches
