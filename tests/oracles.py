"""Pure-Python oracles for the iterative analytics (no Spark)."""

from __future__ import annotations

from collections import defaultdict


def pagerank_oracle(edge_list, damping=0.85, epsilon=0.001, max_iter=100):
    """Giraph-semantics PageRank (PageRankComputation.java:51-81):
    rank = (1-d)/N + d*sum(in msgs), msg = rank/out_edge_count (parallel
    edges count), halt when max relative delta < epsilon after >= 2
    updates.
    """
    out_edges = defaultdict(list)
    vertices = set()
    for e in edge_list:
        s, d = int(e[0]), int(e[1])
        out_edges[s].append(d)
        vertices.add(s)
        vertices.add(d)
    n = len(vertices)
    rank = {v: 1.0 / n for v in vertices}
    for it in range(1, max_iter + 1):
        msgs = defaultdict(float)
        for s, dsts in out_edges.items():
            share = rank[s] / len(dsts)
            for d in dsts:
                msgs[d] += share
        new_rank = {}
        max_delta = 0.0
        for v in vertices:
            r = (1.0 - damping) / n + damping * msgs.get(v, 0.0)
            max_delta = max(max_delta, abs(r - rank[v]) / rank[v])
            new_rank[v] = r
        rank = new_rank
        if it >= 2 and max_delta < epsilon:
            break
    return rank


def wcc_oracle(edge_list):
    """Max-label connected components via union-find."""
    parent = {}

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for e in edge_list:
        for v in (int(e[0]), int(e[1])):
            parent.setdefault(v, v)
    for e in edge_list:
        a, b = find(int(e[0])), find(int(e[1]))
        if a != b:
            parent[a] = b
    comp_max = {}
    for v in parent:
        r = find(v)
        comp_max[r] = max(comp_max.get(r, v), v)
    return {v: comp_max[find(v)] for v in parent}


def triangle_oracle(edge_list):
    """Brute-force distinct triangle count (undirected, loops ignored)."""
    adj = defaultdict(set)
    for e in edge_list:
        s, d = int(e[0]), int(e[1])
        if s == d:
            continue
        adj[s].add(d)
        adj[d].add(s)
    count = 0
    nodes = sorted(adj)
    for a in nodes:
        for b in adj[a]:
            if b <= a:
                continue
            for c in adj[a] & adj[b]:
                if c > b:
                    count += 1
    return count


def giraph_lc_oracle(edge_list, max_supersteps=1000):
    """Pure-Python twin of LeafCompressionComputation.java's BSP
    protocol (see operators/leaf_compression.leaf_compression_giraph):
    superstep-synchronous message passing with Giraph mutation timing
    (vertex removals requested at processing time, applied one
    superstep later; messages to removed vertices resurrect them).
    Returns (values: {id: value}, edges: {(src, dst)})."""
    from collections import defaultdict

    out = defaultdict(list)
    values = {}
    for s, d in edge_list:
        out[s].append(d)
        values.setdefault(s, 0)
        values.setdefault(d, 0)

    # superstep 0: every vertex is active
    msgs = []
    for vid in sorted(values):
        if len(out[vid]) == 1 and values[vid] != -1:
            msgs.append((out[vid][0], vid, values[vid]))
            values[vid] = -1
    pending = set()
    for _ in range(max_supersteps):
        if not msgs:
            break
        for r in pending:
            values.pop(r, None)
            out.pop(r, None)
        pending = set()
        by_to = defaultdict(list)
        for to, frm, val in msgs:
            by_to[to].append((frm, val))
        new_msgs = []
        for to in sorted(by_to):
            cur = values.get(to, 0)  # missing receiver → resurrection
            for frm, val in by_to[to]:
                cur = cur + 1 + val
                pending.add(frm)
                if to in out:
                    out[to] = [d for d in out[to] if d != frm]
            values[to] = cur
            if len(out.get(to, [])) == 1 and values[to] != -1:
                new_msgs.append((out[to][0], to, values[to]))
                values[to] = -1
        msgs = new_msgs
    for r in pending:
        values.pop(r, None)
        out.pop(r, None)
    edges = {(s, d) for s in values for d in out.get(s, [])}
    return values, edges


def ppr_oracle(edge_list, sources, damping=0.85, epsilon=1e-6, max_iter=100):
    """Personalized-PageRank twin: rank = (1-d)*s(v) + d*sum(in msgs),
    s = 1/|S| on the source set; r0 = s; halt on max-abs delta."""
    from collections import defaultdict

    out_edges = defaultdict(list)
    vertices = set()
    for e in edge_list:
        s, d = int(e[0]), int(e[1])
        out_edges[s].append(d)
        vertices.add(s)
        vertices.add(d)
    seed = {v: (1.0 / len(sources) if v in set(sources) else 0.0) for v in vertices}
    rank = dict(seed)
    for _ in range(max_iter):
        msgs = defaultdict(float)
        for s, dsts in out_edges.items():
            share = rank[s] / len(dsts)
            for d in dsts:
                msgs[d] += share
        new_rank = {
            v: (1.0 - damping) * seed[v] + damping * msgs.get(v, 0.0)
            for v in vertices
        }
        max_delta = max(abs(new_rank[v] - rank[v]) for v in vertices)
        rank = new_rank
        if max_delta < epsilon:
            break
    return rank
