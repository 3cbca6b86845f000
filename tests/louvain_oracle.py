"""Pure-Python oracle replicating the reference GraphX Louvain
(LouvainCore.scala) exactly: parallel moves, even/odd gating, BigDecimal
ΔQ via Fraction (exact rationals), progress-based halt, compression,
multi-level loop.
"""

from __future__ import annotations

from collections import defaultdict
from fractions import Fraction


def louvain_level_oracle(edge_list, min_progress=2000, progress_counter=1,
                         internal=None):
    """One level. edge_list: [(src,dst,w)]; internal: {id: internal_w}.
    Returns (q, state dict id -> (community, sigma_tot, internal_w, node_w),
    cycles//2).
    """
    merged = defaultdict(int)
    for s, d, w in edge_list:
        merged[(s, d)] += w
    node_w = defaultdict(int)
    for (s, d), w in merged.items():
        node_w[s] += w
        node_w[d] += w
    ids = set(node_w)
    internal = dict(internal or {})
    ids |= set(internal)
    state = {
        v: {
            "community": v,
            "internal_w": internal.get(v, 0),
            "node_w": node_w.get(v, 0),
        }
        for v in ids
    }
    for v in state.values():
        v["sigma_tot"] = v["node_w"] + v["internal_w"]
    m_total = sum(v["internal_w"] + v["node_w"] for v in state.values())

    def community_sigma():
        sig = defaultdict(int)
        for v in state.values():
            sig[v["community"]] += v["node_w"] + v["internal_w"]
        return sig

    def messages():
        msgs = defaultdict(lambda: defaultdict(int))
        for (s, d), w in merged.items():
            msgs[s][state[d]["community"]] += w
            msgs[d][state[s]["community"]] += w
        return msgs

    updated = -min_progress
    updated_last_phase = 0
    even = False
    count = 0
    stop = 0
    while True:
        count += 1
        even = not even
        msgs = messages()
        # snapshot community sigma (as stored on vertices: state sigma_tot
        # is the post-previous-cycle recompute)
        comm_sigma = {v["community"]: v["sigma_tot"] for v in state.values()}
        moves = {}
        changed_count = 0
        for vid, per_comm in msgs.items():
            st = state[vid]
            cur = st["community"]
            k_i = Fraction(st["node_w"] + st["internal_w"])
            best_comm, best_dq = cur, Fraction(0)
            for comm, w_to in per_comm.items():
                is_cur = comm == cur
                k_i_in = Fraction(w_to + (st["internal_w"] if is_cur else 0))
                sigma = Fraction(comm_sigma[comm]) - (k_i if is_cur else 0)
                if is_cur and sigma == 0:
                    dq = Fraction(0)
                else:
                    dq = k_i_in - k_i * sigma / m_total
                if dq > best_dq or (dq > 0 and dq == best_dq and comm > best_comm):
                    best_dq = dq
                    best_comm = comm
            if best_comm != cur and (
                (even and cur > best_comm) or (not even and cur < best_comm)
            ):
                moves[vid] = best_comm
                changed_count += 1
        for vid, comm in moves.items():
            state[vid]["community"] = comm
        for vid in msgs:
            state[vid]["changed"] = vid in moves
        sig = community_sigma()
        for vid in state:
            state[vid]["sigma_tot"] = sig[state[vid]["community"]]
        if even:
            updated = 0
        updated += changed_count
        if not even:
            if updated >= updated_last_phase - min_progress:
                stop += 1
            updated_last_phase = updated
        if not (stop <= progress_counter and (even or (updated > 0 and count < 100000))):
            break

    # modularity
    msgs = messages()
    q = 0.0
    for vid, per_comm in msgs.items():
        st = state[vid]
        k_i_in = st["internal_w"] + per_comm.get(st["community"], 0)
        k_i = st["node_w"] + st["internal_w"]
        sigma = st["sigma_tot"]
        qi = k_i_in / m_total - (sigma * k_i) / (m_total**2)
        q += max(0.0, qi)
    return q, state, count // 2


def louvain_oracle(edge_list, min_progress=2000, progress_counter=1):
    """Full multi-level run. Returns (level0 {id: community},
    final {id: community}, [q per level])."""
    edges = [(s, d, (e[2] if len(e) > 2 else 1)) for *e, in []] or [
        (int(e[0]), int(e[1]), int(e[2]) if len(e) > 2 else 1) for e in edge_list
    ]
    internal = None
    mapping = None
    level0 = None
    qs = []
    q_prev = -1.0
    for level in range(20):
        q, state, _ = louvain_level_oracle(
            edges, min_progress, progress_counter, internal
        )
        qs.append(q)
        assign = {vid: st["community"] for vid, st in state.items()}
        if level == 0:
            level0 = dict(assign)
            mapping = dict(assign)
        else:
            mapping = {orig: assign[c] for orig, c in mapping.items()}
        if not (q > q_prev + 0.001):
            break
        q_prev = q
        # compress
        internal_new = defaultdict(int)
        for vid, st in state.items():
            internal_new[st["community"]] += st["internal_w"]
        merged = defaultdict(int)
        for s, d, w in edges:
            merged[(s, d)] += w
        new_edges = defaultdict(int)
        for (s, d), w in merged.items():
            cs, cd = assign[s], assign[d]
            if cs == cd:
                internal_new[cs] += 2 * w
            else:
                new_edges[(min(cs, cd), max(cs, cd))] += w
        edges = [(s, d, w) for (s, d), w in new_edges.items()]
        internal = dict(internal_new)
    return level0, mapping, qs
