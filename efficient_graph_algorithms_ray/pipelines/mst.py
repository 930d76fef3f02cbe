"""Distributed minimum spanning forest — Borůvka over CSR shards.

Reference parity: ``SpanningTreeGFIntegrator``'s MST construction
(Kruskal + ``DisjointSetADT`` union-find, /root/reference/src/ega/
algorithms/spanning_trees.py:11-47, 98-124). Kruskal's global edge
sort doesn't distribute; Borůvka does: each round every component
picks its minimum crossing edge (a local scan + one small exchange),
chosen edges merge components, components halve → O(log V) rounds of
O(E) scans.

Determinism/exactness: edges are totally ordered by
``(w, min(u,v), max(u,v))``; under a total order the MSF is unique,
so the result matches a Kruskal oracle with the same order exactly.

Distribution shape per round — NO driver-side vertex/component state
(driver holds only {part: ObjectRef} dicts and per-round counters):
- component labels live as per-partition arrays in the object store
  (task-return refs, re-created per round — they change, unlike the
  CSR);
- the crossing-edge scan is a task per shard: per-local-component
  best edge, routed to the component's owner partition
  (``comp % P``) via per-destination returns;
- each owner reduces to the global per-component min edge, then the
  contraction runs as distributed hook + pointer-doubling:
  every component hooks to its chosen edge's partner component
  (2-cycles break to the smaller id — Borůvka's functional graph has
  exactly one 2-cycle per merge group, the group's minimum edge),
  then ``parent ← parent(parent)`` jumps, each a request/response
  exchange between owner partitions, until fixpoint (≤ log₂ depth
  rounds). New label = the group's cycle-min root id.
- vertex labels remap through the same owner-sharded request/response
  (distinct labels only — O(#components) traffic, not O(V·P)).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray
import ray.data as rd

from ..state.graph import ShardedGraph

_EMPTY = dict(
    comp=np.empty(0, dtype=np.uint64),
    w=np.empty(0, dtype=np.float64),
    a=np.empty(0, dtype=np.uint64),
    b=np.empty(0, dtype=np.uint64),
    other=np.empty(0, dtype=np.uint64),
)


@ray.remote
def _untuple0(t):
    return t[0]


def _call_routed(task, n: int, *args) -> list:
    """Invoke a task returning a tuple of n blocks; always yields a list
    of n refs (Ray's num_returns=1 would make the tuple ONE object)."""
    if n == 1:
        return [_untuple0.remote(task.remote(*args))]
    return list(task.options(num_returns=n).remote(*args))


@ray.remote
def _init_labels(csr: dict) -> np.ndarray:
    """Initial per-partition component labels = own vids (remote task:
    the shard never streams through the driver)."""
    return csr["vids"].copy()


@ray.remote
def _extract_vids(csr: dict) -> np.ndarray:
    """vids-only slice of a shard — the neighbor-label lookup index.
    Extracted once so scan tasks fetch 8 B/vertex per neighbor
    partition instead of the whole CSR (O(E/P) with indices/weights)."""
    return csr["vids"]


def _route_by_owner(vals: np.ndarray, parts: list[int], P: int):
    """Stable-order masks of ``vals`` grouped by owner part (val % P) —
    the shared routing convention: responses aligned to these masks."""
    owner = (vals % np.uint64(P)).astype(np.int64)
    return [owner == o for o in parts]


@ray.remote
def _scan_part(p: int, P: int, csr_refs: dict, vid_refs: dict, label_refs: dict, wseed=None):
    """Per-shard scan → per-local-component best crossing edge
    (comp, w, a, b, other-comp), pre-routed by comp % P.

    ``wseed`` (optional) overrides edge weights with the seeded hash
    splitmix64(min⊕max⊕wseed) >> 11 — a 53-bit integer, exact as
    float64 — turning the MSF into a seeded RANDOM spanning forest
    (pipelines/tree_ensemble.py). Returns P blocks (num_returns=P set
    by the caller)."""
    csr = ray.get(csr_refs[p])
    vids, deg, v = csr["vids"], csr["deg"], csr["indices"]
    w = csr.get("weights")
    if w is None:
        w = np.ones(len(v))
    out = [dict(_EMPTY) for _ in range(P)]
    if len(v):
        row = np.repeat(np.arange(len(vids), dtype=np.int64), deg)
        labels_p = ray.get(label_refs[p])
        cu = labels_p[row]
        cv = np.empty(len(v), dtype=np.uint64)
        vpart = (v % np.uint64(P)).astype(np.int64)
        for q in np.unique(vpart):
            sel = vpart == q
            lq = ray.get(label_refs[int(q)])
            qvids = ray.get(vid_refs[int(q)])
            cv[sel] = lq[np.searchsorted(qvids, v[sel])]
        crossing = cu != cv
        if crossing.any():
            u = vids[row[crossing]]
            vv = v[crossing]
            ww = w[crossing]
            cc = cu[crossing]
            oo = cv[crossing]
            umin = np.minimum(u, vv)
            umax = np.maximum(u, vv)
            if wseed is not None:
                from ..sources.edges_synth import _splitmix64

                ww = (
                    _splitmix64(umin ^ umax ^ np.uint64(wseed)) >> np.uint64(11)
                ).astype(np.float64)
            # per-component argmin by (w, umin, umax): lexsort, first per comp
            order = np.lexsort((umax, umin, ww, cc))
            cc_s = cc[order]
            firsts = np.flatnonzero(np.concatenate(([True], cc_s[1:] != cc_s[:-1])))
            sel = order[firsts]
            cc, ww, aa, bb, oo = cc[sel], ww[sel], umin[sel], umax[sel], oo[sel]
            owner = (cc % np.uint64(P)).astype(np.int64)
            for q in np.unique(owner):
                m = owner == q
                out[int(q)] = dict(comp=cc[m], w=ww[m], a=aa[m], b=bb[m], other=oo[m])
    return tuple(out)


@ray.remote(num_returns=2)
def _reduce_comps(*blocks):
    """Owner-side reduce: global per-component min edge by (w, a, b).
    Returns (comp table sorted by comp, n_comps)."""
    blocks = [b for b in blocks if b is not None and len(b["comp"])]
    if not blocks:
        return dict(_EMPTY), 0
    comp = np.concatenate([b["comp"] for b in blocks])
    w = np.concatenate([b["w"] for b in blocks])
    a = np.concatenate([b["a"] for b in blocks])
    b_ = np.concatenate([b["b"] for b in blocks])
    other = np.concatenate([b["other"] for b in blocks])
    order = np.lexsort((b_, a, w, comp))
    comp_s = comp[order]
    firsts = np.flatnonzero(np.concatenate(([True], comp_s[1:] != comp_s[:-1])))
    sel = order[firsts]
    tbl = dict(comp=comp[sel], w=w[sel], a=a[sel], b=b_[sel], other=other[sel])
    return tbl, int(len(sel))


@ray.remote
def _route_values(table: dict, key: str, parts: list[int], P: int):
    """Route ``table[key]`` values to their owner parts (stable order).
    Returns len(parts) query blocks."""
    vals = table[key]
    masks = _route_by_owner(vals, parts, P)
    return tuple(vals[m] for m in masks)


def _lookup_sorted(keys_sorted: np.ndarray, vals: np.ndarray, q: np.ndarray, default=None):
    """vals[searchsorted(keys_sorted, q)] with identity on miss."""
    if len(keys_sorted) == 0:
        return q.copy() if default is None else np.full(len(q), default, dtype=vals.dtype)
    pos = np.clip(np.searchsorted(keys_sorted, q), 0, len(keys_sorted) - 1)
    hit = keys_sorted[pos] == q
    out = q.copy() if default is None else np.full(len(q), default, dtype=vals.dtype)
    out[hit] = vals[pos[hit]]
    return out


@ray.remote
def _answer(table: dict, key_col: str, val_col: str, *qblocks):
    """Owner-side lookup: for each query block, map q → table[val_col]
    (identity on miss). Returns len(qblocks) response blocks."""
    return tuple(
        _lookup_sorted(table[key_col], table[val_col], q) for q in qblocks
    )


@ray.remote(num_returns=3)
def _hook(table: dict, q_part: int, parts: list[int], P: int, *pp_blocks):
    """Initialize parents from partner-of-partner responses and emit
    this owner's chosen forest edges.

    parent(c) = c        if partner(partner(c)) == c and c < partner(c)
              = partner  otherwise.
    Edge (a,b,w) of comp c is emitted iff c is not the larger side of
    a 2-cycle (each 2-cycle pair picked the SAME edge — the group min)."""
    comp, partner = table["comp"], table["other"]
    pp = np.empty(len(comp), dtype=np.uint64)
    masks = _route_by_owner(partner, parts, P)
    for m, resp in zip(masks, pp_blocks):
        pp[m] = resp
    two_cycle = pp == comp
    root = two_cycle & (comp < partner)
    parent = np.where(root, comp, partner)
    emit = ~(two_cycle & (comp > partner))
    edges = pa.table(
        {
            "a": pa.array(table["a"][emit], type=pa.uint64()),
            "b": pa.array(table["b"][emit], type=pa.uint64()),
            "w": pa.array(table["w"][emit], type=pa.float64()),
        }
    )
    stats = (int(emit.sum()), float(table["w"][emit].sum()))
    return dict(comp=comp, parent=parent), edges, stats


@ray.remote(num_returns=2)
def _jump(table: dict, parts: list[int], P: int, *resp_blocks):
    """One pointer-doubling step: parent ← parent(parent); returns
    (updated table, #changed)."""
    parent = table["parent"]
    new = np.empty(len(parent), dtype=np.uint64)
    masks = _route_by_owner(parent, parts, P)
    for m, resp in zip(masks, resp_blocks):
        new[m] = resp
    changed = int((new != parent).sum())
    return dict(comp=table["comp"], parent=new), changed


@ray.remote
def _route_label_queries(labels: np.ndarray, parts: list[int], P: int):
    """Distinct labels of a vertex partition, routed by owner."""
    uniq = np.unique(labels)
    masks = _route_by_owner(uniq, parts, P)
    return tuple(uniq[m] for m in masks)


@ray.remote
def _apply_relabel(labels: np.ndarray, parts: list[int], P: int, *resp_blocks):
    """Remap labels through the (distinct-label → root) responses."""
    uniq = np.unique(labels)
    masks = _route_by_owner(uniq, parts, P)
    new_of_uniq = np.empty(len(uniq), dtype=np.uint64)
    for m, resp in zip(masks, resp_blocks):
        new_of_uniq[m] = resp
    return new_of_uniq[np.searchsorted(uniq, labels)]


def minimum_spanning_forest(
    graph: ShardedGraph, max_rounds: int = 64, *, edge_weight_seed: int | None = None
):
    """→ (Dataset (a, b, w) of forest edges, summary dict).

    ``graph`` must be undirected (symmetrized); weights optional
    (unit default ≡ any spanning forest under the vid tie-order).
    Driver state per round is O(P) ObjectRefs + scalar counters —
    candidate edges, parents and labels never leave the workers.
    """
    assert not graph.directed, "MSF requires an undirected graph"
    refs = graph.refs
    parts = graph.parts
    P = graph.num_partitions
    label_refs = {p: _init_labels.remote(refs[p]) for p in parts}
    vid_refs = {p: _extract_vids.remote(refs[p]) for p in parts}

    edge_refs: list[ray.ObjectRef] = []
    total_edges = 0
    total_weight = 0.0
    history = []
    for r in range(max_rounds):
        # 1. scan: per shard → per-owner candidate blocks
        scan = {
            p: _call_routed(
                _scan_part, P, p, P, refs, vid_refs, label_refs, edge_weight_seed
            )
            for p in parts
        }
        # 2. owner-side per-component min
        reduced = {}
        count_refs = []
        for q in parts:
            tbl_ref, cnt_ref = _reduce_comps.remote(*[scan[p][q] for p in parts])
            reduced[q] = tbl_ref
            count_refs.append(cnt_ref)
        counts = ray.get(count_refs)
        n_comps = int(sum(counts))
        if n_comps == 0:
            break

        # 3. partner-of-partner exchange → hook
        idx = {q: i for i, q in enumerate(parts)}
        routes = {
            q: _call_routed(_route_values, len(parts), reduced[q], "other", parts, P)
            for q in parts
        }
        answers = {
            o: _call_routed(
                _answer, len(parts), reduced[o], "comp", "other",
                *[routes[q][idx[o]] for q in parts],
            )
            for o in parts
        }
        parent_tables = {}
        stat_refs = []
        for q in parts:
            pt, ed, st = _hook.remote(
                reduced[q], q, parts, P, *[answers[o][idx[q]] for o in parts]
            )
            parent_tables[q] = pt
            edge_refs.append(ed)
            stat_refs.append(st)

        # 4. pointer doubling to fixpoint
        jumps = 0
        while True:
            proutes = {
                q: _call_routed(
                    _route_values, len(parts), parent_tables[q], "parent", parts, P
                )
                for q in parts
            }
            panswers = {
                o: _call_routed(
                    _answer, len(parts), parent_tables[o], "comp", "parent",
                    *[proutes[q][idx[o]] for q in parts],
                )
                for o in parts
            }
            new_tables = {}
            chg_refs = []
            for q in parts:
                nt, ch = _jump.remote(
                    parent_tables[q], parts, P, *[panswers[o][idx[q]] for o in parts]
                )
                new_tables[q] = nt
                chg_refs.append(ch)
            changed = sum(ray.get(chg_refs))
            parent_tables = new_tables
            jumps += 1
            if changed == 0:
                break

        # 5. relabel vertex partitions through (comp → root)
        lroutes = {
            p: _call_routed(_route_label_queries, len(parts), label_refs[p], parts, P)
            for p in parts
        }
        lanswers = {
            o: _call_routed(
                _answer, len(parts), parent_tables[o], "comp", "parent",
                *[lroutes[p][idx[o]] for p in parts],
            )
            for o in parts
        }
        label_refs = {
            p: _apply_relabel.remote(
                label_refs[p], parts, P, *[lanswers[o][idx[p]] for o in parts]
            )
            for p in parts
        }

        stats = ray.get(stat_refs)
        round_edges = int(sum(s[0] for s in stats))
        total_edges += round_edges
        total_weight += float(sum(s[1] for s in stats))
        history.append(
            {"round": r, "chosen": round_edges, "components_merged": n_comps, "jumps": jumps}
        )

    if edge_refs:
        edges = rd.from_arrow_refs(edge_refs)
    else:
        edges = rd.from_arrow(
            pa.table(
                {
                    "a": pa.array([], type=pa.uint64()),
                    "b": pa.array([], type=pa.uint64()),
                    "w": pa.array([], type=pa.float64()),
                }
            )
        )
    return edges, {
        "rounds": len(history),
        "n_edges": total_edges,
        "total_weight": total_weight,
        "history": history,
    }
