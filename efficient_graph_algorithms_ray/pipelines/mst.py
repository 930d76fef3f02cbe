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

Distribution shape per round:
- component labels live as per-partition arrays in the object store
  (re-pinned per round — they change, unlike the CSR);
- the crossing-edge scan is map-side per shard (neighbor labels via
  the label index, like triangles' degree index);
- per-shard candidates are pre-aggregated to one best edge per local
  component before the single ``groupby(comp)`` exchange;
- the merge (union-find over ≤ #components chosen edges) runs on the
  driver — #components halves each round; at 10^12-vertex scale
  round 0 would instead reuse the engine's distributed CC on the
  contracted graph (documented trade-off, same semantics).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray
import ray.data as rd

from ..state.graph import ShardedGraph


def _scan_round(graph: ShardedGraph, label_refs: dict):
    refs = graph.refs
    P = graph.num_partitions

    def _fn(batch: pa.Table) -> pa.Table:
        out_c, out_w, out_u, out_v = [], [], [], []
        for p in batch.column("part").to_numpy(zero_copy_only=False):
            p = int(p)
            csr = ray.get(refs[p])
            vids, deg, v = csr["vids"], csr["deg"], csr["indices"]
            w = csr.get("weights")
            if w is None:
                w = np.ones(len(v))
            row = np.repeat(np.arange(len(vids), dtype=np.int64), deg)
            labels_p = ray.get(label_refs[p])
            cu = labels_p[row]
            cv = np.empty(len(v), dtype=np.uint64)
            vpart = (v % np.uint64(P)).astype(np.int64)
            for q in np.unique(vpart):
                sel = vpart == q
                lq = ray.get(label_refs[int(q)])
                qvids = ray.get(refs[int(q)])["vids"]
                cv[sel] = lq[np.searchsorted(qvids, v[sel])]
            crossing = cu != cv
            if not crossing.any():
                continue
            u = vids[row[crossing]]
            vv = v[crossing]
            ww = w[crossing]
            cc = cu[crossing]
            umin = np.minimum(u, vv)
            umax = np.maximum(u, vv)
            # per-component argmin by (w, umin, umax): lexsort, first per comp
            order = np.lexsort((umax, umin, ww, cc))
            cc_s = cc[order]
            firsts = np.flatnonzero(np.concatenate(([True], cc_s[1:] != cc_s[:-1])))
            sel = order[firsts]
            out_c.append(cc[sel])
            out_w.append(ww[sel])
            out_u.append(umin[sel])
            out_v.append(umax[sel])
        if not out_c:
            return pa.table(
                {
                    "comp": pa.array([], type=pa.uint64()),
                    "w": pa.array([], type=pa.float64()),
                    "a": pa.array([], type=pa.uint64()),
                    "b": pa.array([], type=pa.uint64()),
                }
            )
        return pa.table(
            {
                "comp": pa.array(np.concatenate(out_c), type=pa.uint64()),
                "w": pa.array(np.concatenate(out_w), type=pa.float64()),
                "a": pa.array(np.concatenate(out_u), type=pa.uint64()),
                "b": pa.array(np.concatenate(out_v), type=pa.uint64()),
            }
        )

    return _fn


@ray.remote
def _init_labels(csr: dict) -> np.ndarray:
    """Initial per-partition component labels = own vids (remote task:
    the shard never streams through the driver)."""
    return csr["vids"].copy()


@ray.remote
def _relabel_task(labels: np.ndarray, old_sorted: np.ndarray, new_sorted: np.ndarray):
    pos = np.searchsorted(old_sorted, labels)
    ok = pos < len(old_sorted)
    hit = np.zeros(len(labels), dtype=bool)
    hit[ok] = old_sorted[pos[ok]] == labels[ok]
    out = labels.copy()
    out[hit] = new_sorted[pos[hit]]
    return out


def minimum_spanning_forest(graph: ShardedGraph, max_rounds: int = 64):
    """→ (Dataset (a, b, w) of forest edges, summary dict).

    ``graph`` must be undirected (symmetrized); weights optional
    (unit default ≡ any spanning forest under the vid tie-order).
    """
    assert not graph.directed, "MSF requires an undirected graph"
    refs = graph.refs
    label_refs = {p: _init_labels.remote(refs[p]) for p in graph.parts}
    parts_ds = rd.from_arrow(pa.table({"part": pa.array(graph.parts, type=pa.int64())}))

    chosen_a: list[np.ndarray] = []
    chosen_b: list[np.ndarray] = []
    chosen_w: list[np.ndarray] = []
    history = []
    for r in range(max_rounds):
        cand = parts_ds.map_batches(
            _scan_round(graph, label_refs), batch_format="pyarrow", batch_size=1
        )
        batches = list(cand.iter_batches(batch_size=None, batch_format="pyarrow"))
        if not batches:  # Ray drops empty blocks → fully converged
            break
        tbl = pa.concat_tables(batches)
        if tbl.num_rows == 0:
            break
        comp = tbl.column("comp").to_numpy(zero_copy_only=False).astype(np.uint64)
        w = tbl.column("w").to_numpy(zero_copy_only=False)
        a = tbl.column("a").to_numpy(zero_copy_only=False).astype(np.uint64)
        b = tbl.column("b").to_numpy(zero_copy_only=False).astype(np.uint64)
        # global per-component min by (w, a, b)
        order = np.lexsort((b, a, w, comp))
        comp_s = comp[order]
        firsts = np.flatnonzero(np.concatenate(([True], comp_s[1:] != comp_s[:-1])))
        sel = order[firsts]
        ea, eb, ew = a[sel], b[sel], w[sel]
        # dedup edges picked by both endpoints' components
        pair_order = np.lexsort((eb, ea))
        ea, eb, ew = ea[pair_order], eb[pair_order], ew[pair_order]
        keep = np.concatenate(([True], (ea[1:] != ea[:-1]) | (eb[1:] != eb[:-1])))
        ea, eb, ew = ea[keep], eb[keep], ew[keep]
        chosen_a.append(ea)
        chosen_b.append(eb)
        chosen_w.append(ew)

        # union-find over chosen edges on the CONTRACTED component graph:
        # endpoints a/b are vertex ids; their component = label lookup
        def _vid_comp(vs: np.ndarray) -> np.ndarray:
            out = np.empty(len(vs), dtype=np.uint64)
            vpart = (vs % np.uint64(graph.num_partitions)).astype(np.int64)
            for q in np.unique(vpart):
                s = vpart == q
                lq = ray.get(label_refs[int(q)])
                qvids = ray.get(refs[int(q)])["vids"]
                out[s] = lq[np.searchsorted(qvids, vs[s])]
            return out

        ca, cb = _vid_comp(ea), _vid_comp(eb)
        comps = np.unique(np.concatenate([ca, cb]))
        parent = np.arange(len(comps))

        def find(x):
            while parent[x] != x:
                parent[x] = parent[parent[x]]
                x = parent[x]
            return x

        for x, y in zip(np.searchsorted(comps, ca), np.searchsorted(comps, cb)):
            rx, ry = find(x), find(y)
            if rx != ry:
                parent[max(rx, ry)] = min(rx, ry)
        roots = np.array([find(i) for i in range(len(comps))])
        new_labels = comps[roots]  # comp → min comp vid in merged group
        # relabel distributed label arrays
        label_refs = {
            p: _relabel_task.remote(label_refs[p], comps, new_labels)
            for p in graph.parts
        }  # task returns are driver-owned refs — no round-trip copy
        history.append({"round": r, "chosen": int(len(ea)), "components_merged": int(len(comps))})

    a_all = np.concatenate(chosen_a) if chosen_a else np.empty(0, dtype=np.uint64)
    b_all = np.concatenate(chosen_b) if chosen_b else np.empty(0, dtype=np.uint64)
    w_all = np.concatenate(chosen_w) if chosen_w else np.empty(0)
    edges = rd.from_arrow(
        pa.table(
            {
                "a": pa.array(a_all, type=pa.uint64()),
                "b": pa.array(b_all, type=pa.uint64()),
                "w": pa.array(w_all, type=pa.float64()),
            }
        )
    )
    return edges, {
        "rounds": len(history),
        "n_edges": int(len(a_all)),
        "total_weight": float(w_all.sum()),
        "history": history,
    }
