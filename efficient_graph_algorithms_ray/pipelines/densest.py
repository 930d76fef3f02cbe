"""Densest-subgraph 2(1+ε)-approximation — parallel peeling.

Public algorithm: Bahmani, Kumar, Vassilvitskii, "Densest subgraph in
streaming and MapReduce" (VLDB 2012): repeatedly delete every vertex
whose degree in the surviving subgraph S is ≤ 2(1+ε)·ρ(S) (ρ = |E(S)|
/ |S|); some surviving prefix achieves ≥ 1/(2(1+ε)) of the optimum
density, and the loop ends in O(log_{1+ε} n) rounds because each round
removes a constant fraction of S.

This is one of the few operators expressed with raw Ray tasks instead
of Dataset transforms: each round's kill threshold depends on a GLOBAL
reduction over the current round's degrees, which the streaming
Dataset executor can't thread back into the same pass. The state is
one bool array per partition living in the object store (the alive
mask), updated by one remote task per partition per round:

  - degree pass: task p loads its CSR shard node-locally, looks up its
    neighbors' alive bits in the other partitions' masks (the same
    broadcast-index pattern as triangles' orientation — bits, not
    edges, cross partitions) and reduces to (Σ alive, Σ deg_S) plus a
    per-partition degree array that STAYS in the object store
    (``num_returns=2`` — the driver only ever sees two ints per
    partition, never a vertex array);
  - kill pass: task p applies the EXACT INTEGER threshold
    2·den·deg·n_alive ≤ num·Σdeg  (num/den = 2(1+ε) as a rational —
    no float enters the control flow, so rounds are bit-deterministic
    at any parallelism).

Reference analogue: iterative subgraph refinement in the clustering
family (/root/reference/src/ega/algorithms/gromov_wasserstein_graphs.py
partition loops); peeling itself is the public Bahmani algorithm.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray

from ..state.graph import ShardedGraph


@ray.remote
def _init_alive(csr: dict) -> np.ndarray:
    return np.ones(len(csr["vids"]), dtype=bool)


@ray.remote
def _vids_of(csr: dict) -> np.ndarray:
    return csr["vids"]


@ray.remote(num_returns=2)
def _degree_pass(csr: dict, P: int, alive_refs: dict, vids_refs: dict):
    vids, deg, nbrs = csr["vids"], csr["deg"].astype(np.int64), csr["indices"]
    p_self = int(vids[0] % np.uint64(P)) if len(vids) else 0
    alive = ray.get(alive_refs[p_self])
    a_ind = np.zeros(len(nbrs), dtype=np.int64)
    npart = (nbrs % np.uint64(P)).astype(np.int64)
    for q in np.unique(npart):
        sel = npart == q
        aq = ray.get(alive_refs[int(q)])
        vq = ray.get(vids_refs[int(q)])
        a_ind[sel] = aq[np.searchsorted(vq, nbrs[sel])]
    indptr = np.zeros(len(vids) + 1, dtype=np.int64)
    np.cumsum(deg, out=indptr[1:])
    deg_s = np.zeros(len(vids), dtype=np.int64)
    nz = deg > 0
    if nz.any():
        deg_s[nz] = np.add.reduceat(a_ind, indptr[:-1][nz])
    deg_s[~alive] = 0
    return (int(alive.sum()), int(deg_s[alive].sum())), deg_s


@ray.remote
def _kill_pass(alive: np.ndarray, deg_s: np.ndarray, n_alive: int, sum_deg: int,
               num: int, den: int) -> np.ndarray:
    # kill iff deg_S(v) ≤ 2(1+ε)·ρ = (num/den)·Σdeg/(2·n_alive)
    #      ⇔ 2·den·deg·n_alive ≤ num·Σdeg   (all exact ints)
    kill = alive & (2 * den * deg_s * n_alive <= num * sum_deg)
    out = alive.copy()
    out[kill] = False
    return out


def densest_subgraph(graph: ShardedGraph, *, num: int = 5, den: int = 2):
    """Run the peeling to exhaustion. num/den = 2(1+ε) (default 5/2 →
    ε = 0.25). Returns (per-round pa.Table (round, n_alive, edges2),
    best) where best = {round, n_alive, edges2, density} for the
    densest surviving prefix (density = edges2/(2·n_alive), one IEEE
    division of exact ints). Guarantee: best.density ≥ OPT/(2(1+ε)).
    """
    assert not graph.directed, "densest-subgraph peeling is for undirected graphs"
    P = graph.num_partitions
    alive_refs = {p: _init_alive.remote(graph.refs[p]) for p in graph.parts}
    vids_refs = {p: _vids_of.remote(graph.refs[p]) for p in graph.parts}

    rows = []
    best = None
    rnd = 0
    while True:
        stats, degs = {}, {}
        for p in graph.parts:
            stats[p], degs[p] = _degree_pass.remote(
                graph.refs[p], P, alive_refs, vids_refs
            )
        got = {p: ray.get(stats[p]) for p in graph.parts}
        n_alive = sum(g[0] for g in got.values())
        sum_deg = sum(g[1] for g in got.values())
        if n_alive == 0:
            break
        rnd += 1
        density = float(sum_deg) / float(2 * n_alive)
        rows.append((rnd, n_alive, sum_deg))
        if best is None or density > best["density"]:
            best = {
                "round": rnd,
                "n_alive": n_alive,
                "edges2": sum_deg,
                "density": density,
            }
        alive_refs = {
            p: _kill_pass.remote(alive_refs[p], degs[p], n_alive, sum_deg, num, den)
            for p in graph.parts
        }
    table = pa.table(
        {
            "round": pa.array([r[0] for r in rows], type=pa.int64()),
            "n_alive": pa.array([r[1] for r in rows], type=pa.int64()),
            "edges2": pa.array([r[2] for r in rows], type=pa.int64()),
        }
    )
    return table, best


@ray.remote
def _min_alive_degree(alive: np.ndarray, deg_s: np.ndarray) -> int:
    """Per-partition min alive-subgraph degree (2^62 sentinel if the
    partition has no alive vertex) — two ints cross to the driver."""
    if not alive.any():
        return 1 << 62
    return int(deg_s[alive].min())


@ray.remote(num_returns=2)
def _onion_kill(alive: np.ndarray, deg_s: np.ndarray, vids: np.ndarray,
                k: int, rnd: int):
    """Peel every alive vertex with alive-degree ≤ k; returns the new
    alive mask and this round's removed rows (vid, layer, k) as an
    Arrow table THAT STAYS IN THE OBJECT STORE (the driver keeps only
    the ref — removed rows never funnel through one process)."""
    kill = alive & (deg_s <= k)
    out = alive.copy()
    out[kill] = False
    tbl = pa.table(
        {
            "vid": pa.array(vids[kill].astype(np.int64), type=pa.int64()),
            "layer": pa.array(np.full(int(kill.sum()), rnd, dtype=np.int64)),
            "k": pa.array(np.full(int(kill.sum()), k, dtype=np.int64)),
        }
    )
    return out, tbl


@ray.remote
def _alive_rows(alive: np.ndarray, vids: np.ndarray):
    tbl = pa.table(
        {
            "vid": pa.array(vids[alive].astype(np.int64), type=pa.int64()),
            "layer": pa.array(np.full(int(alive.sum()), -1, dtype=np.int64)),
            "k": pa.array(np.full(int(alive.sum()), -1, dtype=np.int64)),
        }
    )
    return tbl


def onion_layers(graph: ShardedGraph, *, max_rounds: int = 16):
    """Onion decomposition (Hébert-Dufresne, Grochow & Allard 2016),
    TRUNCATED to ``max_rounds`` outer shells: round r peels every
    vertex whose degree in the surviving subgraph is ≤ k, where k is
    the running max of the surviving min-degree (so k equals each
    vertex's CORENESS at removal — a free cross-check against the
    h-index pipeline). Vertices still alive after ``max_rounds`` get
    layer = k = −1 (the untruncated loop would need O(#shells) global
    rounds; the outer profile is the useful part for periphery
    analysis and keeps the unrolled SQL oracle bounded).

    Same raw-task shape as ``densest_subgraph`` (each round's threshold
    is a GLOBAL min over surviving degrees): alive bits live in the
    object store, the driver sees two ints per partition per round, and
    removed rows are per-partition Arrow refs assembled into a Dataset
    without a driver funnel. Returns a Dataset (vid, layer, k)."""
    import ray.data as rd

    assert not graph.directed, "onion decomposition is for undirected graphs"
    P = graph.num_partitions
    alive_refs = {p: _init_alive.remote(graph.refs[p]) for p in graph.parts}
    vids_refs = {p: _vids_of.remote(graph.refs[p]) for p in graph.parts}

    out_refs = []
    k = 0
    for rnd in range(1, max_rounds + 1):
        stats, degs = {}, {}
        for p in graph.parts:
            stats[p], degs[p] = _degree_pass.remote(
                graph.refs[p], P, alive_refs, vids_refs
            )
        n_alive = sum(ray.get(stats[p])[0] for p in graph.parts)
        if n_alive == 0:
            break
        kmin = min(
            ray.get(
                [_min_alive_degree.remote(alive_refs[p], degs[p]) for p in graph.parts]
            )
        )
        k = max(k, int(kmin))
        nxt = {}
        for p in graph.parts:
            nxt[p], rem = _onion_kill.remote(
                alive_refs[p], degs[p], vids_refs[p], k, rnd
            )
            out_refs.append(rem)
        alive_refs = nxt
    out_refs.extend(
        _alive_rows.remote(alive_refs[p], vids_refs[p]) for p in graph.parts
    )
    return rd.from_arrow_refs(out_refs)
