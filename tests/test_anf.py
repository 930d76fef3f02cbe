"""HyperANF neighborhood function vs exact BFS ball sizes + a dense
max-propagation replica (bit-exact registers)."""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray.data as rd

from efficient_graph_algorithms_ray.config import EngineConfig
from efficient_graph_algorithms_ray.pipelines.anf import (
    estimate_rows,
    neighborhood_function,
    vertex_registers,
)
from efficient_graph_algorithms_ray.pipelines.graph_build import build_graph
from efficient_graph_algorithms_ray.stages.hashing import hash_to_vid


def _graph(n=64, seed=11):
    """Ring + a few chords: known structure, diameter ≫ 1."""
    vids = hash_to_vid([f"a{i}" for i in range(n)])
    src, dst = [], []
    for i in range(n):
        src.append(vids[i]); dst.append(vids[(i + 1) % n])
        if i % 8 == 0:
            src.append(vids[i]); dst.append(vids[(i + n // 4) % n])
    src = np.array(src, dtype=np.uint64); dst = np.array(dst, dtype=np.uint64)
    ds = rd.from_arrow(pa.table(
        {"src": pa.array(src, type=pa.uint64()), "dst": pa.array(dst, type=pa.uint64())}
    ))
    return build_graph(ds, EngineConfig(num_partitions=4), directed=False), vids, src, dst


def _adj(vids, src, dst):
    pos = {v: i for i, v in enumerate(vids)}
    adj = [set() for _ in vids]
    for s, d in zip(src, dst):
        adj[pos[s]].add(pos[d]); adj[pos[d]].add(pos[s])
    return adj


def test_anf_matches_dense_replica_and_exact_balls(tmp_path):
    g, vids, src, dst = _graph()
    res = neighborhood_function(g, str(tmp_path / "anf"), p=6)
    n = len(vids)
    adj = _adj(vids, src, dst)

    # dense replica: same registers, same max-propagation
    order = np.argsort(vids)
    vids_sorted = vids[order]
    regs = vertex_registers(vids_sorted, 6)
    pos_sorted = {v: i for i, v in enumerate(vids_sorted)}
    adj_sorted = [set() for _ in vids_sorted]
    for s, d in zip(src, dst):
        adj_sorted[pos_sorted[s]].add(pos_sorted[d])
        adj_sorted[pos_sorted[d]].add(pos_sorted[s])
    replica_nt = [float(estimate_rows(regs).sum())]
    for _ in range(res["t_max"]):
        new = regs.copy()
        for u in range(n):
            for v in adj_sorted[u]:
                new[u] = np.maximum(new[u], regs[v])
        regs = new
        replica_nt.append(float(estimate_rows(regs).sum()))
    assert np.allclose(res["n_t"], replica_nt, rtol=0, atol=1e-9)  # engine ≡ replica

    # exact neighborhood function via BFS balls
    exact = []
    dists = np.zeros((n, n), dtype=np.int64)
    for s0 in range(n):
        d = np.full(n, -1); d[s0] = 0; frontier = [s0]; t = 0
        while frontier:
            t += 1
            nxt = [v for u in frontier for v in adj[u] if d[v] == -1]
            nxt = list(set(nxt))
            for v in nxt: d[v] = t
            frontier = nxt
        dists[s0] = d
    for t in range(res["t_max"] + 1):
        exact.append(int((dists <= t).sum()) if t else n)
    exact = np.asarray(exact, dtype=np.float64)

    got = np.asarray(res["n_t"])
    rel = np.abs(got - exact) / exact
    assert rel.max() < 0.15  # HLL p=6 aggregate error over 64 vertices

    # structure: monotone, closure at N(t_max) ≈ n² (single component)
    assert (np.diff(got) >= -1e-9).all()
    assert abs(got[-1] - n * n) / (n * n) < 0.15
    assert 0 < res["effective_diameter"] <= res["t_max"]


def test_anf_closure_rounds_equal_diameter(tmp_path):
    g, vids, src, dst = _graph(n=40)
    res = neighborhood_function(g, str(tmp_path / "anf2"), p=6)
    adj = _adj(vids, src, dst)
    n = len(vids)
    # exact diameter by BFS
    diam = 0
    for s0 in range(n):
        d = np.full(n, -1); d[s0] = 0; frontier = [s0]; t = 0
        while frontier:
            t += 1
            nxt = [v for u in frontier for v in adj[u] if d[v] == -1]
            nxt = list(set(nxt))
            for v in nxt: d[v] = t
            frontier = nxt
        diam = max(diam, d.max())
    # registers stop changing exactly one round after every ball closes
    assert res["t_max"] in (diam, diam + 1)
