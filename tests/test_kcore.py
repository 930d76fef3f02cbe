"""Coreness decomposition vs the sequential Batagelj–Zaveršnik peeling
oracle, plus planted-structure checks."""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray.data as rd

from efficient_graph_algorithms_ray.config import EngineConfig
from efficient_graph_algorithms_ray.pipelines.graph_build import build_graph
from efficient_graph_algorithms_ray.pipelines.kcore import coreness
from efficient_graph_algorithms_ray.stages.hashing import hash_to_vid


def _peel_oracle(n, edge_pairs):
    """Exact coreness by iterative min-degree peeling."""
    adj = [set() for _ in range(n)]
    for a, b in edge_pairs:
        adj[a].add(b)
        adj[b].add(a)
    deg = np.array([len(s) for s in adj])
    core = np.zeros(n, dtype=np.int64)
    alive = np.ones(n, dtype=bool)
    k = 0
    for _ in range(n):
        if not alive.any():
            break
        k = max(k, int(deg[alive].min()))
        while alive.any() and (deg[alive] <= k).any():
            us = [u for u in np.flatnonzero(alive) if deg[u] <= k]
            for u in us:
                core[u] = k
                alive[u] = False
                for v in adj[u]:
                    if alive[v]:
                        deg[v] -= 1
    return core


def _build(n, edge_pairs):
    vids = hash_to_vid([f"k{i}" for i in range(n)])
    src = np.array([vids[a] for a, b in edge_pairs], dtype=np.uint64)
    dst = np.array([vids[b] for a, b in edge_pairs], dtype=np.uint64)
    ds = rd.from_arrow(
        pa.table(
            {"src": pa.array(src, type=pa.uint64()), "dst": pa.array(dst, type=pa.uint64())}
        )
    )
    return build_graph(ds, EngineConfig(num_partitions=4), directed=False), vids


def test_coreness_matches_peeling_on_random_graph(tmp_path):
    n = 100
    rng = np.random.Generator(np.random.Philox(key=[41, 0]))
    iu, ju = np.triu_indices(n, 1)
    keep = rng.random(len(iu)) < 0.08
    pairs = list(zip(iu[keep].tolist(), ju[keep].tolist()))
    g, vids = _build(n, pairs)
    out, summary = coreness(g, str(tmp_path / "core"))
    df = out.to_pandas().set_index("vid")
    oracle = _peel_oracle(n, pairs)
    for i, v in enumerate(vids):
        assert df.loc[v, "coreness"] == oracle[i]
    assert summary["converged"]


def test_coreness_planted_clique_and_path(tmp_path):
    # 6-clique (coreness 5) with a pendant path (coreness 1)
    pairs = [(a, b) for a in range(6) for b in range(a + 1, 6)]
    pairs += [(5, 6), (6, 7), (7, 8)]
    g, vids = _build(9, pairs)
    out, _ = coreness(g, str(tmp_path / "core2"))
    df = out.to_pandas().set_index("vid")
    oracle = _peel_oracle(9, pairs)
    expect = [5] * 6 + [1, 1, 1]
    assert list(oracle) == expect  # oracle sanity on the known structure
    for i, v in enumerate(vids):
        assert df.loc[v, "coreness"] == expect[i]


def test_coreness_cap_clamps(tmp_path):
    # 8-clique with cap=4: everything clamps at cap−1 = 3
    pairs = [(a, b) for a in range(8) for b in range(a + 1, 8)]
    g, vids = _build(8, pairs)
    out, _ = coreness(g, str(tmp_path / "core3"), cap=4)
    df = out.to_pandas()
    assert (df["coreness"] == 3).all()
