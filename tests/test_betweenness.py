"""Seed-set Brandes betweenness vs a dense Python reference."""

from __future__ import annotations

import tempfile
from collections import deque

import numpy as np
import pyarrow as pa
import ray.data as rd

from efficient_graph_algorithms_ray.config import EngineConfig
from efficient_graph_algorithms_ray.pipelines.betweenness import seed_betweenness
from efficient_graph_algorithms_ray.pipelines.graph_build import build_graph


def _graph(edges, n_parts=4):
    u = np.array([e[0] for e in edges], dtype=np.uint64)
    v = np.array([e[1] for e in edges], dtype=np.uint64)
    ds = rd.from_arrow(pa.table({"src": pa.array(u), "dst": pa.array(v)}))
    return build_graph(ds, EngineConfig(num_partitions=n_parts), directed=False)


def _brandes_delta(edges, source, max_rounds):
    """Dense Brandes dependency δ_source(v), BFS truncated at max_rounds."""
    adj: dict[int, set[int]] = {}
    for a, b in edges:
        adj.setdefault(int(a), set()).add(int(b))
        adj.setdefault(int(b), set()).add(int(a))
    dist = {v: -1 for v in adj}
    sigma = {v: 0.0 for v in adj}
    dist[source] = 0
    sigma[source] = 1.0
    q = deque([source])
    order = []
    while q:
        v = q.popleft()
        if dist[v] >= max_rounds:
            continue
        for w in adj[v]:
            if dist[w] == -1:
                dist[w] = dist[v] + 1
                q.append(w)
            if dist[w] == dist[v] + 1:
                sigma[w] += sigma[v]
        order.append(v)
    delta = {v: 0.0 for v in adj}
    for v in sorted(adj, key=lambda x: -dist[x]):
        if dist[v] <= 0:
            continue
        for w in adj[v]:
            if dist[w] == dist[v] - 1:
                delta[w] += sigma[w] / sigma[v] * (1.0 + delta[v])
    return dist, sigma, delta


def _run(edges, seeds, rounds):
    g = _graph(edges)
    out, _, _ = seed_betweenness(
        g, tempfile.mkdtemp(prefix="btw_", dir="/tmp"), seeds, rounds=rounds
    )
    df = out.to_pandas()
    mat = np.stack(df["deltas"].to_numpy())
    return dict(zip(df["vid"].astype(np.int64), [tuple(r) for r in mat]))


def test_betweenness_path_graph():
    # P5: 1-2-3-4-5; exact δ values are classic
    edges = [(1, 2), (2, 3), (3, 4), (4, 5)]
    got = _run(edges, seeds=[1], rounds=6)
    _, _, delta = _brandes_delta(edges, 1, 6)
    for v, d in delta.items():
        assert abs(got[v][0] - d) < 1e-12, (v, got[v][0], d)
    # known values: from source 1, δ(2)=3, δ(3)=2, δ(4)=1
    assert got[2][0] == 3.0 and got[3][0] == 2.0 and got[4][0] == 1.0


def test_betweenness_random_graph_multi_seed():
    rng = np.random.default_rng(11)
    n = 60
    edges = sorted(
        {
            (int(min(a, b)), int(max(a, b)))
            for a, b in rng.integers(1, n + 1, size=(150, 2))
            if a != b
        }
    )
    seeds = [1, 5, 9]
    rounds = 5
    got = _run(edges, seeds, rounds)
    for j, s in enumerate(seeds):
        if s not in {v for e in edges for v in e}:
            continue
        _, _, delta = _brandes_delta(edges, s, rounds)
        for v, d in delta.items():
            assert abs(got[v][j] - d) < 1e-9, (s, v, got[v][j], d)


def test_betweenness_diamond_sigma_split():
    # diamond 1-2, 1-3, 2-4, 3-4: two shortest paths 1→4 ⇒ δ(2)=δ(3)=0.5
    edges = [(1, 2), (1, 3), (2, 4), (3, 4)]
    got = _run(edges, seeds=[1], rounds=4)
    assert abs(got[2][0] - 0.5) < 1e-12
    assert abs(got[3][0] - 0.5) < 1e-12
    assert got[4][0] == 0.0
