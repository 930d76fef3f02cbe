"""Gromov–Wasserstein matching suite vs structural ground truths."""

from __future__ import annotations

import collections

import numpy as np
import pyarrow as pa
import ray.data as rd

from efficient_graph_algorithms_ray.pipelines.matching import (
    fused_gromov_wasserstein,
    gromov_wasserstein,
    gw_graph_partition,
    node_pair_assignment,
    sampled_cost_matrix,
    sinkhorn_plan,
)


def _tree_cost(edges, n) -> np.ndarray:
    adj = collections.defaultdict(list)
    for a, b in edges:
        adj[a].append(b)
        adj[b].append(a)
    C = np.zeros((n, n))
    for s in range(n):
        dist = {s: 0}
        q = [s]
        while q:
            u = q.pop(0)
            for w in adj[u]:
                if w not in dist:
                    dist[w] = dist[u] + 1
                    q.append(w)
        for t in range(n):
            C[s, t] = dist[t]
    return C


_TREE = [(0, 1), (1, 2), (2, 3), (3, 4), (1, 5), (1, 6), (3, 7), (7, 8), (7, 9)]


def test_gw_identical_graphs_zero():
    C = _tree_cost(_TREE, 10)
    T, d = gromov_wasserstein(C, C, beta=0.02, outer_iter=100)
    assert abs(d) < 1e-6
    np.testing.assert_allclose(T.sum(axis=1), np.full(10, 0.1), atol=1e-6)
    np.testing.assert_allclose(T.sum(axis=0), np.full(10, 0.1), atol=1e-6)


def test_gw_separates_structures():
    C = _tree_cost(_TREE, 10)
    star = np.full((10, 10), 2.0)
    star[0, :] = 1.0
    star[:, 0] = 1.0
    np.fill_diagonal(star, 0.0)
    _, d_same = gromov_wasserstein(C, C.copy(), beta=0.02, outer_iter=100)
    _, d_diff = gromov_wasserstein(C, star, beta=0.02, outer_iter=100, n_restarts=3)
    assert d_diff > d_same + 0.1


def test_gw_permutation_recovery():
    """Relabeled isomorphic tree: the best-of-restarts plan recovers an
    adjacency-preserving node matching with zero discrepancy."""
    C = _tree_cost(_TREE, 10)
    perm = np.roll(np.arange(10), 3)
    C2 = C[np.ix_(perm, perm)]
    T, d = gromov_wasserstein(C, C2, beta=0.02, outer_iter=100, n_restarts=5)
    assert abs(d) < 1e-6
    m = np.array([t for _, t in node_pair_assignment(T, list(range(10)), list(range(10)))])
    assert np.allclose(C, C2[np.ix_(m, m)])  # structure-preserving map


def test_fgw_alpha_zero_is_plain_ot():
    C1 = C2 = _tree_cost(_TREE, 10)
    rng = np.random.Generator(np.random.Philox(key=[5, 0]))
    M = rng.uniform(0, 1, (10, 10))
    p = q = np.full(10, 0.1)
    T_fgw, _ = fused_gromov_wasserstein(C1, C2, M, alpha=0.0, beta=0.1)
    # α=0 ⇒ the proximal loop iterates Sinkhorn on M alone — replay it
    from efficient_graph_algorithms_ray.pipelines.matching import _init_plan

    T = _init_plan(p, q, seed=0)
    for _ in range(30):
        T = sinkhorn_plan(M, p, q, beta=0.1, trans0=T)
    np.testing.assert_allclose(T_fgw, T, atol=1e-8)


def test_gw_partition_two_cliques():
    n = 12
    C = np.full((n, n), 2.0)
    for blk in (range(6), range(6, 12)):
        for i in blk:
            for j in blk:
                C[i, j] = 0.0 if i == j else 1.0
    C[5, 6] = C[6, 5] = 1.0
    lab = gw_graph_partition(C, 2, beta=0.05)
    assert len(set(lab[:5])) == 1
    assert len(set(lab[7:])) == 1
    assert lab[0] != lab[11]


def test_sampled_cost_matrix_from_engine(tmp_path):
    """Engine front-end: k×k cost from one multi-source walk run —
    deterministic, symmetric, zero diagonal, within-cluster < cross."""
    from efficient_graph_algorithms_ray.config import EngineConfig
    from efficient_graph_algorithms_ray.pipelines.graph_build import build_graph

    rng = np.random.Generator(np.random.Philox(key=[11, 0]))
    src, dst = [], []
    for lo in (0, 40):
        for _ in range(600):
            a, b = rng.integers(lo, lo + 40, 2)
            if a != b:
                src.append(a)
                dst.append(b)
    for _ in range(5):
        src.append(int(rng.integers(0, 40)))
        dst.append(int(rng.integers(40, 80)))
    edges = rd.from_arrow(
        pa.table(
            {
                "src": pa.array(np.array(src, dtype=np.uint64), type=pa.uint64()),
                "dst": pa.array(np.array(dst, dtype=np.uint64), type=pa.uint64()),
            }
        )
    )
    g = build_graph(edges, EngineConfig(num_partitions=4), directed=False)
    cost, sample = sampled_cost_matrix(g, str(tmp_path / "gw"), k=16, walk_k=2)
    assert cost.shape == (16, 16)
    np.testing.assert_allclose(cost, cost.T)
    np.testing.assert_allclose(np.diag(cost), 0.0)
    grp = (sample >= 40).astype(int)
    same = cost[(grp[:, None] == grp[None, :]) & ~np.eye(16, dtype=bool)]
    cross = cost[grp[:, None] != grp[None, :]]
    assert same.mean() < cross.mean()
    cost2, sample2 = sampled_cost_matrix(g, str(tmp_path / "gw2"), k=16, walk_k=2)
    assert (sample == sample2).all()
    np.testing.assert_allclose(cost, cost2)


def test_recursive_gw_partition_four_cliques():
    """Recursive bisection separates 4 cliques into 4 distinct labels."""
    from efficient_graph_algorithms_ray.pipelines.matching import recursive_gw_partition

    n = 24
    C = np.full((n, n), 2.0)
    blocks = [range(0, 6), range(6, 12), range(12, 18), range(18, 24)]
    for blk in blocks:
        for i in blk:
            for j in blk:
                C[i, j] = 0.0 if i == j else 1.0
    # sparse inter-block links so the graph is connected
    for a, b in ((5, 6), (11, 12), (17, 18)):
        C[a, b] = C[b, a] = 1.0
    lab = recursive_gw_partition(C, depth=2, beta=0.05, min_block=3)
    # every clique is label-pure and the four cliques get 4 labels
    per_block = [set(lab[list(blk)[1:-1]]) for blk in blocks]  # interior nodes
    assert all(len(sb) == 1 for sb in per_block)
    assert len(set.union(*per_block)) == 4
