"""Gromov–Wasserstein graph matching — the reference's OT suite.

Reference parity (re-derived from the published algorithms, not a
port): ``gromov_wasserstein_discrepancy`` + ``sinkhorn_knopp_iteration``
(/root/reference/src/ega/algorithms/gromov_wasserstein_graphs.py:108-597,
the proximal-point entropic GW of Xu et al., ICML 2019),
``fgw_lp``-style fused costs (fused_gromov_wasserstein.py:677-974,
Vayer et al. 2019), and the matching/partition readouts
``node_pair_assignment`` / ``graph_partition``
(gromov_wasserstein_graphs.py:753-1032).

Scale contract (why this module is driver-side numpy): graph matching
is a dense optimization over an (n_s × n_t) transport plan — the
OUTPUT is quadratic, so the honest distributed form is matching
between bounded COARSENINGS of big graphs, exactly like the bounded
query sets of ``diffusion_state_distance_pairs``. The distributed half
lives in ``sampled_cost_matrix``: hash-sample k vertices and derive
the k×k structure cost from ONE multi-source walk-kernel superstep run
over the full graph ([n, k] vector field — the engine does the O(E·k)
work; only the k×k block ever reaches the solver). k ≲ 10³ keeps the
solver trivial while the sampled metric reflects the full 100-TB graph.

The L2 tensor trick: for loss (a−b)², the GW gradient decomposes as
cost_st − 2·C_s·T·C_tᵀ with cost_st = (C_s²)p·1ᵀ + 1·(q ᵀC_t²ᵀ)
(Peyré et al. 2016) — O(n²·n) matmuls, never the n²×n² tensor.
"""

from __future__ import annotations

import numpy as np


def sinkhorn_plan(
    cost: np.ndarray,
    p: np.ndarray,
    q: np.ndarray,
    beta: float = 0.1,
    trans0: np.ndarray | None = None,
    max_iter: int = 50,
    error_bound: float = 1e-3,
) -> np.ndarray:
    """Entropic OT plan: min_T <cost, T> + beta·KL(T ‖ trans0)
    (trans0=None → plain entropy). Standard Sinkhorn–Knopp scaling
    (reference: gromov_wasserstein_graphs.py:108-168)."""
    p = p.reshape(-1, 1)
    q = q.reshape(-1, 1)
    # shifting cost by a constant leaves the constrained optimum
    # unchanged but keeps exp() in range for small beta / negative
    # costs; flooring the kernel bounds the scaling vectors (the
    # proximal trans0 can be extremely peaky after many outer rounds)
    with np.errstate(under="ignore"):
        kernel = np.exp(-(cost - cost.min()) / beta)
    if trans0 is not None:
        kernel = kernel * (trans0 / trans0.max())
    a = np.ones_like(p) / len(p)
    rel = np.inf
    it = 0
    b = np.ones_like(q)
    while rel > error_bound and it < max_iter:
        b = q / np.maximum(kernel.T @ a, 1e-300)
        a_new = p / np.maximum(kernel @ b, 1e-300)
        rel = float(np.abs(a_new - a).sum() / max(np.abs(a).sum(), 1e-300))
        a = a_new
        # scaling freedom (a·c, b/c): renormalize so a never overflows
        amax = float(a.max())
        if amax > 0:
            a = a / amax
        it += 1
    b = q / np.maximum(kernel.T @ a, 1e-300)
    return (a @ b.T) * kernel


def _init_plan(p: np.ndarray, q: np.ndarray, seed: int = 0) -> np.ndarray:
    """Deterministically perturbed product coupling: the plain product
    p·qᵀ is a stationary point of GW on vertex-transitive structures
    (constant local cost → Sinkhorn returns it unchanged), so a small
    seeded multiplicative perturbation breaks the symmetry; the first
    proximal Sinkhorn restores the marginals."""
    rng = np.random.Generator(np.random.Philox(key=[13, 7 + seed]))
    noise = 1.0 + 0.05 * rng.uniform(-1.0, 1.0, (len(p), len(q)))
    return np.outer(p, q) * noise


def _gw_cost_const(C1: np.ndarray, C2: np.ndarray, p: np.ndarray, q: np.ndarray) -> np.ndarray:
    """cost_st of the L2 tensor decomposition (f1⊕f2 term)."""
    f1 = (C1**2) @ p.reshape(-1, 1)  # (n_s, 1)
    f2 = (C2**2) @ q.reshape(-1, 1)  # (n_t, 1)
    return f1 + f2.T  # broadcast outer sum


def gromov_wasserstein(
    C1: np.ndarray,
    C2: np.ndarray,
    p: np.ndarray | None = None,
    q: np.ndarray | None = None,
    *,
    beta: float = 0.1,
    outer_iter: int = 30,
    inner_iter: int = 50,
    tol: float = 1e-6,
    n_restarts: int = 1,
    trans0: np.ndarray | None = None,
) -> tuple[np.ndarray, float]:
    """Entropic proximal-point GW: returns (transport T, discrepancy).

    Per outer iteration the local cost is cost_st − 2·C1·T·C2ᵀ and the
    plan is re-solved by Sinkhorn with KL(T‖T_prev) (the proximal
    term). GW is non-convex — ``n_restarts`` deterministic perturbed
    inits are solved and the lowest-discrepancy plan wins (the
    reference's outer sweep over hyperparameters plays the same role).
    ``trans0`` warm-starts a single run (barycenter fixed-point use).
    """
    n_s, n_t = len(C1), len(C2)
    p = np.full(n_s, 1.0 / n_s) if p is None else np.asarray(p, dtype=np.float64)
    q = np.full(n_t, 1.0 / n_t) if q is None else np.asarray(q, dtype=np.float64)
    const = _gw_cost_const(C1, C2, p, q)
    best: tuple[np.ndarray, float] | None = None
    for r in range(max(1, n_restarts) if trans0 is None else 1):
        T = _init_plan(p, q, seed=r) if trans0 is None else trans0
        d_prev = np.inf
        for _ in range(outer_iter):
            cost = const - 2.0 * (C1 @ T @ C2.T)
            T = sinkhorn_plan(cost, p, q, beta=beta, trans0=T, max_iter=inner_iter)
            d = float((cost * T).sum())
            if abs(d_prev - d) < tol:
                d_prev = d
                break
            d_prev = d
        cost = const - 2.0 * (C1 @ T @ C2.T)
        d = float((cost * T).sum())
        if best is None or d < best[1]:
            best = (T, d)
    return best


def fused_gromov_wasserstein(
    C1: np.ndarray,
    C2: np.ndarray,
    M: np.ndarray,
    alpha: float = 0.5,
    p: np.ndarray | None = None,
    q: np.ndarray | None = None,
    *,
    beta: float = 0.1,
    outer_iter: int = 30,
    inner_iter: int = 50,
    tol: float = 1e-6,
    trans0: np.ndarray | None = None,
) -> tuple[np.ndarray, float]:
    """Fused GW (Vayer et al.): structure + feature cost
    (1−α)·M + α·GW-term; α=0 degrades to plain entropic OT on M
    (the pytest identity), α=1 to pure GW. ``trans0`` warm-starts
    (barycenter fixed-point use)."""
    n_s, n_t = len(C1), len(C2)
    p = np.full(n_s, 1.0 / n_s) if p is None else np.asarray(p, dtype=np.float64)
    q = np.full(n_t, 1.0 / n_t) if q is None else np.asarray(q, dtype=np.float64)
    T = _init_plan(p, q) if trans0 is None else trans0
    const = _gw_cost_const(C1, C2, p, q)
    d_prev = np.inf
    for _ in range(outer_iter):
        gw_term = const - 2.0 * (C1 @ T @ C2.T)
        cost = (1.0 - alpha) * M + alpha * gw_term
        T = sinkhorn_plan(cost, p, q, beta=beta, trans0=T, max_iter=inner_iter)
        d = float((cost * T).sum())
        if abs(d_prev - d) < tol:
            d_prev = d
            break
        d_prev = d
    gw_term = const - 2.0 * (C1 @ T @ C2.T)
    cost = (1.0 - alpha) * M + alpha * gw_term
    return T, float((cost * T).sum())


def node_pair_assignment(T: np.ndarray, source_ids, target_ids) -> list[tuple]:
    """Matched (source, target) pairs by row-argmax of the transport
    (reference node_pair_assignment, gromov_wasserstein_graphs.py:753)."""
    cols = np.argmax(T, axis=1)
    return [(source_ids[i], target_ids[int(cols[i])]) for i in range(len(T))]


def gw_graph_partition(
    C: np.ndarray, k: int, p: np.ndarray | None = None, *, beta: float = 0.05
) -> np.ndarray:
    """Partition a graph into k blocks by matching it to a k-node
    disconnected template (identity cost) — the reference's
    GW-partition driver (graph_partition, :922-1032). Returns the block
    id per vertex (transport column argmax)."""
    template = 1.0 - np.eye(k)
    q = np.full(k, 1.0 / k)
    T, _ = gromov_wasserstein(C, template, p, q, beta=beta)
    return np.argmax(T, axis=1)


def recursive_gw_partition(
    C: np.ndarray,
    depth: int = 2,
    *,
    beta: float = 0.05,
    min_block: int = 4,
) -> np.ndarray:
    """Recursive GW bisection (the reference's
    ``recursive_graph_partition`` driver, gromov_wasserstein_graphs.py
    :960-1112): split into 2 blocks by template matching, recurse into
    each block's cost submatrix until ``depth`` levels or blocks get
    smaller than ``min_block``. Returns int labels in [0, 2^depth)."""
    n = len(C)
    labels = np.zeros(n, dtype=np.int64)
    if depth <= 0 or n < 2 * min_block:
        return labels
    half = gw_graph_partition(C, 2, beta=beta)
    for side in (0, 1):
        idx = np.flatnonzero(half == side)
        if len(idx) >= 2 * min_block and depth > 1:
            sub = recursive_gw_partition(
                C[np.ix_(idx, idx)], depth - 1, beta=beta, min_block=min_block
            )
        else:
            sub = np.zeros(len(idx), dtype=np.int64)
        labels[idx] = side * (1 << (depth - 1)) + sub
    return labels


def estimate_target_distribution(probs: list[np.ndarray], dim_t: int = 2) -> np.ndarray:
    """Average of sorted-descending source distributions, resampled to
    ``dim_t`` points (reference ``estimate_target_distribution``,
    gromov_wasserstein_graphs.py:731-750)."""
    p_t = np.zeros(dim_t)
    x_t = np.linspace(0, 1, dim_t)
    for p_s in probs:
        p_s = np.sort(np.asarray(p_s, dtype=np.float64).ravel())[::-1]
        x_s = np.linspace(0, 1, len(p_s))
        p_t += np.interp(x_t, x_s, p_s)
    return p_t / p_t.sum()


def _struct_init(C: np.ndarray, p: np.ndarray, q: np.ndarray, seed: int = 0) -> np.ndarray:
    """Product coupling with a cost-rank-anchored perturbation: vertex
    i's normalized row-sum rank in C is matched against the barycenter
    column index, so alike vertices across graphs prefer the same
    columns. A 10× smaller seeded term breaks ties on graphs with
    constant row sums."""
    n, m = len(p), len(q)
    r = C.sum(axis=1)
    rank = np.argsort(np.argsort(r)) / max(n - 1, 1)
    col = np.arange(m) / max(m - 1, 1)
    noise = 1.0 + 0.05 * np.outer(2.0 * rank - 1.0, 2.0 * col - 1.0)
    rng = np.random.Generator(np.random.Philox(key=[13, 7 + seed]))
    noise = noise * (1.0 + 0.005 * rng.uniform(-1.0, 1.0, (n, m)))
    return np.outer(p, q) * noise


def gromov_wasserstein_average(
    transports: list[np.ndarray],
    costs: list[np.ndarray],
    p_center: np.ndarray,
    weights: list[float] | None = None,
) -> np.ndarray:
    """L2 barycenter cost update Σ_n w_n·TᵀC_nT / (p_c·p_cᵀ)
    (reference ``gromov_wasserstein_average``,
    gromov_wasserstein_graphs.py:598-635, L2 branch)."""
    k = len(costs)
    if weights is None:
        weights = [1.0 / k] * k
    bary = np.zeros((len(p_center), len(p_center)))
    for w, C, T in zip(weights, costs, transports):
        bary += w * (T.T @ (C @ T))
    return bary / np.outer(p_center, p_center)


def gromov_wasserstein_barycenter(
    costs: list[np.ndarray],
    ps: list[np.ndarray] | None = None,
    p_center: np.ndarray | None = None,
    *,
    n_center: int | None = None,
    weights: list[float] | None = None,
    beta: float = 0.1,
    max_iter: int = 20,
    cost_bound: float = 1e-4,
) -> tuple[np.ndarray, list[np.ndarray], list[float]]:
    """One-step GW barycenter fixed point over k graphs (reference
    ``gromov_wasserstein_barycenter``, gromov_wasserstein_graphs.py:
    638-715): alternate (a) per-graph GW transports to the current
    barycenter (warm-started), (b) the L2 cost average. Returns
    (barycenter cost [n_c, n_c], transports, per-iter Σ d_gw).

    Source cost matrices come from ``sampled_cost_matrix`` — the
    distributed front-end keeps each at a bounded k regardless of
    graph size, exactly as for pairwise GW distance.
    """
    k = len(costs)
    if ps is None:
        ps = [np.full(len(C), 1.0 / len(C)) for C in costs]
    if p_center is None:
        if n_center is None:
            raise ValueError("give p_center or n_center")
        p_center = estimate_target_distribution(ps, n_center)
    p_center = np.asarray(p_center, dtype=np.float64).ravel()
    # structure-anchored perturbed couplings: the plain product is a
    # SADDLE of the GW objective (see _init_plan), and independent
    # per-graph noise breaks it in arbitrary directions — which lets
    # different graphs lock onto DIFFERENT barycenter-column
    # alignments. Anchoring the perturbation on each vertex's cost
    # row-sum rank steers structurally-alike vertices of every graph
    # toward the same barycenter columns (consistent multi-graph
    # labels); a small seeded term still covers vertex-transitive
    # graphs whose row sums are constant.
    transports = [
        _struct_init(C, p, p_center, seed=n) for n, (C, p) in enumerate(zip(costs, ps))
    ]
    bary0 = np.diag(p_center)
    d_sum_hist: list[float] = []
    for _ in range(max_iter):
        d_sum = 0.0
        for n in range(k):
            transports[n], d = gromov_wasserstein(
                costs[n], bary0, ps[n], p_center, beta=beta, trans0=transports[n]
            )
            d_sum += d
        bary = gromov_wasserstein_average(transports, costs, p_center, weights)
        rel = float(np.abs(bary - bary0).sum() / max(np.abs(bary0).sum(), 1e-300))
        bary0 = bary
        d_sum_hist.append(d_sum)
        if rel < cost_bound:
            break
    return bary0, transports, d_sum_hist


def multi_graph_partition(
    costs: list[np.ndarray],
    k: int,
    ps: list[np.ndarray] | None = None,
    *,
    beta: float = 0.05,
    max_iter: int = 20,
) -> tuple[list[np.ndarray], np.ndarray]:
    """Consistent multi-graph partition via the GW barycenter against a
    k-node template (reference ``multi_graph_partition``,
    gromov_wasserstein_graphs.py:1032-1210): every graph transports to
    the SHARED barycenter; block id = transport column argmax, so block
    labels align across graphs (matched communities). Returns
    (per-graph label arrays, barycenter cost matrix)."""
    bary, transports, _ = gromov_wasserstein_barycenter(
        costs, ps, n_center=k, beta=beta, max_iter=max_iter
    )
    labels = [np.argmax(T, axis=1).astype(np.int64) for T in transports]
    return labels, bary


def fgw_barycenters(
    Ys: list[np.ndarray],
    Cs: list[np.ndarray],
    ps: list[np.ndarray] | None = None,
    *,
    n_center: int,
    alpha: float = 0.5,
    lambdas: list[float] | None = None,
    beta: float = 0.1,
    max_iter: int = 20,
    tol: float = 1e-6,
) -> tuple[np.ndarray, np.ndarray, list[np.ndarray], list[float]]:
    """Fused-GW barycenter of attributed graphs (reference
    ``fgw_barycenters``, fused_gromov_wasserstein.py:1233-1465 — eq (5)
    of Vayer et al. 2019): alternate per-sample FGW transports with

        X ← (Σ_s λ_s·T_sᵀY_s) / p_c      (feature barycentric map)
        C ← (Σ_s λ_s·T_sᵀC_sT_s) / p_cp_cᵀ  (sq-euclidean structure avg)

    Feature cost M_s = squared-euclidean distance between Y_s and X.
    Returns (X [n_c, d], C [n_c, n_c], transports, per-iter Σ d_fgw).
    Solver substitution as everywhere in this module: entropic
    proximal-point plans instead of Frank-Wolfe+Armijo (the exact-LP
    pytest cross-check bounds the bias).
    """
    k = len(Cs)
    if ps is None:
        ps = [np.full(len(C), 1.0 / len(C)) for C in Cs]
    if lambdas is None:
        lambdas = [1.0 / k] * k
    p_c = estimate_target_distribution(ps, n_center)
    d = Ys[0].shape[1]
    transports = [
        _struct_init(C, p, p_c, seed=n) for n, (C, p) in enumerate(zip(Cs, ps))
    ]
    # barycentric inits from the transports themselves
    X = sum(
        lam * (T.T @ Y) for lam, T, Y in zip(lambdas, transports, Ys)
    ) / p_c.reshape(-1, 1)
    C = gromov_wasserstein_average(transports, Cs, p_c, lambdas)
    d_hist: list[float] = []
    for _ in range(max_iter):
        d_sum = 0.0
        for s in range(k):
            M = (
                (Ys[s] ** 2).sum(axis=1, keepdims=True)
                - 2.0 * (Ys[s] @ X.T)
                + (X**2).sum(axis=1)[None, :]
            )
            transports[s], d_s = fused_gromov_wasserstein(
                Cs[s], C, M, alpha, ps[s], p_c, beta=beta, trans0=transports[s]
            )
            d_sum += lambdas[s] * d_s
        X = sum(
            lam * (T.T @ Y) for lam, T, Y in zip(lambdas, transports, Ys)
        ) / p_c.reshape(-1, 1)
        C = gromov_wasserstein_average(transports, Cs, p_c, lambdas)
        d_hist.append(d_sum)
        if len(d_hist) >= 2 and abs(d_hist[-2] - d_hist[-1]) < tol:
            break
    assert X.shape == (n_center, d)
    return X, C, transports, d_hist


def hungarian(cost: np.ndarray) -> np.ndarray:
    """Exact min-cost assignment, O(n³) shortest-augmenting-path with
    potentials (the classical Kuhn–Munkres/Jonker-Volgenant scheme) —
    the scipy/POT-free ``emd`` core for uniform equal marginals.
    Returns perm with row i matched to column perm[i]."""
    c = np.asarray(cost, dtype=np.float64)
    n = len(c)
    INF = np.inf
    u = np.zeros(n + 1)
    v = np.zeros(n + 1)
    p = np.zeros(n + 1, dtype=np.int64)  # p[j] = row matched to column j
    way = np.zeros(n + 1, dtype=np.int64)
    for i in range(1, n + 1):
        p[0] = i
        j0 = 0
        minv = np.full(n + 1, INF)
        used = np.zeros(n + 1, dtype=bool)
        while True:
            used[j0] = True
            i0 = p[j0]
            delta = INF
            j1 = -1
            for j in range(1, n + 1):
                if not used[j]:
                    cur = c[i0 - 1, j - 1] - u[i0] - v[j]
                    if cur < minv[j]:
                        minv[j] = cur
                        way[j] = j0
                    if minv[j] < delta:
                        delta = minv[j]
                        j1 = j
            for j in range(n + 1):
                if used[j]:
                    u[p[j]] += delta
                    v[j] -= delta
                else:
                    minv[j] -= delta
            j0 = j1
            if p[j0] == 0:
                break
        while True:
            j1 = way[j0]
            p[j0] = p[j1]
            j0 = j1
            if j0 == 0:
                break
    perm = np.zeros(n, dtype=np.int64)
    for j in range(1, n + 1):
        perm[p[j] - 1] = j - 1
    return perm


def emd_uniform(M: np.ndarray) -> np.ndarray:
    """Exact OT plan for uniform equal square marginals: by Birkhoff an
    optimal vertex is a permutation matrix / n (Hungarian core)."""
    n = len(M)
    perm = hungarian(M)
    T = np.zeros((n, n))
    T[np.arange(n), perm] = 1.0 / n
    return T


def frank_wolfe_gw(
    C1: np.ndarray,
    C2: np.ndarray,
    *,
    max_iter: int = 100,
    tol: float = 1e-9,
    linesearch: str = "exact",
    armijo_c: float = 1e-4,
    armijo_rho: float = 0.5,
    trans0: np.ndarray | None = None,
) -> tuple[np.ndarray, float]:
    """Frank-Wolfe (conditional-gradient) GW with EXACT emd direction —
    the reference's ``cg`` + ``emd`` solver path (optimization.py:33-416,
    fused_gromov_wasserstein.py:362-974) restricted to uniform equal
    marginals (where emd = assignment, solved exactly by
    :func:`hungarian`). The 1-d line-search (#80) is either the
    CLOSED-FORM quadratic minimizer (f along the segment is
    aτ² + bτ + c with a = −2⟨C1ΔC2ᵀ, Δ⟩, b = ⟨const, Δ⟩ −
    4⟨C1TC2ᵀ, Δ⟩ for symmetric costs — the reference's
    solve_linesearch) or Armijo backtracking. Returns (T, discrepancy);
    an independent cross-check of the entropic proximal solver.
    """
    n = len(C1)
    assert C2.shape[0] == n, "frank_wolfe_gw: uniform equal marginals only"
    p = np.full(n, 1.0 / n)
    const = _gw_cost_const(C1, C2, p, p)

    def grad_half(T):
        return const - 2.0 * (C1 @ T @ C2.T)

    def f(T):
        return float((grad_half(T) * T).sum())

    T = np.outer(p, p) if trans0 is None else trans0.copy()
    f_prev = f(T)
    for _ in range(max_iter):
        G = 2.0 * grad_half(T)  # ∇f for the quadratic objective
        D = emd_uniform(G) - T  # FW direction toward an exact vertex
        a = -2.0 * float((C1 @ D @ C2.T * D).sum())
        b = float((const * D).sum()) - 4.0 * float((C1 @ T @ C2.T * D).sum())
        if linesearch == "exact":
            if a > 1e-18:
                tau = float(np.clip(-b / (2.0 * a), 0.0, 1.0))
            else:  # concave/linear along the segment: better endpoint
                tau = 1.0 if a + b < 0 else 0.0
        else:  # Armijo backtracking on the true objective
            tau = 1.0
            f0 = f(T)
            slope = b  # directional derivative at τ=0
            while tau > 1e-12 and f(T + tau * D) > f0 + armijo_c * tau * slope:
                tau *= armijo_rho
        T = T + tau * D
        f_cur = f(T)
        if abs(f_prev - f_cur) < tol:
            break
        f_prev = f_cur
    return T, f(T)


def exact_ot_cost_bruteforce(M: np.ndarray) -> float:
    """Exact OT optimum for UNIFORM square marginals: by Birkhoff–von
    Neumann an optimal vertex is a permutation/n, so the LP optimum is
    the min-cost assignment — enumerated exactly for tiny n (the
    POT/scipy-free LP oracle pinning the entropic solver's bias,
    reference ``optimization.py:358`` emd branch)."""
    from itertools import permutations

    n = len(M)
    assert M.shape == (n, n) and n <= 8, "brute-force LP oracle is for tiny n"
    best = np.inf
    idx = np.arange(n)
    for perm in permutations(range(n)):
        c = float(M[idx, list(perm)].sum())
        if c < best:
            best = c
    return best / n


def sampled_cost_matrix(
    graph,
    ckpt_dir: str,
    k: int = 64,
    *,
    walk_k: int = 3,
    seed: int = 42,
):
    """k×k structure-cost matrix of a (possibly huge) ShardedGraph from
    ONE distributed multi-source walk run — the engine front-end that
    makes GW applicable at scale.

    Sample k vertices by smallest splitmix64(vid ⊕ seed) (uniform,
    deterministic, partition-independent), run a k-source k-step walk
    ([n, k] field, O(E·k) distributed work), then read ONLY the k×k
    similarity block S[i, j] = mass_j(sample_i) and return
    cost = 1 − S/max(S). Returns (cost [k, k], sampled vids [k]).
    """
    import ray

    from ..sources.edges_synth import _splitmix64
    from .walks import multi_source_pagerank

    # deterministic bottom-k sample of the vertex set: a remote task per
    # shard returns only its k (vid, hash) candidates — the driver merge
    # sees k·P tiny rows, never a shard
    @ray.remote
    def _bottomk(csr: dict, kk: int, sd: int):
        vids = csr["vids"]
        h = _splitmix64(vids ^ np.uint64(sd))
        take = np.argsort(h, kind="stable")[:kk]
        return vids[take], h[take]

    cands = ray.get([_bottomk.remote(graph.refs[p], k, seed) for p in graph.parts])
    vids_all = np.concatenate([c[0] for c in cands])
    h_all = np.concatenate([c[1] for c in cands])
    sel = np.argsort(h_all, kind="stable")[:k]
    sample = np.sort(vids_all[sel])

    scores, _ = multi_source_pagerank(
        graph,
        ckpt_dir,
        [[int(v)] for v in sample],
        damping=1.0,  # pure walk powers
        tol=0.0,
        max_iters=walk_k,
    )
    # distributed filter: only the k sample rows reach the driver
    import pyarrow as pa
    import pyarrow.compute as pc

    vset = pa.array(sample, type=pa.uint64())

    def _flt(b: pa.Table) -> pa.Table:
        return b.filter(pc.is_in(b.column("vid"), value_set=vset))

    from ..util import list_rows

    rows = {}
    for b in scores.map_batches(_flt, batch_format="pyarrow").iter_batches(
        batch_size=None, batch_format="pyarrow"
    ):
        for vid, vec in zip(
            b.column("vid").to_numpy(zero_copy_only=False), list_rows(b, "scores")
        ):
            rows[int(vid)] = np.asarray(vec, dtype=np.float64)
    S = np.vstack([rows[int(v)] for v in sample])  # (k, k): S[i, j] = mass_j at sample_i
    S = 0.5 * (S + S.T)  # symmetrize (walk mass is direction-dependent)
    mx = S.max()
    cost = 1.0 - (S / mx if mx > 0 else S)
    np.fill_diagonal(cost, 0.0)
    return cost, sample
