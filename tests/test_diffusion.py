"""Diffusion operators vs dense oracles (same recurrences)."""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray.data as rd

from efficient_graph_algorithms_ray.config import EngineConfig
from efficient_graph_algorithms_ray.pipelines.diffusion import (
    adjacency_matvec,
    convolutional_barycenter,
    heat_kernel_smooth,
    sinkhorn_distance,
)
from efficient_graph_algorithms_ray.pipelines.graph_build import build_graph
from efficient_graph_algorithms_ray.pipelines.walks import vertex_lookup_init
from efficient_graph_algorithms_ray.stages.hashing import hash_to_vid


def _ring_fixture(n=48):
    """Ring + chords: bounded-degree 'mesh-like' graph (FIXTURES.md F5)."""
    names = [f"r{i}" for i in range(n)]
    vids = hash_to_vid(names)
    src, dst = [], []
    for i in range(n):
        src += [vids[i], vids[i]]
        dst += [vids[(i + 1) % n], vids[(i + 5) % n]]
    src = np.array(src, dtype=np.uint64)
    dst = np.array(dst, dtype=np.uint64)
    ds = rd.from_arrow(
        pa.table({"src": pa.array(src, type=pa.uint64()), "dst": pa.array(dst, type=pa.uint64())})
    )
    g = build_graph(ds, EngineConfig(num_partitions=4), directed=False)
    # dense symmetric adjacency in sorted-vid order
    allv = np.unique(np.concatenate([src, dst]))
    A = np.zeros((n, n))
    for s, d in zip(src, dst):
        i, j = np.searchsorted(allv, s), np.searchsorted(allv, d)
        A[i, j] = A[j, i] = 1.0
    return g, allv, A


def _field(allv, seed=3):
    rng = np.random.Generator(np.random.Philox(key=[seed, 0]))
    x = rng.random(len(allv))
    return x, vertex_lookup_init(allv, x)


def test_adjacency_matvec_matches_dense(tmp_path):
    g, allv, A = _ring_fixture()
    x, init = _field(allv)
    for k in (1, 3):
        out, s = adjacency_matvec(g, str(tmp_path / f"mv{k}"), init, k=k)
        df = out.to_pandas().sort_values("vid").reset_index(drop=True)
        expect = x.copy()
        for _ in range(k):
            expect = A @ expect
        assert np.allclose(df["value"].to_numpy(), expect, atol=1e-10)


def test_heat_kernel_matches_dense_euler(tmp_path):
    g, allv, A = _ring_fixture()
    x, init = _field(allv, seed=9)
    t, steps = 0.4, 8
    out, s = heat_kernel_smooth(g, str(tmp_path / "heat"), init, t=t, steps=steps)
    df = out.to_pandas().sort_values("vid").reset_index(drop=True)
    L = np.diag(A.sum(1)) - A
    expect = x.copy()
    for _ in range(steps):
        expect = expect - (t / steps) * (L @ expect)
    assert np.allclose(df["value"].to_numpy(), expect, atol=1e-10)
    # heat flow preserves total mass on a symmetric Laplacian
    assert abs(df["value"].sum() - x.sum()) < 1e-9
    # and contracts toward the mean (smoothing)
    assert df["value"].std() < x.std()


def test_convolutional_barycenter_matches_dense(tmp_path):
    g, allv, A = _ring_fixture()
    n = len(allv)
    rng = np.random.Generator(np.random.Philox(key=[21, 0]))
    mu = np.zeros((n, 2))
    mu[:, 0] = rng.random(n)
    mu[:, 1] = rng.random(n)
    mu /= mu.sum(axis=0)

    def marginals_init(csr):
        pos = np.searchsorted(allv, csr["vids"])
        return mu[pos]

    blur_t, blur_steps, iters = 0.3, 4, 6
    out, hist = convolutional_barycenter(
        g, str(tmp_path / "bary"), marginals_init, 2,
        blur_t=blur_t, blur_steps=blur_steps, n_iters=iters,
    )
    df = out.to_pandas().sort_values("vid").reset_index(drop=True)
    got = df["barycenter"].to_numpy()

    # dense replica of the same algorithm (identical blur operator)
    L = np.diag(A.sum(1)) - A
    def H(X):
        Y = X.copy()
        for _ in range(blur_steps):
            Y = Y - (blur_t / blur_steps) * (L @ Y)
        return Y
    eps = 1e-300
    w = np.ones((n, 2))
    alpha = np.array([0.5, 0.5])
    for _ in range(iters):
        hw = H(w)
        v = mu / np.maximum(hw, eps)
        hv = H(v)
        b = np.exp(np.log(np.maximum(hv, eps)) @ alpha)
        w = w * b[:, None] / np.maximum(hv, eps)
    assert np.allclose(got, b, atol=1e-8)  # engine ≡ dense replica
    assert (got > 0).all() and np.isfinite(got).all()
    assert len(hist) == iters  # per-iteration convergence metric recorded


def test_low_rank_diffusion_matches_dense_replica():
    import pyarrow.parquet as pq

    from efficient_graph_algorithms_ray.pipelines.diffusion import (
        _rff_features,
        _symm_exp_terms,
        low_rank_diffusion_integrate,
    )

    tbl = pq.read_table("/root/testdata/sf0.001/embeddings.parquet")
    ids = tbl.column("vec_id").to_numpy()
    mat = np.vstack(tbl.column("embedding").to_pylist()).astype(np.float64)
    rng = np.random.Generator(np.random.Philox(key=[44, 0]))
    x = rng.random(len(ids))
    ds = rd.from_arrow(tbl.append_column("f", pa.array(x, type=pa.float64())))

    lam, m, epsv, seed = 0.05, 32, 2.0, 7
    out = (
        low_rank_diffusion_integrate(
            ds, "f", lambda_par=lam, num_rand_features=m, epsilon=epsv, seed=seed
        )
        .to_pandas()
        .sort_values("vec_id")
        .reset_index(drop=True)
    )

    # dense replica: same Φ (same seeded W, b), same eigen-solve helper
    rng2 = np.random.Generator(np.random.Philox(key=[seed, 5]))
    w = rng2.standard_normal((m, mat.shape[1]))
    b = rng2.uniform(0.0, 2.0 * np.pi, m)
    phi = _rff_features(mat, w, b, epsv)
    order = np.argsort(ids)
    expect = x + phi @ (_symm_exp_terms(phi.T @ phi, lam) @ (phi.T @ x))
    assert np.allclose(out["value"].to_numpy(), expect[order], atol=1e-8)

    # λ = 0 → expm(0) − I = 0 → exact identity on the field
    ident = (
        low_rank_diffusion_integrate(
            ds, "f", lambda_par=0.0, num_rand_features=m, epsilon=epsv, seed=seed
        )
        .to_pandas()
        .sort_values("vec_id")
        .reset_index(drop=True)
    )
    assert np.allclose(ident["value"].to_numpy(), x[order], atol=1e-12)


def test_sinkhorn_distance_matches_dense_and_orders_targets(tmp_path):
    g, allv, A = _ring_fixture()
    n = len(allv)
    rng = np.random.Generator(np.random.Philox(key=[33, 0]))
    mu = rng.random(n)
    mu /= mu.sum()
    # target 0: μ itself; target 1: an unrelated distribution
    nu = np.empty((n, 2))
    nu[:, 0] = mu
    nu[:, 1] = rng.random(n)
    nu[:, 1] /= nu[:, 1].sum()

    def mu_init(csr):
        return mu[np.searchsorted(allv, csr["vids"])]

    def nu_init(csr):
        return nu[np.searchsorted(allv, csr["vids"])]

    blur_t, blur_steps, iters = 0.3, 4, 8
    dist, hist = sinkhorn_distance(
        g, str(tmp_path / "sink"), mu_init, nu_init, 2,
        blur_t=blur_t, blur_steps=blur_steps, n_iters=iters,
    )

    # dense replica: identical blur operator + update order
    L = np.diag(A.sum(1)) - A

    def H(X):
        Y = X.copy()
        for _ in range(blur_steps):
            Y = Y - (blur_t / blur_steps) * (L @ Y)
        return Y

    eps = 1e-300
    w = np.ones((n, 2))
    for _ in range(iters):
        v = mu[:, None] / np.maximum(H(w), eps)
        w = nu / np.maximum(H(v), eps)
    expect = blur_t * (
        mu[:, None] * np.log(np.maximum(v, eps)) + nu * np.log(np.maximum(w, eps))
    ).sum(axis=0)
    assert np.allclose(dist, expect, atol=1e-8)  # engine ≡ dense replica
    # identical marginals cost (strictly) less than a distant target
    assert dist[0] < dist[1]
    assert len(hist) == iters and np.isfinite(dist).all()


def test_grid_conv_wass_parallelism_invariant():
    """The quantized-integer log-sum reduce makes the barycenter
    bit-identical at any blocking."""
    import numpy as np
    import pyarrow as pa
    import ray.data as rd

    from efficient_graph_algorithms_ray.pipelines.diffusion import (
        grid_conv_wasserstein_barycenter,
    )

    rng = np.random.default_rng(3)
    n, d = 60, 64
    emb = rng.random((n, d))
    tbl = pa.table(
        {
            "vec_id": pa.array(np.arange(n, dtype=np.int64)),
            "embedding": pa.array([list(r) for r in emb], type=pa.list_(pa.float64())),
        }
    )
    a = grid_conv_wasserstein_barycenter(rd.from_arrow(tbl).repartition(1))
    b = grid_conv_wasserstein_barycenter(rd.from_arrow(tbl).repartition(7))
    assert a.column("bary_r6").to_pylist() == b.column("bary_r6").to_pylist()
    s = sum(a.column("bary_r6").to_pylist())
    assert 0.9 < s < 1.1  # barycenter is (approximately) a distribution
