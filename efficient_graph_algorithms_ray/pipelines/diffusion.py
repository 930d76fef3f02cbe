"""Diffusion operators: raw adjacency matvec, heat-kernel smoothing,
and the Sinkhorn-style convolutional barycenter control flow.

Reference parity:

- ``adjacency_matvec`` — the unnormalized A·x gather that underlies
  the diffusion integrators (``DFGFIntegrator`` applies exp(λA)·x,
  /root/reference/src/ega/algorithms/graph_diffusion_gf_integrator.py:6-96;
  ``interconnected_kernel``'s A² term, graph_kernels.py:109-112).
- ``heat_kernel_smooth`` — exp(-t·L)·x via explicit-Euler series
  (x ← x - (t/k)·(D_w·x - A·x), k steps), the distributed stand-in
  for ``heat_kernel``'s dense ``expm`` (graph_kernels.py:101-105) and
  the pre-factored solves of ``blur_on_mesh``
  (/root/reference/src/ega/util/blur_on_mesh.py:5-30). Correctness is
  asserted exactly vs a dense NumPy Euler oracle (same recurrence);
  accuracy to the true matrix exponential is a step-count property,
  not an engine property.
- ``convolutional_barycenter`` — the Bregman-projection fixed-point
  loop of ``ConvolutionalBarycenter.get_convolutional_barycenter``
  (/root/reference/src/ega/algorithms/convolutional_barycenter.py:5-81):
  per-iteration: blur each marginal, elementwise divide/accumulate in
  log space, convergence on a global scalar — the same
  iterate-matvec-until-tolerance control flow as PageRank, driven
  over [n, d] vector fields so all d marginals blur in ONE superstep.
"""

from __future__ import annotations

import numpy as np

from ..state.graph import ShardedGraph
from ..state.superstep import run_supersteps, state_vertex_dataset
from ..util import parts_dataset


def adjacency_matvec(graph: ShardedGraph, ckpt_dir: str, init_fn, k: int = 1):
    """x ← A_w^k · x (unnormalized gather, k supersteps)."""

    def apply_fn(agg, old, T, dm, csr):
        return agg

    summary = run_supersteps(
        graph, ckpt_dir, "sum", init_fn,
        tol=0.0, max_iters=k, normalize=False, apply_fn=apply_fn,
    )
    return state_vertex_dataset(graph, summary["final_iter_dir"], "value"), summary


def heat_kernel_smooth(
    graph: ShardedGraph, ckpt_dir: str, init_fn, t: float = 0.5, steps: int = 10
):
    """exp(-t·L_w)·x by k explicit-Euler steps over the weighted
    Laplacian L = D_w − A_w. Requires an undirected (symmetrized)
    graph for L to be a Laplacian; dt = t/steps must keep
    dt·max(deg) < 1 for stability (caller's responsibility, asserted
    per partition)."""
    dt = t / steps

    def apply_fn(agg, old, T, dm, csr):
        degw = csr.get("wdeg", csr["deg"]).astype(np.float64)
        if old.ndim == 2:
            return old - dt * (degw[:, None] * old - agg)
        return old - dt * (degw * old - agg)

    summary = run_supersteps(
        graph, ckpt_dir, "sum", init_fn,
        tol=0.0, max_iters=steps, normalize=False, apply_fn=apply_fn,
    )
    return state_vertex_dataset(graph, summary["final_iter_dir"], "value"), summary


def _parts_ds(graph: ShardedGraph):
    import pyarrow as pa
    import ray.data as rd

    return parts_dataset(graph.parts)


def _persist_fields(graph: ShardedGraph, out_dir: str, fn):
    """Run ``fn(part, csr) -> [n, d] array`` in TASKS and write each
    partition's result with write_state_part — field data never touches
    the driver (the worker-resident Sinkhorn state store)."""
    import pyarrow as pa

    refs = graph.refs

    def _write(batch: pa.Table) -> pa.Table:
        import ray

        from ..state.ckpt import write_state_part

        for p in batch.column("part").to_numpy(zero_copy_only=False):
            p = int(p)
            csr = ray.get(refs[p])
            write_state_part(out_dir, p, np.asarray(fn(p, csr), dtype=np.float64), "sum")
        return batch

    # count() drives the stage — the write is the effect
    _parts_ds(graph).map_batches(_write, batch_format="pyarrow", batch_size=4).count()


def _ckpt_field_init(field_dir: str):
    """init_fn reading THIS partition's field from a state directory —
    per-partition worker-side reads, nothing driver-held."""

    def _init(csr):
        from ..state.ckpt import read_state_part

        return read_state_part(field_dir, int(csr["part"]))

    return _init


def convolutional_barycenter(
    graph: ShardedGraph,
    ckpt_dir: str,
    marginals_init,
    n_marginals: int,
    *,
    alpha: np.ndarray | None = None,
    blur_t: float = 0.5,
    blur_steps: int = 5,
    n_iters: int = 12,
):
    """Wasserstein-style barycenter of d vertex distributions via
    Sinkhorn/Bregman projections with a heat-kernel blur.

    marginals_init: init_fn returning the [n, d] marginal matrix per
    partition. Returns (Dataset (vid, barycenter), history of scalar
    changes per outer iteration).

    Control-flow shape (not a numerical clone of the reference — the
    blur operator differs): v ← μ ⊘ H(w), b ← Π H(v)^α, w ← w·b⊘H(v),
    iterated; every H(·) is ``blur_steps`` supersteps over the [n, d]
    field, driven by the same checkpointed engine.

    WORKER-RESIDENT state: μ, the scalings w and the barycenter live as
    per-partition state files read/written inside tasks and superstep
    init — the driver moves only directory names and per-iteration
    scalar metrics (round-1 held {part: [n, d]} dicts on the driver
    between blurs — unbounded at scale).
    """
    alpha = (
        np.full(n_marginals, 1.0 / n_marginals) if alpha is None else np.asarray(alpha)
    )
    eps = 1e-300
    mu_dir = f"{ckpt_dir}/mu"
    _persist_fields(graph, mu_dir, lambda p, csr: marginals_init(csr))
    _persist_fields(
        graph, f"{ckpt_dir}/w0",
        lambda p, csr: np.ones((len(csr["vids"]), n_marginals)),
    )

    history = []
    prev_bary_dir = None
    for it in range(n_iters):
        _, s1 = heat_kernel_smooth(
            graph, f"{ckpt_dir}/hw{it}", _ckpt_field_init(f"{ckpt_dir}/w{it}"),
            t=blur_t, steps=blur_steps,
        )
        hw_dir = s1["final_iter_dir"]

        def _v(p, csr, _hw=hw_dir):
            from ..state.ckpt import read_state_part

            mu = read_state_part(mu_dir, p)
            return mu / np.maximum(read_state_part(_hw, p), eps)

        _persist_fields(graph, f"{ckpt_dir}/v{it}", _v)
        _, s2 = heat_kernel_smooth(
            graph, f"{ckpt_dir}/hv{it}", _ckpt_field_init(f"{ckpt_dir}/v{it}"),
            t=blur_t, steps=blur_steps,
        )
        hv_dir = s2["final_iter_dir"]
        bary_dir = f"{ckpt_dir}/bary{it}"

        def _bary(p, csr, _hv=hv_dir):
            from ..state.ckpt import read_state_part

            hv = read_state_part(_hv, p)
            return np.exp(np.log(np.maximum(hv, eps)) @ alpha).reshape(-1, 1)

        _persist_fields(graph, bary_dir, _bary)

        def _w_next(p, csr, _hv=hv_dir, _b=bary_dir, _w=f"{ckpt_dir}/w{it}"):
            from ..state.ckpt import read_state_part

            w = read_state_part(_w, p)
            b = read_state_part(_b, p)[:, 0]
            hv = read_state_part(_hv, p)
            return w * b[:, None] / np.maximum(hv, eps)

        _persist_fields(graph, f"{ckpt_dir}/w{it + 1}", _w_next)

        # per-iteration metric: L1 change of the barycenter (partial
        # sums per part inside a task; driver adds P scalars)
        if prev_bary_dir is not None:
            change = _sum_over_parts(
                graph,
                lambda p, csr, _a=bary_dir, _b=prev_bary_dir: float(
                    np.abs(
                        _read_part(_a, p) - _read_part(_b, p)
                    ).sum()
                ),
            )
        else:
            change = float("inf")
        prev_bary_dir = bary_dir
        history.append({"iter": it, "l1_change": change})

    import pyarrow as pa

    refs = graph.refs
    final_bary = prev_bary_dir

    def _emit(batch: pa.Table) -> pa.Table:
        import ray

        from ..state.ckpt import read_state_part

        parts = batch.column("part").to_numpy(zero_copy_only=False)
        vid_out, val_out = [], []
        for p in parts:
            csr = ray.get(refs[int(p)])
            vid_out.append(csr["vids"])
            val_out.append(read_state_part(final_bary, int(p))[:, 0])
        return pa.table(
            {
                "vid": pa.array(np.concatenate(vid_out), type=pa.uint64()),
                "barycenter": pa.array(np.concatenate(val_out)),
            }
        )

    return _parts_ds(graph).map_batches(_emit, batch_format="pyarrow", batch_size=4), history


def _read_part(field_dir: str, p: int) -> np.ndarray:
    from ..state.ckpt import read_state_part

    return read_state_part(field_dir, p)


def _sum_over_parts(graph: ShardedGraph, fn) -> float:
    """Σ_p fn(p, csr) computed in tasks; the driver adds P scalars."""
    import pyarrow as pa

    refs = graph.refs

    def _part(batch: pa.Table) -> pa.Table:
        import ray

        vals = [
            float(fn(int(p), ray.get(refs[int(p)])))
            for p in batch.column("part").to_numpy(zero_copy_only=False)
        ]
        return pa.table({"s": pa.array(vals, type=pa.float64())})

    tot = 0.0
    for b in (
        _parts_ds(graph)
        .map_batches(_part, batch_format="pyarrow", batch_size=4)
        .iter_batches(batch_size=None, batch_format="pyarrow")
    ):
        tot += float(np.sum(b.column("s").to_numpy(zero_copy_only=False)))
    return tot


def _rff_features(mat: np.ndarray, w: np.ndarray, b: np.ndarray, epsilon: float):
    """Real random-Fourier features of the Gaussian kernel
    k(x,y) = exp(-‖x−y‖²/(2ε²)): φ(x) = √(2/M)·cos(Wx/ε + b)."""
    m = w.shape[0]
    return np.sqrt(2.0 / m) * np.cos(mat @ (w.T / epsilon) + b)


def _symm_exp_terms(gram: np.ndarray, lambda_par: float):
    """(expm(λG) − I)·G⁺ for symmetric PSD G via eigendecomposition
    (numpy-only stand-in for the reference's scipy inv/expm; clamped
    pseudo-inverse instead of plain inv for near-singular Grams)."""
    s, v = np.linalg.eigh(gram)
    inv_s = np.where(s > 1e-12, 1.0 / np.maximum(s, 1e-300), 0.0)
    coef = (np.exp(lambda_par * s) - 1.0) * inv_s
    return (v * coef) @ v.T


def low_rank_diffusion_integrate(
    embeddings_ds,
    field_col: str | None = None,
    *,
    lambda_par: float = 0.1,
    num_rand_features: int = 64,
    epsilon: float = 1.0,
    seed: int = 7,
):
    """Fast approximate diffusion-kernel field integration
    exp(λK)·x ≈ x + Φ·(ΦᵀΦ)⁺·(expm(λΦᵀΦ) − I)·Φᵀx over point-cloud
    positions (the ``embedding`` column), K the Gaussian ε-kernel.

    Reference parity: ``DFGFIntegrator`` (/root/reference/src/ega/
    algorithms/graph_diffusion_gf_integrator.py:6-96) — same low-rank
    exp identity, with symmetric real RFF (A = B = Φ, valid for a PSD
    kernel) instead of the ±position complex features. Distributed
    shape: one ``map_batches`` reduce pass emits per-block partials
    (ΦᵀΦ [M×M] and Φᵀx [M]); the driver sums the tiny partials and
    eigen-solves M×M; one broadcast map pass computes x + Φ·c. Never
    materializes Φ (N×M) or K (N×N).

    ``field_col`` names a float column in the dataset (None → the
    constant-1 field). Returns Dataset (vec_id, value).
    """
    import pyarrow as pa
    import ray

    from ..util import list_rows

    def _xmat(batch: pa.Table):
        ids = batch.column("vec_id").to_numpy(zero_copy_only=False)
        rows = list_rows(batch, "embedding")
        mat = np.vstack(rows).astype(np.float64) if rows else np.empty((0, 0))
        if field_col is not None:
            x = batch.column(field_col).to_numpy(zero_copy_only=False).astype(np.float64)
        else:
            x = np.ones(len(ids), dtype=np.float64)
        return ids, mat, x

    # dimensionality probe from one batch (cheap: first block only)
    first = next(iter(embeddings_ds.limit(1).iter_batches(batch_size=1, batch_format="pyarrow")))
    dim = len(first.column("embedding")[0])
    rng = np.random.Generator(np.random.Philox(key=[seed, 5]))
    w = rng.standard_normal((num_rand_features, dim))
    b = rng.uniform(0.0, 2.0 * np.pi, num_rand_features)
    wb_ref = ray.put((w, b))

    def _partials(batch: pa.Table) -> pa.Table:
        ww, bb = ray.get(wb_ref)
        _, mat, x = _xmat(batch)
        phi = _rff_features(mat, ww, bb, epsilon)
        gram = phi.T @ phi
        r = phi.T @ x
        return pa.table(
            {
                "gram": pa.array([gram.ravel()], type=pa.list_(pa.float64())),
                "r": pa.array([r], type=pa.list_(pa.float64())),
            }
        )

    m = num_rand_features
    gram = np.zeros((m, m))
    r = np.zeros(m)
    for btab in embeddings_ds.map_batches(_partials, batch_format="pyarrow").iter_batches(
        batch_size=None, batch_format="pyarrow"
    ):
        for g_row, r_row in zip(list_rows(btab, "gram"), list_rows(btab, "r")):
            gram += g_row.reshape(m, m)
            r += r_row

    c = _symm_exp_terms(gram, lambda_par) @ r  # [M]
    c_ref = ray.put((w, b, c))

    def _emit(batch: pa.Table) -> pa.Table:
        ww, bb, cc = ray.get(c_ref)
        ids, mat, x = _xmat(batch)
        phi = _rff_features(mat, ww, bb, epsilon)
        return pa.table(
            {
                "vec_id": pa.array(ids.astype(np.int64), type=pa.int64()),
                "value": pa.array(x + phi @ cc, type=pa.float64()),
            }
        )

    return embeddings_ds.map_batches(_emit, batch_format="pyarrow")


def sinkhorn_distance(
    graph: ShardedGraph,
    ckpt_dir: str,
    mu_init,
    nu_init,
    n_targets: int,
    *,
    blur_t: float = 0.5,
    blur_steps: int = 5,
    n_iters: int = 20,
):
    """Entropic-regularized OT distance between a source distribution μ
    and d target distributions ν₁…ν_d, convolutional-Sinkhorn style.

    Reference parity: the Sinkhorn scaling loops behind
    ``ConvolutionalBarycenter`` (/root/reference/src/ega/algorithms/
    convolutional_barycenter.py:5-81) — the distance variant is the
    same v/w fixed point with a value readout instead of a barycenter:
    per iteration v ← μ ⊘ H(w), w ← ν ⊘ H(v) (Gauss–Seidel order),
    and W²(μ, ν_j) ≈ γ Σ_i [μ_i ln v_ij + ν_ij ln w_ij] with γ =
    ``blur_t`` (Solomon et al. 2015, conv. Wasserstein distances).

    All d targets iterate as ONE [n, d] vector field — each H(·) is a
    single ``blur_steps``-superstep run regardless of d. ``mu_init``
    returns the [n] source column per partition, ``nu_init`` the
    [n, d] target matrix. Returns (distances ndarray [d], history).

    WORKER-RESIDENT state: μ, ν and the v/w scalings are per-partition
    state files computed and read inside tasks / superstep init; the
    driver only moves directory names and the per-iteration [d]
    distance partials (round-1 held every field as driver dicts
    between blurs — unbounded at scale).
    """
    eps = 1e-300
    mu_dir = f"{ckpt_dir}/mu"
    nu_dir = f"{ckpt_dir}/nu"
    _persist_fields(
        graph, mu_dir,
        lambda p, csr: np.asarray(mu_init(csr), dtype=np.float64).reshape(-1, 1),
    )
    _persist_fields(
        graph, nu_dir,
        lambda p, csr: np.asarray(nu_init(csr), dtype=np.float64).reshape(
            len(csr["vids"]), -1
        ),
    )
    _persist_fields(
        graph, f"{ckpt_dir}/w0",
        lambda p, csr: np.ones((len(csr["vids"]), n_targets)),
    )

    history = []
    dist = None
    for it in range(n_iters):
        _, s1 = heat_kernel_smooth(
            graph, f"{ckpt_dir}/hw{it}", _ckpt_field_init(f"{ckpt_dir}/w{it}"),
            t=blur_t, steps=blur_steps,
        )
        hw_dir = s1["final_iter_dir"]

        def _v(p, csr, _hw=hw_dir):
            mu = _read_part(mu_dir, p)[:, 0]
            return mu[:, None] / np.maximum(_read_part(_hw, p), eps)

        v_dir = f"{ckpt_dir}/v{it}"
        _persist_fields(graph, v_dir, _v)
        _, s2 = heat_kernel_smooth(
            graph, f"{ckpt_dir}/hv{it}", _ckpt_field_init(v_dir),
            t=blur_t, steps=blur_steps,
        )
        hv_dir = s2["final_iter_dir"]

        def _w_next(p, csr, _hv=hv_dir):
            nu = _read_part(nu_dir, p)
            return nu / np.maximum(_read_part(_hv, p), eps)

        w_dir = f"{ckpt_dir}/w{it + 1}"
        _persist_fields(graph, w_dir, _w_next)

        # per-iteration distance: [d] partials per part inside tasks,
        # driver adds P tiny vectors (matches the round-1 float order:
        # per-part sums over axis 0, then the part-ordered driver sum)
        def _dist_part(p, csr, _v=v_dir, _w=w_dir):
            mu = _read_part(mu_dir, p)[:, 0]
            nu = _read_part(nu_dir, p)
            v = _read_part(_v, p)
            w = _read_part(_w, p)
            return (
                mu[:, None] * np.log(np.maximum(v, eps))
                + nu * np.log(np.maximum(w, eps))
            ).sum(axis=0)

        dist = _sum_vec_over_parts(graph, _dist_part, n_targets) * blur_t
        history.append({"iter": it, "dist": dist.copy()})

    return dist, history


def _sum_vec_over_parts(graph: ShardedGraph, fn, d: int) -> np.ndarray:
    """Σ_p fn(p, csr) for [d]-vector partials, summed in graph.parts
    order on the driver (P tiny vectors — preserves the original
    part-ordered float accumulation)."""
    import pyarrow as pa

    from ..util import list_array, list_rows

    refs = graph.refs

    def _part(batch: pa.Table) -> pa.Table:
        import ray

        parts = batch.column("part").to_numpy(zero_copy_only=False)
        vals = [np.asarray(fn(int(p), ray.get(refs[int(p)])), dtype=np.float64) for p in parts]
        return pa.table(
            {
                "part": pa.array(parts, type=pa.int64()),
                "v": list_array(vals, np.float64, pa.float64()),
            }
        )

    partials: dict[int, np.ndarray] = {}
    for b in (
        _parts_ds(graph)
        .map_batches(_part, batch_format="pyarrow", batch_size=4)
        .iter_batches(batch_size=None, batch_format="pyarrow")
    ):
        for p, v in zip(b.column("part").to_numpy(zero_copy_only=False), list_rows(b, "v")):
            partials[int(p)] = v
    tot = np.zeros(d)
    for p in graph.parts:
        tot = tot + partials[p]
    return tot




def katz_centrality(
    graph: ShardedGraph, ckpt_dir: str, *, alpha: float = 0.005, k: int = 6
):
    """Truncated Katz centrality x_k = 1 + Σ_{j=1..k} α^j·(A^j·1), the
    damped path-count centrality (reference analogue:
    `random_walk_kernel`'s undamped A^k powers, src/ega at
    algorithms/random_walks — here with geometric damping).

    Exactness contract: state is a 2-column field [p, acc] where
    p_j = A^j·1 stays an EXACT integer in float64 (path counts; k
    bounded so max p < 2^53 — 5e12 at k=6 on the co-occ graph) and
    acc accumulates left-to-right as acc += (α^j)·p_j with α^j a
    precomputed Python double. Every FP op is then a correctly-rounded
    function of exact integers applied in a fixed order, so the SQL
    oracle (same unrolled recurrence over SUM(BIGINT)) is
    bit-identical — no float-sum-ordering drift, per the repo's
    sufficient-statistics recipe. No extra shuffle beyond the
    superstep exchange; the acc column rides the same scatter."""
    pows = [alpha**j for j in range(k + 1)]

    def apply_fn(agg, old, T, dm, csr, it):
        p_new = agg[:, 0]  # A·p_{it-1}: exact integer counts
        acc_new = old[:, 1] + pows[it] * p_new
        return np.column_stack([p_new, acc_new])

    summary = run_supersteps(
        graph, ckpt_dir, "sum",
        lambda csr: np.ones((len(csr["vids"]), 2), dtype=np.float64),
        tol=0.0, max_iters=k, normalize=False, apply_fn=apply_fn,
    )
    return state_vertex_dataset(graph, summary["final_iter_dir"], "value"), summary


def grid_conv_wasserstein_barycenter(
    emb_ds,
    *,
    h: int = 8,
    w: int = 8,
    reg: float = 0.05,
    n_iters: int = 4,
    eps: float = 1e-12,
):
    """Grid convolutional-Wasserstein barycenter (SURVEY §2 #48) —
    Solomon et al. 2015 via the reference's Sinkhorn-with-separable-
    Gaussian-blur formulation (/root/reference/src/ega/algorithms/
    convolutional_wass.py:31-160: V = bar/KU; U = A/KV; bar =
    exp(Σᵢ wᵢ·log KUᵢ) with K[i,j] = exp(−(tᵢ−tⱼ)²/reg) on
    linspace(0,1)), over the distributions obtained by reshaping each
    embedding row to an h×w grid and shift-normalizing it
    (p = (x − min + 0.1)/Σ — SQL-replayable).

    Distributed shape: each image's scaling vector U is a COLUMN of
    the Dataset (one row per image; the blur is two small matmuls per
    row, vectorized per batch); the only cross-image coupling is the
    geometric-mean reduce for ``bar`` — h·w quantized-integer partial
    sums per block, summed on the driver (order-independent by
    integer quantization: sᵢ = floor(log(KUᵢ + eps)·2³⁰), the
    kmeans_quantized convention — the run is bit-identical at any
    parallelism). n_iters rounds = n_iters streaming passes; nothing
    materializes beyond the (vec_id, p, u) table.

    Returns a pyarrow Table (cell, bary_r6): the barycenter grid,
    round_even 6 (oracles/sql.grid_conv_wass_sql replays it).
    """
    import pyarrow as pa
    import ray

    from ..util import list_array, list_rows

    Q = float(1 << 30)
    d = h * w
    t = np.arange(h, dtype=np.float64) / (h - 1)
    K1 = np.exp(-((t[:, None] - t[None, :]) ** 2) / reg)
    t2 = np.arange(w, dtype=np.float64) / (w - 1)
    K2 = np.exp(-((t2[:, None] - t2[None, :]) ** 2) / reg)
    kref = ray.put((K1, K2))

    def _blur(mats: np.ndarray) -> np.ndarray:
        k1, k2 = ray.get(kref)
        return np.einsum("ij,njl->nil", k1, mats) @ k2.T

    def _prep(b: pa.Table) -> pa.Table:
        mat = np.asarray(list_rows(b, "embedding"), dtype=np.float64)
        a = mat - mat.min(axis=1, keepdims=True) + 0.1
        p = a / a.sum(axis=1, keepdims=True)
        u = np.ones_like(p)
        return pa.table(
            {
                "vec_id": b.column("vec_id"),
                "p": list_array(list(p), np.float64, pa.float64()),
                "u": list_array(list(u), np.float64, pa.float64()),
            }
        )

    def _count_and_logsum(b: pa.Table) -> pa.Table:
        u = np.asarray(list_rows(b, "u"), dtype=np.float64).reshape(-1, h, w)
        ku = _blur(u).reshape(-1, d)
        s = np.floor(np.log(ku + eps) * Q).astype(np.int64).sum(axis=0)
        return pa.table(
            {
                "cell": pa.array(np.arange(d, dtype=np.int64)),
                "s": pa.array(s, type=pa.int64()),
                "n": pa.array(
                    np.full(d, len(u), dtype=np.int64), type=pa.int64()
                ),
            }
        )

    def _reduce_bar(ds):
        S = np.zeros(d, dtype=np.int64)
        n = 0
        for tb in ds.map_batches(
            _count_and_logsum, batch_format="pyarrow"
        ).iter_batches(batch_size=None, batch_format="pyarrow"):
            S += np.bincount(
                tb.column("cell").to_numpy(zero_copy_only=False),
                weights=tb.column("s").to_numpy(zero_copy_only=False),
                minlength=d,
            ).astype(np.int64)
            n += int(tb.column("n")[0].as_py())
        return S, n

    def _step(bar: np.ndarray):
        bref = ray.put(bar)

        def _f(b: pa.Table) -> pa.Table:
            br = ray.get(bref)
            p = np.asarray(list_rows(b, "p"), dtype=np.float64)
            u = np.asarray(list_rows(b, "u"), dtype=np.float64).reshape(-1, h, w)
            ku = _blur(u).reshape(-1, d)
            v = (br[None, :] / (ku + eps)).reshape(-1, h, w)
            kv = _blur(v).reshape(-1, d)
            u_new = p / (kv + eps)
            return pa.table(
                {
                    "vec_id": b.column("vec_id"),
                    "p": b.column("p"),
                    "u": list_array(list(u_new), np.float64, pa.float64()),
                }
            )

        return _f

    ds = emb_ds.map_batches(_prep, batch_format="pyarrow").materialize()
    bar = np.full(d, 1.0 / d)
    for _ in range(n_iters):
        ds = ds.map_batches(_step(bar), batch_format="pyarrow").materialize()
        S, n = _reduce_bar(ds)
        bar = np.exp(S.astype(np.float64) / (Q * n))

    return pa.table(
        {
            "cell": pa.array(np.arange(d, dtype=np.int64)),
            "bary_r6": pa.array(np.round(bar, 6), type=pa.float64()),
        }
    )
