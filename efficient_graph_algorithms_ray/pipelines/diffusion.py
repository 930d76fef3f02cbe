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
    """
    import ray

    alpha = (
        np.full(n_marginals, 1.0 / n_marginals) if alpha is None else np.asarray(alpha)
    )

    # driver-held per-outer-iteration state lives in the object store as
    # the engine's own checkpoints; each blur is its own superstep run.
    def blur(tag: str, init_fn):
        out, _ = heat_kernel_smooth(
            graph, f"{ckpt_dir}/{tag}", init_fn, t=blur_t, steps=blur_steps
        )
        return out

    # gather the small per-vertex matrices to drive elementwise steps —
    # the elementwise math itself runs distributed via map_batches below.
    from ..state.ckpt import read_state_part

    def _collect(run_dir_ckpt, final_iter_dir):
        return {
            p: read_state_part(final_iter_dir, p) for p in graph.parts
        }

    eps = 1e-300
    w = None  # {part: [n,d]} — Sinkhorn scaling
    mu = {}  # marginals per part
    for p in graph.parts:
        csr = ray.get(graph.refs[p])
        mu[p] = np.asarray(marginals_init(csr), dtype=np.float64)
        if w is None:
            d = mu[p].shape[1]
        # init scalings to 1
    w = {p: np.ones_like(mu[p]) for p in graph.parts}

    history = []
    bary = None
    for it in range(n_iters):
        # H(w)
        hw_run, s1 = heat_kernel_smooth(
            graph, f"{ckpt_dir}/hw{it}", _dict_init(w), t=blur_t, steps=blur_steps
        )
        hw = _collect(None, s1["final_iter_dir"])
        v = {p: mu[p] / np.maximum(hw[p], eps) for p in graph.parts}
        hv_run, s2 = heat_kernel_smooth(
            graph, f"{ckpt_dir}/hv{it}", _dict_init(v), t=blur_t, steps=blur_steps
        )
        hv = _collect(None, s2["final_iter_dir"])
        new_bary = {}
        for p in graph.parts:
            logs = np.log(np.maximum(hv[p], eps)) @ alpha
            new_bary[p] = np.exp(logs)
        change = sum(
            float(np.abs(new_bary[p] - (bary[p] if bary else 0)).sum())
            for p in graph.parts
        ) if bary is not None else float("inf")
        bary = new_bary
        w = {
            p: w[p] * bary[p][:, None] / np.maximum(hv[p], eps) for p in graph.parts
        }
        history.append({"iter": it, "l1_change": change})

    import pyarrow as pa
    import ray.data as rd

    refs = graph.refs
    bary_ref = ray.put(bary)

    def _emit(batch: pa.Table) -> pa.Table:
        b = ray.get(bary_ref)
        parts = batch.column("part").to_numpy(zero_copy_only=False)
        vid_out, val_out = [], []
        for p in parts:
            csr = ray.get(refs[int(p)])
            vid_out.append(csr["vids"])
            val_out.append(b[int(p)])
        return pa.table(
            {
                "vid": pa.array(np.concatenate(vid_out), type=pa.uint64()),
                "barycenter": pa.array(np.concatenate(val_out)),
            }
        )

    parts_ds = rd.from_arrow(pa.table({"part": pa.array(graph.parts, type=pa.int64())}))
    return parts_ds.map_batches(_emit, batch_format="pyarrow", batch_size=4), history


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
    Driver holds the per-part scaling dicts between blurs (same
    moderate-V·d note as ``_dict_init``).
    """
    import ray

    eps = 1e-300
    mu, nu = {}, {}
    for p in graph.parts:
        csr = ray.get(graph.refs[p])
        mu[p] = np.asarray(mu_init(csr), dtype=np.float64).reshape(-1)
        nu[p] = np.asarray(nu_init(csr), dtype=np.float64).reshape(len(mu[p]), -1)
    w = {p: np.ones_like(nu[p]) for p in graph.parts}
    v = {p: np.ones_like(nu[p]) for p in graph.parts}

    from ..state.ckpt import read_state_part

    def _blur(tag, field):
        _, s = heat_kernel_smooth(
            graph, f"{ckpt_dir}/{tag}", _dict_init(field), t=blur_t, steps=blur_steps
        )
        return {p: read_state_part(s["final_iter_dir"], p) for p in graph.parts}

    history = []
    for it in range(n_iters):
        hw = _blur(f"hw{it}", w)
        v = {p: mu[p][:, None] / np.maximum(hw[p], eps) for p in graph.parts}
        hv = _blur(f"hv{it}", v)
        w = {p: nu[p] / np.maximum(hv[p], eps) for p in graph.parts}
        dist = sum(
            (mu[p][:, None] * np.log(np.maximum(v[p], eps))
             + nu[p] * np.log(np.maximum(w[p], eps))).sum(axis=0)
            for p in graph.parts
        ) * blur_t
        history.append({"iter": it, "dist": dist.copy()})

    return dist, history


def _dict_init(d: dict):
    """init_fn from a {part: array} dict (captured by workers).

    NOTE: the barycenter driver holds the per-part field dicts on the
    driver between blurs — fine for moderate V·d; the scale path would
    keep scalings worker-resident (a persistent-pool variant) and is a
    documented follow-up, not a semantics change."""

    def _init(csr):
        return d[int(csr["part"])]

    return _init
