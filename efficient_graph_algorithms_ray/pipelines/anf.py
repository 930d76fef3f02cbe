"""Approximate neighborhood function — HyperANF supersteps.

Public algorithm: Boldi–Vigna–Rosa "HyperANF: approximating the
neighbourhood function of very large graphs" (WWW 2011). Every vertex
keeps a small HyperLogLog register set seeded with itself; one
superstep merges each vertex's registers with its neighbors'
(elementwise max — the engine's ``mode='max'`` monoid), so after t
rounds vertex v's registers sketch the ball B(v, t). The neighborhood
function N(t) = Σ_v |B(v, t)| falls out of the per-iteration
checkpoints the engine already writes, and the effective diameter is
the (interpolated) smallest t with N(t) ≥ q·N(∞).

Reference tie-in: the reachability/frontier machinery the separator
and tree integrators presume, at sketch cost — registers are
2^p · 8 B per vertex here (float64 superstep fields; a uint8-packed
exchange is the documented multi-node optimization), with exchange
pre-aggregated per (worker, dst) like every other superstep.
"""

from __future__ import annotations

import numpy as np

from ..sources.edges_synth import _splitmix64
from ..state.graph import ShardedGraph
from ..state.superstep import run_supersteps

_ALPHA = {16: 0.673, 32: 0.697, 64: 0.709}


def _alpha(m: int) -> float:
    return _ALPHA.get(m, 0.7213 / (1 + 1.079 / m))


def vertex_registers(vids: np.ndarray, p: int) -> np.ndarray:
    """[n, 2^p] float64 — each vertex's singleton HLL (itself only)."""
    m = 1 << p
    h = _splitmix64(vids.astype(np.uint64))
    idx = (h >> np.uint64(64 - p)).astype(np.int64)
    rest = (h << np.uint64(p)) | np.uint64((1 << p) - 1)
    rank = np.zeros(len(h), dtype=np.int64)
    probe = rest
    for shift in (32, 16, 8, 4, 2, 1):
        mask = probe < (np.uint64(1) << np.uint64(64 - shift))
        rank[mask] += shift
        probe = np.where(mask, probe << np.uint64(shift), probe)
    rank += 1
    regs = np.zeros((len(vids), m), dtype=np.float64)
    regs[np.arange(len(vids)), idx] = rank
    return regs


def estimate_rows(regs: np.ndarray) -> np.ndarray:
    """Vectorized HLL estimate per row of an [n, m] register matrix."""
    m = regs.shape[1]
    est = _alpha(m) * m * m / np.exp2(-regs).sum(axis=1)
    zeros = (regs == 0).sum(axis=1)
    lc = np.where(zeros > 0, m * np.log(np.maximum(m / np.maximum(zeros, 1), 1.0)), est)
    return np.where((est <= 2.5 * m) & (zeros > 0), lc, est)


def neighborhood_function(
    graph: ShardedGraph,
    ckpt_dir: str,
    *,
    p: int = 6,
    max_t: int = 128,
    quantile: float = 0.9,
):
    """Run HyperANF to closure; returns a summary dict with

    - ``n_t``: [N(0), N(1), …] — the approximate neighborhood function
      (N(0) = number of vertices),
    - ``t_max``: rounds to closure (= diameter on a connected graph),
    - ``effective_diameter``: interpolated smallest t with
      N(t) ≥ quantile · N(t_max),
    - ``summary``: the underlying superstep run summary.
    """
    from ..state.ckpt import iter_dir as _iter_dir
    from ..state.ckpt import read_state_part

    def init_fn(csr):
        return vertex_registers(csr["vids"], p)

    summary = run_supersteps(
        graph, ckpt_dir, "max", init_fn, tol=0.0, max_iters=max_t
    )
    t_max = summary["iterations"]

    n_t = []
    for t in range(t_max + 1):
        idir = _iter_dir(ckpt_dir, t)
        total = 0.0
        for part in graph.parts:
            regs = read_state_part(idir, part)
            total += float(estimate_rows(regs).sum())
        n_t.append(total)

    nf = np.asarray(n_t)
    target = quantile * nf[-1]
    eff = float(t_max)
    for t in range(len(nf)):
        if nf[t] >= target:
            if t == 0:
                eff = 0.0
            else:
                lo, hi = nf[t - 1], nf[t]
                eff = t - 1 + (target - lo) / max(hi - lo, 1e-30)
            break
    return {
        "n_t": n_t,
        "t_max": t_max,
        "effective_diameter": eff,
        "p": p,
        "summary": summary,
    }
