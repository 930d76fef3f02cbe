"""HITS hubs & authorities over a bipartite link graph.

Kleinberg's alternating recurrence h ← B·a, a ← Bᵀ·h (B = hub-side ×
authority-side biadjacency) run as ONE symmetric superstep chain: on
the SYMMETRIZED bipartite graph A = [[0, B], [Bᵀ, 0]] with x₀ = 1
everywhere, the unnormalized gather x ← A·x alternates the two
updates automatically — x at superstep 2t restricted to the hub side
is hₜ, and x at superstep 2t+1 restricted to the authority side is
aₜ₊₁ (the sides never mix because the graph is bipartite). One run of
``2k+1`` supersteps therefore yields the full (h_k, a_{k+1}) pair with
no per-iteration driver work and no second graph for Bᵀ (the round-2
alternative — chaining two directed-graph matvec runs through
driver-side re-inits — would funnel a vertex table per half-step).

Reference parity: the same damped-free alternating matvec family as
``random_walk_kernel`` (/root/reference/src/ega/algorithms/
graph_kernels.py:29-50), specialized to the bipartite hub/authority
split; normalization follows Kleinberg (L2 per side).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from ..state.ckpt import iter_dir as _iter_dir
from ..state.graph import ShardedGraph
from ..state.superstep import run_supersteps, state_vertex_dataset


def hits(graph: ShardedGraph, ckpt_dir: str, k: int = 1):
    """(hub_ds, auth_ds, summary) after k full HITS iterations.

    ``graph`` must be the SYMMETRIZED bipartite graph (undirected
    build). Returns per-vertex UNNORMALIZED integer-valued scores over
    ALL vertices: callers restrict each dataset to its side (hub
    scores are meaningful on the hub side, authority scores on the
    authority side) and normalize — see ``l2_normalize``.
    """
    if k < 1:
        raise ValueError("k >= 1")

    def _ones(csr):
        return np.ones(len(csr["vids"]), dtype=np.float64)

    def _identity(agg, old, T, dm, csr):
        return agg

    summary = run_supersteps(
        graph, ckpt_dir, "sum", _ones,
        tol=0.0, max_iters=2 * k + 1, normalize=False, apply_fn=_identity,
    )
    hub = state_vertex_dataset(graph, _iter_dir(ckpt_dir, 2 * k), "hub")
    auth = state_vertex_dataset(graph, _iter_dir(ckpt_dir, 2 * k + 1), "auth")
    return hub, auth, summary


def salsa(graph: ShardedGraph, ckpt_dir: str, k: int = 1, auth_pred=None):
    """SALSA hub/authority scores (Lempel & Moran, WWW 2000).

    SALSA replaces HITS's unnormalized matvecs with the DEGREE-
    NORMALIZED alternating walk: the authority chain is the 2-step
    random walk on the symmetrized bipartite graph restricted to the
    authority side (and likewise for hubs) — so on this engine it is
    ONE k_step-style normalized-walk superstep chain (damping 1, zero
    teleport) from x₀ = 1 on the authority side, read at superstep 2k
    (authority side = a_k) and 2k−1 (hub side = h_k). Same
    single-chain trick as ``hits`` above; the normalization is the
    per-sender 1/deg the scatter already applies.

    ``auth_pred``: vectorized vids → bool mask for the authority side.
    Returns (hub_ds, auth_ds, summary) with RAW walk mass (callers
    restrict to each side and scale/round).
    """
    if k < 1:
        raise ValueError("k >= 1")
    assert auth_pred is not None

    def _init(csr):
        return np.where(auth_pred(csr["vids"]), 1.0, 0.0)

    def zero_teleport(csr):
        return np.zeros(len(csr["vids"]))

    summary = run_supersteps(
        graph, ckpt_dir, "sum", _init,
        damping=1.0, tol=0.0, max_iters=2 * k, teleport_fn=zero_teleport,
    )
    hub = state_vertex_dataset(graph, _iter_dir(ckpt_dir, 2 * k - 1), "hub")
    auth = state_vertex_dataset(graph, _iter_dir(ckpt_dir, 2 * k), "auth")
    return hub, auth, summary


def l2_normalize(ds, col: str):
    """Divide ``col`` by its global L2 norm (two streaming passes: a
    sum-of-squares scalar reduce, then a broadcast scalar divide)."""

    def _sq(b: pa.Table) -> pa.Table:
        x = b.column(col).to_numpy(zero_copy_only=False)
        return pa.table({"ss": pa.array(np.array([float(np.dot(x, x))]))})

    ss = ds.map_batches(_sq, batch_format="pyarrow").sum("ss")
    norm = float(np.sqrt(ss)) if ss else 1.0

    def _div(b: pa.Table) -> pa.Table:
        x = b.column(col).to_numpy(zero_copy_only=False)
        return b.set_column(
            b.schema.get_field_index(col), col, pa.array(x / norm)
        )

    return ds.map_batches(_div, batch_format="pyarrow")
