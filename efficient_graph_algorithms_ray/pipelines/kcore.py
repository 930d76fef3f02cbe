"""Coreness (k-core) decomposition — distributed h-index iteration.

Public algorithm: Montresor, De Pellegrini, Miorandi, "Distributed
k-core decomposition" (IEEE TPDS 2013): initialize every vertex's
coreness estimate to its degree, then repeatedly set

    est(v) ← H-index{ est(u) : u ∈ N(v) }

(the largest h such that ≥ h neighbors have estimate ≥ h). Estimates
are non-increasing and converge to the exact coreness — the same
numbers the sequential Batagelj–Zaveršnik peeling produces (the pytest
oracle).

Superstep mapping: the H-index needs the *multiset* of neighbor
estimates, which a scalar monoid can't carry — but a bounded
*histogram* can: each vertex's message is the one-hot vector of its
capped estimate, the engine's ``mode='sum'`` combine adds them into a
per-vertex neighbor-estimate histogram, and ``apply_fn`` extracts the
H-index with a reversed cumulative sum. Exchange cost: ``cap`` floats
per vertex, pre-aggregated per (worker, dst) like every superstep.

``cap`` bounds the representable coreness (estimates clamp to
cap − 1). Exact wherever true coreness < cap − 1; web-scale runs pick
cap ~ 256 and report the top bucket as "≥ cap−1" (the standard
truncated-core trade-off; state is [n, cap] so memory is cap × 8 B
per vertex).
"""

from __future__ import annotations

import numpy as np

from ..state.graph import ShardedGraph
from ..state.superstep import run_supersteps, state_vertex_dataset


def coreness(
    graph: ShardedGraph,
    ckpt_dir: str,
    *,
    cap: int = 64,
    max_iters: int = 200,
    resume: bool = False,
):
    """Run h-index iteration to fixpoint on an undirected graph.

    Returns (Dataset (vid, coreness), summary). Exact for vertices
    whose true coreness < cap − 1; estimates clamp at cap − 1.
    """
    assert not graph.directed, "coreness requires an undirected graph"

    def init_fn(csr):
        n = len(csr["vids"])
        state = np.zeros((n, cap), dtype=np.float64)
        state[:, 0] = np.minimum(csr["deg"], cap - 1)
        return state

    def msg_fn(state, csr):
        est = np.minimum(state[:, 0].astype(np.int64), cap - 1)
        msg = np.zeros_like(state)
        msg[np.arange(len(est)), est] = 1.0
        return msg

    def apply_fn(agg, old, T, dm, csr):
        # agg row v = histogram of N(v)'s capped estimates;
        # H-index = max h with (# neighbors est ≥ h) ≥ h
        ge = np.cumsum(agg[:, ::-1], axis=1)[:, ::-1]  # ge[:, h] = #est ≥ h
        h_idx = np.arange(agg.shape[1])[None, :]
        h = np.max(np.where(ge >= np.maximum(h_idx, 1), h_idx, 0), axis=1)
        new = np.zeros_like(old)
        new[:, 0] = np.minimum(old[:, 0], h)
        return new

    summary = run_supersteps(
        graph, ckpt_dir, "sum", init_fn,
        tol=0.5, max_iters=max_iters, resume=resume,
        normalize=False, apply_fn=apply_fn, msg_fn=msg_fn,
    )

    import pyarrow as pa

    state = state_vertex_dataset(graph, summary["final_iter_dir"], "state")

    def _shape(batch: pa.Table) -> pa.Table:
        from ..util import list_rows

        rows = list_rows(batch, "state")
        core = np.array([int(r[0]) for r in rows], dtype=np.int64) if rows else np.empty(0, np.int64)
        return pa.table(
            {
                "vid": batch.column("vid"),
                "coreness": pa.array(core, type=pa.int64()),
            }
        )

    return state.map_batches(_shape, batch_format="pyarrow"), summary
