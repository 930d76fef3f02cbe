"""Seed-set betweenness centrality — two-phase Brandes on the BSP
superstep engine.

Public algorithm: Brandes (J. Math. Sociol. 2001): for each source s,
a forward BFS computes dist and the shortest-path counts σ_s, then a
backward sweep over descending BFS levels accumulates the dependency

    δ_s(v) = Σ_{w : v ∈ pred_s(w)} σ_s(v)/σ_s(w) · (1 + δ_s(w)),

and C_B(v) = Σ_s δ_s(v). Exact betweenness needs all sources; the
standard large-graph estimator (Brandes–Pich 2007) runs a bounded
seed set — the same bounded-source contract as the engine's closeness
and DSD queries. Reference shape: seeded projection scoring,
/root/reference/src/ega/algorithms/graph_kernels.py:387-519.

Engine mapping (all k seeds in ONE pair of runs, vector state):

- forward: state [n, 2k+1] = [σ_1..k | dist_1..k | counter]. The
  counter column (incremented every apply) tells msg_fn/apply_fn the
  current superstep — the engine's UDF hooks are stateless, so the
  round number rides the state. Superstep t: vertices at dist_j = t−1
  send σ_j (sum-monoid gather = path-count accumulation); unreached
  receivers with inflow set dist_j = t, σ_j = inflow. Runs exactly
  ``rounds`` supersteps (tol=0) so the unrolled SQL oracle replays it.
- backward: state [n, 3k+1] = [σ | dist | δ | counter], initialized
  PER PARTITION from the forward run's final checkpoint
  (``read_state_part(fwd_dir, csr["part"])`` inside init_fn — each
  worker reads its own shard's file; no driver funnel, no broadcast).
  Backward superstep t: vertices at level R−t+1 send (1+δ_j)/σ_j;
  receivers at level R−t accumulate δ_j += σ_j · inflow. Adjacent
  vertices one level apart are predecessors by the BFS property, so
  receiver-side level gating is exactly the pred-set filter.

σ values are integer-valued floats (exact while < 2^53 — shortest-
path counts only, never walk counts); δ involves true division, so
the query rounds the published score (bc_r6) like every sum-monoid
oracle in the repo (pagerank's rank_r9 convention).
"""

from __future__ import annotations

import numpy as np

from ..state.ckpt import read_state_part
from ..state.graph import ShardedGraph
from ..state.superstep import run_supersteps, state_vertex_dataset


def seed_betweenness(
    graph: ShardedGraph,
    ckpt_dir: str,
    seeds,
    *,
    rounds: int = 6,
):
    """Brandes dependency scores from a bounded seed set.

    Returns (Dataset (vid, deltas: list<float64>[k]), fwd_summary,
    bwd_summary); deltas[j] = δ_{seeds[j]}(v) with δ at the seed's own
    column NOT yet zeroed (callers exclude it when summing C_B).
    """
    assert not graph.directed, "betweenness requires an undirected graph"
    seeds = np.asarray(seeds, dtype=np.uint64)
    k = len(seeds)
    R = rounds
    fwd_dir = ckpt_dir + "_fwd"
    bwd_dir = ckpt_dir + "_bwd"

    def fwd_init(csr):
        n = len(csr["vids"])
        st = np.zeros((n, 2 * k + 1))
        st[:, k : 2 * k] = -1.0
        pos = np.searchsorted(csr["vids"], seeds)
        for j, p in enumerate(pos):
            if p < n and csr["vids"][p] == seeds[j]:
                st[p, j] = 1.0  # sigma
                st[p, k + j] = 0.0  # dist
        return st

    def fwd_msg(value, csr):
        if len(value) == 0:
            return value
        c = value[0, -1]
        msg = np.zeros_like(value)
        for j in range(k):
            sel = value[:, k + j] == c
            msg[sel, j] = value[sel, j]
        return msg

    def fwd_apply(acc, old, T, dm, csr):
        new = old.copy()
        if len(old) == 0:
            return new
        c = old[0, -1]
        for j in range(k):
            got = (old[:, k + j] == -1.0) & (acc[:, j] > 0)
            new[got, j] = acc[got, j]
            new[got, k + j] = c + 1.0
        new[:, -1] = c + 1.0
        return new

    fwd = run_supersteps(
        graph,
        fwd_dir,
        "sum",
        fwd_init,
        tol=0.0,
        max_iters=R,
        msg_fn=fwd_msg,
        apply_fn=fwd_apply,
    )
    fwd_final = fwd["final_iter_dir"]

    def bwd_init(csr):
        f = read_state_part(fwd_final, csr["part"])
        n = len(csr["vids"])
        st = np.zeros((n, 3 * k + 1))
        st[:, : 2 * k] = f[:, : 2 * k]
        return st

    def bwd_msg(value, csr):
        if len(value) == 0:
            return np.zeros_like(value)
        c = value[0, -1]
        lvl = R - c
        msg = np.zeros_like(value)
        for j in range(k):
            sel = value[:, k + j] == lvl
            if sel.any():
                msg[sel, j] = (1.0 + value[sel, 2 * k + j]) / value[sel, j]
        return msg

    def bwd_apply(acc, old, T, dm, csr):
        new = old.copy()
        if len(old) == 0:
            return new
        c = old[0, -1]
        lvl = R - c
        for j in range(k):
            rec = old[:, k + j] == lvl - 1.0
            new[rec, 2 * k + j] += old[rec, j] * acc[rec, j]
        new[:, -1] = c + 1.0
        return new

    bwd = run_supersteps(
        graph,
        bwd_dir,
        "sum",
        bwd_init,
        tol=0.0,
        max_iters=R,
        msg_fn=bwd_msg,
        apply_fn=bwd_apply,
    )
    full = state_vertex_dataset(graph, bwd["final_iter_dir"], "state")

    import pyarrow as pa

    from ..util import list_array, list_rows

    def _deltas(batch: pa.Table) -> pa.Table:
        rows = list_rows(batch, "state")
        mat = (
            np.stack([r.reshape(-1)[2 * k : 3 * k] for r in rows])
            if rows
            else np.empty((0, k))
        )
        return pa.table(
            {
                "vid": batch.column("vid"),
                "deltas": list_array(list(mat), np.float64, pa.float64()),
            }
        )

    return full.map_batches(_deltas, batch_format="pyarrow"), fwd, bwd
