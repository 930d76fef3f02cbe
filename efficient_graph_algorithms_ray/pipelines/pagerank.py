"""Distributed PageRank — damped power iteration over CSR shards.

Semantics match the reference's closed-form damped random walk with
restart, ``random_walk_with_restart_kernel``
(/root/reference/src/ega/algorithms/graph_kernels.py:72-79):
``r = alpha * (I - (1-alpha) * A * D^-1)^-1 * v`` with uniform
restart v = 1/N; here computed by power iteration with damping
d = 1 - alpha = 0.85, dangling mass redistributed uniformly:

    r_{k+1}(v) = (1-d)/N + d * ( Σ_{u→v} r_k(u)/outdeg(u) + dangling_k/N )

converging to ‖Δ‖∞ < tol (default 1e-6, float64 throughout) —
verified ``allclose(1e-6)`` against the dense NumPy oracle in
oracles/numpy_graph.py.
"""

from __future__ import annotations

import numpy as np

from ..config import EngineConfig
from ..state.graph import ShardedGraph
from ..state.superstep import run_supersteps, state_vertex_dataset


def pagerank(
    graph: ShardedGraph,
    ckpt_dir: str,
    *,
    damping: float = 0.85,
    tol: float = 1e-6,
    max_iters: int = 100,
    resume: bool = False,
    ckpt_every: int = 1,
) -> tuple:
    """Run PageRank; returns (vertex Dataset (vid, rank), run summary)."""
    N = graph.n_vertices

    def init_fn(csr):
        return np.full(len(csr["vids"]), 1.0 / N, dtype=np.float64)

    summary = run_supersteps(
        graph,
        ckpt_dir,
        "sum",
        init_fn,
        damping=damping,
        tol=tol,
        max_iters=max_iters,
        resume=resume,
        ckpt_every=ckpt_every,
    )
    ranks = state_vertex_dataset(graph, summary["final_iter_dir"], "rank")
    return ranks, summary


def pagerank_warm(
    graph: ShardedGraph,
    ckpt_dir: str,
    *,
    warm_graph: ShardedGraph,
    warm_final_dir: str,
    damping: float = 0.85,
    tol: float = 1e-6,
    max_iters: int = 100,
) -> tuple:
    """Incremental PageRank — warm-start from a previous run's final
    checkpoint (the crawl-delta pattern: yesterday's graph's ranks
    seed today's graph-plus-new-edges run, converging in far fewer
    supersteps than a cold start while reaching the SAME fixed point).

    Mechanics: ``init_fn`` runs inside each BSP worker and reads only
    its OWN shard's old state file (``read_state_part`` — the
    betweenness two-phase pattern; no driver funnel, no broadcast).
    Vertex→part assignment is the same hash partitioner, so old part p
    is exactly the old vertices of new part p; vids absent from the
    old graph start at the uniform 1/N. The warm init is NOT
    renormalized: the damped iteration contracts total mass to 1
    geometrically (Σr_{k+1} = (1−d) + d·Σr_k), so normalization is
    unnecessary for correctness and the L∞ convergence test is
    unchanged.

    Returns (vertex Dataset (vid, rank), run summary).
    """
    from ..state.ckpt import read_state_part

    if len(graph.parts) != len(warm_graph.parts):
        raise ValueError("warm start requires the same partition count")
    N = graph.n_vertices
    old_refs = warm_graph.refs

    def init_fn(csr):
        import ray

        p = int(csr["part"])
        vids = csr["vids"]
        out = np.full(len(vids), 1.0 / N, dtype=np.float64)
        if p in old_refs:
            old_vids = ray.get(old_refs[p])["vids"]
            old_state = np.asarray(read_state_part(warm_final_dir, p), dtype=np.float64)
            pos = np.searchsorted(old_vids, vids)
            ok = pos < len(old_vids)
            match = np.zeros(len(vids), dtype=bool)
            match[ok] = old_vids[pos[ok]] == vids[ok]
            out[match] = old_state[pos[match]]
        return out

    summary = run_supersteps(
        graph,
        ckpt_dir,
        "sum",
        init_fn,
        damping=damping,
        tol=tol,
        max_iters=max_iters,
    )
    ranks = state_vertex_dataset(graph, summary["final_iter_dir"], "rank")
    return ranks, summary


def pagerank_pipeline(pages_ds, cfg: EngineConfig, ckpt_dir: str, **kw):
    """pages → graph → PageRank (the flagship composition)."""
    from .graph_build import graph_from_pages

    graph = graph_from_pages(pages_ds, cfg, directed=True)
    return pagerank(
        graph, ckpt_dir, damping=cfg.damping, tol=cfg.tol, max_iters=cfg.max_iters, **kw
    )


def top_k_ranks(ranks_ds, k: int = 20):
    """Global top-k by rank — reference analogue ``get_ranking``
    (/root/reference/src/ega/algorithms/graph_kernels.py:559-585)."""
    return ranks_ds.sort("rank", descending=True).limit(k)


def average_projection(ranks_ds, vids: np.ndarray, col: str = "rank"):
    """Mean score over a vertex subset — reference analogue
    ``get_average_projection`` (/root/reference/src/ega/algorithms/
    graph_kernels.py:587-612).

    The subset is broadcast once via ``ray.put``; each batch reduces to
    a (sum, count) partial, so nothing but two floats per block moves.
    Returns a 1-row Dataset (avg_<col>, n_vertices).
    """
    import pyarrow as pa
    import ray
    import ray.data as rd

    sub = np.sort(np.asarray(vids, dtype=np.uint64))
    ref = ray.put(sub)

    def _partial(batch: pa.Table) -> pa.Table:
        s = ray.get(ref)
        v = batch.column("vid").to_numpy(zero_copy_only=False).astype(np.uint64)
        pos = np.searchsorted(s, v)
        ok = pos < len(s)
        hit = np.zeros(len(v), dtype=bool)
        hit[ok] = s[pos[ok]] == v[ok]
        vals = batch.column(col).to_numpy(zero_copy_only=False)[hit]
        return pa.table(
            {
                "s": pa.array([float(vals.sum())], type=pa.float64()),
                "c": pa.array([int(hit.sum())], type=pa.int64()),
            }
        )

    agg = ranks_ds.map_batches(_partial, batch_format="pyarrow").sum(["s", "c"])
    total, count = float(agg["sum(s)"]), int(agg["sum(c)"])
    return rd.from_arrow(
        pa.table(
            {
                f"avg_{col}": pa.array(
                    [total / count if count else 0.0], type=pa.float64()
                ),
                "n_vertices": pa.array([count], type=pa.int64()),
            }
        )
    )
