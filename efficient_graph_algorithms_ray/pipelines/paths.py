"""Weighted single/multi-source shortest paths — Bellman–Ford supersteps.

Reference parity: the Dijkstra shortest-path balls inside the tree
decompositions (``FRTTreeGFIntegrator`` /root/reference/src/ega/
algorithms/frt_trees.py and ``BartalTreeGFIntegrator`` bartal_trees.py
both grow clusters by weighted graph distance) and the shortest-path
metric underlying ``diffusion_state_distance``'s all-pairs variant
(graph_kernels.py) — here as the distributed primitive those methods
presume: a shortest-path forest from a seed set.

Mechanics: the same encoded min-propagation as decomposition.py /
tree_dp.py, with the edge length entering through the engine's
``edge_shift_fn`` (state/bsp.py): per-edge quantized lengths are
precomputed once into the static scatter structure and added to each
gathered message — Bellman–Ford relaxation with pre-aggregated
exchanges, converging in O(weighted-diameter / min-edge) rounds on the
quantized metric.

State: ``(dist_q << 32) | claimant dense-id``; the min combine is
lexicographic (shortest distance, then smallest claimant id), so the
result is a deterministic shortest-path forest: every reached vertex
stores its exact quantized distance and its tree parent. Quantization
(``scale`` quanta per unit length) is part of the metric — the dense
replica oracle uses identical integer arithmetic, so tests assert
bit-equality, not allclose.
"""

from __future__ import annotations

import numpy as np

from ..config import UNLABELED
from ..state.graph import ShardedGraph
from ..state.superstep import run_supersteps
from .decomposition import _id_bases
from ..util import parts_dataset

_LOW32 = np.uint64(0xFFFFFFFF)
_INF = np.uint64(1 << 30)  # dist_q sentinel (keyhi) for unreached


def shortest_path_forest(
    graph: ShardedGraph,
    sources: np.ndarray,
    ckpt_dir: str,
    *,
    scale: int = 1 << 16,
    max_iters: int = 500,
):
    """Multi-source weighted SSSP over an undirected (or directed)
    sharded graph; unweighted graphs use unit edge length.

    ``sources``: uint64 vids with distance 0. Returns (Dataset (vid,
    own_id, parent_id, dist_q, dist, reached), summary) — ``dist_q``
    the exact quantized distance (⌊w·scale⌉ per edge), ``dist`` its
    float rendering, ``parent_id`` the shortest-path-tree parent
    (own_id for sources and unreached vertices).
    """
    bases = _id_bases(graph)
    srcs = np.sort(np.asarray(sources, dtype=np.uint64))

    def init_fn(csr):
        vids = csr["vids"]
        own = np.uint64(bases[int(csr["part"])]) + np.arange(len(vids), dtype=np.uint64)
        pos = np.searchsorted(srcs, vids)
        ok = pos < len(srcs)
        is_src = np.zeros(len(vids), dtype=bool)
        is_src[ok] = srcs[pos[ok]] == vids[ok]
        dist = np.where(is_src, np.uint64(0), _INF).astype(np.uint64)
        return (dist << np.uint64(32)) | own

    def msg_fn(value, csr):
        own = np.uint64(bases[int(csr["part"])]) + np.arange(len(value), dtype=np.uint64)
        dist = value >> np.uint64(32)
        return np.where(
            dist < _INF,
            (dist << np.uint64(32)) | own,
            np.uint64(UNLABELED),
        ).astype(np.uint64)

    def edge_shift_fn(w_perm, csr):
        if w_perm is None:
            q = np.full(len(csr["indices"]), scale, dtype=np.uint64)
        else:
            if (w_perm < 0).any():
                raise ValueError("shortest_path_forest requires non-negative weights")
            q = np.maximum(np.rint(w_perm * scale), 1).astype(np.uint64)
        return q << np.uint64(32)

    summary = run_supersteps(
        graph, ckpt_dir, "min", init_fn, tol=0.0, max_iters=max_iters,
        msg_fn=msg_fn, edge_shift_fn=edge_shift_fn,
    )

    import pyarrow as pa
    import ray
    import ray.data as rd

    from ..state.ckpt import read_state_part

    refs = graph.refs
    final_dir = summary["final_iter_dir"]

    def _emit(batch: pa.Table) -> pa.Table:
        parts = batch.column("part").to_numpy(zero_copy_only=False)
        vid_o, own_o, par_o, dq_o = [], [], [], []
        for p in parts:
            csr = ray.get(refs[int(p)])
            enc = read_state_part(final_dir, int(p)).astype(np.uint64)
            n = len(enc)
            vid_o.append(csr["vids"])
            own_o.append(
                (np.uint64(bases[int(p)]) + np.arange(n, dtype=np.uint64)).astype(np.int64)
            )
            par_o.append((enc & _LOW32).astype(np.int64))
            dq_o.append((enc >> np.uint64(32)).astype(np.int64))
        own = np.concatenate(own_o)
        par = np.concatenate(par_o)
        dq = np.concatenate(dq_o)
        reached = dq < int(_INF)
        return pa.table(
            {
                "vid": pa.array(np.concatenate(vid_o), type=pa.uint64()),
                "own_id": pa.array(own, type=pa.int64()),
                "parent_id": pa.array(np.where(reached, par, own), type=pa.int64()),
                "dist_q": pa.array(np.where(reached, dq, -1), type=pa.int64()),
                "dist": pa.array(
                    np.where(reached, dq / scale, np.inf), type=pa.float64()
                ),
                "reached": pa.array(reached),
            }
        )

    parts_ds = parts_dataset(graph.parts)
    return parts_ds.map_batches(_emit, batch_format="pyarrow", batch_size=4), summary


def distance_bucket_aggregate(
    graph: ShardedGraph,
    sources: np.ndarray,
    ckpt_dir: str,
    *,
    unit_q: int,
    scale: int = 1 << 16,
    max_iters: int = 500,
):
    """Distance-bucketed vertex clustering — the reference's
    ``base_compute_clustering`` sub-pattern (/root/reference/src/ega/
    util/separator_utils.py:28-57): multi-source shortest-path
    distances, vertices grouped by ⌊dist/unit⌋. Distributed form: one
    SSSP superstep run, then an integer bucket map + one tiny
    ``groupby(bucket)`` count (buckets are exact int division of the
    quantized metric, so the result is integer-exact and
    SQL-oracleable). Unreached vertices land in bucket −1.

    Returns (Dataset (bucket, n), summary).
    """
    import pyarrow as pa
    from ray.data.aggregate import Sum

    out, summary = shortest_path_forest(
        graph, sources, ckpt_dir, scale=scale, max_iters=max_iters
    )

    def _bucket(batch: pa.Table) -> pa.Table:
        dq = batch.column("dist_q").to_numpy(zero_copy_only=False)
        bucket = np.where(dq >= 0, dq // unit_q, -1)
        uniq, cnt = np.unique(bucket, return_counts=True)  # per-block combiner
        return pa.table(
            {
                "bucket": pa.array(uniq.astype(np.int64), type=pa.int64()),
                "n": pa.array(cnt.astype(np.int64), type=pa.int64()),
            }
        )

    agg = (
        out.map_batches(_bucket, batch_format="pyarrow")
        .groupby("bucket")
        .aggregate(Sum("n", alias_name="n"))
    )
    return agg, summary


def widest_path_forest(
    graph,
    sources: np.ndarray,
    ckpt_dir: str,
    *,
    max_iters: int = 8,
    source_cap: float = 1e18,
):
    """Max-bottleneck (widest-path) capacities from a source set.

    The max-min semiring on the superstep engine: state = best
    bottleneck capacity (0 = unreached, monoid identity), message =
    min(cap(u), w(u, v)) via the engine's ``msg_edge_min`` clamp,
    combine = max. Pure selection arithmetic (LEAST/GREATEST, no sums)
    ⇒ bit-exact against the unrolled SQL oracle with NO rounding.
    Returns (Dataset (vid, width), summary); sources carry
    ``source_cap`` (exactly representable), unreached vertices 0.
    """
    from ..state.superstep import run_supersteps, state_vertex_dataset

    src_sorted = np.sort(np.asarray(sources, dtype=np.uint64))

    def init_fn(csr):
        cap = np.zeros(len(csr["vids"]), dtype=np.float64)
        pos = np.searchsorted(csr["vids"], src_sorted)
        ok = pos < len(csr["vids"])
        idx = pos[ok]
        match = csr["vids"][idx] == src_sorted[ok]
        cap[idx[match]] = source_cap
        return cap

    summary = run_supersteps(
        graph,
        ckpt_dir,
        "max",
        init_fn,
        tol=0.0,
        max_iters=max_iters,
        msg_edge_min=True,
    )
    out = state_vertex_dataset(graph, summary["final_iter_dir"], "width")
    return out, summary
