"""Driver-table tree-DP variants — TEST SUPPORT ONLY.

These are the original pandas-``parents_df`` implementations of the
two-pass tree DP, kept as small-scale parity oracles for the
dataset-native ``*_g`` variants in ``pipelines/tree_dp.py`` (which are
what production queries use). They materialize O(V) forest tables on
the driver by design and must not be used outside tests.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray
import ray.data as rd

from efficient_graph_algorithms_ray.config import EngineConfig
from efficient_graph_algorithms_ray.pipelines.graph_build import build_graph
from efficient_graph_algorithms_ray.state.graph import ShardedGraph
from efficient_graph_algorithms_ray.state.superstep import (
    run_supersteps,
    state_vertex_dataset,
)


def _parent_edge_arrays(parents_df):
    """(child vid, parent vid) uint64 arrays, roots excluded —
    vectorized sorted-array dense-id→vid translation (no dict/.map)."""
    own = parents_df["own_id"].to_numpy().astype(np.int64)
    vids = parents_df["vid"].to_numpy().astype(np.uint64)
    order = np.argsort(own)
    own_s, vid_s = own[order], vids[order]
    nonroot = parents_df["parent_id"].to_numpy() != own
    child = vids[nonroot]
    parent = vid_s[np.searchsorted(own_s, parents_df["parent_id"].to_numpy()[nonroot])]
    return child.astype(np.uint64), parent.astype(np.uint64)


def subtree_aggregate(
    graph: ShardedGraph,
    parents_df,
    x_lookup,
    ckpt_dir: str,
    *,
    num_partitions: int | None = None,
    max_iters: int = 500,
    child_scale: float = 1.0,
):
    """Bottom-up subtree sums over an oriented forest (pandas API).

    ``parents_df``: pandas output of ``rooted_bfs`` (vid, own_id,
    parent_id, depth). ``x_lookup(vids) -> float array`` supplies the
    per-vertex field. Returns (Dataset (vid, subtree_sum), summary).
    ``child_scale`` = λ generalizes the sum to
    up(v) = x(v) + λ·Σ_children up(c); λ=1 is the plain subtree sum.
    """
    child, parent = _parent_edge_arrays(parents_df)
    all_vids = parents_df["vid"].to_numpy().astype(np.uint64)
    pv, pc = np.unique(parent, return_counts=True)
    pvc_ref = ray.put((pv, pc))

    iso = np.setdiff1d(all_vids, np.union1d(child, parent))
    src = np.concatenate([child, iso])
    dst = np.concatenate([parent, iso])
    edges = rd.from_arrow(
        pa.table(
            {"src": pa.array(src, type=pa.uint64()), "dst": pa.array(dst, type=pa.uint64())}
        )
    )
    P = num_partitions or graph.num_partitions
    dp_graph = build_graph(edges, EngineConfig(num_partitions=P), directed=True)

    def init_fn(csr):
        pv_, pc_ = ray.get(pvc_ref)
        vids = csr["vids"]
        n = len(vids)
        state = np.zeros((n, 4), dtype=np.float64)
        state[:, 0] = x_lookup(vids)
        pos = np.searchsorted(pv_, vids)
        ok = pos < len(pv_)
        hit = np.zeros(n, dtype=bool)
        hit[ok] = pv_[pos[ok]] == vids[ok]
        state[hit, 2] = pc_[np.searchsorted(pv_, vids[hit])]
        return state

    def _ready(state):
        return (state[:, 1] >= state[:, 2]) & (state[:, 3] == 0)

    def msg_fn(state, csr):
        r = _ready(state)
        msg = np.zeros_like(state)
        msg[:, 0] = child_scale * (state[:, 0] * r)
        msg[:, 1] = r
        return msg

    def apply_fn(agg, old, T, dm, csr):
        new = old.copy()
        new[:, 0] += agg[:, 0]
        new[:, 1] += agg[:, 1]
        new[:, 3] += _ready(old)
        return new

    summary = run_supersteps(
        dp_graph, ckpt_dir, "sum", init_fn,
        tol=1e-12, max_iters=max_iters, normalize=False,
        apply_fn=apply_fn, msg_fn=msg_fn,
    )
    state = state_vertex_dataset(dp_graph, summary["final_iter_dir"], "state")

    def _shape(batch: pa.Table) -> pa.Table:
        from efficient_graph_algorithms_ray.util import list_rows

        rows = list_rows(batch, "state")
        acc = np.array([r[0] for r in rows]) if rows else np.empty(0)
        return pa.table(
            {
                "vid": batch.column("vid"),
                "subtree_sum": pa.array(acc, type=pa.float64()),
            }
        )

    return state.map_batches(_shape, batch_format="pyarrow"), summary


def topdown_prefix(
    graph: ShardedGraph,
    parents_df,
    x_lookup,
    ckpt_dir: str,
    *,
    num_partitions: int | None = None,
    max_iters: int = 500,
    parent_scale: float = 1.0,
):
    """Top-down pass (pandas API): prefix(v) = λ·prefix(parent) + x(v),
    root: prefix = x. Returns (Dataset (vid, prefix), summary)."""
    child, parent = _parent_edge_arrays(parents_df)
    all_vids = parents_df["vid"].to_numpy().astype(np.uint64)
    roots = np.sort(
        parents_df.loc[parents_df["parent_id"] == parents_df["own_id"], "vid"]
        .to_numpy()
        .astype(np.uint64)
    )
    roots_ref = ray.put(roots)
    iso = np.setdiff1d(all_vids, np.union1d(child, parent))
    src = np.concatenate([parent, iso])  # parent → child
    dst = np.concatenate([child, iso])
    edges = rd.from_arrow(
        pa.table(
            {"src": pa.array(src, type=pa.uint64()), "dst": pa.array(dst, type=pa.uint64())}
        )
    )
    P = num_partitions or graph.num_partitions
    dp_graph = build_graph(edges, EngineConfig(num_partitions=P), directed=True)

    def init_fn(csr):
        roots_ = ray.get(roots_ref)
        vids = csr["vids"]
        n = len(vids)
        state = np.zeros((n, 4), dtype=np.float64)
        x = np.asarray(x_lookup(vids), dtype=np.float64)
        pos = np.searchsorted(roots_, vids)
        ok = pos < len(roots_)
        is_root = np.zeros(n, dtype=bool)
        is_root[ok] = roots_[pos[ok]] == vids[ok]
        state[:, 3] = x
        state[:, 0] = x * is_root
        state[:, 1] = is_root
        return state

    def _ready(state):
        return (state[:, 1] > 0) & (state[:, 2] == 0)

    def msg_fn(state, csr):
        r = _ready(state)
        msg = np.zeros_like(state)
        msg[:, 0] = state[:, 0] * r
        msg[:, 1] = r
        return msg

    def apply_fn(agg, old, T, dm, csr):
        new = old.copy()
        arrived = agg[:, 1] > 0
        new[:, 0] += parent_scale * agg[:, 0] + arrived * old[:, 3]
        new[:, 1] += agg[:, 1]
        new[:, 2] += _ready(old)
        return new

    summary = run_supersteps(
        dp_graph, ckpt_dir, "sum", init_fn,
        tol=1e-12, max_iters=max_iters, normalize=False,
        apply_fn=apply_fn, msg_fn=msg_fn,
    )
    state = state_vertex_dataset(dp_graph, summary["final_iter_dir"], "state")

    def _shape(batch: pa.Table) -> pa.Table:
        from efficient_graph_algorithms_ray.util import list_rows

        rows = list_rows(batch, "state")
        acc = np.array([r[0] for r in rows]) if rows else np.empty(0)
        return pa.table(
            {"vid": batch.column("vid"), "prefix": pa.array(acc, type=pa.float64())}
        )

    return state.map_batches(_shape, batch_format="pyarrow"), summary


def integrate_tree_field(
    graph: ShardedGraph,
    parents_df,
    x_lookup,
    a: float,
    ckpt_dir: str,
    *,
    num_partitions: int | None = None,
):
    """Tree-metric kernel matvec y = K·x with K(u,v) = exp(a·dist_T)
    (pandas API) — parity oracle for ``integrate_tree_field_g``."""
    lam = float(np.exp(a))
    up_ds, s_up = subtree_aggregate(
        graph, parents_df, x_lookup, f"{ckpt_dir}/up",
        num_partitions=num_partitions, child_scale=lam,
    )
    up_df = up_ds.to_pandas()  # test scale only
    uv = up_df["vid"].to_numpy().astype(np.uint64)
    uu = up_df["subtree_sum"].to_numpy().astype(np.float64)
    order = np.argsort(uv)
    uv, uu = uv[order], uu[order]
    root_vids = np.sort(
        parents_df.loc[parents_df["parent_id"] == parents_df["own_id"], "vid"]
        .to_numpy()
        .astype(np.uint64)
    )
    arr_ref = ray.put((uv, uu, root_vids))

    def x2_lookup(q: np.ndarray) -> np.ndarray:
        uv_, uu_, roots_ = ray.get(arr_ref)
        vals = uu_[np.searchsorted(uv_, q)]
        pos = np.searchsorted(roots_, q)
        ok = pos < len(roots_)
        is_root = np.zeros(len(q), dtype=bool)
        is_root[ok] = roots_[pos[ok]] == q[ok]
        return np.where(is_root, vals, (1.0 - lam * lam) * vals)

    z_ds, s_dn = topdown_prefix(
        graph, parents_df, x2_lookup, f"{ckpt_dir}/down",
        num_partitions=num_partitions, parent_scale=lam,
    )

    def _shape(batch: pa.Table) -> pa.Table:
        return pa.table(
            {"vid": batch.column("vid"), "integral": batch.column("prefix")}
        )

    return z_ds.map_batches(_shape, batch_format="pyarrow"), {"up": s_up, "down": s_dn}
