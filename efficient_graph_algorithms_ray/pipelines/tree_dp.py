"""Two-pass dynamic programming over trees/forests — supersteps.

Reference parity: ``TreeGFIntegrator`` (/root/reference/src/ega/
algorithms/tree_based_integrators.py) runs a bottom-up (leaves→root)
accumulation followed by a top-down (root→leaves) distribution over
BFS levels of a spanning tree, and #38's subtree cost aggregation
(lipton_tarjan separator costs). Distributed equivalents here:

- ``rooted_bfs`` — orient a forest: per-component root (the CC
  min-vid vertex) + per-vertex (depth, parent). One min-mode superstep
  run with sender-id-encoded messages: state ``(depth << 32) | parent
  dense-id``; each reached vertex offers ``(depth+1 << 32) | own id``,
  unreached vertices offer the UNLABELED identity. The min combine
  picks the shallowest (then smallest-id) claimant — a deterministic
  BFS tree in O(diameter) rounds.
- ``subtree_aggregate_g`` — bottom-up pass: on the child→parent edge
  graph, vector state ``[acc, recv, n_children, sent]`` with
  readiness-gated messages (a vertex fires exactly once, the round
  after all children have fired — ``msg_fn`` gates, ``apply_fn``
  marks). Subtree sums for every vertex in O(tree depth) rounds, one
  pre-aggregated exchange each.
- ``topdown_prefix_g`` — top-down pass: on the parent→child graph,
  state ``[prefix, got, sent, x]``; the root fires first, every
  vertex adds its parent's prefix to its own x and fires once.
  Root-to-vertex path sums in O(depth) rounds.

Scale notes: root detection reads the CC *checkpoint* per partition
inside ``init_fn`` (no driver collect); the child-count / root-set
lookup arrays are ``ray.put`` once and read from plasma in ``init_fn``
(never closure-captured, never re-shipped per actor).
"""

from __future__ import annotations

import numpy as np

from ..config import EngineConfig, UNLABELED
from ..state.graph import ShardedGraph
from ..state.superstep import run_supersteps
from .decomposition import _id_bases
from ..util import parts_dataset

_LOW32 = np.uint64(0xFFFFFFFF)
_INF_DEPTH = np.uint64(1 << 30)


def make_vid_lookup(vids: np.ndarray, vals: np.ndarray, default: float = 0.0):
    """f(query_vids) -> values — sorted-array vid lookup (missing →
    default). Arrays go through ``ray.put`` once (plasma broadcast),
    not per-actor closure shipping — the map can be O(V)."""
    import ray

    order = np.argsort(vids)
    ref = ray.put((vids[order], np.asarray(vals, dtype=np.float64)[order]))

    def _f(q: np.ndarray) -> np.ndarray:
        vs, xs = ray.get(ref)
        out = np.full(len(q), default, dtype=np.float64)
        pos = np.searchsorted(vs, q)
        ok = pos < len(vs)
        hit = np.zeros(len(q), dtype=bool)
        hit[ok] = vs[pos[ok]] == q[ok]
        out[hit] = xs[pos[hit]]
        return out

    return _f


def rooted_bfs(
    graph: ShardedGraph, ckpt_dir: str, *, max_iters: int = 300, cc_dir: str | None = None
):
    """Orient an undirected forest/graph from per-component min-vid roots.

    Returns (Dataset (vid, own_id, parent_id, depth), summary). For a
    root, parent_id == own_id and depth == 0. On a non-tree graph this
    yields a BFS spanning tree per component (shallowest-then-smallest
    parent, deterministic).

    ``cc_dir`` (optional) reuses an existing min-label CC checkpoint
    from ANY graph with the same vertex set and partitioner (e.g. the
    source graph of a sampled spanning forest — a forest has exactly
    its source's components), skipping one superstep run per call.
    """
    from .components import connected_components

    assert not graph.directed, "rooted_bfs requires an undirected graph"
    # roots come straight from the CC CHECKPOINT, read per-partition
    # inside init_fn (state parts are in partition vertex order, exactly
    # aligned with csr["vids"]) — no driver collect of the component
    # table, no O(V) arrays captured in the closure (the round-1
    # scale-killer this replaces).
    if cc_dir is None:
        _, cc_summary = connected_components(graph, f"{ckpt_dir}/cc")
        cc_dir = cc_summary["final_iter_dir"]

    bases = _id_bases(graph)

    def init_fn(csr):
        from ..state.ckpt import read_state_part

        vids = csr["vids"]
        own = np.uint64(bases[int(csr["part"])]) + np.arange(len(vids), dtype=np.uint64)
        lab = read_state_part(cc_dir, int(csr["part"])).astype(np.uint64)
        is_root = lab == vids
        depth = np.where(is_root, np.uint64(0), _INF_DEPTH).astype(np.uint64)
        return (depth << np.uint64(32)) | own

    def msg_fn(value, csr):
        own = np.uint64(bases[int(csr["part"])]) + np.arange(len(value), dtype=np.uint64)
        depth = value >> np.uint64(32)
        return np.where(
            depth < _INF_DEPTH,
            ((depth + np.uint64(1)) << np.uint64(32)) | own,
            np.uint64(UNLABELED),
        ).astype(np.uint64)

    summary = run_supersteps(
        graph, f"{ckpt_dir}/bfs", "min", init_fn, tol=0.0, max_iters=max_iters,
        msg_fn=msg_fn,
    )

    import pyarrow as pa
    import ray
    import ray.data as rd

    from ..state.ckpt import read_state_part

    refs = graph.refs
    final_dir = summary["final_iter_dir"]

    def _emit(batch: pa.Table) -> pa.Table:
        parts = batch.column("part").to_numpy(zero_copy_only=False)
        vid_o, own_o, par_o, dep_o = [], [], [], []
        for p in parts:
            csr = ray.get(refs[int(p)])
            enc = read_state_part(final_dir, int(p)).astype(np.uint64)
            n = len(enc)
            vid_o.append(csr["vids"])
            own_o.append(
                (np.uint64(bases[int(p)]) + np.arange(n, dtype=np.uint64)).astype(np.int64)
            )
            par_o.append((enc & _LOW32).astype(np.int64))
            dep_o.append((enc >> np.uint64(32)).astype(np.int64))
        return pa.table(
            {
                "vid": pa.array(np.concatenate(vid_o), type=pa.uint64()),
                "own_id": pa.array(np.concatenate(own_o), type=pa.int64()),
                "parent_id": pa.array(np.concatenate(par_o), type=pa.int64()),
                "depth": pa.array(np.concatenate(dep_o), type=pa.int64()),
            }
        )

    parts_ds = parts_dataset(graph.parts)
    return parts_ds.map_batches(_emit, batch_format="pyarrow", batch_size=4), summary


def min_neighbor_forest_edges(graph: ShardedGraph):
    """Canonical SQL-reproducible forest over any undirected graph:
    parent(v) = min neighbor u with u < v (absent → v is a root).

    Parent chains strictly decrease, so the structure is a forest whose
    tree roots are exactly the vertices with no smaller neighbor — and
    each root is its tree's minimum vid, so the engine's generic
    ``rooted_bfs`` (roots = per-component min vid) orients this forest
    back onto itself. Emitted partition-locally from each CSR shard
    (indices are sorted, so the parent is the first neighbor when it is
    smaller). Returns a (src=child, dst=parent) edge Dataset.
    """
    import pyarrow as pa
    import ray
    import ray.data as rd

    refs = graph.refs

    def _emit(batch: pa.Table) -> pa.Table:
        parts = batch.column("part").to_numpy(zero_copy_only=False)
        child_o, par_o = [], []
        for p in parts:
            csr = ray.get(refs[int(p)])
            vids, indptr, idx = csr["vids"], csr["indptr"], csr["indices"]
            has_edge = np.diff(indptr) > 0
            first = idx[indptr[:-1][has_edge]]  # min neighbor (sorted indices)
            keep = first < vids[has_edge]
            child_o.append(vids[has_edge][keep])
            par_o.append(first[keep])
            # roots (no smaller neighbor) emit a SELF row: the CSR pack
            # drops the self-loop but keeps the vid in the vertex set,
            # so singleton trees exist in BOTH forest orientations
            roots = np.concatenate(
                [vids[has_edge][~keep], vids[~has_edge]]
            )
            child_o.append(roots)
            par_o.append(roots)
        return pa.table(
            {
                "src": pa.array(
                    np.concatenate(child_o) if child_o else np.empty(0, np.uint64),
                    type=pa.uint64(),
                ),
                "dst": pa.array(
                    np.concatenate(par_o) if par_o else np.empty(0, np.uint64),
                    type=pa.uint64(),
                ),
            }
        )

    parts_ds = parts_dataset(graph.parts)
    return parts_ds.map_batches(_emit, batch_format="pyarrow", batch_size=4)


def forest_graphs(forest_edges_ds, num_partitions: int = 16):
    """(child→parent graph, parent→child graph) from a (src=child,
    dst=parent) forest edge Dataset — same hash partitioner, so both
    graphs hold IDENTICAL per-partition vid arrays (sorted) and any
    per-vertex array from one aligns with the other. The foundation of
    the fully dataset-native tree-DP path (no driver-side forest
    table). Root self-rows in the input keep singletons in both vertex
    sets (the pack drops the self-loop, keeps the vid)."""
    import pyarrow as pa

    from ..config import EngineConfig
    from .graph_build import build_graph

    cfg = EngineConfig(num_partitions=num_partitions)
    edges = forest_edges_ds.materialize()
    g_up = build_graph(edges, cfg, directed=True)  # child → parent

    def _rev(batch: pa.Table) -> pa.Table:
        return pa.table({"src": batch.column("dst"), "dst": batch.column("src")})

    g_down = build_graph(
        edges.map_batches(_rev, batch_format="pyarrow"), cfg, directed=True
    )
    return g_up, g_down


def _sibling_children_counts(g_down):
    """init-time lookup: n_children(v) = out-degree in the parent→child
    orientation, read from the ALIGNED sibling shard (plasma,
    partition-local, zero driver involvement)."""
    refs = g_down.refs

    def _counts(csr):
        import ray

        return ray.get(refs[int(csr["part"])])["deg"].astype(np.float64)

    return _counts


def subtree_aggregate_g(
    g_up,
    g_down,
    x_lookup,
    ckpt_dir: str,
    *,
    max_iters: int = 500,
    child_scale: float = 1.0,
):
    """Dataset-native bottom-up pass: like :func:`subtree_aggregate`
    but with NO driver-side forest table — child counts come from the
    aligned parent→child sibling graph inside ``init_fn``.
    Returns (Dataset (vid, subtree_sum), summary)."""
    import pyarrow as pa

    from ..state.superstep import run_supersteps, state_vertex_dataset

    n_children = _sibling_children_counts(g_down)

    def init_fn(csr):
        n = len(csr["vids"])
        state = np.zeros((n, 4), dtype=np.float64)
        state[:, 0] = x_lookup(csr["vids"])
        state[:, 2] = n_children(csr)
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
        g_up, ckpt_dir, "sum", init_fn,
        tol=1e-12, max_iters=max_iters, normalize=False,
        apply_fn=apply_fn, msg_fn=msg_fn,
    )
    state = state_vertex_dataset(g_up, summary["final_iter_dir"], "state")

    def _shape(batch: pa.Table) -> pa.Table:
        from ..util import list_rows

        rows = list_rows(batch, "state")
        acc = np.array([r[0] for r in rows]) if rows else np.empty(0)
        return pa.table(
            {"vid": batch.column("vid"), "subtree_sum": pa.array(acc, type=pa.float64())}
        )

    return state.map_batches(_shape, batch_format="pyarrow"), summary


def topdown_prefix_g(
    g_up,
    g_down,
    x_lookup,
    ckpt_dir: str,
    *,
    max_iters: int = 500,
    parent_scale: float = 1.0,
):
    """Dataset-native top-down pass: prefix(v) = λ·prefix(parent) + x(v)
    over the parent→child graph; roots (out-degree 0 in the aligned
    child→parent sibling) detected partition-locally.
    ``x_lookup(vids, csr)``-style callables are supported via a plain
    vids signature. Returns (Dataset (vid, prefix), summary)."""
    import pyarrow as pa

    from ..state.superstep import run_supersteps, state_vertex_dataset

    up_refs = g_up.refs

    def init_fn(csr):
        import ray

        vids = csr["vids"]
        n = len(vids)
        state = np.zeros((n, 4), dtype=np.float64)
        x = np.asarray(x_lookup(vids), dtype=np.float64)
        is_root = ray.get(up_refs[int(csr["part"])])["deg"] == 0
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
        g_down, ckpt_dir, "sum", init_fn,
        tol=1e-12, max_iters=max_iters, normalize=False,
        apply_fn=apply_fn, msg_fn=msg_fn,
    )
    state = state_vertex_dataset(g_down, summary["final_iter_dir"], "state")

    def _shape(batch: pa.Table) -> pa.Table:
        from ..util import list_rows

        rows = list_rows(batch, "state")
        acc = np.array([r[0] for r in rows]) if rows else np.empty(0)
        return pa.table(
            {"vid": batch.column("vid"), "prefix": pa.array(acc, type=pa.float64())}
        )

    return state.map_batches(_shape, batch_format="pyarrow"), summary


def integrate_tree_field_g(
    g_up,
    g_down,
    x_lookup,
    a: float,
    ckpt_dir: str,
):
    """Dataset-native tree-metric kernel matvec (see
    :func:`integrate_tree_field` for the math): the up-pass checkpoint
    is read per-partition inside the down-pass ``init_fn`` through the
    ALIGNED sibling shards — no driver collect of up values."""
    import pyarrow as pa
    import ray

    from ..state.superstep import run_supersteps, state_vertex_dataset

    lam = float(np.exp(a))
    _, s_up = subtree_aggregate_g(
        g_up, g_down, x_lookup, f"{ckpt_dir}/up", child_scale=lam
    )
    up_dir = s_up["final_iter_dir"]
    up_refs = g_up.refs

    def x2_lookup_init(csr):
        # called with the g_down csr; partitions/vids align with g_up
        from ..state.ckpt import read_state_part

        up = read_state_part(up_dir, int(csr["part"]))[:, 0]
        is_root = ray.get(up_refs[int(csr["part"])])["deg"] == 0
        return np.where(is_root, up, (1.0 - lam * lam) * up)

    # topdown_prefix_g takes a vids-based lookup; here the field depends
    # on the PARTITION (checkpoint read), so inline a tailored run
    def init_fn(csr):
        vids = csr["vids"]
        n = len(vids)
        state = np.zeros((n, 4), dtype=np.float64)
        x = x2_lookup_init(csr)
        is_root = ray.get(up_refs[int(csr["part"])])["deg"] == 0
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
        new[:, 0] += lam * agg[:, 0] + arrived * old[:, 3]
        new[:, 1] += agg[:, 1]
        new[:, 2] += _ready(old)
        return new

    summary = run_supersteps(
        g_down, f"{ckpt_dir}/down", "sum", init_fn,
        tol=1e-12, max_iters=500, normalize=False,
        apply_fn=apply_fn, msg_fn=msg_fn,
    )
    state = state_vertex_dataset(g_down, summary["final_iter_dir"], "state")

    def _shape(batch: pa.Table) -> pa.Table:
        from ..util import list_rows

        rows = list_rows(batch, "state")
        acc = np.array([r[0] for r in rows]) if rows else np.empty(0)
        return pa.table(
            {"vid": batch.column("vid"), "integral": pa.array(acc, type=pa.float64())}
        )

    return state.map_batches(_shape, batch_format="pyarrow"), {"up": s_up, "down": summary}

