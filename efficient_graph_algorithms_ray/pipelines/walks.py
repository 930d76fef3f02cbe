"""Random-walk operator family over the generalized superstep engine.

Reference parity (all from /root/reference/src/ega/algorithms/
graph_kernels.py):

- ``k_step_walk``       ← ``random_walk_kernel`` (:66-68): k powers of
  the (weight-)normalized adjacency, undamped — damping=1, zero
  teleport.
- ``personalized_pagerank`` ← ``random_walk_with_restart_kernel``
  (:72-79) applied to a seed indicator, i.e. ``get_projection``
  seed-set scoring (:387-519) with the SEEDSET_SIZE correction (seed
  mass split uniformly across the seed set).
- ``multi_source_pagerank`` ← ``get_projections_batch`` (:521-557):
  d seed sets scored in ONE run via a [n, d] vector field (the
  reference's tensor-field abstraction, gf_integrator.py:4-22).
- ``masked_neighbor_interpolate`` ← ``Interpolator.interpolate``
  (/root/reference/src/ega/util/interpolator.py:5-33): integrate
  (F·mask) / integrate(mask) — one superstep each, elementwise divide.

Weighted graphs: build the graph from an edge table with a ``w``
column; the walk normalizer becomes the per-vertex weight sum
(reference weights default 1.0, mesh_utils.py:94-106).
"""

from __future__ import annotations

import numpy as np

from ..state.graph import ShardedGraph
from ..state.superstep import run_supersteps, state_vertex_dataset
from ..util import parts_dataset


def vertex_lookup_init(vids: np.ndarray, vals: np.ndarray, default=0.0, width: int = 1):
    """init_fn factory: per-partition array from a sorted (vids → vals)
    map. The arrays are ``ray.put`` ONCE — workers read the plasma copy
    instead of a closure capture re-shipped per actor (the map can be
    O(V))."""
    import ray

    order = np.argsort(vids)
    ref = ray.put((vids[order], np.asarray(vals)[order]))

    def _init(csr):
        vids_s, vals_s = ray.get(ref)
        n = len(csr["vids"])
        out = (
            np.full((n, width), default, dtype=np.float64)
            if width > 1
            else np.full(n, default, dtype=np.float64)
        )
        pos = np.searchsorted(vids_s, csr["vids"])
        ok = pos < len(vids_s)
        hit = np.zeros(n, dtype=bool)
        hit[ok] = vids_s[pos[ok]] == csr["vids"][ok]
        out[hit] = vals_s[pos[hit]]
        return out

    return _init


def _seed_teleport(seeds: dict[int, float]):
    """teleport_fn for a normalized seed distribution."""
    vids = np.fromiter((np.uint64(v) for v in seeds), dtype=np.uint64, count=len(seeds))
    w = np.fromiter((float(seeds[int(v)]) for v in vids), dtype=np.float64, count=len(seeds))
    w = w / w.sum()
    return vertex_lookup_init(vids, w, default=0.0)


def personalized_pagerank(
    graph: ShardedGraph,
    ckpt_dir: str,
    seeds,
    *,
    damping: float = 0.85,
    tol: float = 1e-6,
    max_iters: int = 100,
    resume: bool = False,
):
    """Seeded PageRank: restart at the seed distribution. ``seeds`` is
    a {vid: weight} dict or a list of vids (uniform over the set).

    Seeds absent from the graph are dropped BEFORE normalization (so
    the teleport still sums to 1 — matching generalized_walk_oracle's
    semantics; silently leaking teleport mass was the round-1 bug)."""
    if not isinstance(seeds, dict):
        seeds = {int(v): 1.0 for v in seeds}
    present = graph.vids_present(np.array(sorted(seeds), dtype=np.uint64))
    seeds = {v: seeds[v] for v, ok in zip(sorted(seeds), present) if ok}
    if not seeds:
        raise ValueError("none of the seed vids exist in the graph")
    tfn = _seed_teleport(seeds)
    summary = run_supersteps(
        graph,
        ckpt_dir,
        "sum",
        tfn,  # init = teleport distribution (standard PPR start)
        damping=damping,
        tol=tol,
        max_iters=max_iters,
        resume=resume,
        teleport_fn=tfn,
    )
    return state_vertex_dataset(graph, summary["final_iter_dir"], "score"), summary


def multi_source_pagerank(
    graph: ShardedGraph,
    ckpt_dir: str,
    seed_sets: list[list[int]],
    *,
    damping: float = 0.85,
    tol: float = 1e-6,
    max_iters: int = 100,
):
    """d seed sets scored in one run ([n, d] field). Returns a Dataset
    (vid, scores: list<float64>[d]) + summary."""
    d = len(seed_sets)
    flat_vids = []
    flat_rows = []
    for j, ss in enumerate(seed_sets):
        for v in ss:
            flat_vids.append(np.uint64(v))
            flat_rows.append((j, 1.0 / len(ss)))
    svids = np.array(flat_vids, dtype=np.uint64)

    def teleport_fn(csr):
        n = len(csr["vids"])
        T = np.zeros((n, d))
        pos = np.searchsorted(csr["vids"], svids)
        ok = pos < n
        hit = np.zeros(len(svids), dtype=bool)
        hit[ok] = csr["vids"][pos[ok]] == svids[ok]
        for i in np.flatnonzero(hit):
            j, wgt = flat_rows[i]
            T[pos[i], j] += wgt
        return T

    summary = run_supersteps(
        graph,
        ckpt_dir,
        "sum",
        teleport_fn,
        damping=damping,
        tol=tol,
        max_iters=max_iters,
        teleport_fn=teleport_fn,
    )
    return state_vertex_dataset(graph, summary["final_iter_dir"], "scores"), summary


def k_step_walk(graph: ShardedGraph, ckpt_dir: str, k: int, init_fn=None):
    """Distribution after exactly k steps of the normalized random walk
    (undamped; dangling mass is absorbed, matching A_norm^k · x)."""
    N = graph.n_vertices

    def default_init(csr):
        return np.full(len(csr["vids"]), 1.0 / N)

    def zero_teleport(csr):
        return np.zeros(len(csr["vids"]))

    summary = run_supersteps(
        graph,
        ckpt_dir,
        "sum",
        init_fn or default_init,
        damping=1.0,
        tol=0.0,
        max_iters=k,
        teleport_fn=zero_teleport,
    )
    return state_vertex_dataset(graph, summary["final_iter_dir"], "mass"), summary


def diffusion_state_distance_pairs(
    graph: ShardedGraph,
    ckpt_dir: str,
    query_vids,
    n_rw: int = 3,
):
    """Exact Diffusion State Distance between all pairs of a bounded
    query set — the distributed answer to the reference's all-pairs
    ``diffusion_state_distance`` (graph_kernels.py:82-95), whose O(N²)
    output cannot exist at scale. DSD(u,v) = ‖c_u − c_v‖₁ with
    c_u = Σ_{i=0..nRw} e_uᵀPⁱ.

    One superstep run carries all |Q| rows as a [n, 2d] field (current
    walk power ‖ accumulator); the pairwise L1 reduce is a per-batch
    partial + tiny driver merge (d² scalars). Returns an ndarray
    [(qa, qb, dsd)] over qa < qb.
    """
    import pyarrow as pa  # noqa: F401

    q = np.sort(np.asarray(list(query_vids), dtype=np.uint64))
    d = len(q)

    def init_fn(csr):
        n = len(csr["vids"])
        state = np.zeros((n, 2 * d), dtype=np.float64)
        pos = np.searchsorted(csr["vids"], q)
        ok = pos < n
        hit = np.zeros(d, dtype=bool)
        hit[ok] = csr["vids"][pos[ok]] == q[ok]
        for j in np.flatnonzero(hit):
            state[pos[j], j] = 1.0  # current power e_q
            state[pos[j], d + j] = 1.0  # accumulator starts at e_q (P^0 term)
        return state

    def msg_fn(state, csr):
        # msg_fn owns normalization: send P-step of the power half only
        norm = csr.get("wdeg", csr["deg"]).astype(np.float64)
        msg = np.zeros_like(state)
        nz = norm > 0
        msg[nz, :d] = state[nz, :d] / norm[nz, None]
        return msg

    def apply_fn(agg, old, T, dm, csr):
        new = np.empty_like(old)
        new[:, :d] = agg[:, :d]  # next walk power e_qᵀP^{i+1}
        new[:, d:] = old[:, d:] + agg[:, :d]  # accumulate
        return new

    summary = run_supersteps(
        graph, ckpt_dir, "sum", init_fn,
        tol=0.0, max_iters=n_rw, normalize=False,
        msg_fn=msg_fn, apply_fn=apply_fn,
        # msg_fn normalizes by wdeg; the scatter must still scale each
        # send by the per-edge weight for P to be row-stochastic on a
        # weighted graph (no-op when weights are unit).
        msg_edge_weights=True,
    )

    state = state_vertex_dataset(graph, summary["final_iter_dir"], "state")

    # pairwise L1 between accumulator columns: per-batch partials
    ia, ib = np.triu_indices(d, 1)

    def _partial(batch):
        from ..util import list_rows

        rows = list_rows(batch, "state")
        if not rows:
            return pa.table({"pair": pa.array([], type=pa.int64()),
                             "s": pa.array([], type=pa.float64())})
        mat = np.vstack(rows)[:, d:]  # [rows, d] accumulators
        diffs = np.abs(mat[:, ia] - mat[:, ib]).sum(axis=0)  # [d*(d-1)/2]
        return pa.table(
            {
                "pair": pa.array(np.arange(len(ia), dtype=np.int64), type=pa.int64()),
                "s": pa.array(diffs, type=pa.float64()),
            }
        )

    import pyarrow as pa

    totals = np.zeros(len(ia))
    for b in state.map_batches(_partial, batch_format="pyarrow").iter_batches(
        batch_size=None, batch_format="pyarrow"
    ):
        pid = b.column("pair").to_numpy(zero_copy_only=False)
        s = b.column("s").to_numpy(zero_copy_only=False)
        np.add.at(totals, pid, s)
    return np.array(
        [(int(q[a]), int(q[b]), float(t)) for a, b, t in zip(ia, ib, totals)],
        dtype=object,
    ), summary


def masked_neighbor_interpolate(
    graph: ShardedGraph, ckpt_dir: str, value_init, mask_init
):
    """Interpolator semantics: one normalized gather of (F·mask) divided
    by the same gather of mask — the masked neighbor average used for
    field interpolation (vertex_normal_prediction.py:204-205).

    value_init/mask_init: init_fn callables (see vertex_lookup_init).
    Returns Dataset (vid, value) where vertices with no known
    neighbors get 0.
    """
    import pyarrow as pa
    import ray.data as rd

    def masked_init(csr):
        return np.asarray(value_init(csr), dtype=np.float64) * np.asarray(
            mask_init(csr), dtype=np.float64
        )

    def zero_teleport(csr):
        return np.zeros(len(csr["vids"]))

    s_num = run_supersteps(
        graph, ckpt_dir + "/num", "sum", masked_init,
        damping=1.0, tol=0.0, max_iters=1, teleport_fn=zero_teleport,
    )
    s_den = run_supersteps(
        graph, ckpt_dir + "/den", "sum", mask_init,
        damping=1.0, tol=0.0, max_iters=1, teleport_fn=zero_teleport,
    )
    # alignment is per-partition: read both checkpoint files per part
    refs = graph.refs

    def _ratio(batch: pa.Table) -> pa.Table:
        import ray

        from ..state.ckpt import read_state_part

        parts = batch.column("part").to_numpy(zero_copy_only=False)
        vid_out, val_out = [], []
        for p in parts:
            p = int(p)
            csr = ray.get(refs[p])
            nu = read_state_part(s_num["final_iter_dir"], p)
            de = read_state_part(s_den["final_iter_dir"], p)
            out = np.divide(nu, de, out=np.zeros_like(nu), where=de > 0)
            vid_out.append(csr["vids"])
            val_out.append(out)
        return pa.table(
            {
                "vid": pa.array(np.concatenate(vid_out), type=pa.uint64()),
                "value": pa.array(np.concatenate(val_out)),
            }
        )

    parts_ds = parts_dataset(graph.parts)
    return parts_ds.map_batches(_ratio, batch_format="pyarrow", batch_size=4)
