"""Per-vertex triangle counting — degree-oriented wedge join.

Reference semantics: the A² common-neighbor term of
``interconnected_kernel`` (/root/reference/src/ega/algorithms/
graph_kernels.py:109-112); per-vertex count = ((A@A)*A).sum(axis=1)/2
(the dense oracle in oracles/numpy_graph.py). The reference's
triangle *structure* machinery (``Triangulator``,
/root/reference/src/planar_separators/lipton_tarjan/triangulator.py:7-162)
is planar-specific; the engine uses the standard distributed
edge-orientation algorithm instead:

1. orient each undirected edge low→high by the total order
   ``(deg, vid)`` — bounds every oriented out-degree by O(√E), which
   bounds wedge blow-up Σ C(outdeg⁺,2) (the SURVEY §7 "hard part");
2. generate wedges (a, b, u) from each vertex u's oriented neighbor
   list (a before b in (deg,vid) order);
3. closure-check wedge (a,b) against the oriented edge set of a's
   partition — a *no-shuffle* ``map_batches`` lookup against the
   pinned shard index (exact pair membership via structured-array
   searchsorted, no hashing → no collision risk);
4. every closed wedge is one triangle (u,a,b): count 1 for each
   corner; partial-aggregate per batch, then one ``groupby(vid)`` sum.

Shuffle inventory: attach-deg exchange (key part(v)), oriented CSR
pack (key part(a)), final count groupby (key vid) — wedges themselves
never shuffle.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray
import ray.data as rd

from ..state.graph import ShardedGraph
from ..util import group_reduce, pair_struct, pairs_in_sorted

_WEDGE_CHUNK = 2_000_000  # max wedges emitted per yielded batch


def _emit_edges_with_src_deg(graph: ShardedGraph):
    """Shard → edge rows (part(v), u, v, deg_u) for the deg-attach join."""
    refs = graph.refs
    P = graph.num_partitions

    def _fn(batch: pa.Table):
        parts = batch.column("part").to_numpy(zero_copy_only=False)
        for p in parts:
            csr = ray.get(refs[int(p)])
            deg = csr["deg"]
            u = np.repeat(csr["vids"], deg)
            du = np.repeat(deg.astype(np.int64), deg)
            v = csr["indices"]
            yield pa.table(
                {
                    "part": pa.array((v % np.uint64(P)).astype(np.int64), type=pa.int64()),
                    "u": pa.array(u, type=pa.uint64()),
                    "v": pa.array(v, type=pa.uint64()),
                    "deg_u": pa.array(du, type=pa.int64()),
                }
            )

    return _fn


def _orient(graph: ShardedGraph):
    """Grouped by part(v): attach deg_v locally, keep (deg_u,u)<(deg_v,v)."""
    refs = graph.refs
    P = graph.num_partitions

    def _fn(group: pa.Table) -> pa.Table:
        p = int(group.column("part")[0].as_py())
        csr = ray.get(refs[p])
        u = group.column("u").to_numpy(zero_copy_only=False).astype(np.uint64, copy=False)
        v = group.column("v").to_numpy(zero_copy_only=False).astype(np.uint64, copy=False)
        du = group.column("deg_u").to_numpy(zero_copy_only=False)
        pos = np.searchsorted(csr["vids"], v)
        dv = csr["deg"][pos].astype(np.int64)
        keep = (du < dv) | ((du == dv) & (u < v))
        a, b, da, db = u[keep], v[keep], du[keep], dv[keep]
        return pa.table(
            {
                "part": pa.array((a % np.uint64(P)).astype(np.int64), type=pa.int64()),
                "a": pa.array(a, type=pa.uint64()),
                "b": pa.array(b, type=pa.uint64()),
                "deg_b": pa.array(db, type=pa.int64()),
            }
        )

    return _fn


def _pack_oriented(group: pa.Table) -> pa.Table:
    """Grouped by part(a): oriented CSR + sorted pair set, as one Arrow row."""
    from ..util import list_array

    p = int(group.column("part")[0].as_py())
    a = group.column("a").to_numpy(zero_copy_only=False).astype(np.uint64, copy=False)
    b = group.column("b").to_numpy(zero_copy_only=False).astype(np.uint64, copy=False)
    db = group.column("deg_b").to_numpy(zero_copy_only=False).astype(np.int64, copy=False)
    order = np.lexsort((b, a))
    a, b, db = a[order], b[order], db[order]
    vids = np.unique(a)
    counts = np.bincount(np.searchsorted(vids, a), minlength=len(vids))
    indptr = np.zeros(len(vids) + 1, dtype=np.int64)
    np.cumsum(counts, out=indptr[1:])
    return pa.table(
        {
            "part": pa.array([p], type=pa.int64()),
            "vids": list_array([vids], np.uint64, pa.uint64()),
            "indptr": list_array([indptr], np.int64, pa.int64()),
            "indices": list_array([b], np.uint64, pa.uint64()),
            "ideg": list_array([db], np.int64, pa.int64()),
        }
    )


def _build_oriented_index(oriented_ds) -> dict[int, "ray.ObjectRef"]:
    from ..util import list_rows

    refs: dict[int, ray.ObjectRef] = {}
    for block in oriented_ds.iter_batches(batch_size=None, batch_format="pyarrow"):
        for i in range(block.num_rows):
            row = block.slice(i, 1)
            vids = list_rows(row, "vids")[0]
            indptr = list_rows(row, "indptr")[0]
            indices = list_rows(row, "indices")[0]
            ideg = list_rows(row, "ideg")[0]
            pairs = pair_struct(np.repeat(vids, np.diff(indptr)), indices)
            refs[int(block.column("part")[i].as_py())] = ray.put(
                {
                    "vids": vids,
                    "indptr": indptr,
                    "indices": indices,
                    "ideg": ideg,
                    "pairs": np.sort(pairs),
                }
            )
    return refs


def _wedges(oriented_refs: dict, P: int):
    """Oriented shard → wedge rows (part(a), a, b, u), chunked generator."""

    def _fn(batch: pa.Table):
        parts = batch.column("part").to_numpy(zero_copy_only=False)
        buf_a, buf_b, buf_u, buffered = [], [], [], 0
        for p in parts:
            sh = ray.get(oriented_refs[int(p)])
            vids, indptr, nbrs, nd = sh["vids"], sh["indptr"], sh["indices"], sh["ideg"]
            for j in range(len(vids)):
                lo, hi = indptr[j], indptr[j + 1]
                k = hi - lo
                if k < 2:
                    continue
                seg_n, seg_d = nbrs[lo:hi], nd[lo:hi]
                order = np.lexsort((seg_n, seg_d))  # (deg, vid) ascending
                seg = seg_n[order]
                ia, ib = np.triu_indices(k, 1)
                buf_a.append(seg[ia])
                buf_b.append(seg[ib])
                buf_u.append(np.full(len(ia), vids[j], dtype=np.uint64))
                buffered += len(ia)
                if buffered >= _WEDGE_CHUNK:
                    yield _wedge_table(buf_a, buf_b, buf_u, P)
                    buf_a, buf_b, buf_u, buffered = [], [], [], 0
        if buffered:
            yield _wedge_table(buf_a, buf_b, buf_u, P)

    return _fn


def _wedge_table(buf_a, buf_b, buf_u, P) -> pa.Table:
    a = np.concatenate(buf_a)
    b = np.concatenate(buf_b)
    u = np.concatenate(buf_u)
    return pa.table(
        {
            "part": pa.array((a % np.uint64(P)).astype(np.int64), type=pa.int64()),
            "a": pa.array(a, type=pa.uint64()),
            "b": pa.array(b, type=pa.uint64()),
            "u": pa.array(u, type=pa.uint64()),
        }
    )


def _closure_counts(oriented_refs: dict):
    """Wedge batch → per-vertex partial triangle counts (no shuffle)."""

    def _fn(batch: pa.Table) -> pa.Table:
        parts = batch.column("part").to_numpy(zero_copy_only=False)
        a = batch.column("a").to_numpy(zero_copy_only=False).astype(np.uint64, copy=False)
        b = batch.column("b").to_numpy(zero_copy_only=False).astype(np.uint64, copy=False)
        u = batch.column("u").to_numpy(zero_copy_only=False).astype(np.uint64, copy=False)
        hit = np.zeros(len(a), dtype=bool)
        for p in np.unique(parts):
            sel = parts == p
            sh = ray.get(oriented_refs[int(p)])
            hit[sel] = pairs_in_sorted(a[sel], b[sel], sh["pairs"])
        corners = np.concatenate([a[hit], b[hit], u[hit]])
        uk, cnt = group_reduce(corners, np.ones(len(corners), dtype=np.int64), "sum")
        return pa.table(
            {
                "vid": pa.array(uk, type=pa.uint64()),
                "tri": pa.array(cnt, type=pa.int64()),
            }
        )

    return _fn


def triangle_count(graph: ShardedGraph):
    """Undirected ShardedGraph → Dataset (vid, triangles), zeros included."""
    assert not graph.directed, "triangle counting requires an undirected graph"
    P = graph.num_partitions
    parts_ds = rd.from_arrow(pa.table({"part": pa.array(graph.parts, type=pa.int64())}))

    edge_rows = parts_ds.map_batches(
        _emit_edges_with_src_deg(graph), batch_format="pyarrow", batch_size=1
    )
    oriented_rows = edge_rows.groupby("part").map_groups(_orient(graph), batch_format="pyarrow")
    oriented_ds = oriented_rows.groupby("part").map_groups(_pack_oriented, batch_format="pyarrow")
    oriented_refs = _build_oriented_index(oriented_ds)

    o_parts_ds = rd.from_arrow(
        pa.table({"part": pa.array(sorted(oriented_refs), type=pa.int64())})
    )
    wedges = o_parts_ds.map_batches(_wedges(oriented_refs, P), batch_format="pyarrow", batch_size=1)
    partials = wedges.map_batches(_closure_counts(oriented_refs), batch_format="pyarrow")

    zeros = graph.vertex_dataset().map_batches(
        lambda t: pa.table(
            {
                "vid": t.column("vid"),
                "tri": pa.array(np.zeros(t.num_rows, dtype=np.int64), type=pa.int64()),
            }
        ),
        batch_format="pyarrow",
    )
    from ray.data.aggregate import Sum

    out = partials.union(zeros).groupby("vid").aggregate(Sum("tri", alias_name="triangles"))
    return out


def total_triangles(tri_ds) -> int:
    """Global triangle count = Σ per-vertex / 3."""
    s = tri_ds.sum("triangles")
    return int(s // 3)
