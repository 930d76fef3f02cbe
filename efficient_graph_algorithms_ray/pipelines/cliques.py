"""Per-vertex 4-clique counting — two-level oriented closure.

Extends the triangle pipeline (pipelines/triangles.py) one motif up,
with the same scale discipline. Reference semantics: higher-order
common-neighbor statistics in the ``interconnected_kernel`` family
(/root/reference/src/ega/algorithms/graph_kernels.py:107-121); the
reference has no clique machinery — this is the engine's motif-counting
surface, built on the standard kClist-style degree orientation
(Danisch–Balalau–Sozio, WWW'18, public algorithm).

Counting scheme (each 4-clique counted exactly once):

  orient edges low→high by (deg, vid). For the oriented triangle
  (u, a, b) with u the apex (lowest) and a the mid vertex, the set
  S_ua = {b : (u,a,b) closed} is the common oriented-out-neighborhood
  of the base pair (u, a). A 4-clique {p1<p2<p3<p4} is exactly one
  base pair (p1, p2) plus one *edge* (p3, p4) inside S_{p1,p2}.

Pipeline stages:

1. orientation + wedge + closure — identical machinery to triangles
   (map-side orientation off the broadcast degree index, compressed
   wedge rows, partition-local closure). The closure task here emits
   the *triangle list grouped by base pair* instead of corner counts:
   all wedges (u; a, ·) share the wedge home part(a), so each task
   sees every triangle of its base pairs — S_ua is complete in-task.
2. candidate generation: for each S_ua and each member c, one
   compressed row (part(c), u, a, c, ds = S_ua \\ {c}). Every
   unordered pair {x, y} ⊂ S_ua is queried at BOTH part(x) and
   part(y) because the oriented edge between them is stored at
   whichever endpoint is lower in (deg, vid) — unknown without a
   degree lookup; the dual routing trades a 2× candidate exchange
   for zero extra degree traffic. Exactly one of the two probes can
   hit (the edge is stored once), so no 4-clique double-counts.
3. pair check: one ``groupby(part)`` co-locates each partition's
   oriented CSR row with the candidates keyed to it; the task builds
   the sorted (src, dst) pair index for its ONE partition (exact
   membership via structured-array searchsorted) and credits the four
   corners (u, a, c, d) of every confirmed clique — partial counts
   leave as per-home-partition list rows.
4. final P-group merge onto the full vertex set (zeros included).

Shuffle inventory: three — the wedge exchange, the candidate exchange
(volume 2·Σ C(|S_ua|, 2), the honest cost of 4-clique counting; the
orientation bounds |S_ua| ≤ min outdeg⁺ = O(√E)), and the P-group
count merge. Edges never shuffle; no driver pass over the graph.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray
import ray.data as rd

from ..state.graph import ShardedGraph
from ..util import group_reduce, list_array, list_rows, pair_struct, pairs_in_sorted, parts_dataset
from .triangles import (
    _degree_index,
    _orient_local,
    _pad_oriented,
    _wedges_from_rows,
)

_CAND_CHUNK = 2_000_000  # max candidate list items per yielded batch


def _cand_schema() -> pa.Schema:
    """Superset schema for the candidate/oriented co-shuffle (stage 3):
    candidate rows null the CSR list columns, oriented rows null
    u/a/c/ds — same two-kind union trick as the triangle closure."""
    return pa.schema(
        [
            ("part", pa.int64()),
            ("u", pa.uint64()),
            ("a", pa.uint64()),
            ("c", pa.uint64()),
            ("ds", pa.list_(pa.uint64())),
            ("vids", pa.list_(pa.uint64())),
            ("indptr", pa.list_(pa.int64())),
            ("indices", pa.list_(pa.uint64())),
        ]
    )


def _cand_table(rows_u, rows_a, rows_c, rows_ds, P) -> pa.Table:
    c = np.asarray(rows_c, dtype=np.uint64)
    n = len(c)
    return pa.table(
        {
            "part": pa.array((c % np.uint64(P)).astype(np.int64), type=pa.int64()),
            "u": pa.array(np.asarray(rows_u, dtype=np.uint64), type=pa.uint64()),
            "a": pa.array(np.asarray(rows_a, dtype=np.uint64), type=pa.uint64()),
            "c": pa.array(c, type=pa.uint64()),
            "ds": list_array(rows_ds, np.uint64, pa.uint64()),
            "vids": pa.nulls(n, type=pa.list_(pa.uint64())),
            "indptr": pa.nulls(n, type=pa.list_(pa.int64())),
            "indices": pa.nulls(n, type=pa.list_(pa.uint64())),
        },
        schema=_cand_schema(),
    )


def _tri_list_group(P: int):
    """Per-partition closure group → candidate rows for the 4th-vertex
    pair check. Identical to triangles._closure_group up to the hit
    mask, then groups hit triangles by base pair (u, a) and emits one
    compressed row per S_ua member."""

    def _fn(group: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        is_oriented = pc.is_valid(group.column("indptr")).to_numpy(zero_copy_only=False)
        o_rows = np.flatnonzero(is_oriented)
        w_rows = np.flatnonzero(~is_oriented)
        if len(o_rows) == 0 or len(w_rows) == 0:
            return _cand_table([], [], [], [], P)
        orow = group.slice(int(o_rows[0]), 1)
        vids_o = list_rows(orow, "vids")[0]
        indptr_o = list_rows(orow, "indptr")[0]
        indices_o = list_rows(orow, "indices")[0]
        pairs = np.sort(pair_struct(np.repeat(vids_o, np.diff(indptr_o)), indices_o))
        wed = group.take(pa.array(w_rows))
        a_row = wed.column("a").to_numpy(zero_copy_only=False).astype(np.uint64, copy=False)
        u_row = wed.column("u").to_numpy(zero_copy_only=False).astype(np.uint64, copy=False)
        bs_rows = list_rows(wed, "bs")
        lens = np.fromiter((len(r) for r in bs_rows), dtype=np.int64, count=len(bs_rows))
        a = np.repeat(a_row, lens)
        u = np.repeat(u_row, lens)
        b = (
            np.concatenate(bs_rows).astype(np.uint64, copy=False)
            if bs_rows
            else np.empty(0, np.uint64)
        )
        hit = pairs_in_sorted(a, b, pairs)
        u_h, a_h, b_h = u[hit], a[hit], b[hit]
        if not len(u_h):
            return _cand_table([], [], [], [], P)
        order = np.lexsort((b_h, a_h, u_h))
        u_s, a_s, b_s = u_h[order], a_h[order], b_h[order]
        starts = np.flatnonzero(
            np.concatenate(([True], (u_s[1:] != u_s[:-1]) | (a_s[1:] != a_s[:-1])))
        )
        ends = np.append(starts[1:], len(u_s))
        # map_groups requires one return table per group; peak memory is
        # this partition's candidate volume 2·Σ C(|S_ua|, 2) — the same
        # order as the task's own hit arrays (documented stage cost)
        chunks, rows_u, rows_a, rows_c, rows_ds, buffered = [], [], [], [], [], 0
        for lo, hi in zip(starts, ends):
            L = hi - lo
            if L < 2:
                continue
            cs = b_s[lo:hi]
            for j in range(L):
                rows_u.append(u_s[lo])
                rows_a.append(a_s[lo])
                rows_c.append(cs[j])
                rows_ds.append(np.delete(cs, j))
            buffered += L * (L - 1)
            if buffered >= _CAND_CHUNK:
                chunks.append(_cand_table(rows_u, rows_a, rows_c, rows_ds, P))
                rows_u, rows_a, rows_c, rows_ds, buffered = [], [], [], [], 0
        chunks.append(_cand_table(rows_u, rows_a, rows_c, rows_ds, P))
        return pa.concat_tables(chunks)

    return _fn


def _pair_check_group(P: int):
    """Per-partition group (oriented row + its candidate rows) →
    per-home-partition corner-count list rows."""

    def _fn(group: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        empty = pa.table(
            {
                "part": pa.array([], type=pa.int64()),
                "vids": list_array([], np.uint64, pa.uint64()),
                "cnt": list_array([], np.int64, pa.int64()),
            }
        )
        is_oriented = pc.is_valid(group.column("indptr")).to_numpy(zero_copy_only=False)
        o_rows = np.flatnonzero(is_oriented)
        c_rows = np.flatnonzero(~is_oriented)
        if len(o_rows) == 0 or len(c_rows) == 0:
            return empty
        orow = group.slice(int(o_rows[0]), 1)
        vids_o = list_rows(orow, "vids")[0]
        indptr_o = list_rows(orow, "indptr")[0]
        indices_o = list_rows(orow, "indices")[0]
        pairs = np.sort(pair_struct(np.repeat(vids_o, np.diff(indptr_o)), indices_o))
        cand = group.take(pa.array(c_rows))
        u_row = cand.column("u").to_numpy(zero_copy_only=False).astype(np.uint64, copy=False)
        a_row = cand.column("a").to_numpy(zero_copy_only=False).astype(np.uint64, copy=False)
        c_row = cand.column("c").to_numpy(zero_copy_only=False).astype(np.uint64, copy=False)
        ds_rows = list_rows(cand, "ds")
        lens = np.fromiter((len(r) for r in ds_rows), dtype=np.int64, count=len(ds_rows))
        u = np.repeat(u_row, lens)
        a = np.repeat(a_row, lens)
        c = np.repeat(c_row, lens)
        d = (
            np.concatenate(ds_rows).astype(np.uint64, copy=False)
            if ds_rows
            else np.empty(0, np.uint64)
        )
        hit = pairs_in_sorted(c, d, pairs)
        if not hit.any():
            return empty
        corners = np.concatenate([u[hit], a[hit], c[hit], d[hit]])
        uk, cnt = group_reduce(corners, np.ones(len(corners), dtype=np.int64), "sum")
        home = (uk % np.uint64(P)).astype(np.int64)
        order = np.argsort(home, kind="stable")
        home_s, uk_s, cnt_s = home[order], uk[order], cnt[order]
        bounds = np.flatnonzero(np.concatenate(([True], home_s[1:] != home_s[:-1])))
        ends = np.append(bounds[1:], len(home_s))
        out_p, out_v, out_c = [], [], []
        for lo, hi in zip(bounds, ends):
            out_p.append(int(home_s[lo]))
            out_v.append(uk_s[lo:hi])
            out_c.append(cnt_s[lo:hi])
        return pa.table(
            {
                "part": pa.array(out_p, type=pa.int64()),
                "vids": list_array(out_v, np.uint64, pa.uint64()),
                "cnt": list_array(out_c, np.int64, pa.int64()),
            }
        )

    return _fn


def _merge_clique_counts(graph: ShardedGraph):
    """Per home partition: merge corner-count partials onto the full
    vertex set (zeros included)."""

    def _fn(group: pa.Table) -> pa.Table:
        from ..util import flatten_list_column

        p = int(group.column("part")[0].as_py())
        csr = ray.get(graph.refs[p])
        vids = csr["vids"]
        acc = np.zeros(len(vids), dtype=np.int64)
        dsts = flatten_list_column(group, "vids").astype(np.uint64, copy=False)
        cnts = flatten_list_column(group, "cnt")
        if len(dsts):
            idx = np.searchsorted(vids, dsts)
            acc = np.bincount(idx, weights=cnts, minlength=len(vids)).astype(np.int64)
        return pa.table(
            {
                "vid": pa.array(vids, type=pa.uint64()),
                "cliques4": pa.array(acc, type=pa.int64()),
            }
        )

    return _fn


def cliques4_count(graph: ShardedGraph):
    """Undirected ShardedGraph → Dataset (vid, cliques4): per-vertex
    count of 4-cliques the vertex participates in, zeros included."""
    assert not graph.directed, "4-clique counting requires an undirected graph"
    P = graph.num_partitions
    parts_ds = parts_dataset(graph.parts)

    deg_refs = _degree_index(graph)
    oriented_ds = parts_ds.map_batches(
        _orient_local(graph, deg_refs), batch_format="pyarrow", batch_size=1
    ).materialize()
    wedges = oriented_ds.map_batches(_wedges_from_rows(P), batch_format="pyarrow", batch_size=1)
    co = wedges.union(oriented_ds.map_batches(_pad_oriented, batch_format="pyarrow"))
    cands = co.groupby("part").map_groups(_tri_list_group(P), batch_format="pyarrow")

    co2 = cands.union(
        oriented_ds.map_batches(
            lambda b: _pad_oriented(b)
            .append_column("c", pa.nulls(b.num_rows, type=pa.uint64()))
            .append_column("ds", pa.nulls(b.num_rows, type=pa.list_(pa.uint64())))
            .select(["part", "u", "a", "c", "ds", "vids", "indptr", "indices"])
            .cast(_cand_schema()),
            batch_format="pyarrow",
        )
    )
    partials = co2.groupby("part").map_groups(_pair_check_group(P), batch_format="pyarrow")

    presence = rd.from_arrow(
        pa.table(
            {
                "part": pa.array(graph.parts, type=pa.int64()),
                "vids": list_array(
                    [np.empty(0, np.uint64)] * len(graph.parts), np.uint64, pa.uint64()
                ),
                "cnt": list_array(
                    [np.empty(0, np.int64)] * len(graph.parts), np.int64, pa.int64()
                ),
            }
        )
    )
    return (
        partials.union(presence)
        .groupby("part")
        .map_groups(_merge_clique_counts(graph), batch_format="pyarrow")
    )


def total_cliques4(cl_ds) -> int:
    """Global 4-clique count = Σ per-vertex / 4."""
    return int(cl_ds.sum("cliques4") // 4)
