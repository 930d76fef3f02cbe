"""Bipartite butterfly (4-cycle) counting.

A butterfly is the bipartite clique K2,2 — two left vertices sharing
two right vertices; it is the bipartite analogue of the triangle and
the standard cohesion motif for part–supplier / user–item / doc–term
tables (the reference's ``interconnected_kernel`` A² term counts the
one-mode wedge overlaps this builds on:
/root/reference/src/ega/algorithms/graph_kernels.py:109-112).

Plan (two exchanges, both pre-aggregated per task):
1. ``groupby(right % P)`` — per right vertex r, its sorted distinct
   left neighbors yield wedge rows (l1 < l2) via one ``triu_indices``
   pass; each task pre-sums wedges per (l1, l2) before the shuffle.
2. ``groupby(hash(l1,l2) % P)`` — sum wedge multiplicities c per left
   pair; the pair hosts C(c, 2) butterflies, credited to both left
   endpoints; per-task partial sums per left vertex ride a tiny final
   ``groupby(left)`` Sum.

Scale note: wedge work is Σ_r C(deg(r), 2) — hub right vertices
dominate; ``max_right_degree`` caps them for the approximate regime
(default None keeps the count exact for the oracle check). The final
output is one row per left vertex, never per pair.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from .truss import _mix, _pair_agg

_I64 = pa.int64()


def butterfly_counts(
    edges,
    num_partitions: int = 16,
    max_right_degree: int | None = None,
):
    """Per-left-vertex butterfly counts over a bipartite edge Dataset.

    ``edges``: Dataset with int columns (left, right); duplicates are
    deduped here. Returns a Dataset (left, butterflies), butterflies>0.
    """
    from ray.data.aggregate import Sum

    P = num_partitions

    def _tag(batch: pa.Table) -> pa.Table:
        left = batch.column("left").to_numpy(zero_copy_only=False).astype(np.int64)
        right = batch.column("right").to_numpy(zero_copy_only=False).astype(np.int64)
        return pa.table(
            {
                "left": pa.array(left, type=_I64),
                "right": pa.array(right, type=_I64),
                "part": pa.array(
                    (right.astype(np.uint64) % np.uint64(P)).astype(np.int64)
                ),
            }
        )

    def _wedges(group: pa.Table) -> pa.Table:
        left = group.column("left").to_numpy(zero_copy_only=False).astype(np.uint64)
        right = group.column("right").to_numpy(zero_copy_only=False).astype(np.uint64)
        order = np.lexsort((left, right))
        left, right = left[order], right[order]
        keep = np.concatenate(
            ([True], (right[1:] != right[:-1]) | (left[1:] != left[:-1]))
        )
        left, right = left[keep], right[keep]  # distinct (right, left)
        starts = np.flatnonzero(np.concatenate(([True], right[1:] != right[:-1])))
        counts = np.diff(np.append(starts, len(right)))
        l1, l2 = [], []
        for d in np.unique(counts):
            if d < 2 or (max_right_degree is not None and d > max_right_degree):
                continue
            sel = starts[counts == d]
            mat = left[sel[:, None] + np.arange(int(d))[None, :]]  # sorted rows
            ia, ib = np.triu_indices(int(d), 1)
            l1.append(mat[:, ia].ravel())
            l2.append(mat[:, ib].ravel())
        if not l1:
            return pa.table(
                {
                    "l1": pa.array([], type=_I64),
                    "l2": pa.array([], type=_I64),
                    "c": pa.array([], type=_I64),
                    "part": pa.array([], type=_I64),
                }
            )
        u = np.concatenate(l1)
        v = np.concatenate(l2)
        u, v, c = _pair_agg(u, v, np.ones(len(u)))
        return pa.table(
            {
                "l1": pa.array(u.astype(np.int64), type=_I64),
                "l2": pa.array(v.astype(np.int64), type=_I64),
                "c": pa.array(c, type=_I64),
                "part": pa.array(
                    (_mix(u, v) % np.uint64(P)).astype(np.int64)
                ),
            }
        )

    def _pair_butterflies(group: pa.Table) -> pa.Table:
        u = group.column("l1").to_numpy(zero_copy_only=False).astype(np.uint64)
        v = group.column("l2").to_numpy(zero_copy_only=False).astype(np.uint64)
        c = group.column("c").to_numpy(zero_copy_only=False).astype(np.float64)
        u, v, cs = _pair_agg(u, v, c)
        bf = (cs * (cs - 1)) // 2
        sel = bf > 0
        u, v, bf = u[sel], v[sel], bf[sel]
        # credit both left endpoints, partial-sum per vertex in-task
        vid = np.concatenate([u, v]).astype(np.int64)
        w = np.concatenate([bf, bf]).astype(np.int64)
        if len(vid) == 0:
            return pa.table(
                {
                    "left": pa.array([], type=_I64),
                    "butterflies": pa.array([], type=_I64),
                }
            )
        order = np.argsort(vid, kind="stable")
        vid, w = vid[order], w[order]
        first = np.concatenate(([True], vid[1:] != vid[:-1]))
        gid = np.cumsum(first) - 1
        return pa.table(
            {
                "left": pa.array(vid[first], type=_I64),
                "butterflies": pa.array(
                    np.bincount(gid, weights=w).astype(np.int64), type=_I64
                ),
            }
        )

    out = (
        edges.map_batches(_tag, batch_format="pyarrow")
        .groupby("part")
        .map_groups(_wedges, batch_format="pyarrow")
        .groupby("part")
        .map_groups(_pair_butterflies, batch_format="pyarrow")
        .groupby("left")
        .aggregate(Sum("butterflies", alias_name="butterflies"))
    )
    return out


def frustrated_edges(forest_out, edges, *, num_partitions: int = 16):
    """Bipartiteness diagnostic: edges whose endpoints sit at EQUAL BFS
    distance from the seed — each is a witness of an odd cycle (on an
    unweighted graph adjacent distances differ by at most 1, and a
    difference of 0 closes an odd walk). Returns (dist, n_frustrated)
    per BFS level with at least one witness.

    Plan: two union-tag co-shuffles attach dist(u) then dist(v) to each
    edge (distance rows ride the same hash partitions — the dist table
    is never broadcast), then a per-level count pre-aggregation.
    ``forest_out``: (vid, dist_q, reached) Dataset;
    ``edges``: (src, dst) Dataset (any orientation, dupes fine).
    """
    from ray.data.aggregate import Sum

    P = num_partitions
    _i64 = pa.int64()

    def _rows(part, a, b, c):
        return pa.table(
            {
                "part": pa.array(np.asarray(part, dtype=np.int64), type=_i64),
                "a": pa.array(np.asarray(a, dtype=np.int64), type=_i64),
                "b": pa.array(np.asarray(b, dtype=np.int64), type=_i64),
                "c": pa.array(np.asarray(c, dtype=np.int64), type=_i64),
            }
        )

    def _edge_rows(batch: pa.Table) -> pa.Table:
        s = batch.column("src").to_numpy(zero_copy_only=False).astype(np.uint64)
        d = batch.column("dst").to_numpy(zero_copy_only=False).astype(np.uint64)
        u, v = np.minimum(s, d), np.maximum(s, d)
        keep = u != v
        u, v = u[keep], v[keep]
        # dedup map-side; exact dedup happens implicitly in the attach
        # groups (duplicates count once via the pair-dedup below)
        order = np.lexsort((v, u))
        u, v = u[order], v[order]
        first = np.concatenate(([True], (u[1:] != u[:-1]) | (v[1:] != v[:-1])))
        u, v = u[first], v[first]
        return _rows((u % np.uint64(P)).astype(np.int64), u, v, np.full(len(u), -1))

    def _dist_rows(batch: pa.Table) -> pa.Table:
        vid = batch.column("vid").to_numpy(zero_copy_only=False).astype(np.uint64)
        dq = batch.column("dist_q").to_numpy(zero_copy_only=False)
        reached = batch.column("reached").to_numpy(zero_copy_only=False)
        vid, dq = vid[reached], dq[reached]
        return _rows(
            (vid % np.uint64(P)).astype(np.int64), vid, np.full(len(vid), -1), dq
        )

    def _attach(key_col_a: bool):
        def _fn(group: pa.Table) -> pa.Table:
            a = group.column("a").to_numpy(zero_copy_only=False)
            b = group.column("b").to_numpy(zero_copy_only=False)
            c = group.column("c").to_numpy(zero_copy_only=False)
            is_d = b == -1
            dk = a[is_d]
            dv = c[is_d]
            order = np.argsort(dk)
            dk, dv = dk[order], dv[order]
            eu, ev, ec = a[~is_d], b[~is_d], c[~is_d]
            if key_col_a and len(eu):
                # exact (u, v) dedup — every copy of an edge shares the
                # u key, so this group sees them all
                eorder = np.lexsort((ev, eu))
                eu, ev, ec = eu[eorder], ev[eorder], ec[eorder]
                efirst = np.concatenate(
                    ([True], (eu[1:] != eu[:-1]) | (ev[1:] != ev[:-1]))
                )
                eu, ev, ec = eu[efirst], ev[efirst], ec[efirst]
            pos = np.searchsorted(dk, eu)
            ok = (pos < len(dk)) & (dk[np.minimum(pos, len(dk) - 1)] == eu)
            eu, ev, ec, pos = eu[ok], ev[ok], ec[ok], pos[ok]
            got = dv[pos]
            if key_col_a:
                # first attach: dist(u) into c, re-key by v (swap a/b)
                return _rows(
                    (ev.astype(np.uint64) % np.uint64(P)).astype(np.int64),
                    ev,
                    eu,
                    got,
                )
            # second attach: compare dist(v) == carried dist(u)
            eq = got == ec
            lv = ec[eq]
            if not len(lv):
                return pa.table(
                    {
                        "dist": pa.array([], type=_i64),
                        "n": pa.array([], type=_i64),
                    }
                )
            d_u, cnt = np.unique(lv, return_counts=True)
            return pa.table(
                {
                    "dist": pa.array(d_u.astype(np.int64), type=_i64),
                    "n": pa.array(cnt.astype(np.int64), type=_i64),
                }
            )

        return _fn

    dist_ds = forest_out.map_batches(_dist_rows, batch_format="pyarrow")
    e_ds = edges.map_batches(_edge_rows, batch_format="pyarrow")
    first = e_ds.union(dist_ds).groupby("part").map_groups(
        _attach(True), batch_format="pyarrow"
    )
    second = first.union(dist_ds).groupby("part").map_groups(
        _attach(False), batch_format="pyarrow"
    )
    return second.groupby("dist").aggregate(Sum("n", alias_name="n_frustrated"))
