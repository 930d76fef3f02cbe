"""k-truss peeling over an edge Dataset: fixed-round distributed
support computation + filter.

The k-truss of a graph is the maximal subgraph where every edge lies in
at least k-2 triangles. The reference's triangle machinery
(/root/reference/src/ega/algorithms/graph_kernels.py:109-112, the A²∘A
term) counts triangles per vertex; a truss needs them per EDGE, on a
shrinking edge set — so this operator works on the edge *Dataset*
directly instead of a packed CSR (the edge set changes every round;
re-packing CSR shards per round would pay the full build shuffle each
time for no reuse).

Round structure (three exchanges per round, all hash-partitioned —
no stage ever sees more than its partition):

1. ``groupby(u % P)`` — per task, each center vertex ``a``'s sorted
   higher-neighbor row N⁺(a) yields wedge rows (b, c | center a) via
   one ``triu_indices`` pass (orientation by vertex id: triangle
   a<b<c is generated exactly once, at its minimum vertex). Edge
   marker rows (u, v | center −1) ride along.
2. ``groupby(hash(b,c) % P)`` co-locates each wedge with the (b,c)
   edge marker — a wedge whose (b,c) is present is a triangle
   (a,b,c), closing the three edges (a,b), (a,c), (b,c). Each task
   pre-aggregates its support increments per edge (lexsort+reduceat)
   so the third exchange carries one row per distinct edge per task.
3. ``groupby(hash(u,v) % P)`` sums increments (markers keep
   zero-support edges alive in the output), and edges with
   support < k−2 are dropped.

The round count is FIXED (not run-to-fixpoint) so the result is
exactly reproducible by the unrolled SQL oracle; true trusses converge
in few rounds on web-ish graphs, and each round is a full
correctness check of the support computation anyway.

Scale note: wedge work is Σ |N⁺(u)|² — the same bound as the triangle
pipeline *without* the degree-orientation trick; ``max_center_width``
caps pathological hub rows (off by default so the oracle check stays
exact). All exchanges are pre-aggregated per task before shuffling.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

_I64 = pa.int64()
_MASK = np.uint64(0xFFFFFFFFFFFFFFFF)


def _mix(u: np.ndarray, v: np.ndarray) -> np.ndarray:
    """splitmix64-style pair hash → uint64 (stable partitioner)."""
    x = (u.astype(np.uint64) * np.uint64(0x9E3779B97F4A7C15) + v.astype(np.uint64)) & _MASK
    x = ((x ^ (x >> np.uint64(30))) * np.uint64(0xBF58476D1CE4E5B9)) & _MASK
    x = ((x ^ (x >> np.uint64(27))) * np.uint64(0x94D049BB133111EB)) & _MASK
    return x ^ (x >> np.uint64(31))


def _pair_agg(u: np.ndarray, v: np.ndarray, c: np.ndarray):
    """Sum c over distinct (u, v); returns (u, v, c) deduped."""
    if len(u) == 0:
        return u, v, np.zeros(0, dtype=np.int64)
    order = np.lexsort((v, u))
    u, v, c = u[order], v[order], c[order]
    first = np.concatenate(([True], (u[1:] != u[:-1]) | (v[1:] != v[:-1])))
    gid = np.cumsum(first) - 1
    return u[first], v[first], np.bincount(gid, weights=c).astype(np.int64)


def _edge_table(u, v, c, parts: int) -> pa.Table:
    return pa.table(
        {
            "u": pa.array(u.astype(np.int64), type=_I64),
            "v": pa.array(v.astype(np.int64), type=_I64),
            "c": pa.array(c.astype(np.int64), type=_I64),
            "part": pa.array(
                (_mix(u.astype(np.uint64), v.astype(np.uint64)) % np.uint64(parts)).astype(
                    np.int64
                )
            ),
        }
    )


def k_truss(
    edges,
    k: int = 4,
    rounds: int = 2,
    num_partitions: int = 16,
    max_center_width: int | None = None,
):
    """``rounds`` peel iterations of k-truss over ``edges``.

    ``edges``: Dataset with int-like columns (src, dst) — duplicates
    fine, both orientations fine; canonicalized + deduped here.
    Returns a Dataset (u, v, support): the edges surviving all rounds
    with the support computed on the LAST round's edge set.
    """
    import ray.data as rd  # noqa: F401  (Dataset ops on the argument)

    P = num_partitions
    min_sup = k - 2

    def _canon(batch: pa.Table) -> pa.Table:
        s = batch.column("src").to_numpy(zero_copy_only=False).astype(np.uint64)
        d = batch.column("dst").to_numpy(zero_copy_only=False).astype(np.uint64)
        u, v = np.minimum(s, d), np.maximum(s, d)
        keep = u != v
        u, v = u[keep], v[keep]
        u, v, _ = _pair_agg(u, v, np.ones(len(u)))
        return _edge_table(u, v, np.zeros(len(u), np.int64), P)

    def _dedup(group: pa.Table) -> pa.Table:
        u = group.column("u").to_numpy(zero_copy_only=False).astype(np.uint64)
        v = group.column("v").to_numpy(zero_copy_only=False).astype(np.uint64)
        u, v, _ = _pair_agg(u, v, np.ones(len(u)))
        return _edge_table(u, v, np.zeros(len(u), np.int64), P)

    # distinct canonical edges, hash-partitioned by pair
    cur = (
        edges.map_batches(_canon, batch_format="pyarrow")
        .groupby("part")
        .map_groups(_dedup, batch_format="pyarrow")
    )

    def _upart(batch: pa.Table) -> pa.Table:
        u = batch.column("u").to_numpy(zero_copy_only=False).astype(np.uint64)
        return batch.set_column(
            batch.schema.get_field_index("part"),
            "part",
            pa.array((u % np.uint64(P)).astype(np.int64)),
        )

    def _wedges(group: pa.Table) -> pa.Table:
        u = group.column("u").to_numpy(zero_copy_only=False).astype(np.uint64)
        v = group.column("v").to_numpy(zero_copy_only=False).astype(np.uint64)
        order = np.lexsort((v, u))
        u, v = u[order], v[order]
        starts = np.flatnonzero(np.concatenate(([True], u[1:] != u[:-1])))
        counts = np.diff(np.append(starts, len(u)))
        w1, w2, ctr = [u], [v], [np.full(len(u), -1, dtype=np.int64)]  # markers
        for d in np.unique(counts):
            if d < 2 or (max_center_width is not None and d > max_center_width):
                continue
            sel = starts[counts == d]
            mat = v[sel[:, None] + np.arange(int(d))[None, :]]  # [m, d] sorted rows
            ia, ib = np.triu_indices(int(d), 1)
            w1.append(mat[:, ia].ravel())
            w2.append(mat[:, ib].ravel())
            ctr.append(np.repeat(u[sel].astype(np.int64), len(ia)))
        w1c = np.concatenate(w1)
        w2c = np.concatenate(w2)
        return pa.table(
            {
                "u": pa.array(w1c.astype(np.int64), type=_I64),
                "v": pa.array(w2c.astype(np.int64), type=_I64),
                "c": pa.array(np.concatenate(ctr), type=_I64),
                "part": pa.array(
                    (_mix(w1c.astype(np.uint64), w2c.astype(np.uint64)) % np.uint64(P)).astype(
                        np.int64
                    )
                ),
            }
        )

    def _close(group: pa.Table) -> pa.Table:
        """Wedge×edge closure → pre-aggregated support increments."""
        b = group.column("u").to_numpy(zero_copy_only=False).astype(np.uint64)
        c = group.column("v").to_numpy(zero_copy_only=False).astype(np.uint64)
        a = group.column("c").to_numpy(zero_copy_only=False)
        is_edge = a < 0
        order = np.lexsort((c, b))
        b, c, a, is_edge = b[order], c[order], a[order], is_edge[order]
        first = np.concatenate(([True], (b[1:] != b[:-1]) | (c[1:] != c[:-1])))
        gid = np.cumsum(first) - 1
        closed = np.bincount(gid, weights=is_edge) > 0  # (b,c) is an edge
        tri = closed[gid] & ~is_edge  # triangle rows (a, b, c)
        ta = a[tri].astype(np.uint64)
        tb, tc = b[tri], c[tri]
        # increments for all three edges + zero-rows for markers
        iu = np.concatenate([ta, ta, tb, b[is_edge]])
        iv = np.concatenate([tb, tc, tc, c[is_edge]])
        ic = np.concatenate(
            [np.ones(3 * len(ta)), np.zeros(int(is_edge.sum()))]
        )
        iu, iv, ic = _pair_agg(iu, iv, ic)
        return _edge_table(iu, iv, ic, P)

    def _sum_filter(group: pa.Table) -> pa.Table:
        u = group.column("u").to_numpy(zero_copy_only=False).astype(np.uint64)
        v = group.column("v").to_numpy(zero_copy_only=False).astype(np.uint64)
        c = group.column("c").to_numpy(zero_copy_only=False).astype(np.float64)
        # markers carry c=0; increment rows only exist for real edges
        # (wedge legs + closed pair are all edges by construction)
        u, v, s = _pair_agg(u, v, c)
        keep = s >= min_sup
        return _edge_table(u[keep], v[keep], s[keep], P)

    for _ in range(rounds):
        wedges = (
            cur.map_batches(_upart, batch_format="pyarrow")
            .groupby("part")
            .map_groups(_wedges, batch_format="pyarrow")
        )
        cur = (
            wedges.groupby("part")
            .map_groups(_close, batch_format="pyarrow")
            .groupby("part")
            .map_groups(_sum_filter, batch_format="pyarrow")
        )

    def _out(batch: pa.Table) -> pa.Table:
        return pa.table(
            {
                "u": batch.column("u"),
                "v": batch.column("v"),
                "support": batch.column("c"),
            }
        )

    return cur.map_batches(_out, batch_format="pyarrow")
