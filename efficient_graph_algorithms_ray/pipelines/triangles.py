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
   bounds wedge blow-up Σ C(outdeg⁺,2) (the SURVEY §7 "hard part").
   Orientation is MAP-SIDE: a's shard already holds the edge
   (symmetrized build) and only needs neighbor *degrees*, served from
   a broadcast per-partition degree index (16 B/vertex);
2. generate wedges (a, b, u) from each vertex u's oriented neighbor
   list (a before b in (deg,vid) order), chunked generator;
3. closure-check wedge (a,b) against the oriented edge set of a's
   partition — PARTITION-LOCAL: one ``groupby(part)`` co-locates each
   partition's oriented CSR row with exactly the wedges keyed to it
   (wedge home = part(a)), and the group task builds the sorted pair
   index for that one partition in-task (exact pair membership via
   structured-array searchsorted, no hashing → no collision risk).
   No driver pass over the graph, no whole-graph broadcast: each task
   holds ONE partition's oriented edges, O(E/P) not O(E);
4. every closed wedge is one triangle (u,a,b): count 1 per corner;
   partial-aggregate per group into per-home-partition list rows, then
   ONE ``groupby(part)`` merge of P list-row groups.

Shuffle inventory: two — the wedge-to-owner exchange (the honest cost
of distributed closure checking; the round-1 alternative cached O(E)
oriented edges on every node) and the final P-group count merge.
Edges and orientation never shuffle.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray
import ray.data as rd

from ..state.graph import ShardedGraph
from ..util import group_reduce, pair_struct, pairs_in_sorted, parts_dataset

_WEDGE_CHUNK = 2_000_000  # max wedges emitted per yielded batch


@ray.remote
def _extract_degrees(csr: dict) -> dict:
    return {"vids": csr["vids"], "deg": csr["deg"].astype(np.int64)}


def _degree_index(graph: ShardedGraph) -> dict[int, "ray.ObjectRef"]:
    """Small per-partition degree lookup {part: {vids, deg}} — the only
    cross-partition data orientation needs (16 B/vertex, not the edges).

    Extracted by a remote task per shard: the full CSR is fetched
    node-locally by the task, and only the driver-owned ref to the
    small degree slice comes back — the driver never funnels shards."""
    return {p: _extract_degrees.remote(graph.refs[p]) for p in graph.parts}


def _orient_local(graph: ShardedGraph, deg_refs: dict):
    """Shard → oriented CSR row, map-side (NO shuffle).

    An oriented edge (a, b) with a = lower (deg, vid) endpoint lives
    in a's shard, and a's shard already holds the edge (symmetrized
    build) — so orientation only needs the *degree* of each neighbor,
    looked up in the broadcast degree index. Kept-edge order inherits
    the CSR's (row, sorted-indices) order = lexicographic (a, b).
    """
    refs = graph.refs
    P = graph.num_partitions

    def _fn(batch: pa.Table) -> pa.Table:
        from ..util import list_array

        out = []
        for p in batch.column("part").to_numpy(zero_copy_only=False):
            p = int(p)
            csr = ray.get(refs[p])
            vids, deg, v = csr["vids"], csr["deg"].astype(np.int64), csr["indices"]
            n = len(vids)
            u_row = np.repeat(np.arange(n, dtype=np.int64), deg)
            u = vids[u_row]
            du = deg[u_row]
            dv = np.empty(len(v), dtype=np.int64)
            vpart = (v % np.uint64(P)).astype(np.int64)
            for q in np.unique(vpart):
                sel = vpart == q
                dq = ray.get(deg_refs[int(q)])
                dv[sel] = dq["deg"][np.searchsorted(dq["vids"], v[sel])]
            keep = (du < dv) | ((du == dv) & (u < v))
            row_k, b_k, db_k = u_row[keep], v[keep], dv[keep]
            counts = np.bincount(row_k, minlength=n)
            indptr = np.zeros(n + 1, dtype=np.int64)
            np.cumsum(counts, out=indptr[1:])
            out.append(
                pa.table(
                    {
                        "part": pa.array([p], type=pa.int64()),
                        "vids": list_array([vids], np.uint64, pa.uint64()),
                        "indptr": list_array([indptr], np.int64, pa.int64()),
                        "indices": list_array([b_k], np.uint64, pa.uint64()),
                        "ideg": list_array([db_k], np.int64, pa.int64()),
                    }
                )
            )
        return pa.concat_tables(out)

    return _fn


# superset schema shared by wedge rows and padded oriented rows so the
# union can shuffle as one block stream (groupby needs a single schema);
# wedge rows null the CSR list columns, oriented rows null a/u/bs.
def _coshuffle_schema() -> pa.Schema:
    return pa.schema(
        [
            ("part", pa.int64()),
            ("a", pa.uint64()),
            ("u", pa.uint64()),
            ("bs", pa.list_(pa.uint64())),
            ("vids", pa.list_(pa.uint64())),
            ("indptr", pa.list_(pa.int64())),
            ("indices", pa.list_(pa.uint64())),
        ]
    )


def _wedges_from_rows(P: int):
    """Oriented CSR row → COMPRESSED wedge rows: one row per (u, a)
    carrying the b-suffix as a list — Σ outdeg rows instead of
    Σ C(outdeg, 2) pairs, ~3× less shuffle volume for the same wedges
    (a and u are not repeated per pair). Reads ONLY its own input row —
    no shard refs, no driver index."""
    from ..util import list_array, list_rows

    def _fn(batch: pa.Table):
        buf_a, buf_u, buf_bs, buffered = [], [], [], 0
        for i in range(batch.num_rows):
            row = batch.slice(i, 1)
            vids = list_rows(row, "vids")[0]
            indptr = list_rows(row, "indptr")[0]
            nbrs = list_rows(row, "indices")[0]
            nd = list_rows(row, "ideg")[0]
            for j in range(len(vids)):
                lo, hi = indptr[j], indptr[j + 1]
                k = hi - lo
                if k < 2:
                    continue
                seg_n, seg_d = nbrs[lo:hi], nd[lo:hi]
                order = np.lexsort((seg_n, seg_d))  # (deg, vid) ascending
                seg = seg_n[order]
                buf_a.append(seg[:-1])
                buf_u.append(np.full(k - 1, vids[j], dtype=np.uint64))
                buf_bs.extend(seg[t + 1 :] for t in range(k - 1))  # views, no copy
                buffered += (k * (k - 1)) // 2
                if buffered >= _WEDGE_CHUNK:
                    yield _wedge_table(buf_a, buf_u, buf_bs, P)
                    buf_a, buf_u, buf_bs, buffered = [], [], [], 0
        if buffered:
            yield _wedge_table(buf_a, buf_u, buf_bs, P)

    return _fn


def _wedge_table(buf_a, buf_u, buf_bs, P) -> pa.Table:
    from ..util import list_array

    a = np.concatenate(buf_a).astype(np.uint64, copy=False)
    u = np.concatenate(buf_u)
    n = len(a)
    return pa.table(
        {
            "part": pa.array((a % np.uint64(P)).astype(np.int64), type=pa.int64()),
            "a": pa.array(a, type=pa.uint64()),
            "u": pa.array(u, type=pa.uint64()),
            "bs": list_array(buf_bs, np.uint64, pa.uint64()),
            "vids": pa.nulls(n, type=pa.list_(pa.uint64())),
            "indptr": pa.nulls(n, type=pa.list_(pa.int64())),
            "indices": pa.nulls(n, type=pa.list_(pa.uint64())),
        },
        schema=_coshuffle_schema(),
    )


def _pad_oriented(batch: pa.Table) -> pa.Table:
    """Oriented CSR row → superset-schema row (a/u/bs null)."""
    n = batch.num_rows
    return pa.table(
        {
            "part": batch.column("part"),
            "a": pa.nulls(n, type=pa.uint64()),
            "u": pa.nulls(n, type=pa.uint64()),
            "bs": pa.nulls(n, type=pa.list_(pa.uint64())),
            "vids": batch.column("vids"),
            "indptr": batch.column("indptr"),
            "indices": batch.column("indices"),
        },
        schema=_coshuffle_schema(),
    )


def _closure_group(P: int):
    """Per-partition group (oriented row + that partition's wedges) →
    per-home-partition pre-aggregated count list rows.

    The task builds the sorted (a,b) pair index for its ONE partition
    in-task from the co-shuffled oriented row — peak memory O(E/P +
    local wedges), nothing cached across tasks, no driver involvement.

    Emitting (part, vids:list, cnt:list) rows (the superstep message
    shape) keeps the final exchange at P groups of list rows instead
    of a row-level ``groupby(vid)`` over millions of rows — measured
    58 s → ~2 s at 200k pages. Also sidesteps Ray's fragile uint64
    group keys (> 2^63 vids fail int64 inference in the sort shuffle).
    """

    def _fn(group: pa.Table) -> pa.Table:
        from ..util import list_array, list_rows

        import pyarrow.compute as pc

        is_oriented = pc.is_valid(group.column("indptr")).to_numpy(zero_copy_only=False)
        empty = pa.table(
            {
                "part": pa.array([], type=pa.int64()),
                "vids": list_array([], np.uint64, pa.uint64()),
                "cnt": list_array([], np.int64, pa.int64()),
            }
        )
        o_rows = np.flatnonzero(is_oriented)
        w_rows = np.flatnonzero(~is_oriented)
        if len(o_rows) == 0 or len(w_rows) == 0:
            return empty
        orow = group.slice(int(o_rows[0]), 1)
        vids_o = list_rows(orow, "vids")[0]
        indptr_o = list_rows(orow, "indptr")[0]
        indices_o = list_rows(orow, "indices")[0]
        pairs = np.sort(pair_struct(np.repeat(vids_o, np.diff(indptr_o)), indices_o))
        wed = group.take(pa.array(w_rows))
        # decompress (a, u, bs-list) wedge rows back to per-pair arrays
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
        corners = np.concatenate([a[hit], b[hit], u[hit]])
        if not len(corners):
            return empty
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


def _merge_counts(graph: ShardedGraph):
    """Per home partition: merge count partials onto the full vertex set
    (zeros included — the shard holds every vid of the partition)."""

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
                "triangles": pa.array(acc, type=pa.int64()),
            }
        )

    return _fn


def triangle_count(graph: ShardedGraph):
    """Undirected ShardedGraph → Dataset (vid, triangles), zeros included."""
    assert not graph.directed, "triangle counting requires an undirected graph"
    P = graph.num_partitions
    parts_ds = parts_dataset(graph.parts)

    deg_refs = _degree_index(graph)
    oriented_ds = parts_ds.map_batches(
        _orient_local(graph, deg_refs), batch_format="pyarrow", batch_size=1
    )
    # one pipeline consumes oriented rows twice (wedge gen + closure
    # side); materialize so orientation runs once, shards stay blocks
    oriented_ds = oriented_ds.materialize()
    # measured (200k-vertex / 2.4M-edge fixture, 32 cpus): a groupby
    # whose input chain is lazy through a union re-executes / stalls on
    # the heavy upstream during the sort's sample+partition passes —
    # end-to-end 7.0 s lazy vs 2.8 s with the two shuffle inputs
    # pinned. Both pins are safe at scale: the sort shuffle holds all
    # blocks in the object store (with spilling) anyway, so peak
    # memory is unchanged — this only removes the re-execution.
    wedges = oriented_ds.map_batches(
        _wedges_from_rows(P), batch_format="pyarrow", batch_size=1
    ).materialize()
    co = wedges.union(oriented_ds.map_batches(_pad_oriented, batch_format="pyarrow"))
    partials = (
        co.groupby("part").map_groups(_closure_group(P), batch_format="pyarrow").materialize()
    )

    # presence rows → every partition forms a merge group (zeros included)
    from ..util import list_array as _la

    presence = rd.from_arrow(
        pa.table(
            {
                "part": pa.array(graph.parts, type=pa.int64()),
                "vids": _la([np.empty(0, np.uint64)] * len(graph.parts), np.uint64, pa.uint64()),
                "cnt": _la([np.empty(0, np.int64)] * len(graph.parts), np.int64, pa.int64()),
            }
        )
    )
    return (
        partials.union(presence)
        .groupby("part")
        .map_groups(_merge_counts(graph), batch_format="pyarrow")
    )


def total_triangles(tri_ds) -> int:
    """Global triangle count = Σ per-vertex / 3."""
    s = tri_ds.sum("triangles")
    return int(s // 3)


def clustering_coefficient(graph: ShardedGraph):
    """(vid, triangles, deg, cc_ppm): local clustering coefficient
    2T/(deg·(deg−1)) as FLOOR(ppm) — floor of the same IEEE double
    expression is bit-identical in numpy and DuckDB (ROUND is not),
    so this composition stays SQL-oracle-exact. Reference analogue:
    the normalized common-neighbor statistics on top of
    ``interconnected_kernel`` (graph_kernels.py:107-121)."""
    tri = triangle_count(graph)
    deg_refs = _degree_index(graph)
    P = graph.num_partitions

    def _cc(batch: pa.Table) -> pa.Table:
        vids = batch.column("vid").to_numpy(zero_copy_only=False).astype(np.uint64)
        tris = batch.column("triangles").to_numpy(zero_copy_only=False).astype(np.float64)
        deg = np.zeros(len(vids), dtype=np.float64)
        parts = (vids % np.uint64(P)).astype(np.int64)
        for p in np.unique(parts):
            d = ray.get(deg_refs[int(p)])
            rows = np.flatnonzero(parts == p)
            pos = np.searchsorted(d["vids"], vids[rows])
            deg[rows] = d["deg"][pos]
        den = deg * (deg - 1.0)
        cc_ppm = np.zeros(len(vids), dtype=np.int64)
        ok = deg >= 2
        cc_ppm[ok] = np.floor(2000000.0 * tris[ok] / den[ok]).astype(np.int64)
        return pa.table(
            {
                "vid": batch.column("vid"),
                "triangles": batch.column("triangles"),
                "deg": pa.array(deg.astype(np.int64), type=pa.int64()),
                "cc_ppm": pa.array(cc_ppm, type=pa.int64()),
            }
        )

    return tri.map_batches(_cc, batch_format="pyarrow")


# ---- directed triangle triad census --------------------------------------

_TRIAD_CLASSES = ("030C", "030T", "120C", "120D", "120U", "210", "300")


def _dyad_states(x: np.ndarray, y: np.ndarray) -> np.ndarray:
    """Dyad state of vid pairs x < y under the hash orientation of
    relational.directed_coocc_edges: 2 = mutual (h%4==0), 1 = x→y
    (h odd), 0 = y→x (h even). Pure closed-form math — classifying a
    triangle needs no directed-edge probe."""
    from ..sources.edges_synth import _splitmix64

    h = _splitmix64(x ^ _splitmix64(y))
    st = np.where(h % np.uint64(2) == 1, 1, 0).astype(np.int8)
    st[h % np.uint64(4) == 0] = 2
    return st


def classify_triads(v1: np.ndarray, v2: np.ndarray, v3: np.ndarray) -> np.ndarray:
    """Holland–Leinhardt class (7 all-connected triad types) for each
    vid triple under the hash orientation. Returns an int8 index into
    _TRIAD_CLASSES."""
    tri = np.sort(np.stack([v1, v2, v3], axis=1).astype(np.uint64), axis=1)
    a, b, c = tri[:, 0], tri[:, 1], tri[:, 2]
    sab, sac, sbc = _dyad_states(a, b), _dyad_states(a, c), _dyad_states(b, c)
    m = (sab == 2).astype(np.int8) + (sac == 2) + (sbc == 2)
    cls = np.empty(len(a), dtype=np.int8)
    cls[m == 3] = _TRIAD_CLASSES.index("300")
    cls[m == 2] = _TRIAD_CLASSES.index("210")
    one = m == 1
    zout = np.zeros(len(a), dtype=np.int8)
    w = one & (sab == 2)
    zout[w] = (sac[w] == 0).astype(np.int8) + (sbc[w] == 0)
    w = one & (sac == 2)
    zout[w] = (sab[w] == 0).astype(np.int8) + (sbc[w] == 1)
    w = one & (sbc == 2)
    zout[w] = (sab[w] == 1).astype(np.int8) + (sac[w] == 1)
    cls[one & (zout == 2)] = _TRIAD_CLASSES.index("120D")
    cls[one & (zout == 0)] = _TRIAD_CLASSES.index("120U")
    cls[one & (zout == 1)] = _TRIAD_CLASSES.index("120C")
    zero = m == 0
    out_a = (sab == 1).astype(np.int8) + (sac == 1)
    out_b = (sab == 0).astype(np.int8) + (sbc == 1)
    out_c = (sac == 0).astype(np.int8) + (sbc == 0)
    mx = np.maximum(np.maximum(out_a, out_b), out_c)
    cls[zero & (mx == 2)] = _TRIAD_CLASSES.index("030T")
    cls[zero & (mx < 2)] = _TRIAD_CLASSES.index("030C")
    return cls


def _census_group(P: int):
    """Closure group → 7-row per-class triangle-count partial. Same
    wedge/closure mechanics as _closure_group; each hit triangle
    (u, a, b) is classified map-side from the hash rule, so the only
    output per task is a 7-int partial."""

    def _fn(group: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        zero = pa.table(
            {
                "triad": pa.array(list(_TRIAD_CLASSES), type=pa.string()),
                "n": pa.array(np.zeros(len(_TRIAD_CLASSES), dtype=np.int64), type=pa.int64()),
            }
        )
        is_oriented = pc.is_valid(group.column("indptr")).to_numpy(zero_copy_only=False)
        o_rows = np.flatnonzero(is_oriented)
        w_rows = np.flatnonzero(~is_oriented)
        if len(o_rows) == 0 or len(w_rows) == 0:
            return zero
        from ..util import list_rows as _lr

        orow = group.slice(int(o_rows[0]), 1)
        vids_o = _lr(orow, "vids")[0]
        indptr_o = _lr(orow, "indptr")[0]
        indices_o = _lr(orow, "indices")[0]
        pairs = np.sort(pair_struct(np.repeat(vids_o, np.diff(indptr_o)), indices_o))
        wed = group.take(pa.array(w_rows))
        a_row = wed.column("a").to_numpy(zero_copy_only=False).astype(np.uint64, copy=False)
        u_row = wed.column("u").to_numpy(zero_copy_only=False).astype(np.uint64, copy=False)
        bs_rows = _lr(wed, "bs")
        lens = np.fromiter((len(r) for r in bs_rows), dtype=np.int64, count=len(bs_rows))
        a = np.repeat(a_row, lens)
        u = np.repeat(u_row, lens)
        b = (
            np.concatenate(bs_rows).astype(np.uint64, copy=False)
            if bs_rows
            else np.empty(0, np.uint64)
        )
        hit = pairs_in_sorted(a, b, pairs)
        if not hit.any():
            return zero
        cls = classify_triads(u[hit], a[hit], b[hit])
        cnt = np.bincount(cls, minlength=len(_TRIAD_CLASSES)).astype(np.int64)
        return pa.table(
            {
                "triad": pa.array(list(_TRIAD_CLASSES), type=pa.string()),
                "n": pa.array(cnt, type=pa.int64()),
            }
        )

    return _fn


def triad_census(graph: ShardedGraph) -> pa.Table:
    """Triangle triad census of the hash-oriented directed view of an
    undirected ShardedGraph: counts of the 7 all-connected triad
    classes (030C 030T 120C 120D 120U 210 300). Dyad orientation is
    the deterministic splitmix rule of ``directed_coocc_edges``, so the
    classification is closed-form inside the triangle-closure task —
    the census costs ONE extra 7-int column over plain triangle
    counting (same two shuffles, no directed-edge probes). Returns a
    7-row (triad, n) table; Σn = total triangles."""
    P = graph.num_partitions
    parts_ds = parts_dataset(graph.parts)
    deg_refs = _degree_index(graph)
    oriented_ds = parts_ds.map_batches(
        _orient_local(graph, deg_refs), batch_format="pyarrow", batch_size=1
    ).materialize()
    wedges = oriented_ds.map_batches(_wedges_from_rows(P), batch_format="pyarrow", batch_size=1)
    co = wedges.union(oriented_ds.map_batches(_pad_oriented, batch_format="pyarrow"))
    partials = co.groupby("part").map_groups(_census_group(P), batch_format="pyarrow")
    agg = partials.groupby("triad").sum("n").to_pandas()
    got = dict(zip(agg["triad"], agg["sum(n)"]))
    return pa.table(
        {
            "triad": pa.array(list(_TRIAD_CLASSES), type=pa.string()),
            "n": pa.array(
                [int(got.get(t, 0)) for t in _TRIAD_CLASSES], type=pa.int64()
            ),
        }
    )


def _closure_triples_group(P: int):
    """Per-partition closure group that EMITS the closed triangles as
    sorted (x < y < z) vid triples instead of folding them into counts
    — the enumeration front-end for triangle-structure consumers
    (k=3 clique percolation). Same co-shuffle contract as
    ``_closure_group``; the triple table is Σ triangles rows total,
    already partition-sharded by the wedge exchange."""

    def _fn(group: pa.Table) -> pa.Table:
        from ..util import list_rows

        import pyarrow.compute as pc

        is_oriented = pc.is_valid(group.column("indptr")).to_numpy(zero_copy_only=False)
        empty = pa.table(
            {
                "x": pa.array([], type=pa.uint64()),
                "y": pa.array([], type=pa.uint64()),
                "z": pa.array([], type=pa.uint64()),
            }
        )
        o_rows = np.flatnonzero(is_oriented)
        w_rows = np.flatnonzero(~is_oriented)
        if len(o_rows) == 0 or len(w_rows) == 0:
            return empty
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
        if not hit.any():
            return empty
        tri = np.sort(np.stack([a[hit], b[hit], u[hit]]), axis=0)
        return pa.table(
            {
                "x": pa.array(tri[0], type=pa.uint64()),
                "y": pa.array(tri[1], type=pa.uint64()),
                "z": pa.array(tri[2], type=pa.uint64()),
            }
        )

    return _fn


def triangle_triples(graph: ShardedGraph):
    """Undirected ShardedGraph → Dataset (x, y, z) of its triangles,
    each exactly once with x < y < z. Same two-exchange plan as
    ``triangle_count`` (orientation map-side, closure partition-local);
    only the group readout differs."""
    assert not graph.directed, "triangle enumeration requires an undirected graph"
    P = graph.num_partitions
    parts_ds = parts_dataset(graph.parts)

    deg_refs = _degree_index(graph)
    oriented_ds = parts_ds.map_batches(
        _orient_local(graph, deg_refs), batch_format="pyarrow", batch_size=1
    ).materialize()
    wedges = oriented_ds.map_batches(_wedges_from_rows(P), batch_format="pyarrow", batch_size=1)
    co = wedges.union(oriented_ds.map_batches(_pad_oriented, batch_format="pyarrow"))
    return co.groupby("part").map_groups(_closure_triples_group(P), batch_format="pyarrow")
