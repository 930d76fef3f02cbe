"""Graph coarsening by matching contraction — the multilevel step.

Public algorithm: the contraction phase of multilevel graph
partitioners (Hendrickson–Leland 1995; Karypis–Kumar METIS 1998):
given a maximal matching, each matched pair collapses into ONE
supervertex (canonical id = the smaller endpoint), unmatched vertices
survive unchanged, and the quotient graph's edge weights are the sums
of the collapsed multiplicities (self-loops dropped). Together with
`pipelines/maxmatch.py` this is the scalable stand-in for the
reference's separator-based contraction machinery
(/root/reference/src/planar_separators/*, SURVEY §2.3 #35/39 note):
coarsen → partition small → project back.

Distribution: the supervertex map has one row per matched VERTEX —
O(V), never broadcast. Each endpoint is resolved by one
hash-partitioned tagged-union co-shuffle (the repo's standard join
idiom), then the quotient weights come from one combiner-backed
``groupby(cu, cv).sum(w)``. Three exchanges total, each keyed on a
vertex or canonical-pair hash — no skew amplification (a supervertex's
rows are pre-aggregated by the final groupby's map-side combine).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa


def _resolve_endpoint(edges_ds, col: str, out_col: str, smap_ds, P: int):
    """Replace ``col`` in edges_ds with its supervertex id (map rows
    (x, s); unmapped endpoints keep their own id). Keeps other cols."""
    cols = list(edges_ds.schema().names)

    def _tag_edges(b: pa.Table) -> pa.Table:
        x = b.column(col).to_numpy(zero_copy_only=False).astype(np.uint64)
        out = {"part": pa.array((x % np.uint64(P)).astype(np.int64)),
               "tag": pa.array(np.zeros(len(b), dtype=np.int64))}
        for c in cols:
            out[c] = b.column(c)
        out["s"] = pa.array(np.zeros(len(b), dtype=np.uint64), type=pa.uint64())
        return pa.table(out)

    def _tag_map(b: pa.Table) -> pa.Table:
        x = b.column("x").to_numpy(zero_copy_only=False).astype(np.uint64)
        out = {"part": pa.array((x % np.uint64(P)).astype(np.int64)),
               "tag": pa.array(np.ones(len(b), dtype=np.int64))}
        for c in cols:
            if c == col:
                out[c] = pa.array(x, type=pa.uint64())
            else:
                f = edges_ds.schema().base_schema.field(c)
                out[c] = pa.array(np.zeros(len(b), dtype=np.int64), type=f.type)
        out["s"] = b.column("s")
        return pa.table(out)

    def _merge(g: pa.Table) -> pa.Table:
        tag = g.column("tag").to_numpy(zero_copy_only=False)
        key = g.column(col).to_numpy(zero_copy_only=False).astype(np.uint64)
        s = g.column("s").to_numpy(zero_copy_only=False).astype(np.uint64)
        is_map = tag == 1
        mk, mv = key[is_map], s[is_map]
        order = np.argsort(mk, kind="stable")
        mk, mv = mk[order], mv[order]
        left = ~is_map
        x = key[left]
        resolved = x.copy()
        if len(mk):
            pos = np.searchsorted(mk, x)
            pos_c = np.clip(pos, 0, len(mk) - 1)
            hit = mk[pos_c] == x
            resolved[hit] = mv[pos_c[hit]]
        out = {}
        for c in cols:
            if c == col:
                out[out_col] = pa.array(resolved, type=pa.uint64())
            else:
                out[c] = g.column(c).filter(pa.array(left))
        return pa.table(out)

    return (
        edges_ds.map_batches(_tag_edges, batch_format="pyarrow")
        .union(smap_ds.map_batches(_tag_map, batch_format="pyarrow"))
        .groupby("part")
        .map_groups(_merge, batch_format="pyarrow")
    )


def coarsen_by_matching(weighted_edges, matching, *, num_partitions: int = 32):
    """weighted_edges: Dataset (u, v, w) of distinct undirected pairs
    (u < v, int64-like w). matching: Dataset (u, v, ...) of matched
    pairs (canonical u < v, from ``maximal_matching``). Returns the
    quotient edge table (u, v, w): supervertex id = min endpoint of the
    matched pair, self-loops dropped, parallel edges' weights summed."""
    from ray.data.aggregate import Sum

    def _smap(b: pa.Table) -> pa.Table:
        u = b.column("u").to_numpy(zero_copy_only=False).astype(np.uint64)
        v = b.column("v").to_numpy(zero_copy_only=False).astype(np.uint64)
        return pa.table(
            {
                "x": pa.array(np.concatenate([u, v]), type=pa.uint64()),
                "s": pa.array(np.concatenate([u, u]), type=pa.uint64()),
            }
        )

    smap = matching.map_batches(_smap, batch_format="pyarrow").materialize()
    step1 = _resolve_endpoint(weighted_edges, "u", "cu", smap, num_partitions)
    step2 = _resolve_endpoint(step1, "v", "cv", smap, num_partitions)

    def _canon(b: pa.Table) -> pa.Table:
        cu = b.column("cu").to_numpy(zero_copy_only=False).astype(np.uint64)
        cv = b.column("cv").to_numpy(zero_copy_only=False).astype(np.uint64)
        w = b.column("w").to_numpy(zero_copy_only=False).astype(np.int64)
        keep = cu != cv
        cu, cv, w = cu[keep], cv[keep], w[keep]
        lo, hi = np.minimum(cu, cv), np.maximum(cu, cv)
        return pa.table(
            {
                "u": pa.array(lo, type=pa.uint64()),
                "v": pa.array(hi, type=pa.uint64()),
                "w": pa.array(w, type=pa.int64()),
            }
        )

    return (
        step2.map_batches(_canon, batch_format="pyarrow")
        .groupby(["u", "v"])
        .aggregate(Sum("w", alias_name="w"))
    )
