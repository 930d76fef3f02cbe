"""Link prediction over CSR shards: common-neighbor / Adamic-Adar /
Jaccard scores for non-adjacent vertex pairs.

The wedge machinery is the ``interconnected_kernel`` A² common-
neighbor term of the reference
(/root/reference/src/ega/algorithms/graph_kernels.py:109-112) turned
into a ranking operator: for every pair (u, w) with at least one
common neighbor a, score

    cn(u, w)   = |N(u) ∩ N(w)|            (common-neighbor count)
    aa(u, w)   = Σ_a 1 / ln(deg(a))       (Adamic–Adar)
    jacc(u, w) = cn / (deg(u)+deg(w)−cn)  (neighborhood Jaccard)

existing edges are excluded, and the global top-k by score is
returned.

Shuffle plan (two exchanges total):
- per-shard wedge generation is vectorized per center vertex
  (``triu_indices`` over the sorted neighbor row) and pre-aggregated
  per shard with a lexsort+reduceat pass, so the exchange carries one
  row per distinct (u, w) per shard — not one per wedge;
- edge-marker rows ride the SAME (u, w) groupby that merges the
  partials, folding the anti-join into the aggregation shuffle
  (group size ≤ #shards + 1);
- Jaccard's endpoint degrees come from the broadcast degree index
  (triangles._degree_index — remote-extracted 16 B/vertex slices, no
  driver shard funnel), looked up map-side per batch;
- global ``sort + limit`` for the top-k.

Scale note: exact all-pairs scoring is inherently Σ deg² wedge work —
the same bound as triangle counting, without the orientation trick
(wedge centers must see BOTH endpoints). ``max_center_degree`` caps
hub centers for the approximate large-scale regime (a hub shared by
two pages is weak evidence anyway: weight 1/ln(deg) → 0); the
default None keeps the operator exact for the oracle check.

Jaccard emits the RAW IEEE quotient (integer cn / integer denom, one
division) — no rounding, so the SQL oracle is bit-identical; AA is an
irrational log-sum, rounded r6 with a deterministic (sorted) partial
sum on both sides.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray

from ..state.graph import ShardedGraph

_I64 = pa.int64()
_F64 = pa.float64()


def _empty() -> pa.Table:
    return pa.table(
        {
            "u": pa.array([], type=_I64),
            "w": pa.array([], type=_I64),
            "cn": pa.array([], type=_I64),
            "s": pa.array([], type=_F64),
            "is_edge": pa.array([], type=_I64),
        }
    )


def _cn_pairs(
    graph: ShardedGraph,
    max_center_degree: int | None,
    weight_mode: str,
):
    """Merged non-adjacent common-neighbor pairs: Dataset (u, w, cn, s)
    with u < w; s = Σ 1/ln(deg(center)) for ``weight_mode='aa'``
    (Adamic-Adar), Σ 1/deg(center) for ``'ra'`` (resource allocation),
    0 for ``'none'``."""
    import ray.data as rd

    assert not graph.directed
    refs = graph.refs

    def _wedge_partials(batch: pa.Table) -> pa.Table:
        parts = batch.column("part").to_numpy(zero_copy_only=False)
        us, ws, wts = [], [], []
        e_us, e_ws = [], []
        for p in parts:
            csr = ray.get(refs[int(p)])
            vids, indptr, nbrs = csr["vids"], csr["indptr"], csr["indices"]
            deg = csr["deg"]
            for i in range(len(vids)):
                d = int(deg[i])
                row = nbrs[indptr[i] : indptr[i + 1]]
                # edge markers (canonical u < w), one per undirected edge
                sel = row > vids[i]
                if sel.any():
                    e_us.append(np.full(int(sel.sum()), vids[i], dtype=np.uint64))
                    e_ws.append(row[sel])
                if d < 2 or (max_center_degree is not None and d > max_center_degree):
                    continue
                iu, iw = np.triu_indices(d, 1)
                us.append(row[iu])  # row is sorted → u < w already
                ws.append(row[iw])
                if weight_mode == "aa":
                    wts.append(np.full(len(iu), 1.0 / np.log(d)))
                elif weight_mode == "ra":
                    wts.append(np.full(len(iu), 1.0 / d))
        if not us and not e_us:
            return _empty()
        out = []
        if us:
            u = np.concatenate(us)
            w = np.concatenate(ws)
            wt = np.concatenate(wts) if weight_mode != "none" else np.zeros(len(u))
            # shard-local pre-aggregation: one row per distinct (u, w)
            order = np.lexsort((w, u))
            u, w, wt = u[order], w[order], wt[order]
            first = np.concatenate(
                ([True], (u[1:] != u[:-1]) | (w[1:] != w[:-1]))
            )
            gid = np.cumsum(first) - 1
            cn = np.bincount(gid)
            s = np.bincount(gid, weights=wt)
            out.append(
                pa.table(
                    {
                        "u": pa.array(u[first].astype(np.int64), type=_I64),
                        "w": pa.array(w[first].astype(np.int64), type=_I64),
                        "cn": pa.array(cn.astype(np.int64), type=_I64),
                        "s": pa.array(s, type=_F64),
                        "is_edge": pa.array(np.zeros(int(first.sum()), np.int64), type=_I64),
                    }
                )
            )
        if e_us:
            eu = np.concatenate(e_us).astype(np.int64)
            ew = np.concatenate(e_ws).astype(np.int64)
            out.append(
                pa.table(
                    {
                        "u": pa.array(eu, type=_I64),
                        "w": pa.array(ew, type=_I64),
                        "cn": pa.array(np.zeros(len(eu), np.int64), type=_I64),
                        "s": pa.array(np.zeros(len(eu)), type=_F64),
                        "is_edge": pa.array(np.ones(len(eu), np.int64), type=_I64),
                    }
                )
            )
        return pa.concat_tables(out)

    parts_ds = rd.from_arrow(
        pa.table({"part": pa.array(graph.parts, type=_I64)})
    ).repartition(len(graph.parts))
    partials = parts_ds.map_batches(
        _wedge_partials, batch_format="pyarrow", batch_size=1
    )

    def _merge(g: pa.Table) -> pa.Table:
        if g.column("is_edge").to_numpy(zero_copy_only=False).any():
            return _empty().drop_columns(["is_edge"])
        cn = int(g.column("cn").to_numpy(zero_copy_only=False).sum())
        # sort partials before summing: group rows arrive in task order,
        # sorting makes the float sum run-to-run deterministic
        s = float(np.sort(g.column("s").to_numpy(zero_copy_only=False)).sum())
        return pa.table(
            {
                "u": g.slice(0, 1).column("u"),
                "w": g.slice(0, 1).column("w"),
                "cn": pa.array([cn], type=_I64),
                "s": pa.array([s], type=_F64),
            }
        )

    return partials.groupby(["u", "w"]).map_groups(_merge, batch_format="pyarrow")


def spectral_moments(graph: ShardedGraph) -> pa.Table:
    """Exact low-order closed-walk counts (adjacency spectral moments)
    and the exact 4-cycle (rectangle) count of an undirected graph:

        m            = #undirected edges            (= tr A² / 2)
        sum_deg_sq   = Σ_v deg(v)²
        wedges       = Σ_v C(deg(v), 2)             (paths of length 2)
        sum_cn_sq    = Σ_{u<w} cn(u, w)²
        closed_4walks= tr A⁴ = sum_deg_sq + 2·sum_cn_sq
        c4           = (tr A⁴ − 2·sum_deg_sq + 2m) / 8   (rectangles)

    All-integer arithmetic end to end → the SQL oracle is hash-exact.
    The reference exposes tr A^k through ``interconnected_kernel``'s
    repeated A·x products (graph_kernels.py:109-112); the rectangle
    identity is the standard closed-walk decomposition.

    Plan: one wedge pass (same Σ deg² bound and shard-local (u, w)
    pre-aggregation as ``_cn_pairs``, but KEEPING adjacent pairs — A²
    entries are wanted for every pair), a combiner-backed
    ``groupby(u, w).sum`` merge, then per-block partial Σcn/Σcn² folded
    by one tiny aggregate. Degree moments come from per-shard remote
    partials (16 B/shard back to the driver)."""
    import ray.data as rd
    from ray.data.aggregate import Sum

    assert not graph.directed
    refs = graph.refs

    def _wedges(batch: pa.Table) -> pa.Table:
        parts = batch.column("part").to_numpy(zero_copy_only=False)
        us, ws = [], []
        for p in parts:
            csr = ray.get(refs[int(p)])
            vids, indptr, nbrs = csr["vids"], csr["indptr"], csr["indices"]
            deg = csr["deg"]
            for i in range(len(vids)):
                d = int(deg[i])
                if d < 2:
                    continue
                row = nbrs[indptr[i] : indptr[i + 1]]
                iu, iw = np.triu_indices(d, 1)
                us.append(row[iu])
                ws.append(row[iw])
        if not us:
            return pa.table(
                {
                    "u": pa.array([], type=_I64),
                    "w": pa.array([], type=_I64),
                    "cn": pa.array([], type=_I64),
                }
            )
        u = np.concatenate(us)
        w = np.concatenate(ws)
        order = np.lexsort((w, u))
        u, w = u[order], w[order]
        first = np.concatenate(([True], (u[1:] != u[:-1]) | (w[1:] != w[:-1])))
        gid = np.cumsum(first) - 1
        cn = np.bincount(gid)
        return pa.table(
            {
                "u": pa.array(u[first].astype(np.int64), type=_I64),
                "w": pa.array(w[first].astype(np.int64), type=_I64),
                "cn": pa.array(cn.astype(np.int64), type=_I64),
            }
        )

    parts_ds = rd.from_arrow(
        pa.table({"part": pa.array(graph.parts, type=_I64)})
    ).repartition(len(graph.parts))
    merged = (
        parts_ds.map_batches(_wedges, batch_format="pyarrow", batch_size=1)
        .groupby(["u", "w"])
        .aggregate(Sum("cn", alias_name="cn"))
    )

    def _partial(batch: pa.Table) -> pa.Table:
        cn = batch.column("cn").to_numpy(zero_copy_only=False).astype(object)
        return pa.table(
            {
                "wedges": pa.array([int(cn.sum())], type=_I64),
                "cn_sq": pa.array([int((cn * cn).sum())], type=_I64),
            }
        )

    sums = merged.map_batches(_partial, batch_format="pyarrow").aggregate(
        Sum("wedges", alias_name="wedges"), Sum("cn_sq", alias_name="cn_sq")
    )
    wedges, cn_sq = int(sums["wedges"]), int(sums["cn_sq"])

    def _deg_partial(batch: pa.Table) -> pa.Table:
        parts = batch.column("part").to_numpy(zero_copy_only=False)
        s = sq = 0
        for p in parts:
            d = ray.get(refs[int(p)])["deg"].astype(object)
            s += int(d.sum())
            sq += int((d * d).sum())
        return pa.table(
            {
                "sd": pa.array([s], type=_I64),
                "sdsq": pa.array([sq], type=_I64),
            }
        )

    dsum = parts_ds.map_batches(
        _deg_partial, batch_format="pyarrow", batch_size=1
    ).aggregate(Sum("sd", alias_name="sd"), Sum("sdsq", alias_name="sdsq"))
    sum_deg, sum_deg_sq = int(dsum["sd"]), int(dsum["sdsq"])

    m = sum_deg // 2
    closed4 = sum_deg_sq + 2 * cn_sq
    c4 = (closed4 - 2 * sum_deg_sq + 2 * m) // 8
    return pa.table(
        {
            "m": pa.array([m], type=_I64),
            "sum_deg_sq": pa.array([sum_deg_sq], type=_I64),
            "wedges": pa.array([wedges], type=_I64),
            "sum_cn_sq": pa.array([cn_sq], type=_I64),
            "closed_4walks": pa.array([closed4], type=_I64),
            "c4": pa.array([c4], type=_I64),
        }
    )


def adamic_adar_topk(
    graph: ShardedGraph,
    k: int = 100,
    max_center_degree: int | None = None,
) -> "ray.data.Dataset":
    """Top-k non-adjacent pairs by Adamic-Adar score.

    Returns (u, v, cn, aa_r6) ordered by (aa_r6 desc, u, v); u < w.
    ``graph`` must be undirected (both directions present).
    """
    merged = _cn_pairs(graph, max_center_degree, weight_mode="aa")

    def _score(batch: pa.Table) -> pa.Table:
        s = batch.column("s").to_numpy(zero_copy_only=False)
        return pa.table(
            {
                "u": batch.column("u"),
                "w": batch.column("w"),
                "cn": batch.column("cn"),
                "aa_r6": pa.array(np.round(s, 6), type=_F64),
            }
        )

    top = (
        merged.map_batches(_score, batch_format="pyarrow")
        .sort(["aa_r6", "u", "w"], descending=[True, False, False])
        .limit(k)
    )

    def _rename(batch: pa.Table) -> pa.Table:
        return batch.rename_columns(["u", "v", "cn", "aa_r6"])

    return top.map_batches(_rename, batch_format="pyarrow")


def jaccard_topk(
    graph: ShardedGraph,
    k: int = 100,
    max_center_degree: int | None = None,
) -> "ray.data.Dataset":
    """Top-k non-adjacent pairs by neighborhood Jaccard similarity.

    Returns (u, v, cn, jaccard) ordered by (jaccard desc, u, v);
    jaccard is the raw IEEE quotient cn / (deg u + deg w − cn).
    """
    from .triangles import _degree_index

    merged = _cn_pairs(graph, max_center_degree, weight_mode="none")
    deg_refs = _degree_index(graph)
    P = graph.num_partitions

    def _lookup(vs: np.ndarray) -> np.ndarray:
        """deg per vid, via the per-partition broadcast degree slices."""
        out = np.zeros(len(vs), dtype=np.int64)
        parts = (vs.astype(np.uint64) % np.uint64(P)).astype(np.int64)
        for p in np.unique(parts):
            sl = ray.get(deg_refs[int(p)])
            sel = parts == p
            pos = np.searchsorted(sl["vids"], vs[sel].astype(np.uint64))
            out[sel] = sl["deg"][pos]
        return out

    def _score(batch: pa.Table) -> pa.Table:
        u = batch.column("u").to_numpy(zero_copy_only=False)
        w = batch.column("w").to_numpy(zero_copy_only=False)
        cn = batch.column("cn").to_numpy(zero_copy_only=False)
        denom = _lookup(u) + _lookup(w) - cn
        return pa.table(
            {
                "u": batch.column("u"),
                "w": batch.column("w"),
                "cn": batch.column("cn"),
                "jaccard": pa.array(
                    cn.astype(np.float64) / denom.astype(np.float64), type=_F64
                ),
            }
        )

    top = (
        merged.map_batches(_score, batch_format="pyarrow")
        .sort(["jaccard", "u", "w"], descending=[True, False, False])
        .limit(k)
    )

    def _rename(batch: pa.Table) -> pa.Table:
        return batch.rename_columns(["u", "v", "cn", "jaccard"])

    return top.map_batches(_rename, batch_format="pyarrow")


def ra_pa_topk(
    graph: ShardedGraph,
    k: int = 100,
    max_center_degree: int | None = None,
) -> "ray.data.Dataset":
    """Top-k non-adjacent pairs by resource-allocation index (Zhou,
    Lü & Zhang 2009: Σ_a 1/deg(a) over common neighbors — the RA
    link-prediction feature), with the preferential-attachment product
    deg(u)·deg(v) attached map-side from the broadcast degree index.
    Returns (u, v, cn, ra_r6, pa) ordered by (ra_r6 desc, u, v)."""
    from .triangles import _degree_index

    merged = _cn_pairs(graph, max_center_degree, weight_mode="ra")
    deg_refs = _degree_index(graph)
    P = graph.num_partitions

    def _score(batch: pa.Table) -> pa.Table:
        s = batch.column("s").to_numpy(zero_copy_only=False)
        u = batch.column("u").to_numpy(zero_copy_only=False).astype(np.uint64)
        w = batch.column("w").to_numpy(zero_copy_only=False).astype(np.uint64)
        du = np.zeros(len(u), dtype=np.int64)
        dw = np.zeros(len(w), dtype=np.int64)
        for arr, out in ((u, du), (w, dw)):
            parts = (arr % np.uint64(P)).astype(np.int64)
            for q in np.unique(parts):
                dq = ray.get(deg_refs[int(q)])
                rows = np.flatnonzero(parts == q)
                out[rows] = dq["deg"][np.searchsorted(dq["vids"], arr[rows])]
        return pa.table(
            {
                "u": batch.column("u"),
                "w": batch.column("w"),
                "cn": batch.column("cn"),
                "ra_r6": pa.array(np.round(s, 6), type=_F64),
                "pa": pa.array(du * dw, type=_I64),
            }
        )

    top = (
        merged.map_batches(_score, batch_format="pyarrow")
        .sort(["ra_r6", "u", "w"], descending=[True, False, False])
        .limit(k)
    )

    def _rename(batch: pa.Table) -> pa.Table:
        return batch.rename_columns(["u", "v", "cn", "ra_r6", "pa"])

    return top.map_batches(_rename, batch_format="pyarrow")
