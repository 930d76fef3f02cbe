"""Degree table (vid, out_deg, in_deg) from a directed ShardedGraph.

Out-degree is local to each CSR shard; in-degree partials are
pre-aggregated per source shard (same combiner trick as the
superstep) before the single ``groupby(vid)`` exchange.
Reference analogue: grouped degree sums via ``np.bincount``
(/root/reference/src/planar_separators/lipton_tarjan/planar_separator.py:286-291).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray
import ray.data as rd
from ray.data.aggregate import Sum

from ..state.graph import ShardedGraph
from ..util import group_reduce, parts_dataset


def degree_table(graph: ShardedGraph):
    refs = graph.refs

    def _emit(batch: pa.Table) -> pa.Table:
        parts = batch.column("part").to_numpy(zero_copy_only=False)
        vid_out, od_out, id_out = [], [], []
        for p in parts:
            csr = ray.get(refs[int(p)])
            # local out-degrees
            vid_out.append(csr["vids"])
            od_out.append(csr["deg"].astype(np.int64))
            id_out.append(np.zeros(len(csr["vids"]), dtype=np.int64))
            # pre-aggregated in-degree partials for dst vids
            uk, cnt = group_reduce(
                csr["indices"], np.ones(len(csr["indices"]), dtype=np.int64), "sum"
            )
            vid_out.append(uk)
            od_out.append(np.zeros(len(uk), dtype=np.int64))
            id_out.append(cnt)
        return pa.table(
            {
                "vid": pa.array(np.concatenate(vid_out), type=pa.uint64()),
                "out_deg": pa.array(np.concatenate(od_out), type=pa.int64()),
                "in_deg": pa.array(np.concatenate(id_out), type=pa.int64()),
            }
        )

    parts_ds = parts_dataset(graph.parts)
    partials = parts_ds.map_batches(_emit, batch_format="pyarrow", batch_size=1)
    return partials.groupby("vid").aggregate(
        Sum("out_deg", alias_name="out_deg"), Sum("in_deg", alias_name="in_deg")
    )


def avg_neighbor_degree(graph: ShardedGraph):
    """(vid, deg, nbr_deg_sum, and_r6): average degree of each vertex's
    neighbors — the classic degree-correlation profile (Pastor-Satorras
    et al.'s knn(v), public measure).

    Zero-shuffle: each shard already holds its vertices' neighbor lists;
    neighbor degrees are served from the broadcast per-partition degree
    index (16 B/vertex — the triangles orientation pattern), summed with
    one ``np.add.reduceat`` per shard. Exactness: nbr_deg_sum is exact
    int64; and_ppm = FLOOR(1e6·sum/deg) of the same IEEE expression on
    both sides (floor is bit-identical numpy↔DuckDB where ROUND's
    half-tie behavior is not — the clustering-coefficient precedent).
    """
    from .triangles import _degree_index

    refs = graph.refs
    P = graph.num_partitions
    deg_refs = _degree_index(graph)

    def _emit(batch: pa.Table) -> pa.Table:
        out = []
        for p in batch.column("part").to_numpy(zero_copy_only=False):
            csr = ray.get(refs[int(p)])
            vids, deg, v = csr["vids"], csr["deg"].astype(np.int64), csr["indices"]
            dv = np.empty(len(v), dtype=np.int64)
            vpart = (v % np.uint64(P)).astype(np.int64)
            for q in np.unique(vpart):
                sel = vpart == q
                dq = ray.get(deg_refs[int(q)])
                dv[sel] = dq["deg"][np.searchsorted(dq["vids"], v[sel])]
            indptr = np.zeros(len(vids) + 1, dtype=np.int64)
            np.cumsum(deg, out=indptr[1:])
            sums = np.zeros(len(vids), dtype=np.int64)
            nz = deg > 0
            if nz.any():
                sums[nz] = np.add.reduceat(dv, indptr[:-1][nz])
            and_ppm = np.zeros(len(vids), dtype=np.int64)
            and_ppm[nz] = np.floor(
                1000000.0 * sums[nz].astype(np.float64) / deg[nz].astype(np.float64)
            ).astype(np.int64)
            out.append(
                pa.table(
                    {
                        "vid": pa.array(vids, type=pa.uint64()),
                        "deg": pa.array(deg, type=pa.int64()),
                        "nbr_deg_sum": pa.array(sums, type=pa.int64()),
                        "and_ppm": pa.array(and_ppm, type=pa.int64()),
                    }
                )
            )
        return pa.concat_tables(out)

    parts_ds = parts_dataset(graph.parts)
    return parts_ds.map_batches(_emit, batch_format="pyarrow", batch_size=1)
