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
from ..util import group_reduce


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

    parts_ds = rd.from_arrow(pa.table({"part": pa.array(graph.parts, type=pa.int64())}))
    partials = parts_ds.map_batches(_emit, batch_format="pyarrow", batch_size=1)
    return partials.groupby("vid").aggregate(
        Sum("out_deg", alias_name="out_deg"), Sum("in_deg", alias_name="in_deg")
    )
