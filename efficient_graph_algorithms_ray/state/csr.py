"""Hash-partitioned CSR shards inside Arrow batches.

The reference's core data model is per-vertex ragged adjacency lists
(``adjacency_lists``, /root/reference/src/ega/algorithms/
gf_integrator.py:26-30). The engine's distributed equivalent is one
row per partition holding the partition's CSR as Arrow list columns:

    part: int64
    vids:   list<uint64>   (sorted — searchsorted lookups)
    indptr: list<int64>    (len = len(vids)+1)
    indices: list<uint64>  (global dst vids, sorted within each row)

``part(vid) = vid % P`` — vids are already uniform 64-bit hashes, so
modulo is a uniform hash partitioner. Every vertex that appears as a
*destination* is guaranteed to exist in its home shard's ``vids``
(dangling vertices included) because edge-build emits a marker row per
distinct dst (see pipelines/graph_build.py).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from ..util import dedup_pairs, list_array, list_rows

CSR_SCHEMA = pa.schema(
    [
        ("part", pa.int64()),
        ("vids", pa.list_(pa.uint64())),
        ("indptr", pa.list_(pa.int64())),
        ("indices", pa.list_(pa.uint64())),
    ]
)


def pack_csr_group(group: pa.Table) -> pa.Table:
    """groupby('part').map_groups packer: edge+marker rows → one CSR row.

    Input columns: part, src, dst, is_marker. Marker rows carry a vid
    in ``src`` that must exist in this shard even without out-edges.
    Dedups (src, dst) pairs exactly and drops self-loops.
    """
    part = group.column("part")[0].as_py()
    src = group.column("src").to_numpy(zero_copy_only=False).astype(np.uint64, copy=False)
    dst = group.column("dst").to_numpy(zero_copy_only=False).astype(np.uint64, copy=False)
    marker = group.column("is_marker").to_numpy(zero_copy_only=False).astype(bool, copy=False)

    e_src, e_dst = src[~marker], dst[~marker]
    keep = e_src != e_dst  # self-loops dropped (link-analysis convention)
    e_src, e_dst = dedup_pairs(e_src[keep], e_dst[keep])

    vids = np.unique(src)  # edge srcs + markers = every vertex homed here
    row = np.searchsorted(vids, e_src)
    counts = np.bincount(row, minlength=len(vids))
    indptr = np.zeros(len(vids) + 1, dtype=np.int64)
    np.cumsum(counts, out=indptr[1:])
    # e_dst already sorted within each src run (dedup_pairs sorts by (src, dst))
    return pa.Table.from_arrays(
        [
            pa.array([part], type=pa.int64()),
            list_array([vids], np.uint64, pa.uint64()),
            list_array([indptr], np.int64, pa.int64()),
            list_array([e_dst], np.uint64, pa.uint64()),
        ],
        schema=CSR_SCHEMA,
    )


def unpack_csr_row(table: pa.Table, i: int) -> dict:
    """One CSR shard row → dict of numpy arrays (+ derived out-degree)."""
    part = table.column("part")[i].as_py()
    vids = list_rows(table.slice(i, 1), "vids")[0].astype(np.uint64, copy=False)
    indptr = list_rows(table.slice(i, 1), "indptr")[0].astype(np.int64, copy=False)
    indices = list_rows(table.slice(i, 1), "indices")[0].astype(np.uint64, copy=False)
    return {
        "part": part,
        "vids": vids,
        "indptr": indptr,
        "indices": indices,
        "deg": np.diff(indptr),
    }
