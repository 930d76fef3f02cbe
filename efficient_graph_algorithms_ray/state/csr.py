"""Hash-partitioned CSR shards inside Arrow batches.

The reference's core data model is per-vertex ragged adjacency lists
with parallel weights (``adjacency_lists``/``weights_lists``,
/root/reference/src/ega/algorithms/gf_integrator.py:26-30). The
engine's distributed equivalent is one row per partition holding the
partition's CSR as Arrow list columns:

    part: int64
    vids:   list<uint64>   (sorted — searchsorted lookups)
    indptr: list<int64>    (len = len(vids)+1)
    indices: list<uint64>  (global dst vids, sorted within each row)
    weights: list<float64> (optional — absent ≡ unit weights, the
                            reference default, mesh_utils.py:94-106)

``part(vid) = vid % P`` — vids are already uniform 64-bit hashes, so
modulo is a uniform hash partitioner. Every vertex that appears as a
*destination* is guaranteed to exist in its home shard's ``vids``
(dangling vertices included) because edge-build emits a marker row per
distinct dst (see pipelines/graph_build.py).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from ..util import list_array, list_rows

CSR_SCHEMA = pa.schema(
    [
        ("part", pa.int64()),
        ("vids", pa.list_(pa.uint64())),
        ("indptr", pa.list_(pa.int64())),
        ("indices", pa.list_(pa.uint64())),
        ("weights", pa.list_(pa.float64())),
    ]
)


def pack_csr_group(group: pa.Table) -> pa.Table:
    """groupby('part').map_groups packer: edge+marker rows → one CSR row.

    Input columns: part, src, dst, is_marker (+ optional w). Marker
    rows carry a vid in ``src`` that must exist in this shard even
    without out-edges. Duplicate (src, dst) pairs collapse exactly;
    with weights, duplicates SUM their weights (multi-link → heavier
    edge). Self-loops dropped (link-analysis convention).
    """
    part = group.column("part")[0].as_py()
    src = group.column("src").to_numpy(zero_copy_only=False).astype(np.uint64, copy=False)
    dst = group.column("dst").to_numpy(zero_copy_only=False).astype(np.uint64, copy=False)
    marker = group.column("is_marker").to_numpy(zero_copy_only=False).astype(bool, copy=False)
    weighted = "w" in group.schema.names
    w = (
        group.column("w").to_numpy(zero_copy_only=False).astype(np.float64, copy=False)
        if weighted
        else None
    )

    e_src, e_dst = src[~marker], dst[~marker]
    e_w = w[~marker] if weighted else None
    keep = e_src != e_dst
    e_src, e_dst = e_src[keep], e_dst[keep]
    if weighted:
        e_w = e_w[keep]
    # exact dedup sorted by (src, dst); weights of duplicates summed
    if len(e_src):
        order = np.lexsort((e_dst, e_src))
        e_src, e_dst = e_src[order], e_dst[order]
        first = np.concatenate(([True], (e_src[1:] != e_src[:-1]) | (e_dst[1:] != e_dst[:-1])))
        if weighted:
            e_w = e_w[order]
            gid = np.cumsum(first) - 1
            e_w = np.bincount(gid, weights=e_w)
        e_src, e_dst = e_src[first], e_dst[first]

    vids = np.unique(src)  # edge srcs + markers = every vertex homed here
    row = np.searchsorted(vids, e_src)
    counts = np.bincount(row, minlength=len(vids))
    indptr = np.zeros(len(vids) + 1, dtype=np.int64)
    np.cumsum(counts, out=indptr[1:])
    wcol = e_w if weighted else np.empty(0, dtype=np.float64)
    return pa.Table.from_arrays(
        [
            pa.array([part], type=pa.int64()),
            list_array([vids], np.uint64, pa.uint64()),
            list_array([indptr], np.int64, pa.int64()),
            list_array([e_dst], np.uint64, pa.uint64()),
            list_array([wcol], np.float64, pa.float64()),
        ],
        schema=CSR_SCHEMA,
    )


def unpack_csr_row(table: pa.Table, i: int) -> dict:
    """One CSR shard row → dict of numpy arrays (+ derived degrees).

    ``weights`` key present only for weighted graphs; ``wdeg`` is the
    per-row weight sum (the random-walk normalizer), == ``deg`` for
    unweighted graphs.
    """
    part = table.column("part")[i].as_py()
    row = table.slice(i, 1)
    vids = list_rows(row, "vids")[0].astype(np.uint64, copy=False)
    indptr = list_rows(row, "indptr")[0].astype(np.int64, copy=False)
    indices = list_rows(row, "indices")[0].astype(np.uint64, copy=False)
    out = {
        "part": part,
        "vids": vids,
        "indptr": indptr,
        "indices": indices,
        "deg": np.diff(indptr),
    }
    if "weights" in table.schema.names:
        weights = list_rows(row, "weights")[0].astype(np.float64, copy=False)
        if len(weights) == len(indices) and len(indices):
            out["weights"] = weights
            lengths = np.diff(indptr)
            gid = np.repeat(np.arange(len(vids)), lengths)
            out["wdeg"] = np.bincount(gid, weights=weights, minlength=len(vids))
    return out
