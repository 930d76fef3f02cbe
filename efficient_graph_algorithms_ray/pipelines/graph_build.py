"""pages → edge table → hash-partitioned CSR shards.

Reference analogues: edge extraction = ``trimesh_to_adjacency_matrices``
(/root/reference/src/ega/util/mesh_utils.py:41-73); edge-table
construction from ragged adjacency = ``adjacency_list_to_sparse_matrix``
(mesh_utils.py:76-91); id dictionary = ``GIDMapper``
(/root/reference/src/ega/algorithms/graph_kernels.py:123-144), replaced
here by a stateless stable hash (stages/hashing.py).

Shuffle inventory (the only all-to-all in graph build):
- ``groupby('part')`` to pack CSR shards — key ``part = vid % P``.
Edge dedup happens *inside* the pack (vectorized per partition), not
as a separate ``groupby(src, dst)`` shuffle: one exchange instead of
two, and it's keyed by the same partitioner every downstream superstep
uses.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from ..config import EngineConfig
from ..stages.extract import parse_pages
from ..stages.hashing import hash_to_vid, normalize_urls
from ..state.csr import pack_csr_group
from ..state.graph import ShardedGraph


def edges_from_parsed(parsed_ds):
    """parsed (url, text, links) → raw edge rows (src: uint64, dst: uint64).

    Vectorized: explode the links list column via Arrow offsets, then
    one polars hash per batch for both endpoints. Self-edges (by
    normalized url) are dropped later in CSR pack; duplicates survive
    until the per-partition exact dedup.
    """

    def _explode(batch: pa.Table) -> pa.Table:
        links = batch.column("links")
        urls = batch.column("url")
        reps = []
        for chunk in links.chunks if isinstance(links, pa.ChunkedArray) else [links]:
            off = chunk.offsets.to_numpy(zero_copy_only=False)
            reps.append(np.diff(off))
        reps = np.concatenate(reps) if reps else np.empty(0, dtype=np.int64)
        src_urls = urls.take(pa.array(np.repeat(np.arange(len(reps)), reps)))
        dst_urls = pa.chunked_array([c.flatten() for c in (links.chunks if isinstance(links, pa.ChunkedArray) else [links])])
        src = hash_to_vid(normalize_urls(src_urls))
        dst = hash_to_vid(normalize_urls(dst_urls))
        return pa.table(
            {
                "src": pa.array(src, type=pa.uint64()),
                "dst": pa.array(dst, type=pa.uint64()),
            }
        )

    return parsed_ds.map_batches(_explode, batch_format="pyarrow")


def _part_rows(num_partitions: int, symmetrize: bool):
    """edges batch → partition-keyed rows: edge rows + dst marker rows.

    Marker rows (is_marker=True) home every destination vid in its own
    partition so dangling vertices exist in the vertex universe —
    pre-deduped per batch to keep marker volume ~ unique dsts, not E.
    """
    P = num_partitions

    def _fn(batch: pa.Table) -> pa.Table:
        src = batch.column("src").to_numpy(zero_copy_only=False).astype(np.uint64, copy=False)
        dst = batch.column("dst").to_numpy(zero_copy_only=False).astype(np.uint64, copy=False)
        weighted = "w" in batch.schema.names
        w = (
            batch.column("w").to_numpy(zero_copy_only=False).astype(np.float64, copy=False)
            if weighted
            else None
        )
        if symmetrize:
            src, dst = np.concatenate([src, dst]), np.concatenate([dst, src])
            if weighted:
                w = np.concatenate([w, w])
        # map-side combiner: collapse duplicate (src, dst) pairs within
        # the batch BEFORE the shuffle (weights partial-sum; the CSR
        # pack still does the exact cross-batch merge) — same pattern
        # as the marker dedup below, shrinks exchange volume on
        # duplicate-heavy link data for free
        if len(src):
            order = np.lexsort((dst, src))
            s_s, d_s = src[order], dst[order]
            first = np.concatenate(
                ([True], (s_s[1:] != s_s[:-1]) | (d_s[1:] != d_s[:-1]))
            )
            if weighted:
                gid = np.cumsum(first) - 1
                w = np.bincount(gid, weights=w[order])
            src, dst = s_s[first], d_s[first]
        marker_vids = np.unique(dst)
        out_src = np.concatenate([src, marker_vids])
        out_dst = np.concatenate([dst, np.zeros(len(marker_vids), dtype=np.uint64)])
        out_marker = np.zeros(len(out_src), dtype=bool)
        out_marker[len(src):] = True
        cols = {
            "part": pa.array((out_src % np.uint64(P)).astype(np.int64), type=pa.int64()),
            "src": pa.array(out_src, type=pa.uint64()),
            "dst": pa.array(out_dst, type=pa.uint64()),
            "is_marker": pa.array(out_marker, type=pa.bool_()),
        }
        if weighted:
            cols["w"] = pa.array(
                np.concatenate([w, np.zeros(len(marker_vids))]), type=pa.float64()
            )
        return pa.table(cols)

    return _fn


def build_graph(edges_ds, cfg: EngineConfig, directed: bool = True) -> ShardedGraph:
    """edge Dataset → materialized ShardedGraph (CSR shards in object store).

    directed=True: out-adjacency (PageRank). directed=False:
    symmetrized adjacency (connected components / label propagation /
    triangles).
    """
    part_ds = edges_ds.map_batches(
        _part_rows(cfg.num_partitions, symmetrize=not directed), batch_format="pyarrow"
    )
    # pin the shuffle input: a groupby over a lazy map chain re-executes
    # it during the sort's sample+partition passes (measured ~25% of
    # build time at the 2.4M-edge bench). The sort shuffle holds all
    # blocks in the object store anyway, so peak memory is unchanged.
    part_ds = part_ds.materialize()
    shard_ds = part_ds.groupby("part").map_groups(pack_csr_group, batch_format="pyarrow")
    return ShardedGraph.from_shard_dataset(shard_ds, cfg.num_partitions, directed)


def graph_from_pages(pages_ds, cfg: EngineConfig, directed: bool = True) -> ShardedGraph:
    """End-to-end: pages → parse (actor pool) → edges → ShardedGraph."""
    parsed = parse_pages(pages_ds, batch_size=cfg.parse_batch_size, concurrency=cfg.parse_concurrency)
    return build_graph(edges_from_parsed(parsed), cfg, directed=directed)


def vertex_urls(parsed_ds):
    """(vid, url) dictionary table for reporting — distinct page urls only."""

    def _vid(batch: pa.Table) -> pa.Table:
        urls = normalize_urls(batch.column("url"))
        return pa.table(
            {
                "vid": pa.array(hash_to_vid(urls), type=pa.uint64()),
                "url": urls,
            }
        )

    return parsed_ds.select_columns(["url"]).map_batches(_vid, batch_format="pyarrow")
