"""Weisfeiler-Leman (1-WL) color refinement over an undirected edge table.

Public algorithm: iterated neighborhood-color hashing (Weisfeiler &
Leman 1968; Shervashidze et al. 2011 "Weisfeiler-Lehman graph
kernels"). WL colors are the feature map of the WL graph kernel — the
same kernel family as the reference's random-walk / diffusion kernels
(`/root/reference/src/ega/algorithms/graph_kernels.py`), but purely
combinatorial: after t rounds two vertices share a color iff their
depth-t unfolded neighborhood trees are isomorphic.

Multiset hashing without sorting (the distributed trick): the per-round
neighbor multiset {c(u)} is combined COMMUTATIVELY as

    S(v)  = Σ_u  splitmix64(c(u))          (mod 2^64)
    c'(v) = splitmix64( 3·splitmix64(c(v)) + S(v)  (mod 2^64) )

Wrap-around uint64 sums are order-independent, so any partition/merge
schedule yields bit-identical colors — and DuckDB replays the exact
arithmetic with HUGEINT mod-2^64 CTEs (`oracles/sql.wl_colors_sql`).
Init color = degree.

Distribution: each round is two hash-partitioned tagged-union
co-shuffles (the repo's standard join idiom — no broadcast, no driver
state):

  1. attach:  edges keyed by SOURCE vertex ∪ colors keyed by vid →
              per-group dictionary lookup, then map-side pre-aggregation
              of Σ splitmix64(c(u)) per DESTINATION (one partial row per
              (group, dst), not per edge);
  2. combine: partials keyed by dst ∪ colors keyed by vid → wraparound
              sum + the rehash above. Isolated vertices get S = 0.

Skew: a hub's messages are pre-summed inside every source partition, so
the combine group sees ≤ P partial rows per vertex regardless of degree.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from ..sources.edges_synth import _splitmix64

_U3 = np.uint64(3)


def _both_dirs(batch: pa.Table) -> pa.Table:
    u = batch.column("u").to_numpy(zero_copy_only=False).astype(np.uint64)
    v = batch.column("v").to_numpy(zero_copy_only=False).astype(np.uint64)
    return pa.table(
        {
            "u": pa.array(np.concatenate([u, v]), type=pa.uint64()),
            "v": pa.array(np.concatenate([v, u]), type=pa.uint64()),
        }
    )


def wl_colors(edges_uv, *, rounds: int = 2, num_partitions: int = 32):
    """edges_uv: Dataset of DISTINCT undirected pairs (u, v). Returns a
    Dataset (vid: uint64, color: uint64) of the round-``rounds`` WL
    colors (init color = degree)."""
    import ray.data as rd
    from ray.data.aggregate import Count

    P = np.uint64(num_partitions)
    directed = edges_uv.map_batches(_both_dirs, batch_format="pyarrow").materialize()

    def _deg_color(b: pa.Table) -> pa.Table:
        return pa.table(
            {
                "vid": b.column("u"),
                "c": pa.array(
                    b.column("n").to_numpy(zero_copy_only=False).astype(np.uint64),
                    type=pa.uint64(),
                ),
            }
        )

    colors = (
        directed.groupby("u")
        .aggregate(Count(alias_name="n"))
        .map_batches(_deg_color, batch_format="pyarrow")
    )

    def _tag_edges(b: pa.Table) -> pa.Table:
        u = b.column("u").to_numpy(zero_copy_only=False).astype(np.uint64)
        return pa.table(
            {
                "part": pa.array((u % P).astype(np.int64)),
                "tag": pa.array(np.zeros(len(b), dtype=np.int64)),
                "k": b.column("u"),
                "v": b.column("v"),
                "c": pa.array(np.zeros(len(b), dtype=np.uint64), type=pa.uint64()),
            }
        )

    def _tag_colors(b: pa.Table) -> pa.Table:
        vid = b.column("vid").to_numpy(zero_copy_only=False).astype(np.uint64)
        z = np.zeros(len(b), dtype=np.uint64)
        return pa.table(
            {
                "part": pa.array((vid % P).astype(np.int64)),
                "tag": pa.array(np.ones(len(b), dtype=np.int64)),
                "k": pa.array(vid, type=pa.uint64()),
                "v": pa.array(z, type=pa.uint64()),
                "c": b.column("c"),
            }
        )

    def _attach_and_presum(g: pa.Table) -> pa.Table:
        tag = g.column("tag").to_numpy(zero_copy_only=False)
        k = g.column("k").to_numpy(zero_copy_only=False).astype(np.uint64)
        is_col = tag == 1
        lut_k = k[is_col]
        lut_h = _splitmix64(
            g.column("c").to_numpy(zero_copy_only=False).astype(np.uint64)[is_col]
        )
        order = np.argsort(lut_k, kind="stable")
        lut_k, lut_h = lut_k[order], lut_h[order]
        src = k[~is_col]
        dst = g.column("v").to_numpy(zero_copy_only=False).astype(np.uint64)[~is_col]
        if len(src) == 0:
            return pa.table(
                {
                    "v": pa.array(np.empty(0, np.uint64), type=pa.uint64()),
                    "s": pa.array(np.empty(0, np.uint64), type=pa.uint64()),
                }
            )
        h = lut_h[np.searchsorted(lut_k, src)]
        srt = np.argsort(dst, kind="stable")
        dst, h = dst[srt], h[srt]
        starts = np.flatnonzero(np.concatenate(([True], dst[1:] != dst[:-1])))
        with np.errstate(over="ignore"):
            sums = np.add.reduceat(h, starts)  # uint64 wraparound: exact mod 2^64
        return pa.table(
            {
                "v": pa.array(dst[starts], type=pa.uint64()),
                "s": pa.array(sums, type=pa.uint64()),
            }
        )

    def _tag_partials(b: pa.Table) -> pa.Table:
        v = b.column("v").to_numpy(zero_copy_only=False).astype(np.uint64)
        return pa.table(
            {
                "part": pa.array((v % P).astype(np.int64)),
                "tag": pa.array(np.zeros(len(b), dtype=np.int64)),
                "k": b.column("v"),
                "s": b.column("s"),
            }
        )

    def _tag_colors2(b: pa.Table) -> pa.Table:
        vid = b.column("vid").to_numpy(zero_copy_only=False).astype(np.uint64)
        return pa.table(
            {
                "part": pa.array((vid % P).astype(np.int64)),
                "tag": pa.array(np.ones(len(b), dtype=np.int64)),
                "k": pa.array(vid, type=pa.uint64()),
                "s": b.column("c"),
            }
        )

    def _combine(g: pa.Table) -> pa.Table:
        tag = g.column("tag").to_numpy(zero_copy_only=False)
        k = g.column("k").to_numpy(zero_copy_only=False).astype(np.uint64)
        s = g.column("s").to_numpy(zero_copy_only=False).astype(np.uint64)
        is_col = tag == 1
        vids, own = k[is_col], s[is_col]
        pv, ps = k[~is_col], s[~is_col]
        S = np.zeros(len(vids), dtype=np.uint64)
        if len(pv):
            order = np.argsort(vids, kind="stable")
            vids_s = vids[order]
            pos = np.searchsorted(vids_s, pv)
            with np.errstate(over="ignore"):
                np.add.at(S, order[pos], ps)  # wraparound partial merge
        with np.errstate(over="ignore"):
            new = _splitmix64(_splitmix64(own) * _U3 + S)
        return pa.table(
            {
                "vid": pa.array(vids, type=pa.uint64()),
                "c": pa.array(new, type=pa.uint64()),
            }
        )

    for _ in range(rounds):
        partials = (
            directed.map_batches(_tag_edges, batch_format="pyarrow")
            .union(colors.map_batches(_tag_colors, batch_format="pyarrow"))
            .groupby("part")
            .map_groups(_attach_and_presum, batch_format="pyarrow")
        )
        colors = (
            partials.map_batches(_tag_partials, batch_format="pyarrow")
            .union(colors.map_batches(_tag_colors2, batch_format="pyarrow"))
            .groupby("part")
            .map_groups(_combine, batch_format="pyarrow")
            .materialize()
        )

    def _out(b: pa.Table) -> pa.Table:
        return pa.table({"vid": b.column("vid"), "color": b.column("c")})

    return colors.map_batches(_out, batch_format="pyarrow")
