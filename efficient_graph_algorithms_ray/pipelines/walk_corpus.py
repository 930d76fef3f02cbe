"""Random-walk corpus generation — training sequences from the graph.

The training-data counterpart of the walk kernels: DeepWalk/node2vec
(public algorithms; Perozzi et al. KDD 2014) train embeddings on walk
*sequences*, so the engine must emit them as data, not just integrate
over them. (Reference tie-in: the same transition structure as
``random_walk_kernel``, /root/reference/src/ega/algorithms/
graph_kernels.py:81-99 — materialized per-walk instead of integrated.)

Ray-Data-native shape: the walk set is a Dataset of rows
``(walk_id, cur, seq)``; each step is ONE ``map_batches`` that groups
the batch's walks by the partition of their frontier vertex, reads
those CSR shards zero-copy from the object store (broadcast-once
refs), and advances every walk vectorized. L steps = a lazy chain of
L map_batches — the streaming executor pipelines them, nothing
materializes until the sink. No shuffle at any step: walks stay in
their block; only shard *reads* follow the frontier.

Determinism: next hop = splitmix64(walk_id ⊕ mix(step) ⊕ seed) mod
degree — reproducible for a fixed seed at any parallelism. Walks at a
dangling/degree-0 vertex truncate (seq stops growing, ``done`` set).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from ..sources.edges_synth import _splitmix64
from ..state.graph import ShardedGraph
from ..util import list_array, list_rows


def walk_seeds(graph: ShardedGraph, walks_per_vertex: int = 1):
    """Dataset of walk starts: one row per (vertex, replica)."""
    import ray
    import ray.data as rd

    refs = graph.refs

    def _emit(batch: pa.Table) -> pa.Table:
        parts = batch.column("part").to_numpy(zero_copy_only=False)
        vid_o = []
        for p in parts:
            vid_o.append(ray.get(refs[int(p)])["vids"])
        vids = np.concatenate(vid_o) if vid_o else np.empty(0, dtype=np.uint64)
        vids = np.repeat(vids, walks_per_vertex)
        rep = np.tile(np.arange(walks_per_vertex, dtype=np.uint64), len(vids) // max(walks_per_vertex, 1))
        walk_id = _splitmix64(vids ^ _splitmix64(rep))
        return pa.table(
            {
                "walk_id": pa.array(walk_id, type=pa.uint64()),
                "cur": pa.array(vids, type=pa.uint64()),
                "seq": list_array([np.array([v], dtype=np.uint64) for v in vids], np.uint64, pa.uint64()),
                "done": pa.array(np.zeros(len(vids), dtype=bool)),
            }
        )

    parts_ds = rd.from_arrow(pa.table({"part": pa.array(graph.parts, type=pa.int64())}))
    return parts_ds.map_batches(_emit, batch_format="pyarrow", batch_size=4)


def random_walk_corpus(
    graph: ShardedGraph,
    walk_len: int = 8,
    walks_per_vertex: int = 1,
    seed: int = 7,
):
    """→ Dataset (walk_id, seq list<uint64>) of deterministic walks."""
    import ray

    refs = graph.refs
    P = graph.num_partitions

    def _step(step: int):
        def _fn(batch: pa.Table) -> pa.Table:
            wid = batch.column("walk_id").to_numpy(zero_copy_only=False).astype(np.uint64)
            cur = batch.column("cur").to_numpy(zero_copy_only=False).astype(np.uint64)
            done = batch.column("done").to_numpy(zero_copy_only=False).copy()
            seqs = list_rows(batch, "seq")
            nxt = cur.copy()
            parts = (cur % np.uint64(P)).astype(np.int64)
            for p in np.unique(parts[~done]):
                csr = ray.get(refs[int(p)])
                rows = np.flatnonzero((parts == p) & ~done)
                pos = np.searchsorted(csr["vids"], cur[rows])
                deg = csr["deg"][pos]
                alive = deg > 0
                r = _splitmix64(
                    wid[rows] ^ _splitmix64(np.full(len(rows), step, dtype=np.uint64))
                    ^ np.uint64(seed)
                )
                choice = np.zeros(len(rows), dtype=np.int64)
                choice[alive] = (r[alive] % deg[alive].astype(np.uint64)).astype(np.int64)
                starts = csr["indptr"][pos]
                sel = csr["indices"][starts[alive] + choice[alive]]
                rows_alive = rows[alive]
                nxt[rows_alive] = sel
                done[rows[~alive]] = True
            new_seqs = [
                s if done[i] else np.concatenate([s, [nxt[i]]])
                for i, s in enumerate(seqs)
            ]
            return pa.table(
                {
                    "walk_id": batch.column("walk_id"),
                    "cur": pa.array(nxt, type=pa.uint64()),
                    "seq": list_array(new_seqs, np.uint64, pa.uint64()),
                    "done": pa.array(done),
                }
            )

        return _fn

    ds = walk_seeds(graph, walks_per_vertex)
    for step in range(1, walk_len):
        ds = ds.map_batches(_step(step), batch_format="pyarrow")

    def _final(batch: pa.Table) -> pa.Table:
        return pa.table(
            {"walk_id": batch.column("walk_id"), "seq": batch.column("seq")}
        )

    return ds.map_batches(_final, batch_format="pyarrow")
