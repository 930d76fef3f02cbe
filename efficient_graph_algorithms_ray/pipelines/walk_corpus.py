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
from ..util import list_array, list_rows, parts_dataset


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

    parts_ds = parts_dataset(graph.parts)
    return parts_ds.map_batches(_emit, batch_format="pyarrow", batch_size=4)


def node2vec_walk_corpus(
    graph: ShardedGraph,
    walk_len: int = 6,
    seed: int = 7,
    w_back: int = 2,
    w_common: int = 4,
    w_far: int = 1,
):
    """node2vec biased 2nd-order walks (Grover & Leskovec, KDD 2016)
    with INTEGER transition weights (p=2, q=4 scaled by lcm 4 →
    back 2 : common 4 : far 1 by default) so the cumulative-weight
    threshold selection r = splitmix64(walk_id ⊕ mix(t) ⊕ seed) mod
    Σw is exact and SQL-replayable. Step 1 (no previous vertex) is the
    uniform DeepWalk hop.

    Same zero-shuffle shape as ``random_walk_corpus``: L map_batches,
    walks stay in their block, CSR shard reads (current AND previous
    vertex rows — the 2nd-order state needs both) follow the frontier
    via broadcast-once refs. Per-step cost is O(Σ deg(cur) +
    Σ log deg(prev)) — the membership test against N(prev) is a
    searchsorted per candidate row.

    Returns Dataset (walk_id, seq list<uint64>).
    """
    import ray

    refs = graph.refs
    P = graph.num_partitions

    def _hash_step(wid: np.ndarray, step: int) -> np.ndarray:
        return _splitmix64(
            wid ^ _splitmix64(np.full(len(wid), step, dtype=np.uint64)) ^ np.uint64(seed)
        )

    def _step(step: int):
        def _fn(batch: pa.Table) -> pa.Table:
            wid = batch.column("walk_id").to_numpy(zero_copy_only=False).astype(np.uint64)
            cur = batch.column("cur").to_numpy(zero_copy_only=False).astype(np.uint64)
            prev = batch.column("prev").to_numpy(zero_copy_only=False).astype(np.uint64)
            done = batch.column("done").to_numpy(zero_copy_only=False).copy()
            seqs = list_rows(batch, "seq")
            nxt = cur.copy()
            new_prev = prev.copy()
            parts = (cur % np.uint64(P)).astype(np.int64)
            r_all = _hash_step(wid, step)
            for p in np.unique(parts[~done]):
                csr = ray.get(refs[int(p)])
                rows = np.flatnonzero((parts == p) & ~done)
                pos = np.searchsorted(csr["vids"], cur[rows])
                deg = csr["deg"][pos]
                starts = csr["indptr"][pos]
                # previous-vertex adjacency rows, grouped by their shard
                pparts = (prev[rows] % np.uint64(P)).astype(np.int64)
                pcsr = {int(q): ray.get(refs[int(q)]) for q in np.unique(pparts)}
                for j, i in enumerate(rows):
                    d = int(deg[j])
                    if d == 0:
                        done[i] = True
                        continue
                    cand = csr["indices"][starts[j] : starts[j] + d]
                    if step == 1:
                        choice = int(r_all[i] % np.uint64(d))
                    else:
                        pc = pcsr[int(pparts[j])]
                        ppos = int(np.searchsorted(pc["vids"], prev[i]))
                        prow = pc["indices"][
                            pc["indptr"][ppos] : pc["indptr"][ppos + 1]
                        ]
                        wts = np.full(d, w_far, dtype=np.int64)
                        mpos = np.searchsorted(prow, cand)
                        ok = mpos < len(prow)
                        member = np.zeros(d, dtype=bool)
                        member[ok] = prow[mpos[ok]] == cand[ok]
                        wts[member] = w_common
                        wts[cand == prev[i]] = w_back
                        cw = np.cumsum(wts)
                        r = int(r_all[i] % np.uint64(cw[-1]))
                        choice = int(np.searchsorted(cw, r, side="right"))
                    new_prev[i] = cur[i]
                    nxt[i] = cand[choice]
            new_seqs = [
                s if done[i] else np.concatenate([s, [nxt[i]]])
                for i, s in enumerate(seqs)
            ]
            return pa.table(
                {
                    "walk_id": batch.column("walk_id"),
                    "prev": pa.array(new_prev, type=pa.uint64()),
                    "cur": pa.array(nxt, type=pa.uint64()),
                    "seq": list_array(new_seqs, np.uint64, pa.uint64()),
                    "done": pa.array(done),
                }
            )

        return _fn

    def _with_prev(batch: pa.Table) -> pa.Table:
        return batch.append_column("prev", batch.column("cur"))

    ds = walk_seeds(graph, 1).map_batches(_with_prev, batch_format="pyarrow")
    for step in range(1, walk_len):
        ds = ds.map_batches(_step(step), batch_format="pyarrow")

    def _final(batch: pa.Table) -> pa.Table:
        return pa.table(
            {"walk_id": batch.column("walk_id"), "seq": batch.column("seq")}
        )

    return ds.map_batches(_final, batch_format="pyarrow")


def skipgram_pairs(walks_ds, window: int = 2):
    """Walk sequences → aggregated skip-gram training pairs
    (center, context, n): every ordered pair at distance ≤ ``window``
    inside a walk (the word2vec/DeepWalk training-set construction —
    Mikolov et al. 2013 §3; Perozzi et al. 2014 §4.2).

    One vectorized pass per batch builds all offset-shifted column
    pairs at once and pre-aggregates (Arrow group_by) before the single
    combiner-backed global ``groupby(center, context).sum`` — the
    shuffle carries one row per distinct pair per batch, which is what
    bounds the hot-pair skew (hub vertices appear in millions of
    walks)."""
    from ray.data.aggregate import Sum

    def _pairs(batch: pa.Table) -> pa.Table:
        seqs = list_rows(batch, "seq")
        cs, xs = [], []
        for s in seqs:
            L = len(s)
            for off in range(1, min(window, L - 1) + 1):
                cs.append(s[:-off])
                xs.append(s[off:])
                cs.append(s[off:])
                xs.append(s[:-off])
        if not cs:
            return pa.table(
                {
                    "center": pa.array([], type=pa.int64()),
                    "context": pa.array([], type=pa.int64()),
                    "n": pa.array([], type=pa.int64()),
                }
            )
        c = np.concatenate(cs).astype(np.int64)
        x = np.concatenate(xs).astype(np.int64)
        raw = pa.table(
            {
                "center": pa.array(c, type=pa.int64()),
                "context": pa.array(x, type=pa.int64()),
                "one": pa.array(np.ones(len(c), dtype=np.int64)),
            }
        )
        agg = raw.group_by(["center", "context"]).aggregate([("one", "sum")])
        return agg.rename_columns(["center", "context", "n"])

    return (
        walks_ds.map_batches(_pairs, batch_format="pyarrow")
        .groupby(["center", "context"])
        .aggregate(Sum("n", alias_name="n"))
    )


def weighted_walk_corpus(graph: ShardedGraph, walk_len: int = 6, seed: int = 7):
    """Edge-weight-proportional random walks (weighted DeepWalk): hop
    t leaves v through edge e with probability w(e)/Σw — selected by
    the exact integer threshold r = splitmix64(walk_id ⊕ mix(t) ⊕
    seed) mod Σw against the cumulative weights in CSR (neighbor-id)
    order. Weights are the integer co-occurrence multiplicities and the
    running total is an int64 cumsum — exact to 2^63 at any block size,
    so the selection is SQL-replayable and blocking-independent.

    Same zero-shuffle L-step shape as ``random_walk_corpus``.
    Returns Dataset (walk_id, seq list<uint64>)."""
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
            r_all = _splitmix64(
                wid ^ _splitmix64(np.full(len(wid), step, dtype=np.uint64))
                ^ np.uint64(seed)
            )
            for p in np.unique(parts[~done]):
                csr = ray.get(refs[int(p)])
                w = csr["weights"]
                rows = np.flatnonzero((parts == p) & ~done)
                pos = np.searchsorted(csr["vids"], cur[rows])
                deg = csr["deg"][pos]
                starts = csr["indptr"][pos]
                alive = deg > 0
                done[rows[~alive]] = True
                rows_a = rows[alive]
                if not len(rows_a):
                    continue
                # Vectorized threshold selection over CONCATENATED
                # neighbor segments. Weights are integer multiplicities,
                # so the running total is an INT64 cumsum — exact up to
                # 2^63 regardless of block size (a float64 cumsum would
                # silently need the block-wide total < 2^53, a much
                # tighter bound than the per-row formulation; ADVICE
                # r4). Choice j = #(cum ≤ r) within the row's segment
                # becomes #(tot ≤ base + r) − off on the concatenation.
                lens = deg[alive].astype(np.int64)
                off = np.concatenate(([0], np.cumsum(lens)[:-1]))
                seg = np.repeat(np.arange(len(lens)), lens)
                gidx = np.repeat(starts[alive], lens) + (
                    np.arange(int(lens.sum()), dtype=np.int64) - off[seg]
                )
                tot = np.cumsum(w[gidx].astype(np.int64, copy=False))
                base = np.where(off > 0, tot[np.maximum(off - 1, 0)], 0)
                seg_sum = tot[off + lens - 1] - base  # exact int64
                r = (r_all[rows_a] % seg_sum.astype(np.uint64)).astype(np.int64)
                loc = np.searchsorted(tot, base + r, side="right")
                nxt[rows_a] = csr["indices"][gidx[loc]]
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

    ds = walk_seeds(graph, 1)
    for step in range(1, walk_len):
        ds = ds.map_batches(_step(step), batch_format="pyarrow")

    def _final(batch: pa.Table) -> pa.Table:
        return pa.table(
            {"walk_id": batch.column("walk_id"), "seq": batch.column("seq")}
        )

    return ds.map_batches(_final, batch_format="pyarrow")


def negative_sample_table(graph: ShardedGraph, m: int = 1024, seed: int = 13):
    """Degree-proportional negative-sampling table for skip-gram
    training (the word2vec negatives step — Mikolov et al. 2013 §2.2,
    with degree standing in for the f^0.75 unigram power so every
    threshold is an exact integer). Draw i selects the vertex owning
    position splitmix64(i ⊕ seed) mod Σdeg in the global
    cumulative-degree order (shards in part order, vids ascending
    within a shard) — the exact multinomial-by-degree sample,
    deterministic at any parallelism.

    Two passes: (1) per-shard degree totals (P tiny rows to the
    driver) → exclusive shard offsets broadcast back; (2) each shard
    task regenerates the m draw positions (m is small — the table is
    a training-time constant), keeps those landing in its range and
    binary-searches its local cumulative-degree array. No shuffle.

    Returns Dataset (i, vid).
    """
    import ray
    import ray.data as rd

    refs = graph.refs
    parts = sorted(graph.parts)

    def _totals(batch: pa.Table) -> pa.Table:
        ps = batch.column("part").to_numpy(zero_copy_only=False)
        out = []
        for p in ps:
            out.append(int(ray.get(refs[int(p)])["deg"].astype(object).sum()))
        return pa.table(
            {
                "part": batch.column("part"),
                "total": pa.array(np.array(out, dtype=np.int64)),
            }
        )

    parts_ds = parts_dataset(parts)
    tot_tbl = pa.concat_tables(
        parts_ds.map_batches(_totals, batch_format="pyarrow").iter_batches(
            batch_size=None, batch_format="pyarrow"
        )
    )
    tp = tot_tbl.column("part").to_numpy(zero_copy_only=False)
    tv = tot_tbl.column("total").to_numpy(zero_copy_only=False)
    order = np.argsort(tp)
    tp, tv = tp[order], tv[order]
    offsets = np.concatenate(([0], np.cumsum(tv)[:-1]))
    grand = int(tv.sum())
    off_map = {int(p): (int(o), int(t)) for p, o, t in zip(tp, offsets, tv)}

    def _draws(batch: pa.Table) -> pa.Table:
        ps = batch.column("part").to_numpy(zero_copy_only=False)
        ii = np.arange(m, dtype=np.uint64)
        r = (_splitmix64(ii ^ np.uint64(seed)) % np.uint64(grand)).astype(np.int64)
        out_i, out_v = [], []
        for p in ps:
            off, tot = off_map[int(p)]
            sel = np.flatnonzero((r >= off) & (r < off + tot))
            if len(sel) == 0:
                continue
            csr = ray.get(refs[int(p)])
            cum = np.cumsum(csr["deg"].astype(np.int64))
            pos = np.searchsorted(cum, r[sel] - off, side="right")
            out_i.append(sel.astype(np.int64))
            out_v.append(csr["vids"][pos].astype(np.int64))
        if not out_i:
            return pa.table(
                {
                    "i": pa.array([], type=pa.int64()),
                    "vid": pa.array([], type=pa.int64()),
                }
            )
        return pa.table(
            {
                "i": pa.array(np.concatenate(out_i), type=pa.int64()),
                "vid": pa.array(np.concatenate(out_v), type=pa.int64()),
            }
        )

    return parts_ds.map_batches(_draws, batch_format="pyarrow", batch_size=1)


def khop_neighbor_sample(graph: ShardedGraph, seed_vids, fanouts=(3, 2), seed: int = 7):
    """Deterministic GraphSAGE-style fanout sampling (Hamilton et al.,
    NeurIPS 2017): per root and hop h, each frontier vertex keeps its
    ``fanouts[h-1]`` neighbors of smallest rank, rank =
    splitmix64(root ⊕ splitmix64(v ⊕ splitmix64(nbr ⊕ (seed + hop))))
    with the neighbor id as tie-break — reproducible at any
    parallelism, SQL-replayable (the oracle replays the identical
    chain with ROW_NUMBER). The frontier advances on DISTINCT
    (root, vertex) pairs; revisits across hops resample (standard
    GraphSAGE; no visited-set).

    Scale shape: per hop ONE map_batches over the frontier (shard
    reads follow the frontier — broadcast-once refs, no shuffle) plus
    one distinct groupby on the tiny next-frontier. Cost per frontier
    row is O(deg(v)) — the hash scan over the adjacency slice, the
    same bound every neighbor sampler pays.

    Returns Dataset (root, hop, src, dst) — the sampled fanout forest.
    """
    import ray
    import ray.data as rd

    refs = graph.refs
    P = graph.num_partitions
    seeds = np.unique(np.asarray(seed_vids, dtype=np.uint64))
    frontier = rd.from_arrow(
        pa.table(
            {
                "root": pa.array(seeds, type=pa.uint64()),
                "v": pa.array(seeds, type=pa.uint64()),
            }
        )
    )
    # from_arrow yields ONE block = one task; spread the seed frontier
    # so hop-1 expansion fans out (later hops inherit groupby blocks)
    frontier = frontier.repartition(max(1, min(len(seeds), P)))
    out_parts = []
    for hop, fan in enumerate(fanouts, start=1):

        def _expand(batch: pa.Table, hop=hop, fan=fan) -> pa.Table:
            root = batch.column("root").to_numpy(zero_copy_only=False).astype(np.uint64)
            v = batch.column("v").to_numpy(zero_copy_only=False).astype(np.uint64)
            parts = (v % np.uint64(P)).astype(np.int64)
            o_root, o_src, o_dst = [], [], []
            for p in np.unique(parts):
                csr = ray.get(refs[int(p)])
                rows = np.flatnonzero(parts == p)
                pos = np.searchsorted(csr["vids"], v[rows])
                deg = (csr["indptr"][pos + 1] - csr["indptr"][pos]).astype(np.int64)
                alive = deg > 0
                if not alive.any():
                    continue
                rows_a, pos_a, lens = rows[alive], pos[alive], deg[alive]
                # vectorized per-segment top-fan by (rank, neighbor id):
                # one concatenated lexsort keyed (segment, h, nbr) — the
                # within-segment order equals the old per-row
                # np.lexsort((nbrs, h)), so the selected sets are identical
                off = np.concatenate(([0], np.cumsum(lens)[:-1]))
                L = int(lens.sum())
                seg = np.repeat(np.arange(len(lens)), lens)
                gidx = np.repeat(csr["indptr"][pos_a], lens) + (
                    np.arange(L, dtype=np.int64) - off[seg]
                )
                nbrs_c = csr["indices"][gidx]
                h_c = _splitmix64(
                    np.repeat(root[rows_a], lens)
                    ^ _splitmix64(
                        np.repeat(v[rows_a], lens)
                        ^ _splitmix64(
                            nbrs_c ^ np.uint64((seed + hop) & 0xFFFFFFFFFFFFFFFF)
                        )
                    )
                )
                order = np.lexsort((nbrs_c, h_c, seg))
                within = np.arange(L, dtype=np.int64) - off[seg[order]]
                keep = order[within < fan]
                o_root.append(np.repeat(root[rows_a], np.minimum(lens, fan)))
                o_src.append(np.repeat(v[rows_a], np.minimum(lens, fan)))
                o_dst.append(nbrs_c[keep])
            root_a = np.concatenate(o_root) if o_root else np.empty(0, np.uint64)
            src_a = np.concatenate(o_src) if o_src else np.empty(0, np.uint64)
            dst_a = np.concatenate(o_dst) if o_dst else np.empty(0, np.uint64)
            return pa.table(
                {
                    "root": pa.array(root_a, type=pa.uint64()),
                    "hop": pa.array(
                        np.full(len(root_a), hop, dtype=np.int64), type=pa.int64()
                    ),
                    "src": pa.array(src_a, type=pa.uint64()),
                    "dst": pa.array(dst_a, type=pa.uint64()),
                }
            )

        edges_h = frontier.map_batches(_expand, batch_format="pyarrow").materialize()
        out_parts.append(edges_h)
        if hop < len(fanouts):
            # distinct (root, dst) → next frontier; group keys as the
            # int64 reinterpretation (uint64 keys past 2^63 hit Ray's
            # pickled-object sort fallback — the content_hash note)
            def _keys(b: pa.Table) -> pa.Table:
                r = b.column("root").to_numpy(zero_copy_only=False).astype(np.uint64)
                d = b.column("dst").to_numpy(zero_copy_only=False).astype(np.uint64)
                return pa.table(
                    {
                        "rk": pa.array(r.view(np.int64), type=pa.int64()),
                        "dk": pa.array(d.view(np.int64), type=pa.int64()),
                    }
                )

            def _next(g: pa.Table) -> pa.Table:
                r = g.column("rk").to_numpy(zero_copy_only=False)[:1].astype(np.int64)
                d = g.column("dk").to_numpy(zero_copy_only=False)[:1].astype(np.int64)
                return pa.table(
                    {
                        "root": pa.array(r.view(np.uint64), type=pa.uint64()),
                        "v": pa.array(d.view(np.uint64), type=pa.uint64()),
                    }
                )

            frontier = (
                edges_h.map_batches(_keys, batch_format="pyarrow")
                .groupby(["rk", "dk"])
                .map_groups(_next, batch_format="pyarrow")
            )
    out = out_parts[0]
    for ds in out_parts[1:]:
        out = out.union(ds)
    return out


def choose_walk_plan(
    *,
    n_walks: int,
    walk_len: int,
    graph_bytes: int,
    num_partitions: int,
    n_nodes: int,
    n_walk_blocks: int | None = None,
) -> bool:
    """Plan selector for ``random_walk_corpus`` (True = frontier
    shuffle), from the quantity each plan actually moves per step:

    - zero-shuffle: every walk block's task fetches the CSR shards its
      frontier touches. After a couple of steps frontiers mix across
      all P partitions, so a block touches min(P, walks_in_block)
      shards; the REMOTE fraction of those fetches ((n_nodes−1)/
      n_nodes — plasma reads on the owning node are zero-copy) is the
      traffic: B · min(P, ⌈W/B⌉) · (graph_bytes/P) · (n−1)/n.
    - frontier shuffle: the walk STATE crosses the wire instead —
      ~(walk_len+3)·8 bytes per walk per step, all-to-all.

    Single-node every fetch is a zero-copy plasma read, so the
    zero-shuffle plan is always chosen (measured 0.11 s vs 0.70 s on
    the sf0.01 co-occurrence fixture — per-step shuffle latency
    dominates when nothing crosses a NIC). Multi-node the shuffle wins
    as soon as replicated shard fetches outweigh walk state — with the
    default block count that is any graph larger than ~walk-state
    size; the measured traffic crossover on the sf0.01 fixture is in
    BASELINE.md (round 5).
    """
    if n_nodes <= 1:
        return False
    B = n_walk_blocks if n_walk_blocks else max(1, num_partitions)
    per_block = max(1, -(-n_walks // B))
    shard_bytes = graph_bytes / max(1, num_partitions)
    remote_frac = (n_nodes - 1) / n_nodes
    fetch_bytes = B * min(num_partitions, per_block) * shard_bytes * remote_frac
    state_bytes = float(n_walks) * (walk_len + 3) * 8
    return fetch_bytes > state_bytes


def _graph_bytes_estimate(graph: ShardedGraph) -> int:
    """CSR shard footprint: ~16 B/edge (indices + weights) + 24 B/vertex
    (vids, indptr, deg)."""
    return int(16 * graph.n_edges + 24 * graph.n_vertices)


def random_walk_corpus(
    graph: ShardedGraph,
    walk_len: int = 8,
    walks_per_vertex: int = 1,
    seed: int = 7,
    frontier_shuffle: bool | None = None,
):
    """→ Dataset (walk_id, seq list<uint64>) of deterministic walks.

    Two execution plans, bit-identical output (the next hop is a pure
    function of (walk_id, step, seed, cur, CSR row) — tested in
    tests/test_walk_corpus.py):

    ``frontier_shuffle=None`` auto-selects via ``choose_walk_plan``
    (single-node → zero-shuffle; multi-node → shuffle once replicated
    shard fetches outweigh walk state); GRAFT_WALK_SHUFFLE=0/1 still
    overrides explicitly.

    - zero-shuffle (``frontier_shuffle=False``): walks stay
      in their block and each step's task ``ray.get``s whichever CSR
      shards its walks' frontiers touch. Single-node this is the
      optimum (every get is a zero-copy plasma read; measured: the
      sf0.01 co-occurrence corpus, 8 steps, 16 cpus — 0.11 s).
      Multi-node it degrades: walks mix across partitions within a
      few steps, so each task pulls up to P remote shards per step —
      per-step network cost O(min(P, walks/task) · shard_bytes)
      instead of O(walk state).
    - ``frontier_shuffle=True`` (or env GRAFT_WALK_SHUFFLE=1): each
      step co-shuffles walks to their frontier vertex's partition
      (bucket = cur % P) and each reduce group reads exactly ONE
      shard. L steps = L shuffles of the walk STATE (~(L+3)·8 bytes a
      walk) — the scale-safe plan when shards outweigh walk state,
      i.e. on any real multi-node corpus. Measured single-node on the
      same fixture: 0.70 s (per-step shuffle latency dominates at this
      size), which is why the zero-shuffle plan stays the default in
      local mode.
    """
    import os

    import ray

    if frontier_shuffle is None:
        env = os.environ.get("GRAFT_WALK_SHUFFLE")
        if env is not None:  # explicit override keeps working
            frontier_shuffle = env == "1"
        else:
            try:
                n_nodes = sum(1 for n in ray.nodes() if n.get("Alive", False))
            except Exception:  # not initialized yet → local semantics
                n_nodes = 1
            frontier_shuffle = choose_walk_plan(
                n_walks=graph.n_vertices * walks_per_vertex,
                walk_len=walk_len,
                graph_bytes=_graph_bytes_estimate(graph),
                num_partitions=graph.num_partitions,
                n_nodes=n_nodes,
            )

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

    def _bucket(batch: pa.Table) -> pa.Table:
        cur = batch.column("cur").to_numpy(zero_copy_only=False).astype(np.uint64)
        return batch.append_column(
            "bucket", pa.array((cur % np.uint64(P)).astype(np.int64), type=pa.int64())
        )

    def _advance(step: int):
        """Frontier-owner reduce step: every row's cur is in THIS
        bucket's partition — one shard read, fully vectorized, same
        per-row arithmetic as ``_step``."""

        def _fn(group: pa.Table) -> pa.Table:
            p = int(group.column("bucket")[0].as_py())
            wid = group.column("walk_id").to_numpy(zero_copy_only=False).astype(np.uint64)
            cur = group.column("cur").to_numpy(zero_copy_only=False).astype(np.uint64)
            done = group.column("done").to_numpy(zero_copy_only=False).copy()
            seqs = list_rows(group, "seq")
            nxt = cur.copy()
            csr = ray.get(refs[p])
            rows = np.flatnonzero(~done)
            if len(rows):
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
                nxt[rows[alive]] = csr["indices"][starts[alive] + choice[alive]]
                done[rows[~alive]] = True
            new_seqs = [
                s if done[i] else np.concatenate([s, [nxt[i]]])
                for i, s in enumerate(seqs)
            ]
            return pa.table(
                {
                    "walk_id": pa.array(wid, type=pa.uint64()),
                    "cur": pa.array(nxt, type=pa.uint64()),
                    "seq": list_array(new_seqs, np.uint64, pa.uint64()),
                    "done": pa.array(done),
                }
            )

        return _fn

    ds = walk_seeds(graph, walks_per_vertex)
    for step in range(1, walk_len):
        if frontier_shuffle:
            ds = (
                ds.map_batches(_bucket, batch_format="pyarrow")
                .groupby("bucket")
                .map_groups(_advance(step), batch_format="pyarrow")
            )
        else:
            ds = ds.map_batches(_step(step), batch_format="pyarrow")

    def _final(batch: pa.Table) -> pa.Table:
        return pa.table(
            {"walk_id": batch.column("walk_id"), "seq": batch.column("seq")}
        )

    return ds.map_batches(_final, batch_format="pyarrow")
