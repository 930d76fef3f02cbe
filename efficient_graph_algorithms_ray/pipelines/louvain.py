"""One-level parallel Louvain: synchronous greedy modularity moves.

Public algorithm: the local-move phase of Blondel et al. 2008 ("Fast
unfolding of communities in large networks"), run SYNCHRONOUSLY for a
fixed number of rounds — every vertex evaluates its neighbors'
communities against the PREVIOUS round's assignment and moves to the
one with the best modularity gain. Reference analogue: the
community-assignment surface ``node_cluster_assignment`` /
``graph_partition`` (/root/reference/src/ega/algorithms/
gromov_wasserstein_graphs.py:867-957) — vertices assigned to the
cluster that maximizes a per-vertex score.

Exact integer scores (the SQL-parity trick): comparing the modularity
gain of moving v from its community A to a neighbor community C only
needs the C-dependent part — with unit weights and m2 = 2m = Σdeg,

    s(C)    = m2·k_{v,C} − deg(v)·tot(C)            (v ∉ C)
    s_stay  = m2·k_{v,A} − deg(v)·(tot(A) − deg(v))  (v ∈ A)

where k_{v,C} = #edges v→C and tot(C) = Σ deg over C's members. v
moves to argmax_C s(C) (tie → smallest C) iff max_C s(C) > s_stay.
All quantities are exact int64 — no floats anywhere, so the unrolled
DuckDB oracle replays every round bit-for-bit.

Distribution: each round is a fixed chain of hash-partitioned
co-shuffles (tagged-union ``groupby(part).map_groups`` — the repo's
standard join idiom; no broadcast, no driver state beyond the m2
scalar):

  1. tot:   ``groupby(lab).sum(deg)`` over the (vid, lab, deg) state
  2. k:     edges co-shuffled with the state by DESTINATION vertex →
            (u, c, k) neighbor-community counts, pre-aggregated
            per group before the combiner-backed ``groupby(u, c)``
  3. attach tot to k rows (by c) and to state rows (by lab)
  4. decide: candidates co-shuffled with the state by u; pure numpy
            argmax with deterministic tie-breaks

Rounds are fixed (synchronous Louvain converges most of the way in
2-3 rounds on modular graphs; label oscillation between symmetric
singletons cannot run away because the round count is bounded and
deterministic). Skew: a hub vertex's candidate rows are ≤ its number
of DISTINCT neighbor communities, which only shrinks as rounds
coarsen; the groupbys hash-partition on (u, c).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa


def _both_dirs(batch: pa.Table) -> pa.Table:
    u = batch.column("u").to_numpy(zero_copy_only=False)
    v = batch.column("v").to_numpy(zero_copy_only=False)
    return pa.table(
        {
            "u": pa.array(np.concatenate([u, v]), type=pa.uint64()),
            "v": pa.array(np.concatenate([v, u]), type=pa.uint64()),
        }
    )


def _attach_tot(rows_ds, key_col: str, tot_ds, P: int):
    """Co-shuffle join: add ``tot`` to ``rows_ds`` by matching
    rows_ds[key_col] against tot_ds.lab. rows_ds columns are kept;
    every row's key MUST have a tot entry (labels always do)."""

    cols = [c for c in rows_ds.schema().names]

    def _tag_rows(b: pa.Table) -> pa.Table:
        key = b.column(key_col).to_numpy(zero_copy_only=False).astype(np.uint64)
        out = {"part": pa.array((key % np.uint64(P)).astype(np.int64))}
        out["tag"] = pa.array(np.zeros(len(b), dtype=np.int64))
        for c in cols:
            out[c] = b.column(c)
        out["tot"] = pa.array(np.zeros(len(b), dtype=np.int64))
        return pa.table(out)

    def _tag_tot(b: pa.Table) -> pa.Table:
        lab = b.column("lab").to_numpy(zero_copy_only=False).astype(np.uint64)
        out = {"part": pa.array((lab % np.uint64(P)).astype(np.int64))}
        out["tag"] = pa.array(np.ones(len(b), dtype=np.int64))
        for c in cols:
            if c == key_col:
                out[c] = pa.array(lab, type=pa.uint64())
            else:
                f = rows_ds.schema().base_schema.field(c)
                out[c] = pa.array(np.zeros(len(b), dtype=np.int64), type=f.type)
        out["tot"] = b.column("tot")
        return pa.table(out)

    def _merge(g: pa.Table) -> pa.Table:
        tag = g.column("tag").to_numpy(zero_copy_only=False)
        key = g.column(key_col).to_numpy(zero_copy_only=False).astype(np.uint64)
        tot = g.column("tot").to_numpy(zero_copy_only=False)
        is_tot = tag == 1
        tl = key[is_tot]
        tv = tot[is_tot]
        order = np.argsort(tl, kind="stable")
        tl, tv = tl[order], tv[order]
        left = ~is_tot
        pos = np.searchsorted(tl, key[left])
        pos = np.clip(pos, 0, max(len(tl) - 1, 0))
        got = tv[pos] if len(tl) else np.zeros(int(left.sum()), dtype=np.int64)
        out = {c: g.column(c).filter(pa.array(left)) for c in cols}
        out["tot"] = pa.array(got.astype(np.int64), type=pa.int64())
        return pa.table(out)

    import ray.data as rd

    both = rows_ds.map_batches(_tag_rows, batch_format="pyarrow").union(
        tot_ds.map_batches(_tag_tot, batch_format="pyarrow")
    )
    return both.groupby("part").map_groups(_merge, batch_format="pyarrow")


def louvain_moves(edges_uv, *, rounds: int = 2, num_partitions: int = 32):
    """edges_uv: Dataset of DISTINCT undirected pairs (u, v), one row
    per pair (any orientation). Returns Dataset (vid, community) after
    ``rounds`` synchronous greedy rounds from singleton init."""
    state, _, _ = louvain_state(edges_uv, rounds=rounds, num_partitions=num_partitions)

    def _shape(b: pa.Table) -> pa.Table:
        return pa.table(
            {
                "vid": pa.array(
                    b.column("vid").to_numpy(zero_copy_only=False).astype(np.int64),
                    type=pa.int64(),
                ),
                "community": pa.array(
                    b.column("lab").to_numpy(zero_copy_only=False).astype(np.int64),
                    type=pa.int64(),
                ),
            }
        )

    return state.map_batches(_shape, batch_format="pyarrow")


def louvain_modularity(edges_uv, *, rounds: int = 2, num_partitions: int = 32):
    """Newman modularity of the ``rounds``-round Louvain communities
    with exact integer numerators: Q = (m2·A − B)/m2² where A = intra
    directed-slot count, B = Σ_c tot_c², m2 = Σ deg — one IEEE
    division. A comes from the same neighbor-community counts the move
    rounds use (Σ k(v, lab(v))); B from one ``groupby(lab).sum``.
    Returns a 1-row table (n_communities, intra_slots, sq_tot, q)."""
    from ray.data.aggregate import Count, Sum

    P = num_partitions
    state, both, m2 = louvain_state(
        edges_uv, rounds=rounds, num_partitions=num_partitions
    )
    tot = state.groupby("lab").aggregate(Sum("deg", alias_name="tot"))

    def _sq(b: pa.Table) -> pa.Table:
        t = b.column("tot").to_numpy(zero_copy_only=False)
        return pa.table(
            {
                "b": pa.array([int((t.astype(object) ** 2).sum())], type=pa.int64()),
                "nc": pa.array([len(t)], type=pa.int64()),
            }
        )

    agg = tot.map_batches(_sq, batch_format="pyarrow").aggregate(
        Sum("b", alias_name="b"), Sum("nc", alias_name="nc")
    )
    B, nc = int(agg["b"]), int(agg["nc"])

    k = _neighbor_counts(both, state, P)

    # intra slots: Σ k(v, lab(v)) — co-shuffle k rows with the state by
    # vertex and keep the own-community row per vertex
    def _tag_state(b: pa.Table) -> pa.Table:
        vid = b.column("vid").to_numpy(zero_copy_only=False).astype(np.uint64)
        return pa.table(
            {
                "part": pa.array((vid % np.uint64(P)).astype(np.int64)),
                "tag": pa.array(np.zeros(len(b), dtype=np.int64)),
                "key": pa.array(vid, type=pa.uint64()),
                "c": b.column("lab"),
                "k": pa.array(np.zeros(len(b), dtype=np.int64)),
            }
        )

    def _tag_k(b: pa.Table) -> pa.Table:
        u = b.column("u").to_numpy(zero_copy_only=False).astype(np.uint64)
        return pa.table(
            {
                "part": pa.array((u % np.uint64(P)).astype(np.int64)),
                "tag": pa.array(np.ones(len(b), dtype=np.int64)),
                "key": pa.array(u, type=pa.uint64()),
                "c": b.column("c"),
                "k": b.column("k"),
            }
        )

    def _own_sum(g: pa.Table) -> pa.Table:
        tag = g.column("tag").to_numpy(zero_copy_only=False)
        key = g.column("key").to_numpy(zero_copy_only=False).astype(np.uint64)
        c = g.column("c").to_numpy(zero_copy_only=False).astype(np.uint64)
        kk = g.column("k").to_numpy(zero_copy_only=False)
        is_state = tag == 0
        sv, sl = key[is_state], c[is_state]
        order = np.argsort(sv, kind="stable")
        sv, sl = sv[order], sl[order]
        ku, kc, kn = key[~is_state], c[~is_state], kk[~is_state]
        if len(ku) == 0 or len(sv) == 0:
            return pa.table({"a": pa.array([0], type=pa.int64())})
        pos = np.searchsorted(sv, ku)
        own = sl[pos] == kc
        return pa.table({"a": pa.array([int(kn[own].sum())], type=pa.int64())})

    from ray.data.aggregate import Sum as _Sum

    merged = state.map_batches(_tag_state, batch_format="pyarrow").union(
        k.map_batches(_tag_k, batch_format="pyarrow")
    )
    a_agg = (
        merged.groupby("part")
        .map_groups(_own_sum, batch_format="pyarrow")
        .aggregate(_Sum("a", alias_name="a"))
    )
    A = int(a_agg["a"])
    return pa.table(
        {
            "n_communities": pa.array([nc], type=pa.int64()),
            "intra_slots": pa.array([A], type=pa.int64()),
            "sq_tot": pa.array([B], type=pa.int64()),
            "q": pa.array([(m2 * A - B) / (m2 * m2)], type=pa.float64()),
        }
    )


def louvain_quotient(edges_uv, *, rounds: int = 2, num_partitions: int = 32):
    """Community-contraction (quotient) graph after the move rounds —
    the input to Louvain's next level and the standard graph-summary
    artifact: one row per ORDERED community pair (cu, cv) with w = the
    number of directed und slots between them (cu = cv rows carry the
    doubled intra-community count).

    Plan: reuse the per-vertex neighbor-community counts k(u, c) the
    move rounds already compute (edges co-shuffled with labels once),
    then ONE more vid-hash co-shuffle attaches lab(u) and
    pre-aggregates (lab(u), c) per partition before the tiny global
    groupby — the edge table is never re-shuffled."""
    from ray.data.aggregate import Sum

    P = num_partitions
    state, both, _ = louvain_state(edges_uv, rounds=rounds, num_partitions=P)
    k = _neighbor_counts(both, state, P)

    def _tag_state(b: pa.Table) -> pa.Table:
        vid = b.column("vid").to_numpy(zero_copy_only=False).astype(np.uint64)
        return pa.table(
            {
                "part": pa.array((vid % np.uint64(P)).astype(np.int64)),
                "tag": pa.array(np.zeros(len(b), dtype=np.int64)),
                "key": pa.array(vid, type=pa.uint64()),
                "c": b.column("lab"),
                "k": pa.array(np.zeros(len(b), dtype=np.int64)),
            }
        )

    def _tag_k(b: pa.Table) -> pa.Table:
        u = b.column("u").to_numpy(zero_copy_only=False).astype(np.uint64)
        return pa.table(
            {
                "part": pa.array((u % np.uint64(P)).astype(np.int64)),
                "tag": pa.array(np.ones(len(b), dtype=np.int64)),
                "key": pa.array(u, type=pa.uint64()),
                "c": b.column("c"),
                "k": b.column("k"),
            }
        )

    def _quot(g: pa.Table) -> pa.Table:
        tag = g.column("tag").to_numpy(zero_copy_only=False)
        key = g.column("key").to_numpy(zero_copy_only=False).astype(np.uint64)
        c = g.column("c").to_numpy(zero_copy_only=False).astype(np.uint64)
        kk = g.column("k").to_numpy(zero_copy_only=False)
        is_state = tag == 0
        sv, sl = key[is_state], c[is_state]
        order = np.argsort(sv, kind="stable")
        sv, sl = sv[order], sl[order]
        ku, kc, kn = key[~is_state], c[~is_state], kk[~is_state]
        if len(ku) == 0 or len(sv) == 0:
            return pa.table(
                {
                    "cu": pa.array([], type=pa.int64()),
                    "cv": pa.array([], type=pa.int64()),
                    "w": pa.array([], type=pa.int64()),
                }
            )
        cu = sl[np.searchsorted(sv, ku)]
        order = np.lexsort((kc, cu))
        cu, kc, kn = cu[order], kc[order], kn[order]
        new = np.concatenate(([True], (cu[1:] != cu[:-1]) | (kc[1:] != kc[:-1])))
        gid = np.cumsum(new) - 1
        w = np.bincount(gid, weights=kn).astype(np.int64)
        return pa.table(
            {
                "cu": pa.array(cu[new].astype(np.int64), type=pa.int64()),
                "cv": pa.array(kc[new].astype(np.int64), type=pa.int64()),
                "w": pa.array(w, type=pa.int64()),
            }
        )

    merged = state.map_batches(_tag_state, batch_format="pyarrow").union(
        k.map_batches(_tag_k, batch_format="pyarrow")
    )
    return (
        merged.groupby("part")
        .map_groups(_quot, batch_format="pyarrow")
        .groupby(["cu", "cv"])
        .aggregate(Sum("w", alias_name="w"))
    )


def louvain_state(edges_uv, *, rounds: int = 2, num_partitions: int = 32):
    """Run the move rounds; returns (state Dataset (vid, lab, deg),
    both-directions edge Dataset, m2 = Σ deg)."""
    from ray.data.aggregate import Count, Sum

    P = num_partitions
    both = edges_uv.map_batches(_both_dirs, batch_format="pyarrow").materialize()
    m2 = int(both.count())
    deg = both.groupby("u").aggregate(Count(alias_name="deg"))

    def _init(b: pa.Table) -> pa.Table:
        return pa.table(
            {
                "vid": b.column("u"),
                "lab": b.column("u"),
                "deg": pa.array(
                    b.column("deg").to_numpy(zero_copy_only=False).astype(np.int64),
                    type=pa.int64(),
                ),
            }
        )

    state = deg.map_batches(_init, batch_format="pyarrow").materialize()

    for _ in range(rounds):
        tot = state.groupby("lab").aggregate(Sum("deg", alias_name="tot"))
        state_t = _attach_tot(state, "lab", tot, P).materialize()
        k = _neighbor_counts(both, state, P)
        k_t = _attach_tot(k, "c", tot, P)
        state = _decide(k_t, state_t, m2, P).materialize()

    return state, both, m2


def _neighbor_counts(both, state, P: int):
    """(u, c, k): edges v-side co-shuffled with (vid → lab); per-group
    (u, lab(v)) counts pre-aggregate before the global groupby."""
    from ray.data.aggregate import Sum

    def _tag_state(b: pa.Table) -> pa.Table:
        vid = b.column("vid").to_numpy(zero_copy_only=False).astype(np.uint64)
        return pa.table(
            {
                "part": pa.array((vid % np.uint64(P)).astype(np.int64)),
                "tag": pa.array(np.zeros(len(b), dtype=np.int64)),
                "v": pa.array(vid, type=pa.uint64()),
                "u": pa.array(np.zeros(len(b), dtype=np.uint64), type=pa.uint64()),
                "lab": b.column("lab"),
            }
        )

    def _tag_edges(b: pa.Table) -> pa.Table:
        v = b.column("v").to_numpy(zero_copy_only=False).astype(np.uint64)
        return pa.table(
            {
                "part": pa.array((v % np.uint64(P)).astype(np.int64)),
                "tag": pa.array(np.ones(len(b), dtype=np.int64)),
                "v": pa.array(v, type=pa.uint64()),
                "u": b.column("u"),
                "lab": pa.array(np.zeros(len(b), dtype=np.uint64), type=pa.uint64()),
            }
        )

    def _count(g: pa.Table) -> pa.Table:
        tag = g.column("tag").to_numpy(zero_copy_only=False)
        v = g.column("v").to_numpy(zero_copy_only=False).astype(np.uint64)
        u = g.column("u").to_numpy(zero_copy_only=False).astype(np.uint64)
        lab = g.column("lab").to_numpy(zero_copy_only=False).astype(np.uint64)
        is_state = tag == 0
        sv, sl = v[is_state], lab[is_state]
        order = np.argsort(sv, kind="stable")
        sv, sl = sv[order], sl[order]
        ev, eu = v[~is_state], u[~is_state]
        if len(ev) == 0 or len(sv) == 0:
            return pa.table(
                {
                    "u": pa.array([], type=pa.uint64()),
                    "c": pa.array([], type=pa.uint64()),
                    "k": pa.array([], type=pa.int64()),
                }
            )
        pos = np.searchsorted(sv, ev)
        c = sl[pos]  # every edge destination has a state row
        # pre-aggregate (u, c) pairs within the group
        order = np.lexsort((c, eu))
        eu, c = eu[order], c[order]
        new = np.concatenate(([True], (eu[1:] != eu[:-1]) | (c[1:] != c[:-1])))
        starts = np.flatnonzero(new)
        cnt = np.diff(np.append(starts, len(eu)))
        return pa.table(
            {
                "u": pa.array(eu[starts], type=pa.uint64()),
                "c": pa.array(c[starts], type=pa.uint64()),
                "k": pa.array(cnt.astype(np.int64), type=pa.int64()),
            }
        )

    tagged = state.map_batches(_tag_state, batch_format="pyarrow").union(
        both.map_batches(_tag_edges, batch_format="pyarrow")
    )
    partial = tagged.groupby("part").map_groups(_count, batch_format="pyarrow")
    return partial.groupby(["u", "c"]).aggregate(Sum("k", alias_name="k"))


def _decide(k_t, state_t, m2: int, P: int):
    """Per-vertex argmax over candidate communities with exact integer
    scores; emits the next (vid, lab, deg) state."""

    def _tag_state(b: pa.Table) -> pa.Table:
        vid = b.column("vid").to_numpy(zero_copy_only=False).astype(np.uint64)
        n = len(b)
        return pa.table(
            {
                "part": pa.array((vid % np.uint64(P)).astype(np.int64)),
                "tag": pa.array(np.zeros(n, dtype=np.int64)),
                "key": pa.array(vid, type=pa.uint64()),
                "lab": b.column("lab"),
                "deg": b.column("deg"),
                "totl": b.column("tot"),
                "c": pa.array(np.zeros(n, dtype=np.uint64), type=pa.uint64()),
                "k": pa.array(np.zeros(n, dtype=np.int64)),
                "totc": pa.array(np.zeros(n, dtype=np.int64)),
            }
        )

    def _tag_k(b: pa.Table) -> pa.Table:
        u = b.column("u").to_numpy(zero_copy_only=False).astype(np.uint64)
        n = len(b)
        return pa.table(
            {
                "part": pa.array((u % np.uint64(P)).astype(np.int64)),
                "tag": pa.array(np.ones(n, dtype=np.int64)),
                "key": pa.array(u, type=pa.uint64()),
                "lab": pa.array(np.zeros(n, dtype=np.uint64), type=pa.uint64()),
                "deg": pa.array(np.zeros(n, dtype=np.int64)),
                "totl": pa.array(np.zeros(n, dtype=np.int64)),
                "c": b.column("c"),
                "k": b.column("k"),
                "totc": b.column("tot"),
            }
        )

    def _merge(g: pa.Table) -> pa.Table:
        tag = g.column("tag").to_numpy(zero_copy_only=False)
        key = g.column("key").to_numpy(zero_copy_only=False).astype(np.uint64)
        is_state = tag == 0
        svid = key[is_state]
        slab = g.column("lab").to_numpy(zero_copy_only=False)[is_state].astype(np.uint64)
        sdeg = g.column("deg").to_numpy(zero_copy_only=False)[is_state]
        stot = g.column("totl").to_numpy(zero_copy_only=False)[is_state]
        order = np.argsort(svid, kind="stable")
        svid, slab, sdeg, stot = svid[order], slab[order], sdeg[order], stot[order]

        ku = key[~is_state]
        kc = g.column("c").to_numpy(zero_copy_only=False)[~is_state].astype(np.uint64)
        kk = g.column("k").to_numpy(zero_copy_only=False)[~is_state]
        ktot = g.column("totc").to_numpy(zero_copy_only=False)[~is_state]

        n = len(svid)
        k_own = np.zeros(n, dtype=np.int64)
        best_s = np.full(n, np.iinfo(np.int64).min, dtype=np.int64)
        best_c = np.zeros(n, dtype=np.uint64)
        if len(ku):
            idx = np.searchsorted(svid, ku)
            own = kc == slab[idx]
            k_own[idx[own]] = kk[own]
            cand = ~own
            if cand.any():
                ci, cc, ck, ct = idx[cand], kc[cand], kk[cand], ktot[cand]
                s = np.int64(m2) * ck - sdeg[ci] * ct
                # per-vertex max s, tie -> smallest c: lexsort by
                # (vertex, -s, c) and take the first row per vertex
                o = np.lexsort((cc, -s, ci))
                ci, cc, s = ci[o], cc[o], s[o]
                first = np.concatenate(([True], ci[1:] != ci[:-1]))
                best_s[ci[first]] = s[first]
                best_c[ci[first]] = cc[first]
        s_stay = np.int64(m2) * k_own - sdeg * (stot - sdeg)
        move = best_s > s_stay
        new_lab = np.where(move, best_c, slab)
        return pa.table(
            {
                "vid": pa.array(svid, type=pa.uint64()),
                "lab": pa.array(new_lab.astype(np.uint64), type=pa.uint64()),
                "deg": pa.array(sdeg.astype(np.int64), type=pa.int64()),
            }
        )

    tagged = state_t.map_batches(_tag_state, batch_format="pyarrow").union(
        k_t.map_batches(_tag_k, batch_format="pyarrow")
    )
    return tagged.groupby("part").map_groups(_merge, batch_format="pyarrow")
