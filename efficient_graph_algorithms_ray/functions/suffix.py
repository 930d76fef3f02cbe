"""Distributed suffix arrays over the token corpus — prefix doubling.

The scalable primitive behind exact-substring deduplication (Lee et
al. 2022, "Deduplicating Training Data Makes Language Models Better",
which builds corpus suffix arrays to find 50-token duplicate spans).
The sequential build is a libdivsufsort call; at 100 TB the standard
distributed formulation is Manber–Myers prefix doubling, where EVERY
round is a sort — exactly the all-to-all primitive a Ray Data cluster
is good at:

    rank_1[p]  = dense-rank of token[p]
    rank_2s[p] = dense-rank of (rank_s[p], rank_s[p + s])   (0 past end)

After ⌈log₂ L⌉ rounds each position's rank orders its full suffix
(suffixes never cross document boundaries — the per-doc sentinel is
the implicit end-of-doc rank 0). Equal suffixes (exact duplicate
tails) share a rank: the output is the dense suffix RANK table, the
canonical deterministic form (a total-order suffix array would need
an arbitrary tie-break among byte-identical suffixes).

Scale plan, per round:
- the (rank[p], rank[p+s]) pair assembly is a bucketed co-shuffle on
  doc_id (docs are bounded — ≤ max_prefix tokens — so buckets are
  balanced by construction and the shift lookup is partition-local
  index arithmetic, never a corpus-wide join);
- the dense rank is ONE distributed sort by (k1, k2, uid) plus the
  repo's two-pass ordered-scan pattern (functions/packing.py): tiny
  per-block partials (first/last key, distinct-group count), an
  O(#blocks) driver merge that chains group numbering across block
  boundaries, and a map pass that adds the per-block base. The driver
  never sees a row table.
- early exit: prefix doubling is a refinement — when a round leaves
  the number of distinct ranks unchanged the partition is stable and
  all later rounds are identity, so the engine stops while the
  fixed-round SQL oracle still replays bit-identically.

All arithmetic is integer (ranks), so the DuckDB oracle (the same
recurrence via DENSE_RANK + self-joins) hash-matches exactly.

Active-set discarding (implemented — the named scale path): once a
position's rank group is a singleton it can never split again, so the
doubling rounds run on RANK-style numbering (competition rank = count
of strictly-smaller positions + 1), which unlike DENSE_RANK values is
stable under refinement: a frozen singleton keeps its rank forever,
because later splits of OTHER groups never change how many positions
compare strictly below it, and a split of its own group is impossible.
The refinement identity that makes the shrinking sort exact:

    r_2s[p] = k1 + #{active q: k1_q = k1 ∧ k2_q < k2_p},  k1 = r_s[p]

— every position counted by k1−1 is already strictly smaller at
prefix s, and the only positions that can newly compare below p share
p's group, all of whose members are still active (frozen ⇔ singleton).
So the per-round sort touches ONLY unresolved positions and shrinks
geometrically (the 500k-doc probe resolves 97% of positions by the
step-8 round — see BASELINE.md). The doc-bucketed co-shuffle still
carries frozen rows of docs with ≥ 1 active position (k2 = r[pos+s]
may land on a frozen row; lookups are same-doc only) as rank-only
"context" rows, and drops fully-resolved documents. The dup/flag
outputs are group-membership facts, so the profile oracles are
unchanged; ``suffix_array_docs`` converts the final competition ranks
to the documented dense-rank form with one single-key dense-rank pass
(both numberings encode the same suffix preorder, so the conversion
is bit-identical to running DENSE_RANK throughout).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray

from .text import _TOKEN_RE


def _tokens_table(docs_ds, bench_source: str | None = None):
    """documents → one row per token position: (doc_id, pos, tok,
    dlen[, bench]). ``bench_source``: when set, emits a 0/1 ``bench``
    column marking tokens of docs whose ``source`` equals it."""

    def _rows(batch: pa.Table) -> pa.Table:
        ids = batch.column("doc_id").to_pylist()
        texts = batch.column("text").to_pylist()
        srcs = (
            batch.column("source").to_pylist()
            if bench_source is not None
            else [None] * len(ids)
        )
        o_id: list[int] = []
        o_pos: list[int] = []
        o_tok: list[str] = []
        o_len: list[int] = []
        o_b: list[int] = []
        for doc_id, text, src in zip(ids, texts, srcs):
            toks = _TOKEN_RE.findall(text or "")
            o_id.extend([doc_id] * len(toks))
            o_pos.extend(range(len(toks)))
            o_tok.extend(toks)
            o_len.extend([len(toks)] * len(toks))
            if bench_source is not None:
                o_b.extend([1 if src == bench_source else 0] * len(toks))
        cols = {
            "doc_id": pa.array(o_id, type=pa.int64()),
            "pos": pa.array(o_pos, type=pa.int64()),
            "tok": pa.array(o_tok, type=pa.string()),
            "dlen": pa.array(o_len, type=pa.int64()),
        }
        if bench_source is not None:
            cols["bench"] = pa.array(o_b, type=pa.int64())
        return pa.table(cols)

    return docs_ds.map_batches(_rows, batch_format="pyarrow")


def _dense_rank(
    ds, keys: list[str], extras: tuple[str, ...] = (), flag: str | None = None
):
    """Dense rank (1-based) over ``keys`` → ((doc_id, pos, r, dup,
    *extras[, gflag]) Dataset, n_groups). Two-pass ordered scan: the
    sort key is made UNIQUE by appending uid = doc_id·2²⁰ + pos
    (positions are bounded by the per-doc token cap), so block order
    and boundary group-merges are exact even when key ties straddle
    blocks.

    ``dup`` (0/1 int64) marks rows whose rank group has ≥ 2 members —
    computed from in-block run lengths plus the two boundary-merge
    bits the driver already derives, so it costs no extra shuffle.
    ``extras`` are int64 columns carried through unchanged.

    ``flag``: name of a 0/1 int64 extras column; when set, the output
    additionally carries ``gflag`` = OR of that column over the row's
    FULL rank group. In-block segments use a bincount OR; groups that
    straddle blocks get the neighboring segments' OR from the same
    O(#blocks) driver merge that chains the rank bases: a forward and
    a backward scan accumulate the prefix/suffix OR carried through
    single-group blocks, giving each block an incoming OR for its
    first and last group."""

    def _uid(batch: pa.Table) -> pa.Table:
        d = batch.column("doc_id").to_numpy(zero_copy_only=False).astype(np.int64)
        p = batch.column("pos").to_numpy(zero_copy_only=False).astype(np.int64)
        return batch.append_column("uid", pa.array(d * (1 << 20) + p, type=pa.int64()))

    sorted_ds = ds.map_batches(_uid, batch_format="pyarrow").sort(
        keys + ["uid"]
    ).materialize()

    def _partial(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return pa.table({"payload": pa.array([], type=pa.string())})
        import json

        cols = [batch.column(k).to_pylist() for k in keys]
        arrs = [batch.column(k).to_numpy(zero_copy_only=False) for k in keys]
        new = np.zeros(batch.num_rows, dtype=bool)
        new[0] = True
        for c in arrs:
            new[1:] |= c[1:] != c[:-1]
        payload = {
            "uid0": int(batch.column("uid")[0].as_py()),
            "g": int(new.sum()),
            "first": [c[0] for c in cols],
            "last": [c[-1] for c in cols],
        }
        if flag is not None:
            fl = batch.column(flag).to_numpy(zero_copy_only=False).astype(bool)
            g_local = np.cumsum(new.astype(np.int64)) - 1
            seg_or = np.bincount(g_local, weights=fl) > 0
            payload["of"] = bool(seg_or[0])
            payload["ol"] = bool(seg_or[-1])
        return pa.table(
            {"payload": pa.array([json.dumps(payload)], type=pa.string())}
        )

    import json

    blocks = []
    for b in sorted_ds.map_batches(
        _partial, batch_format="pyarrow", batch_size=None
    ).iter_batches(batch_size=None, batch_format="pyarrow"):
        blocks.extend(json.loads(s) for s in b.column("payload").to_pylist())

    # Recover the global block order: rows are sorted by (keys, uid)
    # with uid unique, so the (first-key tuple, uid0) pairs across
    # blocks are strictly increasing in true order — sorting by them
    # (typed values, numeric ints / raw strings) is exact even when
    # key ties straddle block boundaries.
    blocks.sort(key=lambda blk: (blk["first"], blk["uid0"]))
    adjs = []
    prev_last = None
    for blk in blocks:
        adjs.append(
            1 if (prev_last is not None and blk["first"] == prev_last) else 0
        )
        prev_last = blk["last"]
    n_blocks = len(blocks)
    inc_first = [False] * n_blocks
    inc_last = [False] * n_blocks
    if flag is not None:
        # forward scan: carry = OR of earlier blocks' segments of the
        # group spanning the (i-1, i) boundary; it survives through
        # single-group blocks that themselves continued
        carry = False
        for i, blk in enumerate(blocks):
            cont = bool(adjs[i])
            inc_first[i] = carry if cont else False
            carry = bool(blk["ol"]) or (
                carry if (blk["g"] == 1 and cont) else False
            )
        # backward scan: suffix OR into each block's last group
        carry = False
        for i in range(n_blocks - 1, -1, -1):
            cont_next = bool(adjs[i + 1]) if i + 1 < n_blocks else False
            inc_last[i] = carry if cont_next else False
            carry = bool(blocks[i]["of"]) or (
                carry if (blocks[i]["g"] == 1 and cont_next) else False
            )
    base_by_uid0: dict[int, tuple[int, int, int, bool, bool]] = {}
    R = 1
    for i, blk in enumerate(blocks):
        adj, nxt = adjs[i], adjs[i + 1] if i + 1 < len(blocks) else 0
        base_by_uid0[blk["uid0"]] = (R - adj, adj, nxt, inc_first[i], inc_last[i])
        R = (R - adj) + blk["g"]
    n_groups = R - 1
    ref = ray.put(base_by_uid0)

    def _apply(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            cols_out = {
                "doc_id": pa.array([], type=pa.int64()),
                "pos": pa.array([], type=pa.int64()),
                "r": pa.array([], type=pa.int64()),
                "dup": pa.array([], type=pa.int64()),
            }
            for e in extras:
                cols_out[e] = pa.array([], type=pa.int64())
            if flag is not None:
                cols_out["gflag"] = pa.array([], type=pa.int64())
            return pa.table(cols_out)
        lookup = ray.get(ref)
        base, prev_merge, next_merge, incf, incl = lookup[
            int(batch.column("uid")[0].as_py())
        ]
        cols = [batch.column(k).to_numpy(zero_copy_only=False) for k in keys]
        new = np.zeros(batch.num_rows, dtype=bool)
        for c in cols:
            new[1:] |= c[1:] != c[:-1]
        # base is the rank of this block's FIRST group; its first row
        # contributes no increment
        g_local = np.cumsum(new.astype(np.int64))  # 0-based in-block group
        r = base + g_local
        run_len = np.bincount(g_local)[g_local]
        dup = run_len >= 2
        if prev_merge:
            dup |= g_local == 0  # first group continues the prev block's tail
        if next_merge:
            dup |= g_local == g_local[-1]  # last group continues into next
        cols_out = {
            "doc_id": batch.column("doc_id"),
            "pos": batch.column("pos"),
            "r": pa.array(r, type=pa.int64()),
            "dup": pa.array(dup.astype(np.int64), type=pa.int64()),
        }
        for e in extras:
            cols_out[e] = batch.column(e)
        if flag is not None:
            fl = batch.column(flag).to_numpy(zero_copy_only=False).astype(bool)
            gor = (np.bincount(g_local, weights=fl) > 0)[g_local]
            if incf:
                gor |= g_local == 0
            if incl:
                gor |= g_local == g_local[-1]
            cols_out["gflag"] = pa.array(gor.astype(np.int64), type=pa.int64())
        return pa.table(cols_out)

    return (
        sorted_ds.map_batches(_apply, batch_format="pyarrow", batch_size=None),
        n_groups,
    )


def _comp_rank(
    ds,
    keys: list[str],
    *,
    seg_key: str | None = None,
    extras: tuple[str, ...] = (),
    flag: str | None = None,
    num_blocks: int | None = None,
):
    """Competition rank over ``keys`` → ((doc_id, pos, r, dup,
    *extras[, gflag]) Dataset, n_groups) — the active-set sibling of
    ``_dense_rank``. r = (segment base) + (count of rows earlier in
    the row's ``seg_key`` segment, excluding its own key group), where
    the segment base is the row's ``seg_key`` VALUE (the previous
    round's competition rank k1 — see the module docstring identity);
    with ``seg_key=None`` the whole input is one segment with base 1,
    i.e. r = 1 + global row index of the key group's first row.

    Same two-pass ordered-scan shape as ``_dense_rank``: one
    distributed sort by (keys, uid), O(#blocks) driver partials that
    chain per-segment/per-group ROW counts (not group counts) across
    block boundaries, and a map pass that applies the carried offsets.
    ``dup``/``flag`` semantics are identical (group-membership facts
    don't depend on the numbering)."""

    def _uid(batch: pa.Table) -> pa.Table:
        d = batch.column("doc_id").to_numpy(zero_copy_only=False).astype(np.int64)
        p = batch.column("pos").to_numpy(zero_copy_only=False).astype(np.int64)
        return batch.append_column("uid", pa.array(d * (1 << 20) + p, type=pa.int64()))

    with_uid = ds.map_batches(_uid, batch_format="pyarrow")
    if num_blocks is not None:
        # Sort output block count tracks input block count, and the
        # round loop unions sort outputs with shuffle outputs — without
        # a bound the block count (hence per-round fixed task cost)
        # compounds geometrically across rounds.
        with_uid = with_uid.repartition(num_blocks)
    sorted_ds = with_uid.sort(keys + ["uid"]).materialize()

    def _partial(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return pa.table({"payload": pa.array([], type=pa.string())})
        import json

        cols = [batch.column(k).to_pylist() for k in keys]
        arrs = [batch.column(k).to_numpy(zero_copy_only=False) for k in keys]
        n = batch.num_rows
        newg = np.zeros(n, dtype=bool)
        newg[0] = True
        for c in arrs:
            newg[1:] |= c[1:] != c[:-1]
        starts = np.flatnonzero(newg)
        if seg_key is not None:
            s = batch.column(seg_key).to_numpy(zero_copy_only=False)
            newseg = np.zeros(n, dtype=bool)
            newseg[0] = True
            newseg[1:] = s[1:] != s[:-1]
            seg_starts = np.flatnonzero(newseg)
        else:
            seg_starts = np.array([0])
        payload = {
            "uid0": int(batch.column("uid")[0].as_py()),
            "n": int(n),
            "g": int(len(starts)),
            "first": [c[0] for c in cols],
            "last": [c[-1] for c in cols],
            "l_grp": int(n - starts[-1]),
            "l_seg": int(n - seg_starts[-1]),
        }
        if flag is not None:
            fl = batch.column(flag).to_numpy(zero_copy_only=False).astype(bool)
            g_local = np.cumsum(newg.astype(np.int64)) - 1
            seg_or = np.bincount(g_local, weights=fl) > 0
            payload["of"] = bool(seg_or[0])
            payload["ol"] = bool(seg_or[-1])
        return pa.table(
            {"payload": pa.array([json.dumps(payload)], type=pa.string())}
        )

    import json

    blocks = []
    for b in sorted_ds.map_batches(
        _partial, batch_format="pyarrow", batch_size=None
    ).iter_batches(batch_size=None, batch_format="pyarrow"):
        blocks.extend(json.loads(s) for s in b.column("payload").to_pylist())

    blocks.sort(key=lambda blk: (blk["first"], blk["uid0"]))
    n_blocks = len(blocks)
    adjs, seg_adjs = [], []
    prev_last = None
    for blk in blocks:
        adjs.append(1 if (prev_last is not None and blk["first"] == prev_last) else 0)
        seg_adjs.append(
            1
            if (
                prev_last is not None
                and (seg_key is None or blk["first"][0] == prev_last[0])
            )
            else 0
        )
        prev_last = blk["last"]
    inc_first = [False] * n_blocks
    inc_last = [False] * n_blocks
    if flag is not None:
        carry = False
        for i, blk in enumerate(blocks):
            cont = bool(adjs[i])
            inc_first[i] = carry if cont else False
            carry = bool(blk["ol"]) or (carry if (blk["g"] == 1 and cont) else False)
        carry = False
        for i in range(n_blocks - 1, -1, -1):
            cont_next = bool(adjs[i + 1]) if i + 1 < n_blocks else False
            inc_last[i] = carry if cont_next else False
            carry = bool(blocks[i]["of"]) or (
                carry if (blocks[i]["g"] == 1 and cont_next) else False
            )
    base_by_uid0: dict[int, tuple] = {}
    seg_count = 0
    grp_count = 0
    n_groups = 0
    for i, blk in enumerate(blocks):
        inc_seg = seg_count if seg_adjs[i] else 0
        inc_grp = grp_count if adjs[i] else 0
        nxt = adjs[i + 1] if i + 1 < n_blocks else 0
        base_by_uid0[blk["uid0"]] = (
            inc_seg, inc_grp, adjs[i], nxt, inc_first[i], inc_last[i],
        )
        single_seg = seg_key is None or blk["first"][0] == blk["last"][0]
        single_grp = blk["g"] == 1
        seg_count = blk["l_seg"] + (inc_seg if single_seg else 0)
        grp_count = blk["l_grp"] + (inc_grp if single_grp else 0)
        n_groups += blk["g"] - adjs[i]
    ref = ray.put(base_by_uid0)

    def _apply(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            cols_out = {
                "doc_id": pa.array([], type=pa.int64()),
                "pos": pa.array([], type=pa.int64()),
                "r": pa.array([], type=pa.int64()),
                "dup": pa.array([], type=pa.int64()),
            }
            for e in extras:
                cols_out[e] = pa.array([], type=pa.int64())
            if flag is not None:
                cols_out["gflag"] = pa.array([], type=pa.int64())
            return pa.table(cols_out)
        lookup = ray.get(ref)
        inc_seg, inc_grp, prev_merge, next_merge, incf, incl = lookup[
            int(batch.column("uid")[0].as_py())
        ]
        arrs = [batch.column(k).to_numpy(zero_copy_only=False) for k in keys]
        n = batch.num_rows
        newg = np.zeros(n, dtype=bool)
        newg[0] = True
        for c in arrs:
            newg[1:] |= c[1:] != c[:-1]
        idx = np.arange(n, dtype=np.int64)
        grp_first = np.maximum.accumulate(np.where(newg, idx, -1))
        if seg_key is not None:
            s = batch.column(seg_key).to_numpy(zero_copy_only=False).astype(np.int64)
            newseg = np.zeros(n, dtype=bool)
            newseg[0] = True
            newseg[1:] = s[1:] != s[:-1]
            seg_first = np.maximum.accumulate(np.where(newseg, idx, -1))
            seg_local = np.cumsum(newseg.astype(np.int64)) - 1
            seg_base = s
        else:
            seg_first = np.zeros(n, dtype=np.int64)
            seg_local = np.zeros(n, dtype=np.int64)
            seg_base = np.ones(n, dtype=np.int64)
        g_local = np.cumsum(newg.astype(np.int64)) - 1
        c = grp_first - seg_first
        c = c + np.where(seg_local == 0, inc_seg, 0) - np.where(g_local == 0, inc_grp, 0)
        r = seg_base + c
        run_len = np.bincount(g_local)[g_local]
        dup = run_len >= 2
        if prev_merge:
            dup |= g_local == 0
        if next_merge:
            dup |= g_local == g_local[-1]
        cols_out = {
            "doc_id": batch.column("doc_id"),
            "pos": batch.column("pos"),
            "r": pa.array(r, type=pa.int64()),
            "dup": pa.array(dup.astype(np.int64), type=pa.int64()),
        }
        for e in extras:
            cols_out[e] = batch.column(e)
        if flag is not None:
            fl = batch.column(flag).to_numpy(zero_copy_only=False).astype(bool)
            gor = (np.bincount(g_local, weights=fl) > 0)[g_local]
            if incf:
                gor |= g_local == 0
            if incl:
                gor |= g_local == g_local[-1]
            cols_out["gflag"] = pa.array(gor.astype(np.int64), type=pa.int64())
        return pa.table(cols_out)

    return (
        sorted_ds.map_batches(_apply, batch_format="pyarrow", batch_size=None),
        n_groups,
    )


def _shift_pairs_ctx(
    state_ds, step: int, n_buckets: int, extras: tuple[str, ...], max_look: int
):
    """Active-set shift co-shuffle. ``state_ds`` rows are (doc_id, pos,
    r, act, *extras) covering EVERY position of every doc that had ≥ 1
    active position last round (act=1 unresolved, act=0 frozen context;
    context extras are zero placeholders). One bucketed co-shuffle on
    doc_id emits, per bucket:

    - kind=0 pair rows (doc_id, pos, k1=r, k2=r[pos+step] or 0,
      *extras) for ACTIVE positions only — the input of the shrinking
      sort;
    - kind=1 context rows (k1=r, k2=0, extras zeroed) for frozen
      positions of docs that STILL have an active position — next
      round's lookup table. Docs with no active position left are
      dropped here, which is where fully-resolved documents exit the
      round loop (one round after they resolve).
    """

    def _bucket(batch: pa.Table) -> pa.Table:
        d = batch.column("doc_id").to_numpy(zero_copy_only=False).astype(np.int64)
        return batch.append_column(
            "bucket", pa.array(d % n_buckets, type=pa.int64())
        )

    def _pairs(group: pa.Table) -> pa.Table:
        d = group.column("doc_id").to_numpy(zero_copy_only=False).astype(np.int64)
        p = group.column("pos").to_numpy(zero_copy_only=False).astype(np.int64)
        r = group.column("r").to_numpy(zero_copy_only=False).astype(np.int64)
        act = group.column("act").to_numpy(zero_copy_only=False).astype(np.int64)
        o = np.lexsort((p, d))
        d, p, r, act = d[o], p[o], r[o], act[o]
        n = len(d)
        doc_break = np.empty(n, dtype=bool)
        doc_break[0] = True
        doc_break[1:] = d[1:] != d[:-1]
        codes = np.cumsum(doc_break) - 1
        doc_active = np.bincount(codes, weights=act) > 0
        keep = doc_active[codes]
        d, p, r, act = d[keep], p[keep], r[keep], act[keep]
        kept_idx = o[keep]
        n = len(d)
        # k2 = r at (doc, pos+step), 0 when past the doc end. Positions
        # are NOT dense per doc after context pruning (below), so the
        # lookup is a searchsorted on the packed sorted (doc, pos) key —
        # a genuinely absent key can only mean "past end": pruning keeps
        # every future-reachable frozen row (see the induction below).
        key = d * (1 << 20) + p
        tgt_key = key + step
        loc = np.searchsorted(key, tgt_key)
        loc_c = np.minimum(loc, max(n - 1, 0))
        hit = (loc < n) & (key[loc_c] == tgt_key) if n else np.zeros(0, dtype=bool)
        k2 = np.where(hit, r[loc_c], 0) if n else np.empty(0, np.int64)
        is_act = act == 1
        # Context pruning: a frozen row only needs to ride forward if a
        # FUTURE round can look it up, i.e. its index is p + step·2^j
        # (j ≥ 1, same doc) for some CURRENTLY active p — future active
        # sets only shrink, so this is a sound superset. This is what
        # caps the co-shuffle at O(active · log max_prefix) instead of
        # O(all positions of active docs) once the corpus resolves.
        needed = is_act.copy()
        if n:
            look = 2 * step
            src_keys = key[is_act]
            # bound: no round ever looks up past max_look tokens ahead,
            # and key+look must stay inside the doc's 2²⁰ uid range
            while len(src_keys) and look <= max_look:
                tk = src_keys + look
                loc = np.minimum(np.searchsorted(key, tk), n - 1)
                loc = loc[key[loc] == tk]
                if len(loc) == 0:
                    break
                needed[loc] = True
                look *= 2
        is_ctx = needed & ~is_act
        sel = np.flatnonzero(is_act | is_ctx)
        d, p, r = d[sel], p[sel], r[sel]
        k2 = k2[sel]
        ia = is_act[sel]
        kind = np.where(ia, 0, 1).astype(np.int64)
        cols_out = {
            "kind": pa.array(kind, type=pa.int64()),
            "doc_id": pa.array(d, type=pa.int64()),
            "pos": pa.array(p, type=pa.int64()),
            "k1": pa.array(r, type=pa.int64()),
            "k2": pa.array(np.where(ia, k2, 0), type=pa.int64()),
        }
        for e in extras:
            v = group.column(e).to_numpy(zero_copy_only=False).astype(np.int64)
            cols_out[e] = pa.array(np.where(ia, v[kept_idx][sel], 0), type=pa.int64())
        return pa.table(cols_out)

    return (
        state_ds.map_batches(_bucket, batch_format="pyarrow")
        .repartition(n_buckets)  # bound the groupby's block fan-in (see _comp_rank)
        .groupby("bucket")
        .map_groups(_pairs, batch_format="pyarrow")
    )


def _shift_pairs(ranks_ds, step: int, n_buckets: int, extras: tuple[str, ...] = ()):
    """(doc_id, pos, r) → (doc_id, pos, k1=r[pos], k2=r[pos+step] or 0)
    via a bucketed co-shuffle on doc_id — the shift lookup is dense
    index arithmetic inside each bucket (positions are 0..len-1 per
    doc), never a corpus-wide join. ``extras`` int64 columns are
    carried through unchanged."""

    def _bucket(batch: pa.Table) -> pa.Table:
        d = batch.column("doc_id").to_numpy(zero_copy_only=False).astype(np.int64)
        return batch.append_column(
            "bucket", pa.array(d % n_buckets, type=pa.int64())
        )

    def _pairs(group: pa.Table) -> pa.Table:
        d = group.column("doc_id").to_numpy(zero_copy_only=False).astype(np.int64)
        p = group.column("pos").to_numpy(zero_copy_only=False).astype(np.int64)
        r = group.column("r").to_numpy(zero_copy_only=False).astype(np.int64)
        o = np.lexsort((p, d))
        d, p, r = d[o], p[o], r[o]
        n = len(d)
        idx = np.arange(n) + step
        valid = idx < n
        idx = np.minimum(idx, n - 1)
        # per-doc positions are dense (0..len-1), so same-doc at the
        # shifted index ⟺ pos+step is inside this document
        k2 = np.where(valid & (d[idx] == d), r[idx], 0)
        cols_out = {
            "doc_id": pa.array(d, type=pa.int64()),
            "pos": pa.array(p, type=pa.int64()),
            "k1": pa.array(r, type=pa.int64()),
            "k2": pa.array(k2, type=pa.int64()),
        }
        for e in extras:
            v = group.column(e).to_numpy(zero_copy_only=False).astype(np.int64)
            cols_out[e] = pa.array(v[o], type=pa.int64())
        return pa.table(cols_out)

    return (
        ranks_ds.map_batches(_bucket, batch_format="pyarrow")
        .groupby("bucket")
        .map_groups(_pairs, batch_format="pyarrow")
    )


def suffix_array_docs(docs_ds, *, max_prefix: int = 128, n_buckets: int = 64):
    """Corpus suffix-rank table by prefix doubling. Returns a Dataset
    (doc_id, pos, srank) where srank is the 1-based dense rank of the
    suffix starting at (doc_id, pos) among ALL corpus suffixes,
    resolved to ``max_prefix`` tokens (full resolution for docs no
    longer than that; byte-identical suffixes share a rank).
    """
    # Active-set doubling rounds (competition-rank numbering), then ONE
    # single-key dense-rank pass to the documented dense form — both
    # numberings encode the same suffix preorder, so this matches the
    # fixed-round DENSE_RANK oracle bit-identically.
    levels = _doubling_levels(
        _tokens_table(docs_ds),
        max_prefix=max_prefix,
        n_buckets=n_buckets,
        src_col="dup",
        out_col="dmax",
    ).materialize()  # pin the lazy union before the dense-rank sort
    dense, _ = _dense_rank(levels, ["r"])

    def _shape(batch: pa.Table) -> pa.Table:
        return pa.table(
            {
                "doc_id": batch.column("doc_id"),
                "pos": batch.column("pos"),
                "srank": batch.column("r"),
            }
        )

    return dense.map_batches(_shape, batch_format="pyarrow")


def dup_window_profile(
    docs_ds, *, max_prefix: int = 128, dup_thresh: int = 8, n_buckets: int = 64
):
    """Per-document exact duplicate-window profile — the suffix-array
    half of ExactSubstr dedup (Lee et al. 2022 flag 50-token spans
    that recur anywhere in the corpus; this reports, at power-of-two
    resolution, the longest window at each position that recurs).

    For every token position, dup_pow2 = the largest level
    w ∈ {1, 2, 4, …, max_prefix} such that the FULL w-token window
    starting there (pos + w ≤ doc length) recurs somewhere else in
    the corpus (0 if even the single token is corpus-unique). Shared
    at 2w implies shared at w, so dup_pow2 is exactly the power-of-
    two floor of the true longest duplicated window. The full-window
    gate matters: without it, two docs sharing only a short TAIL
    (sentinel-truncated suffix equality, k2=0 past end) would count
    as sharing every larger window and saturate at max_prefix. The
    gate is sound both ways — with the end-of-doc sentinel, equal
    level-w ranks where one member has < w tokens remaining force
    ALL members to end at the same offset, so a gated-in position's
    group members genuinely share w real tokens; and a gated-out
    tail-share of true length L was already flagged (ungated) at
    level pow2floor(L) ≤ L in an earlier round.

    The flags fall out of the SAME dense-rank passes that build the
    suffix array (run lengths + boundary-merge bits) — no shuffles
    beyond the doubling rounds themselves; the running maximum and
    the doc length ride the co-shuffles as int64 columns.

    Early exit: when a round leaves the number of rank groups
    unchanged the partition (hence every later level's dup flag) is
    frozen, so a surviving flag is promoted to the largest level its
    position is long enough for — pow2floor(min(max_prefix,
    remaining)) — identical to the fixed-round SQL replay.

    Returns per-doc (doc_id, max_dup, n_dup_thresh, n_pos): the
    longest duplicated window level in the doc, how many of its
    positions start a duplicated window ≥ dup_thresh, and its token
    count. All-integer → exact SQL parity.
    """
    levels = _dup_levels(docs_ds, max_prefix=max_prefix, n_buckets=n_buckets)
    return _profile_aggregate(
        levels, "dmax", dup_thresh, "max_dup", "n_dup_thresh"
    )


def _doubling_levels(
    tokens_ds,
    *,
    max_prefix: int,
    n_buckets: int,
    src_col: str,
    out_col: str,
    carry: tuple[str, ...] = ("dlen",),
    flag: str | None = None,
):
    """Shared prefix-doubling driver with ACTIVE-SET DISCARDING (the
    module docstring's scale path): runs competition-rank rounds over
    ``tokens_ds`` folding the FULL-WINDOW-gated max level of the
    per-round 0/1 ``src_col`` ('dup' or 'gflag') into ``out_col``
    (see dup_window_profile for the gating / promotion-on-freeze
    argument). Rows whose rank group is a singleton freeze out of the
    per-round sort (their rank and all future flags are final); frozen
    rows of docs with surviving active rows ride the doc-bucketed
    co-shuffle as rank-only context (same-doc k2 lookups), and fully
    resolved docs are dropped from the loop entirely. Output schema:
    (doc_id, pos, r, dup, ``out_col``, *carry) for EVERY position,
    where r is the final competition rank and dup/``out_col`` are
    bit-identical to the non-discarding formulation (group membership
    is numbering-agnostic; a frozen row's flags are frozen too).
    ``carry`` columns ride every co-shuffle; ``flag`` is forwarded to
    ``_comp_rank`` (per-group OR → 'gflag')."""
    import pyarrow.compute as pc

    extras = (out_col,) + tuple(carry)
    out_cols = ["doc_id", "pos", "r", "dup", out_col, *carry]
    state_cols = ["doc_id", "pos", "r", "act", *extras]

    def _project(ds, want_dup: int | None, cols: list[str], act: int | None = None):
        """Filter by dup == want_dup (None = keep all) and project/pad
        to ``cols`` (+ an ``act`` constant column when requested)."""

        def _f(b: pa.Table) -> pa.Table:
            t = b.filter(pc.equal(b.column("dup"), want_dup)) if want_dup is not None else b
            out = {}
            for c in cols:
                if c == "act":
                    out[c] = pa.array(
                        np.full(t.num_rows, act, dtype=np.int64), type=pa.int64()
                    )
                else:
                    out[c] = t.column(c)
            return pa.table(out)

        return ds.map_batches(_f, batch_format="pyarrow")

    def _ctx_state(shout_ds):
        """kind=1 rows of a shift output → context state rows."""

        def _f(b: pa.Table) -> pa.Table:
            t = b.filter(pc.equal(b.column("kind"), 1))
            out = {"doc_id": t.column("doc_id"), "pos": t.column("pos"),
                   "r": t.column("k1"),
                   "act": pa.array(np.zeros(t.num_rows, dtype=np.int64), type=pa.int64())}
            for e in extras:
                out[e] = t.column(e)
            return pa.table(out)

        return shout_ds.map_batches(_f, batch_format="pyarrow")

    def _pairs_only(shout_ds):
        def _f(b: pa.Table) -> pa.Table:
            t = b.filter(pc.equal(b.column("kind"), 0))
            return t.drop_columns(["kind"])

        return shout_ds.map_batches(_f, batch_format="pyarrow")

    def _init(batch: pa.Table) -> pa.Table:
        v = batch.column(src_col).to_numpy(zero_copy_only=False)
        return batch.append_column(out_col, pa.array(v, type=pa.int64()))

    def _fold(window: int, promote: bool):
        def _f(batch: pa.Table) -> pa.Table:
            v = batch.column(src_col).to_numpy(zero_copy_only=False)
            acc = batch.column(out_col).to_numpy(zero_copy_only=False)
            pos = batch.column("pos").to_numpy(zero_copy_only=False)
            dlen = batch.column("dlen").to_numpy(zero_copy_only=False)
            remaining = dlen - pos  # ≥ 1 for every emitted position
            if promote:
                # stalled refinement: flag holds at every later level →
                # largest power-of-two window this position can fill
                r = np.minimum(remaining, max_prefix).astype(np.int64)
                eff = (2 ** np.floor(np.log2(r))).astype(np.int64)
            else:
                eff = np.where(remaining >= window, window, 0)
            out = np.maximum(acc, v * eff)
            return batch.drop_columns([out_col]).append_column(
                out_col, pa.array(out, type=pa.int64())
            )

        return _f

    ranks, ng = _comp_rank(tokens_ds, ["tok"], extras=carry, flag=flag)
    ranks = ranks.map_batches(_init, batch_format="pyarrow").materialize()
    n_total = ranks.count()
    n_active = int(ranks.sum("dup") or 0)
    # groups still refinable = total groups − frozen singletons
    act_groups = ng - (n_total - n_active)
    frozen = [_project(ranks, 0, out_cols)]
    active_state = _project(ranks, 1, state_cols, act=1)
    ctx_state = _project(ranks, 0, state_cols, act=0)
    last_active = ranks

    import os as _os
    import time as _time

    dbg = _os.environ.get("GRAFT_SUFFIX_DEBUG") == "1"

    step = 1
    while step < max_prefix and n_active > 0:
        # block counts sized to the shrinking active set: ~64k rows per
        # block, capped at n_buckets (the cluster-sized fan-out) — tiny
        # late rounds shouldn't pay n_buckets× task-launch overhead
        blk = max(1, min(n_buckets, n_active // 65536 + 1))
        state = active_state.union(ctx_state)
        _t0 = _time.perf_counter()
        shout = _shift_pairs_ctx(
            state, step, max(blk, 8), extras, max_prefix
        ).materialize()
        _t1 = _time.perf_counter()
        ranks2, ng2 = _comp_rank(
            _pairs_only(shout), ["k1", "k2"], seg_key="k1", extras=extras,
            flag=flag, num_blocks=blk,
        )
        _t2 = _time.perf_counter()
        stalled = ng2 == act_groups  # zero splits ⇒ permanent duplicates
        ranks2 = ranks2.map_batches(
            _fold(step * 2, promote=stalled), batch_format="pyarrow"
        ).materialize()
        if dbg:
            print(
                f"[suffix] step={step} n_active={n_active} blk={blk} "
                f"shift={_t1-_t0:.2f}s sort={_t2-_t1:.2f}s "
                f"fold={_time.perf_counter()-_t2:.2f}s",
                flush=True,
            )
        if stalled:
            frozen.append(_project(ranks2, None, out_cols))
            n_active = 0
            break
        frozen.append(_project(ranks2, 0, out_cols))
        rows_sorted = n_active
        n_active = int(ranks2.sum("dup") or 0)
        act_groups = ng2 - (rows_sorted - n_active)
        active_state = _project(ranks2, 1, state_cols, act=1)
        ctx_state = _ctx_state(shout).union(_project(ranks2, 0, state_cols, act=0))
        last_active = ranks2
        step *= 2

    if n_active > 0:  # max_prefix reached with unresolved groups
        frozen.append(_project(last_active, 1, out_cols))
    return frozen[0].union(*frozen[1:]) if len(frozen) > 1 else frozen[0]


def _profile_aggregate(
    levels, val_col: str, thresh: int, max_name: str, n_name: str,
    exclude_col: str | None = None,
):
    """Per-doc (doc_id, {max_name}, {n_name}, n_pos) fold of a
    per-position level column; rows with ``exclude_col`` != 0 are
    dropped first (e.g. benchmark docs).

    Shaped as ONE hash-bucketed co-shuffle (doc_id % 64) with a
    vectorized per-bucket fold rather than ``groupby(doc_id)``: Ray
    Data's sort-based aggregate pays per-block + per-group overhead
    that measures ~11× slower at 2.8M rows / 50k groups, while 64
    fat groups folded with bincount/maximum.at are one cheap pass."""
    B = 64

    def _per_pos(batch: pa.Table) -> pa.Table:
        v = batch.column(val_col).to_numpy(zero_copy_only=False).astype(np.int64)
        d = batch.column("doc_id").to_numpy(zero_copy_only=False).astype(np.int64)
        if exclude_col is not None:
            keep = batch.column(exclude_col).to_numpy(zero_copy_only=False) == 0
            v, d = v[keep], d[keep]
        return pa.table(
            {
                "bucket": pa.array(d % B, type=pa.int64()),
                "doc_id": pa.array(d, type=pa.int64()),
                val_col: pa.array(v, type=pa.int64()),
                "hit": pa.array((v >= thresh).astype(np.int64), type=pa.int64()),
            }
        )

    def _fold_doc(group: pa.Table) -> pa.Table:
        d = group.column("doc_id").to_numpy(zero_copy_only=False).astype(np.int64)
        v = group.column(val_col).to_numpy(zero_copy_only=False).astype(np.int64)
        h = group.column("hit").to_numpy(zero_copy_only=False).astype(np.int64)
        uniq, codes = np.unique(d, return_inverse=True)
        mx = np.zeros(len(uniq), dtype=np.int64)
        np.maximum.at(mx, codes, v)
        sm = np.bincount(codes, weights=h, minlength=len(uniq)).astype(np.int64)
        cnt = np.bincount(codes, minlength=len(uniq)).astype(np.int64)
        return pa.table(
            {
                "doc_id": pa.array(uniq, type=pa.int64()),
                max_name: pa.array(mx, type=pa.int64()),
                n_name: pa.array(sm, type=pa.int64()),
                "n_pos": pa.array(cnt, type=pa.int64()),
            }
        )

    # pin before the groupby: a lazy union input is re-executed by the
    # sort's sample + partition passes
    per_pos = levels.map_batches(_per_pos, batch_format="pyarrow").materialize()
    return per_pos.groupby("bucket").map_groups(_fold_doc, batch_format="pyarrow")


def _dup_levels(docs_ds, *, max_prefix: int = 128, n_buckets: int = 64):
    """Per-position duplicate-window levels: Dataset (doc_id, pos, r,
    dup, dmax, dlen) where dmax is the largest power-of-two window
    starting at pos that recurs in the corpus at FULL length (see
    dup_window_profile for the gating argument)."""
    return _doubling_levels(
        _tokens_table(docs_ds),
        max_prefix=max_prefix,
        n_buckets=n_buckets,
        src_col="dup",
        out_col="dmax",
    )


def exactsubstr_prune(
    docs_ds, *, dup_thresh: int = 8, max_prefix: int = 128, n_buckets: int = 64
):
    """ExactSubstr span removal at power-of-two resolution — the
    dedup TRANSFORM on top of the suffix-array machinery (Lee et al.
    2022 remove every token covered by a ≥ 50-token span that recurs
    in the corpus; here the spans are the gated power-of-two windows
    from ``_dup_levels`` with level ≥ ``dup_thresh``).

    A position p of a doc is removed iff some duplicated window
    [s, s + dmax_s) with dmax_s ≥ dup_thresh covers it (s ≤ p <
    s + dmax_s). Because windows are gated to full length
    (dmax_s ≤ dlen - s), intervals never cross document boundaries,
    so coverage over the doc-major position order is ONE
    ``np.maximum.accumulate`` with no per-doc reset.

    Pipeline shape: the doubling rounds of ``_dup_levels``, then one
    tagged co-shuffle on doc bucket (doc_id % n_buckets) that merges
    the per-position levels with the re-derived token table — docs
    never straddle buckets, so the interval union, the kept-token
    join and the per-doc fold are all partition-local.

    Returns per-doc (doc_id, n_pos, n_removed, kept_fp): token count,
    removed-token count, and the FNV-1a fingerprint of the kept
    tokens space-joined in position order (0 when nothing is kept) —
    integer outputs with exact SQL parity.
    """
    from .text import hash_token

    levels = _dup_levels(docs_ds, max_prefix=max_prefix, n_buckets=n_buckets)
    toks = _tokens_table(docs_ds)

    def _tag_levels(batch: pa.Table) -> pa.Table:
        d = batch.column("doc_id").to_numpy(zero_copy_only=False).astype(np.int64)
        return pa.table(
            {
                "bucket": pa.array(d % n_buckets, type=pa.int64()),
                "doc_id": pa.array(d, type=pa.int64()),
                "pos": batch.column("pos"),
                "dmax": batch.column("dmax"),
                "tok": pa.array([""] * len(d), type=pa.string()),
                "tag": pa.array(np.zeros(len(d), dtype=np.int64), type=pa.int64()),
            }
        )

    def _tag_toks(batch: pa.Table) -> pa.Table:
        d = batch.column("doc_id").to_numpy(zero_copy_only=False).astype(np.int64)
        return pa.table(
            {
                "bucket": pa.array(d % n_buckets, type=pa.int64()),
                "doc_id": pa.array(d, type=pa.int64()),
                "pos": batch.column("pos"),
                "dmax": pa.array(np.zeros(len(d), dtype=np.int64), type=pa.int64()),
                "tok": batch.column("tok"),
                "tag": pa.array(np.ones(len(d), dtype=np.int64), type=pa.int64()),
            }
        )

    tagged = levels.map_batches(_tag_levels, batch_format="pyarrow").union(
        toks.map_batches(_tag_toks, batch_format="pyarrow")
    ).materialize()  # pin the lazy union before the bucket groupby

    def _prune(group: pa.Table) -> pa.Table:
        tag = group.column("tag").to_numpy(zero_copy_only=False)
        d = group.column("doc_id").to_numpy(zero_copy_only=False).astype(np.int64)
        p = group.column("pos").to_numpy(zero_copy_only=False).astype(np.int64)
        lv, tk = tag == 0, tag == 1
        ol = np.lexsort((p[lv], d[lv]))
        ot = np.lexsort((p[tk], d[tk]))
        dd, pp = d[lv][ol], p[lv][ol]
        dmax = group.column("dmax").to_numpy(zero_copy_only=False)[lv][ol]
        # only the token rows cross the Arrow→Python boundary (the
        # level rows carry placeholder "" toks)
        tok_sorted = (
            group.column("tok").take(pa.array(np.flatnonzero(tk)[ot])).to_pylist()
        )
        n = len(dd)
        if n == 0:
            return pa.table(
                {
                    "doc_id": pa.array([], type=pa.int64()),
                    "n_pos": pa.array([], type=pa.int64()),
                    "n_removed": pa.array([], type=pa.int64()),
                    "kept_fp": pa.array([], type=pa.int64()),
                }
            )
        # global position index; full-window gating ⇒ reach never
        # crosses a doc boundary ⇒ one accumulate, no per-doc reset
        gpos = np.arange(n, dtype=np.int64)
        reach = np.where(dmax >= dup_thresh, gpos + dmax, -1)
        covered = np.maximum.accumulate(reach) > gpos
        doc_break = np.empty(n, dtype=bool)
        doc_break[0] = True
        doc_break[1:] = dd[1:] != dd[:-1]
        codes = np.cumsum(doc_break) - 1
        n_docs = int(codes[-1]) + 1
        n_pos = np.bincount(codes, minlength=n_docs)
        n_removed = np.bincount(codes, weights=covered, minlength=n_docs).astype(
            np.int64
        )
        doc_ids = dd[doc_break]
        fps = np.empty(n_docs, dtype=np.int64)
        starts = np.flatnonzero(doc_break)
        ends = np.append(starts[1:], n)
        for i, (s, e) in enumerate(zip(starts, ends)):
            kept = [tok_sorted[j] for j in range(s, e) if not covered[j]]
            fps[i] = (
                np.uint64(hash_token(" ".join(kept))).astype(np.int64)
                if kept
                else 0
            )
        return pa.table(
            {
                "doc_id": pa.array(doc_ids, type=pa.int64()),
                "n_pos": pa.array(n_pos.astype(np.int64), type=pa.int64()),
                "n_removed": pa.array(n_removed, type=pa.int64()),
                "kept_fp": pa.array(fps, type=pa.int64()),
            }
        )

    return tagged.groupby("bucket").map_groups(_prune, batch_format="pyarrow")


def cross_dup_window_profile(
    docs_ds,
    *,
    bench_source: str = "src0",
    max_prefix: int = 128,
    dup_thresh: int = 8,
    n_buckets: int = 64,
):
    """Suffix-based benchmark decontamination — the exact-substring
    complement of the 13-gram membership check
    (functions/dedup.benchmark_contamination): for every NON-benchmark
    document, the largest power-of-two window (full length, gated
    exactly as in dup_window_profile) that ALSO occurs verbatim in the
    ``bench_source`` corpus, at any position.

    Mechanics: the same prefix-doubling rounds over the UNION of
    corpus and benchmark tokens; each round's dense rank additionally
    exposes ``gflag`` = OR of the bench bit over the FULL rank group
    (in-block bincount OR + the driver merge's forward/backward
    boundary carries — still no extra shuffle). A corpus position
    whose gated level-w group has gflag=1 shares its full w-token
    window with a benchmark position (the sentinel forces equal
    remaining < w to coincide, so a gated-in match is a real w-token
    match on both sides).

    Returns per NON-benchmark doc (doc_id, max_shared,
    n_shared_thresh, n_pos). All-integer → exact SQL parity.
    """
    levels = _doubling_levels(
        _tokens_table(docs_ds, bench_source=bench_source),
        max_prefix=max_prefix,
        n_buckets=n_buckets,
        src_col="gflag",
        out_col="xmax",
        carry=("dlen", "bench"),
        flag="bench",
    )
    return _profile_aggregate(
        levels, "xmax", dup_thresh, "max_shared", "n_shared_thresh",
        exclude_col="bench",
    )
