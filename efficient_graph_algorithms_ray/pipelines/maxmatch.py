"""Maximal matching — fixed-round greedy local-min peeling over an
edge Dataset.

Public algorithm: the classic distributed greedy matching round
(Israeli–Itai 1986 / Blelloch et al. deterministic variant): each
round every live edge draws a priority; an edge enters the matching
iff its priority is the UNIQUE strict minimum among all live edges
sharing either endpoint; its endpoints become matched and every edge
touching them dies. Ties produce no winner at that vertex — a
deterministic rule the SQL oracle replays verbatim, so 64-bit hash
collisions cannot desynchronize the two sides. Maximal matching is
the standard coarsening step of multilevel graph partitioners — the
scalable stand-in for the reference's planar-separator contraction
machinery (/root/reference/src/planar_separators/*), which SURVEY §2
documents as replaced by hash-partitioned peeling at web scale.

Priority: pri_r(u, v) = splitmix64(u ⊕ v ⊕ RC_r) — symmetric in the
endpoints, re-drawn per round (RC_r inlined into the SQL oracle), the
same hashed-edge-weight trick as the tree-ensemble pipeline.

Round plan (three hash-partitioned exchanges over the shrinking live
set — the MIS/truss family pattern):

1. ``groupby(x % P)`` over both orientations — vertex x's group holds
   its full live incidence list; the unique-strict-min edge at x (if
   any) gets a claim row keyed by the canonical pair hash.
2. ``groupby(pair % P)`` — an edge matched iff BOTH endpoint claims
   arrived; emits matched-edge rows and matched-vertex markers.
3. ``groupby(x % P)`` — drops every live edge incident to a matched
   vertex; matched-edge output rows and vertex markers pass through.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from .mis import _rows
from .truss import _mix

_I64 = pa.int64()
_SM_MASK = np.uint64(0xFFFFFFFFFFFFFFFF)


def round_constants(seed: int, rounds: int) -> list[int]:
    from ..oracles.sql import sm64_py

    return [sm64_py((seed * 0x5BD1E9 + r) & 0xFFFFFFFFFFFFFFFF) for r in range(rounds)]


def _sm64(x: np.ndarray) -> np.ndarray:
    """Vectorized splitmix64 finalizer (same constants as oracles.sql)."""
    with np.errstate(over="ignore"):
        x = (x + np.uint64(0x9E3779B97F4A7C15)) & _SM_MASK
        x = ((x ^ (x >> np.uint64(30))) * np.uint64(0xBF58476D1CE4E5B9)) & _SM_MASK
        x = ((x ^ (x >> np.uint64(27))) * np.uint64(0x94D049BB133111EB)) & _SM_MASK
    return x ^ (x >> np.uint64(31))


def edge_priority(u: np.ndarray, v: np.ndarray, rc: np.uint64) -> np.ndarray:
    return _sm64(u.astype(np.uint64) ^ v.astype(np.uint64) ^ rc)


# row kinds in column f-slot usage; kinds encoded in column b:
_MATCHED_V = -1  # (a=vid) matched-vertex marker
# b >= 0 with f = 0: live edge (both orientations)
# b >= 0 with f = 1: claim row (canonical)
# b >= 0 with f = 2: matched-edge OUTPUT row (canonical, passes through)


def maximal_matching(
    edges, *, rounds: int = 3, num_partitions: int = 16, seed: int = 11
):
    """``rounds`` greedy rounds; returns a Dataset (u, v, round) of the
    matched edges (canonical u < v, 1-indexed round of matching).

    ``edges``: Dataset with int-like (src, dst); duplicates and either
    orientation fine — canonicalized and deduped here.
    """
    P = num_partitions
    rcs = [np.uint64(rc) for rc in round_constants(seed, rounds)]

    def _canon(batch: pa.Table) -> pa.Table:
        s = batch.column("src").to_numpy(zero_copy_only=False).astype(np.uint64)
        d = batch.column("dst").to_numpy(zero_copy_only=False).astype(np.uint64)
        u, v = np.minimum(s, d), np.maximum(s, d)
        keep = u != v
        u, v = u[keep], v[keep]
        return _rows(
            (_mix(u, v) % np.uint64(P)).astype(np.int64), u, v, np.zeros(len(u))
        )

    def _dedup_orient(group: pa.Table) -> pa.Table:
        u = group.column("a").to_numpy(zero_copy_only=False).astype(np.uint64)
        v = group.column("b").to_numpy(zero_copy_only=False).astype(np.uint64)
        order = np.lexsort((v, u))
        u, v = u[order], v[order]
        first = np.concatenate(([True], (u[1:] != u[:-1]) | (v[1:] != v[:-1])))
        u, v = u[first], v[first]
        x = np.concatenate([u, v])
        y = np.concatenate([v, u])
        return _rows((x % np.uint64(P)).astype(np.int64), x, y, np.zeros(len(x)))

    cur = (
        edges.map_batches(_canon, batch_format="pyarrow")
        .groupby("part")
        .map_groups(_dedup_orient, batch_format="pyarrow")
    )

    def _x1(group: pa.Table, rc: np.uint64) -> pa.Table:
        """Unique-strict-min claims; non-live rows pass through."""
        a = group.column("a").to_numpy(zero_copy_only=False)
        b = group.column("b").to_numpy(zero_copy_only=False)
        f = group.column("f").to_numpy(zero_copy_only=False)
        live = (b >= 0) & (f == 0)
        out = []
        passthru = group.filter(pa.array(~live))
        if passthru.num_rows:
            out.append(passthru)
        x = a[live].astype(np.uint64)
        y = b[live].astype(np.uint64)
        if len(x):
            pri = edge_priority(x, y, rc)
            order = np.lexsort((pri, x))
            xs, ys, ps = x[order], y[order], pri[order]
            starts = np.flatnonzero(np.concatenate(([True], xs[1:] != xs[:-1])))
            ends = np.append(starts[1:], len(xs))
            # unique strict min: group head whose pri differs from the
            # second element (or singleton group)
            head = starts
            second_ok = (ends - starts == 1) | (
                ps[np.minimum(starts + 1, len(ps) - 1)] != ps[starts]
            )
            win = head[second_ok]
            cu = np.minimum(xs[win], ys[win])
            cv = np.maximum(xs[win], ys[win])
            out.append(
                _rows(
                    (_mix(cu, cv) % np.uint64(P)).astype(np.int64),
                    cu,
                    cv,
                    np.ones(len(cu)),
                )
            )
            # live edges continue to exchange 3 via the pair key so the
            # matched-vertex drop sees them (canonical, one copy)
            canon = xs < ys
            eu, ev = xs[canon], ys[canon]
            out.append(
                _rows(
                    (_mix(eu, ev) % np.uint64(P)).astype(np.int64),
                    eu,
                    ev,
                    np.zeros(len(eu)),
                )
            )
        return pa.concat_tables(out) if out else _rows([], [], [], [])

    def _x2(group: pa.Table) -> pa.Table:
        """Double-claim edges matched; matched-vertex markers emitted;
        live edges re-keyed to their endpoints for the drop pass."""
        a = group.column("a").to_numpy(zero_copy_only=False).astype(np.uint64)
        b = group.column("b").to_numpy(zero_copy_only=False)
        f = group.column("f").to_numpy(zero_copy_only=False)
        out = []
        passthru = group.filter(pa.array((b == _MATCHED_V) | (f == 2) | (f >= 100)))
        if passthru.num_rows:
            out.append(passthru)
        is_claim = (b >= 0) & (f == 1)
        is_live = (b >= 0) & (f == 0)
        cu, cv = a[is_claim], b[is_claim].astype(np.uint64)
        if len(cu):
            order = np.lexsort((cv, cu))
            cu, cv = cu[order], cv[order]
            first = np.concatenate(([True], (cu[1:] != cu[:-1]) | (cv[1:] != cv[:-1])))
            gid = np.cumsum(first) - 1
            cnt = np.bincount(gid)
            matched = cnt >= 2
            mu, mv = cu[first][matched], cv[first][matched]
            if len(mu):
                # matched-edge output rows (pass through to the end)
                out.append(
                    _rows(
                        (_mix(mu, mv) % np.uint64(P)).astype(np.int64),
                        mu,
                        mv,
                        np.full(len(mu), 2),
                    )
                )
                # matched-vertex markers keyed by vertex
                mvert = np.concatenate([mu, mv])
                out.append(
                    _rows(
                        (mvert % np.uint64(P)).astype(np.int64),
                        mvert,
                        np.full(len(mvert), _MATCHED_V),
                        np.zeros(len(mvert)),
                    )
                )
        lu, lv = a[is_live], b[is_live].astype(np.uint64)
        if len(lu):
            # both orientations keyed by vertex for the drop pass
            xx = np.concatenate([lu, lv])
            yy = np.concatenate([lv, lu])
            out.append(
                _rows((xx % np.uint64(P)).astype(np.int64), xx, yy, np.zeros(len(xx)))
            )
        return pa.concat_tables(out) if out else _rows([], [], [], [])

    def _x3(group: pa.Table) -> pa.Table:
        """Drop live orientations whose keyed endpoint is matched;
        each surviving orientation casts a survival half-vote keyed by
        the canonical pair (exchange 4 keeps edges with both votes, so
        an edge dies as soon as EITHER endpoint matched)."""
        a = group.column("a").to_numpy(zero_copy_only=False)
        b = group.column("b").to_numpy(zero_copy_only=False)
        f = group.column("f").to_numpy(zero_copy_only=False)
        out = []
        passthru = group.filter(pa.array((b == _MATCHED_V) | (f == 2) | (f >= 100)))
        if passthru.num_rows:
            out.append(passthru)
        is_live = (b >= 0) & (f == 0)
        vmatched = set(a[b == _MATCHED_V].tolist())
        x = a[is_live]
        y = b[is_live]
        if len(x):
            alive = ~np.isin(x, np.fromiter(vmatched, dtype=np.int64, count=len(vmatched))) if vmatched else np.ones(len(x), bool)
            xu = x[alive].astype(np.uint64)
            yv = y[alive].astype(np.uint64)
            cu, cv = np.minimum(xu, yv), np.maximum(xu, yv)
            out.append(
                _rows(
                    (_mix(cu, cv) % np.uint64(P)).astype(np.int64),
                    cu,
                    cv,
                    np.full(len(cu), 3),  # survival half-vote
                )
            )
        return pa.concat_tables(out) if out else _rows([], [], [], [])

    def _x4(group: pa.Table) -> pa.Table:
        """Re-pair survival half-votes → live edges (both orientations)."""
        a = group.column("a").to_numpy(zero_copy_only=False)
        b = group.column("b").to_numpy(zero_copy_only=False)
        f = group.column("f").to_numpy(zero_copy_only=False)
        out = []
        passthru = group.filter(pa.array((b == _MATCHED_V) | (f == 2) | (f >= 100)))
        if passthru.num_rows:
            out.append(passthru)
        is_vote = (b >= 0) & (f == 3)
        cu = a[is_vote].astype(np.uint64)
        cv = b[is_vote].astype(np.uint64)
        if len(cu):
            order = np.lexsort((cv, cu))
            cu, cv = cu[order], cv[order]
            first = np.concatenate(([True], (cu[1:] != cu[:-1]) | (cv[1:] != cv[:-1])))
            gid = np.cumsum(first) - 1
            cnt = np.bincount(gid)
            keep = cnt >= 2
            ku, kv = cu[first][keep], cv[first][keep]
            xx = np.concatenate([ku, kv])
            yy = np.concatenate([kv, ku])
            out.append(
                _rows((xx % np.uint64(P)).astype(np.int64), xx, yy, np.zeros(len(xx)))
            )
        return pa.concat_tables(out) if out else _rows([], [], [], [])

    matched_round: list = []
    for r in range(rounds):
        rc = rcs[r]
        cur = (
            cur.groupby("part")
            .map_groups(lambda g, rc=rc: _x1(g, rc), batch_format="pyarrow")
            .groupby("part")
            .map_groups(_x2, batch_format="pyarrow")
            .groupby("part")
            .map_groups(_x3, batch_format="pyarrow")
            .groupby("part")
            .map_groups(_x4, batch_format="pyarrow")
        )
        # tag this round's matched edges: rewrite f=2 rows to f=100+r
        def _tag(batch: pa.Table, r=r) -> pa.Table:
            f = batch.column("f").to_numpy(zero_copy_only=False)
            nf = np.where(f == 2, 100 + r, f)
            return batch.set_column(
                batch.schema.get_field_index("f"), "f", pa.array(nf, type=_I64)
            )

        cur = cur.map_batches(_tag, batch_format="pyarrow")

    def _out(batch: pa.Table) -> pa.Table:
        b = batch.column("b").to_numpy(zero_copy_only=False)
        f = batch.column("f").to_numpy(zero_copy_only=False)
        sel = batch.filter(pa.array((b >= 0) & (f >= 100)))
        rnd = sel.column("f").to_numpy(zero_copy_only=False) - 99
        return pa.table(
            {
                "u": sel.column("a"),
                "v": sel.column("b"),
                "round": pa.array(rnd.astype(np.int64), type=_I64),
            }
        )

    return cur.map_batches(_out, batch_format="pyarrow")
