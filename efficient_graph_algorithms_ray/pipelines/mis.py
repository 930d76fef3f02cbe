"""Maximal independent set — Luby-style fixed-round peeling over an
edge Dataset.

Public algorithm: Luby (SIAM J. Comput. 1986): each round every
undecided vertex draws a priority; a vertex joins the MIS iff its
priority is strictly smaller than every undecided neighbor's, its
neighbors are excluded, and the live edge set shrinks to the edges
between still-undecided vertices. Undecided vertices with no live
neighbors join the MIS (the empty-min rule). The reference has no MIS
operator; this is part of the engine's decomposition family next to
LDD (/root/reference/src/ega/algorithms/* partition utilities use
greedy independent anchors implicitly when seeding clusters).

Determinism: priorities are a bijection of vid — pri(v, r) =
mix(v + RC_r) with mix(x) = (x · C mod 2^64) ⊕ (· >> 29), C odd (odd
multiplier mod 2^64 and xorshift are each bijective). Distinct vids ⇒
distinct priorities ⇒ no ties, so the winner set is well-defined and
two adjacent vertices can never both win. RC_r = splitmix64(seed·R+r)
is inlined into the SQL oracle as a literal; the round count is FIXED
(not run-to-fixpoint) so the unrolled oracle replays the run exactly.

Round plan (three hash-partitioned exchanges, each over the shrinking
live set; the per-vertex state rows ride the same shuffles):

1. ``groupby(x % P)`` over both orientations of the live edges — each
   vertex x's group holds all its live edges, so win(x) =
   pri(x) < min pri(nbr) is computed locally (priorities are pure
   functions of (vid, round): neighbors' priorities are COMPUTED, not
   shipped). Emits one notify row (y ← win(x)) per edge orientation
   plus a self row per live vertex.
2. ``groupby(v % P)`` over notify + self + state rows — decides v's
   new status (win → 1, winning neighbor → 2, else 0; no self row and
   status 0 → isolated → 1) and emits one survival claim per edge
   whose v-side stays undecided.
3. ``groupby(pair_hash % P)`` — an edge survives iff both endpoint
   claims arrived; state rows pass through.

Scale: every exchange is hash-partitioned with no broadcast state; the
edge rows shrink geometrically (Luby: expected ≥ half the edge mass
decided per round); the O(V) state rows re-shuffle each round —
the standard cost of keeping vertex state on the data path instead of
a mutable store.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from .truss import _mix

_I64 = pa.int64()
_U64MASK = np.uint64(0xFFFFFFFFFFFFFFFF)
_PRI_C = np.uint64(0x9E3779B97F4A7C15)
PRI_C = int(_PRI_C)


def round_constants(seed: int, rounds: int) -> list[int]:
    """RC_r = splitmix64(seed * rounds_stride + r); inlined in SQL."""
    from ..oracles.sql import sm64_py

    return [sm64_py((seed * 0x10003 + r) & 0xFFFFFFFFFFFFFFFF) for r in range(rounds)]


def _pri(v: np.ndarray, rc: np.uint64) -> np.ndarray:
    """Bijective per-round priority of vid array ``v`` (uint64)."""
    with np.errstate(over="ignore"):
        x = (v.astype(np.uint64) + rc) * _PRI_C
    return x ^ (x >> np.uint64(29))


def _rows(part, a, b, f) -> pa.Table:
    return pa.table(
        {
            "part": pa.array(np.asarray(part, dtype=np.int64), type=_I64),
            "a": pa.array(np.asarray(a, dtype=np.int64), type=_I64),
            "b": pa.array(np.asarray(b, dtype=np.int64), type=_I64),
            "f": pa.array(np.asarray(f, dtype=np.int64), type=_I64),
        }
    )


# row kinds, encoded in column b (vids are non-negative):
_STATE = -1  # (a=vid, f=status)
_SELF = -2  # (a=vid, f=win)
# b >= 0: in exchange 2 a notify row (a=vid, b=nbr, f=win_nbr);
#          in cur / exchange 3 an edge row (a=u, b=v canonical, f)


def maximal_independent_set(
    edges, *, rounds: int = 3, num_partitions: int = 16, seed: int = 7
):
    """``rounds`` Luby rounds over ``edges``; returns a Dataset
    (vid, status) with status 0 = undecided, 1 = in MIS, 2 = excluded.

    ``edges``: Dataset with int-like (src, dst); duplicates and either
    orientation fine — canonicalized and deduped here. The vertex
    universe is the set of edge endpoints.
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
        """Distinct canonical edges, emitted in BOTH orientations so
        every vertex's exchange-1 group holds its complete live
        adjacency (first round seeds no state rows: exchange 2 defaults
        absent vertices to undecided)."""
        u = group.column("a").to_numpy(zero_copy_only=False).astype(np.uint64)
        v = group.column("b").to_numpy(zero_copy_only=False).astype(np.uint64)
        order = np.lexsort((v, u))
        u, v = u[order], v[order]
        first = np.concatenate(([True], (u[1:] != u[:-1]) | (v[1:] != v[:-1])))
        u, v = u[first], v[first]
        x = np.concatenate([u, v])
        y = np.concatenate([v, u])
        return _rows((x % np.uint64(P)).astype(np.int64), x, y, np.zeros(len(x)))

    # distinct edges in both orientations, keyed by first endpoint
    cur = (
        edges.map_batches(_canon, batch_format="pyarrow")
        .groupby("part")
        .map_groups(_dedup_orient, batch_format="pyarrow")
    )

    def _x1(group: pa.Table, rc: np.uint64) -> pa.Table:
        """Per-vertex win decision from locally-complete adjacency."""
        a = group.column("a").to_numpy(zero_copy_only=False)
        b = group.column("b").to_numpy(zero_copy_only=False)
        f = group.column("f").to_numpy(zero_copy_only=False)
        is_state = b == _STATE
        x = a[~is_state].astype(np.uint64)
        y = b[~is_state].astype(np.uint64)
        out = []
        if len(x):
            order = np.argsort(x, kind="stable")
            x, y = x[order], y[order]
            starts = np.flatnonzero(np.concatenate(([True], x[1:] != x[:-1])))
            gid = np.cumsum(np.concatenate(([True], x[1:] != x[:-1]))) - 1
            pmin = np.minimum.reduceat(_pri(y, rc), starts)
            win = (_pri(x[starts], rc) < pmin).astype(np.int64)
            # notify rows: tell y whether x won
            out.append(
                _rows((y % np.uint64(P)).astype(np.int64), y, x, win[gid])
            )
            # self rows for live vertices
            xs = x[starts]
            out.append(
                _rows(
                    (xs % np.uint64(P)).astype(np.int64),
                    xs,
                    np.full(len(xs), _SELF),
                    win,
                )
            )
        if is_state.any():
            sa = a[is_state]
            out.append(
                _rows(
                    (sa.astype(np.uint64) % np.uint64(P)).astype(np.int64),
                    sa,
                    np.full(len(sa), _STATE),
                    f[is_state],
                )
            )
        return pa.concat_tables(out) if out else _rows([], [], [], [])

    def _x2(group: pa.Table) -> pa.Table:
        """Decide new statuses; emit edge-survival claims."""
        a = group.column("a").to_numpy(zero_copy_only=False).astype(np.uint64)
        b = group.column("b").to_numpy(zero_copy_only=False)
        f = group.column("f").to_numpy(zero_copy_only=False)
        order = np.argsort(a, kind="stable")
        a, b, f = a[order], b[order], f[order]
        starts = np.flatnonzero(np.concatenate(([True], a[1:] != a[:-1])))
        ends = np.append(starts[1:], len(a))
        gid = np.cumsum(np.concatenate(([True], a[1:] != a[:-1]))) - 1
        n_g = len(starts)
        is_state = b == _STATE
        is_self = b == _SELF
        is_ntf = b >= 0
        # per-vertex reductions (duplicate state rows from the seeding
        # round agree, so max() is a plain dedup)
        status = np.zeros(n_g, dtype=np.int64)
        np.maximum.at(status, gid[is_state], f[is_state])
        has_self = np.zeros(n_g, dtype=bool)
        has_self[gid[is_self]] = True
        win_v = np.zeros(n_g, dtype=np.int64)
        np.maximum.at(win_v, gid[is_self], f[is_self])
        nbr_won = np.zeros(n_g, dtype=bool)
        if is_ntf.any():
            np.maximum.at(nbr_won, gid[is_ntf], f[is_ntf] == 1)
        undecided = status == 0
        new_status = status.copy()
        new_status[undecided & ((win_v == 1) | ~has_self)] = 1
        new_status[undecided & (win_v == 0) & has_self & nbr_won] = 2
        vids = a[starts]
        out = [
            _rows(
                (vids % np.uint64(P)).astype(np.int64),
                vids,
                np.full(n_g, _STATE),
                new_status,
            )
        ]
        # survival claims: v stays undecided → claim every incident edge
        stay = new_status[gid] == 0
        claim = is_ntf & stay
        if claim.any():
            cv, cx = a[claim], b[claim].astype(np.uint64)
            cu, cw = np.minimum(cv, cx), np.maximum(cv, cx)
            out.append(
                _rows(
                    (_mix(cu, cw) % np.uint64(P)).astype(np.int64),
                    cu,
                    cw,
                    np.full(len(cu), 2),
                )
            )
        return pa.concat_tables(out)

    def _x3(group: pa.Table) -> pa.Table:
        """Edges with both claims survive; state rows pass through."""
        a = group.column("a").to_numpy(zero_copy_only=False)
        b = group.column("b").to_numpy(zero_copy_only=False)
        f = group.column("f").to_numpy(zero_copy_only=False)
        is_state = b == _STATE
        out = []
        if is_state.any():
            sa = a[is_state]
            out.append(
                _rows(
                    (sa.astype(np.uint64) % np.uint64(P)).astype(np.int64),
                    sa,
                    np.full(len(sa), _STATE),
                    f[is_state],
                )
            )
        u = a[~is_state].astype(np.uint64)
        v = b[~is_state].astype(np.uint64)
        if len(u):
            order = np.lexsort((v, u))
            u, v = u[order], v[order]
            first = np.concatenate(([True], (u[1:] != u[:-1]) | (v[1:] != v[:-1])))
            gidx = np.cumsum(first) - 1
            cnt = np.bincount(gidx)
            keep = cnt >= 2
            ku, kv = u[first][keep], v[first][keep]
            # survivors back to both orientations for the next round
            kx = np.concatenate([ku, kv])
            ky = np.concatenate([kv, ku])
            out.append(
                _rows(
                    (kx % np.uint64(P)).astype(np.int64), kx, ky, np.zeros(len(kx))
                )
            )
        return pa.concat_tables(out) if out else _rows([], [], [], [])

    for r in range(rounds):
        rc = rcs[r]
        cur = (
            cur.groupby("part")
            .map_groups(lambda g, rc=rc: _x1(g, rc), batch_format="pyarrow")
            .groupby("part")
            .map_groups(_x2, batch_format="pyarrow")
            .groupby("part")
            .map_groups(_x3, batch_format="pyarrow")
        )

    def _out(batch: pa.Table) -> pa.Table:
        b = batch.column("b").to_numpy(zero_copy_only=False)
        sel = batch.filter(pa.array(b == _STATE))
        return pa.table({"vid": sel.column("a"), "status": sel.column("f")})

    return cur.map_batches(_out, batch_format="pyarrow")


def greedy_coloring(
    edges, *, rounds: int = 4, num_partitions: int = 16, seed: int = 13
):
    """Jones–Plassmann greedy graph coloring (Jones & Plassmann, SIAM
    J. Sci. Comput. 1993), ``rounds`` fixed rounds: per round every
    UNCOLORED vertex with priority strictly below all uncolored
    neighbors takes color = round index (1-based); uncolored vertices
    with no live neighbors also color (empty-min, as in Luby). Unlike
    MIS, winners' neighbors stay in play — the live edge set shrinks
    to uncolored–uncolored pairs only. Proper by construction: two
    adjacent vertices can never win the same round (bijective
    priorities), and once colored a vertex never changes.

    Same three hash-partitioned exchanges per round as
    ``maximal_independent_set`` (win from locally-complete adjacency →
    status decide + survival claims → both-claims edge filter).
    Returns Dataset (vid, color): 1..rounds, or −1 if still uncolored
    after the fixed rounds.
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
        a = group.column("a").to_numpy(zero_copy_only=False)
        b = group.column("b").to_numpy(zero_copy_only=False)
        f = group.column("f").to_numpy(zero_copy_only=False)
        is_state = b == _STATE
        x = a[~is_state].astype(np.uint64)
        y = b[~is_state].astype(np.uint64)
        out = []
        if len(x):
            order = np.argsort(x, kind="stable")
            x, y = x[order], y[order]
            starts = np.flatnonzero(np.concatenate(([True], x[1:] != x[:-1])))
            gid = np.cumsum(np.concatenate(([True], x[1:] != x[:-1]))) - 1
            pmin = np.minimum.reduceat(_pri(y, rc), starts)
            win = (_pri(x[starts], rc) < pmin).astype(np.int64)
            out.append(_rows((y % np.uint64(P)).astype(np.int64), y, x, win[gid]))
            xs = x[starts]
            out.append(
                _rows(
                    (xs % np.uint64(P)).astype(np.int64),
                    xs,
                    np.full(len(xs), _SELF),
                    win,
                )
            )
        if is_state.any():
            sa = a[is_state]
            out.append(
                _rows(
                    (sa.astype(np.uint64) % np.uint64(P)).astype(np.int64),
                    sa,
                    np.full(len(sa), _STATE),
                    f[is_state],
                )
            )
        return pa.concat_tables(out) if out else _rows([], [], [], [])

    def _x2(group: pa.Table, color: int) -> pa.Table:
        a = group.column("a").to_numpy(zero_copy_only=False).astype(np.uint64)
        b = group.column("b").to_numpy(zero_copy_only=False)
        f = group.column("f").to_numpy(zero_copy_only=False)
        order = np.argsort(a, kind="stable")
        a, b, f = a[order], b[order], f[order]
        starts = np.flatnonzero(np.concatenate(([True], a[1:] != a[:-1])))
        gid = np.cumsum(np.concatenate(([True], a[1:] != a[:-1]))) - 1
        n_g = len(starts)
        is_state = b == _STATE
        is_self = b == _SELF
        is_ntf = b >= 0
        col = np.zeros(n_g, dtype=np.int64)
        np.maximum.at(col, gid[is_state], f[is_state])
        has_self = np.zeros(n_g, dtype=bool)
        has_self[gid[is_self]] = True
        win_v = np.zeros(n_g, dtype=np.int64)
        np.maximum.at(win_v, gid[is_self], f[is_self])
        uncolored = col == 0
        new_col = col.copy()
        new_col[uncolored & ((win_v == 1) | ~has_self)] = color
        vids = a[starts]
        out = [
            _rows(
                (vids % np.uint64(P)).astype(np.int64),
                vids,
                np.full(n_g, _STATE),
                new_col,
            )
        ]
        stay = new_col[gid] == 0
        claim = is_ntf & stay
        if claim.any():
            cv, cx = a[claim], b[claim].astype(np.uint64)
            cu, cw = np.minimum(cv, cx), np.maximum(cv, cx)
            out.append(
                _rows(
                    (_mix(cu, cw) % np.uint64(P)).astype(np.int64),
                    cu,
                    cw,
                    np.full(len(cu), 2),
                )
            )
        return pa.concat_tables(out)

    def _x3(group: pa.Table) -> pa.Table:
        a = group.column("a").to_numpy(zero_copy_only=False)
        b = group.column("b").to_numpy(zero_copy_only=False)
        f = group.column("f").to_numpy(zero_copy_only=False)
        is_state = b == _STATE
        out = []
        if is_state.any():
            sa = a[is_state]
            out.append(
                _rows(
                    (sa.astype(np.uint64) % np.uint64(P)).astype(np.int64),
                    sa,
                    np.full(len(sa), _STATE),
                    f[is_state],
                )
            )
        u = a[~is_state].astype(np.uint64)
        v = b[~is_state].astype(np.uint64)
        if len(u):
            order = np.lexsort((v, u))
            u, v = u[order], v[order]
            first = np.concatenate(([True], (u[1:] != u[:-1]) | (v[1:] != v[:-1])))
            gidx = np.cumsum(first) - 1
            cnt = np.bincount(gidx)
            keep = cnt >= 2
            ku, kv = u[first][keep], v[first][keep]
            kx = np.concatenate([ku, kv])
            ky = np.concatenate([kv, ku])
            out.append(
                _rows(
                    (kx % np.uint64(P)).astype(np.int64), kx, ky, np.zeros(len(kx))
                )
            )
        return pa.concat_tables(out) if out else _rows([], [], [], [])

    for r in range(rounds):
        rc = rcs[r]
        cur = (
            cur.groupby("part")
            .map_groups(lambda g, rc=rc: _x1(g, rc), batch_format="pyarrow")
            .groupby("part")
            .map_groups(lambda g, c=r + 1: _x2(g, c), batch_format="pyarrow")
            .groupby("part")
            .map_groups(_x3, batch_format="pyarrow")
        )

    def _out(batch: pa.Table) -> pa.Table:
        b = batch.column("b").to_numpy(zero_copy_only=False)
        sel = batch.filter(pa.array(b == _STATE))
        col = sel.column("f").to_numpy(zero_copy_only=False)
        col = np.where(col == 0, -1, col)
        return pa.table(
            {
                "vid": sel.column("a"),
                "color": pa.array(col.astype(np.int64), type=_I64),
            }
        )

    return cur.map_batches(_out, batch_format="pyarrow")
