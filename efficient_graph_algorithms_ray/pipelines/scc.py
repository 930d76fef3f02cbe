"""Strongly connected components — pivot FW-BW intersection on the
BSP superstep engine.

Public algorithm: the forward-backward (FW-BW) method for distributed
SCC (Fleischer-Hendrickson-Pinar 2000; the per-round kernel of every
Pregel/GraphX SCC implementation): for a pivot p, SCC(p) =
forward-reach(p) ∩ backward-reach(p). The engine runs the kernel for a
bounded DETERMINISTIC pivot set (the k smallest vertex ids) with a
bounded hop radius — the same bounded-seed / fixed-round contract as
the closeness, harmonic and betweenness queries, which is what makes
the result SQL-oracle-able.

Engine mapping: two max-mode vector-field runs ([n, k] 0/1 reach
flags, elementwise-max monoid = bitwise OR):

- forward reach: run on the FORWARD directed graph (flags flow along
  edge direction, so flag j marks "pivot j reaches me");
- backward reach: the same init on the REVERSED graph (flag j marks
  "I reach pivot j").

The composition reads both runs' final checkpoints per partition
(``read_state_part`` per shard inside a map_batches — the
betweenness-style no-driver-funnel join) and assigns vertex v to
pivot j = argmin{j : fwd[v,j] AND bwd[v,j]}; vertices intersecting no
pivot stay unassigned (a full SCC decomposition peels and repeats —
the peel loop is driver-trivial once this kernel exists).

Reference parity: the reference has no directed-graph machinery (its
components are undirected flood fills, /root/reference/src/
planar_separators/lipton_tarjan/utils.py:62-76); SCC is part of this
engine's link-graph charter (web graphs are directed).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray
import ray.data as rd

from ..state.ckpt import read_state_part
from ..state.graph import ShardedGraph
from ..state.superstep import run_supersteps

_U64 = pa.uint64()


def _pivot_init(pivots: np.ndarray):
    k = len(pivots)

    def init_fn(csr):
        n = len(csr["vids"])
        st = np.zeros((n, k))
        pos = np.searchsorted(csr["vids"], pivots)
        for j, p in enumerate(pos):
            if p < n and csr["vids"][p] == pivots[j]:
                st[p, j] = 1.0
        return st

    return init_fn


def pivot_scc(
    fwd_graph: ShardedGraph,
    rev_graph: ShardedGraph,
    ckpt_dir: str,
    pivots,
    *,
    rounds: int = 8,
):
    """SCCs of the bounded pivot set, hop radius ``rounds`` per side.

    ``fwd_graph``/``rev_graph`` must be directed builds of the same
    edge table with src/dst swapped (same vertex universe, same
    partition count → identical per-partition vid layout, asserted in
    the composition). Returns (Dataset (vid, scc), fwd_summary,
    bwd_summary) where scc = the pivot's vid (pivots in the same SCC
    collapse onto the smallest of them) and unassigned vertices are
    absent from the output.
    """
    assert fwd_graph.directed and rev_graph.directed
    pivots = np.unique(np.asarray(pivots, dtype=np.uint64))
    k = len(pivots)
    init_fn = _pivot_init(pivots)

    fwd = run_supersteps(
        fwd_graph, ckpt_dir + "_f", "max", init_fn, tol=0.0, max_iters=rounds
    )
    bwd = run_supersteps(
        rev_graph, ckpt_dir + "_b", "max", init_fn, tol=0.0, max_iters=rounds
    )
    f_dir, b_dir = fwd["final_iter_dir"], bwd["final_iter_dir"]

    f_refs, b_refs = fwd_graph.refs, rev_graph.refs

    def _compose(batch: pa.Table) -> pa.Table:
        parts = batch.column("part").to_numpy(zero_copy_only=False)
        vid_out, scc_out = [], []
        for p in parts:
            p = int(p)
            vids = ray.get(f_refs[p])["vids"]
            assert np.array_equal(vids, ray.get(b_refs[p])["vids"]), (
                "fwd/rev graphs disagree on partition vid layout"
            )
            F = read_state_part(f_dir, p)
            B = read_state_part(b_dir, p)
            both = (F > 0) & (B > 0)
            hit = both.any(axis=1)
            if hit.any():
                j = both[hit].argmax(axis=1)
                vid_out.append(vids[hit])
                scc_out.append(pivots[j])
        vids = np.concatenate(vid_out) if vid_out else np.empty(0, np.uint64)
        sccs = np.concatenate(scc_out) if scc_out else np.empty(0, np.uint64)
        return pa.table(
            {"vid": pa.array(vids, type=_U64), "scc": pa.array(sccs, type=_U64)}
        )

    # drive the composition off the checkpoint's own file listing (one
    # row per partition file) — state rows never pass through the driver
    ds = rd.read_parquet(f_dir, columns=["part"]).map_batches(
        _compose, batch_format="pyarrow"
    )
    return ds, fwd, bwd


def bowtie_classes(
    fwd_graph: ShardedGraph,
    rev_graph: ShardedGraph,
    ckpt_dir: str,
    pivot: int,
    *,
    rounds: int = 8,
):
    """Bowtie decomposition of a directed graph around one pivot
    (Broder et al., "Graph structure in the Web", WWW 2000): with
    F = forward-reach(pivot) and B = backward-reach(pivot), each
    vertex is CORE (F ∩ B — the pivot's SCC), OUT (F \\ B — reachable
    from the core but not back), IN (B \\ F — reaches the core but is
    not reached), or OTHER (tendrils/disconnected). Bounded hop radius
    ``rounds`` per side (the engine's fixed-round oracle contract).

    Returns (Dataset (vid, cls), fwd_summary, bwd_summary) over ALL
    vertices; cls codes: 0 = core, 1 = in, 2 = out, 3 = other.
    """
    assert fwd_graph.directed and rev_graph.directed
    pivots = np.asarray([pivot], dtype=np.uint64)
    init_fn = _pivot_init(pivots)

    fwd = run_supersteps(
        fwd_graph, ckpt_dir + "_f", "max", init_fn, tol=0.0, max_iters=rounds
    )
    bwd = run_supersteps(
        rev_graph, ckpt_dir + "_b", "max", init_fn, tol=0.0, max_iters=rounds
    )
    f_dir, b_dir = fwd["final_iter_dir"], bwd["final_iter_dir"]
    f_refs, b_refs = fwd_graph.refs, rev_graph.refs

    def _classify(batch: pa.Table) -> pa.Table:
        parts = batch.column("part").to_numpy(zero_copy_only=False)
        vid_out, cls_out = [], []
        for p in parts:
            p = int(p)
            vids = ray.get(f_refs[p])["vids"]
            assert np.array_equal(vids, ray.get(b_refs[p])["vids"]), (
                "fwd/rev graphs disagree on partition vid layout"
            )
            F = read_state_part(f_dir, p).reshape(-1) > 0
            B = read_state_part(b_dir, p).reshape(-1) > 0
            cls = np.full(len(vids), 3, dtype=np.int64)  # other
            cls[F & B] = 0  # core
            cls[B & ~F] = 1  # in
            cls[F & ~B] = 2  # out
            vid_out.append(vids)
            cls_out.append(cls)
        vids = np.concatenate(vid_out) if vid_out else np.empty(0, np.uint64)
        cls = np.concatenate(cls_out) if cls_out else np.empty(0, np.int64)
        return pa.table(
            {"vid": pa.array(vids, type=_U64), "cls": pa.array(cls, type=pa.int64())}
        )

    ds = rd.read_parquet(f_dir, columns=["part"]).map_batches(
        _classify, batch_format="pyarrow"
    )
    return ds, fwd, bwd


_TRIM_K = float(1 << 26)  # dual-direction weight radix (counts < 2^26)


def trim_message_edges(edges):
    """Directed edge table → the weighted message-edge table that
    computes in-degree AND out-degree in ONE gather: each real edge
    x→y emits (x→y, w=1) (alive(x) counts into din(y)) and (y→x,
    w=K) (alive(y) counts into dout(x)). The CSR pack sums duplicate
    slots, so a 2-cycle's fused weight 1+K carries both real
    contributions. Exact while either per-vertex degree count stays
    below K = 2^26 (float64 integer arithmetic; the beyond-2^26 path
    is two unweighted runs per round, one per direction)."""
    def _fn(batch: pa.Table) -> pa.Table:
        u = batch.column("src").to_numpy(zero_copy_only=False).astype(np.uint64)
        v = batch.column("dst").to_numpy(zero_copy_only=False).astype(np.uint64)
        src = np.concatenate([u, v])
        dst = np.concatenate([v, u])
        w = np.concatenate([np.ones(len(u)), np.full(len(u), _TRIM_K)])
        return pa.table(
            {
                "src": pa.array(src, type=_U64),
                "dst": pa.array(dst, type=_U64),
                "w": pa.array(w, type=pa.float64()),
            }
        )

    return edges.map_batches(_fn, batch_format="pyarrow")


def directed_trim_rounds(graph: ShardedGraph, ckpt_dir: str, *, rounds: int = 6):
    """Iterative source/sink peeling of a directed graph — the "trim"
    step of every distributed SCC pipeline (removes the vertices whose
    SCC is a singleton because they have no in- or no out-edge in the
    surviving subgraph; Slota-Rajamanickam-Madduri IPDPS 2014 and the
    FW-BW-trim family).

    ``graph`` must be the weighted build of ``trim_message_edges``.
    One superstep run: state [alive, removed_round, counter]; each
    superstep gathers acc = din + K·dout over ALIVE neighbors (dead
    vertices send 0), then kills vertices with either side zero.
    Returns (Dataset (vid, trim_round), summary): trim_round = the
    1-based peel round that removed the vertex, 0 = survives all
    ``rounds`` (the directed "core").
    """

    def init_fn(csr):
        n = len(csr["vids"])
        st = np.zeros((n, 3))
        st[:, 0] = 1.0
        return st

    def msg_fn(value, csr):
        msg = np.zeros_like(value)
        msg[:, 0] = value[:, 0]
        return msg

    def apply_fn(acc, old, T, dm, csr):
        new = old.copy()
        if len(old) == 0:
            return new
        t = old[0, 2]
        alive = old[:, 0] > 0
        a = acc[:, 0]
        dout = np.floor(a / _TRIM_K)
        din = a - dout * _TRIM_K
        die = alive & ((din == 0) | (dout == 0))
        new[die, 0] = 0.0
        new[die, 1] = t + 1.0
        new[:, 2] = t + 1.0
        return new

    summary = run_supersteps(
        graph,
        ckpt_dir,
        "sum",
        init_fn,
        tol=0.0,
        max_iters=rounds,
        normalize=False,
        msg_fn=msg_fn,
        apply_fn=apply_fn,
        msg_edge_weights=True,
    )
    refs = graph.refs
    final = summary["final_iter_dir"]

    def _shape(batch: pa.Table) -> pa.Table:
        parts = batch.column("part").to_numpy(zero_copy_only=False)
        vid_out, r_out = [], []
        for p in parts:
            p = int(p)
            vids = ray.get(refs[p])["vids"]
            st = read_state_part(final, p)
            vid_out.append(vids)
            r_out.append(st[:, 1].astype(np.int64))
        vids = np.concatenate(vid_out) if vid_out else np.empty(0, np.uint64)
        rr = np.concatenate(r_out) if r_out else np.empty(0, np.int64)
        return pa.table(
            {
                "vid": pa.array(vids, type=_U64),
                "trim_round": pa.array(rr, type=pa.int64()),
            }
        )

    ds = rd.read_parquet(final, columns=["part"]).map_batches(
        _shape, batch_format="pyarrow"
    )
    return ds, summary


def _semi_join_edges(edges, keep_ds, col: str):
    """Edges whose ``col`` endpoint appears in keep_ds (vid) — the
    union-tag co-shuffle semi-join (one groupby; no broadcast, no
    driver scan — keep sets are O(V) at web scale)."""

    def _tag_edges(b: pa.Table) -> pa.Table:
        key = b.column(col).to_numpy(zero_copy_only=False).astype(np.uint64)
        return pa.table(
            {
                "key": pa.array(key.view(np.int64), type=pa.int64()),
                "src": b.column("src"),
                "dst": b.column("dst"),
                "keep": pa.array(np.zeros(b.num_rows, dtype=np.int8), type=pa.int8()),
            }
        )

    def _tag_keep(b: pa.Table) -> pa.Table:
        key = b.column("vid").to_numpy(zero_copy_only=False).astype(np.uint64)
        z = np.zeros(len(key), dtype=np.uint64)
        return pa.table(
            {
                "key": pa.array(key.view(np.int64), type=pa.int64()),
                "src": pa.array(z, type=_U64),
                "dst": pa.array(z, type=_U64),
                "keep": pa.array(np.ones(len(key), dtype=np.int8), type=pa.int8()),
            }
        )

    tagged = edges.map_batches(_tag_edges, batch_format="pyarrow").union(
        keep_ds.map_batches(_tag_keep, batch_format="pyarrow")
    )

    def _grp(g: pa.Table) -> pa.Table:
        keep = g.column("keep").to_numpy(zero_copy_only=False)
        if not (keep == 1).any():
            mask = np.zeros(len(keep), dtype=bool)
        else:
            mask = keep == 0
        return pa.table(
            {
                "src": g.column("src").filter(pa.array(mask)),
                "dst": g.column("dst").filter(pa.array(mask)),
            }
        )

    return tagged.groupby("key").map_groups(_grp, batch_format="pyarrow")


def filter_edges_to_vertices(edges, keep_ds):
    """Edges with BOTH endpoints in keep_ds — two co-shuffle semi-joins."""
    return _semi_join_edges(_semi_join_edges(edges, keep_ds, "src"), keep_ds, "dst")


def scc_decompose(
    edges,
    cfg,
    ckpt_dir: str,
    *,
    peels: int = 2,
    trim_rounds: int = 2,
    pivots_k: int = 4,
    reach_rounds: int = 6,
):
    """The full distributed SCC peel loop (trim + FW-BW, the
    Slota-Rajamanickam-Madduri pipeline shape): per peel, (1) trim —
    vertices peeled as sources/sinks are EXACT singleton SCCs (no
    cycle passes through a vertex with an empty side), assigned
    scc = own vid; (2) pivot FW-BW over the surviving core — bounded
    pivot set (the ``pivots_k`` smallest surviving vids), bounded hop
    radius; (3) peel — assigned vertices leave, the edge set shrinks
    by two co-shuffle semi-joins, repeat. Fixed counts everywhere keep
    it SQL-oracle-able; vertices still unassigned after the last peel
    are absent from the output.

    Returns Dataset (vid, scc, kind) — kind 0 = trim singleton,
    1 = pivot SCC member.
    """
    from .graph_build import build_graph

    out_parts = []
    cur = edges.materialize()
    for peel in range(peels):
        tg = build_graph(trim_message_edges(cur), cfg, directed=True)
        trim_ds, _ = directed_trim_rounds(
            tg, f"{ckpt_dir}_p{peel}_trim", rounds=trim_rounds
        )
        trim_ds = trim_ds.materialize()

        def _singles(b: pa.Table) -> pa.Table:
            tr = b.column("trim_round").to_numpy(zero_copy_only=False)
            m = pa.array(tr > 0)
            v = b.column("vid").filter(m)
            return pa.table(
                {
                    "vid": v,
                    "scc": v,
                    "kind": pa.array(
                        np.zeros(len(v), dtype=np.int64), type=pa.int64()
                    ),
                }
            )

        def _core(b: pa.Table) -> pa.Table:
            m = pa.array(b.column("trim_round").to_numpy(zero_copy_only=False) == 0)
            return pa.table({"vid": b.column("vid").filter(m)})

        out_parts.append(trim_ds.map_batches(_singles, batch_format="pyarrow"))
        core = trim_ds.map_batches(_core, batch_format="pyarrow")
        cur = filter_edges_to_vertices(cur, core).materialize()
        if cur.count() == 0:
            break

        fwd = build_graph(cur, cfg, directed=True)

        def _swap(b: pa.Table) -> pa.Table:
            return pa.table({"src": b.column("dst"), "dst": b.column("src")})

        rev = build_graph(
            cur.map_batches(_swap, batch_format="pyarrow"), cfg, directed=True
        )
        piv = smallest_vids(cur, k=pivots_k)
        assigned, _, _ = pivot_scc(
            fwd, rev, f"{ckpt_dir}_p{peel}_fwbw", piv, rounds=reach_rounds
        )
        assigned = assigned.materialize()

        def _kind1(b: pa.Table) -> pa.Table:
            return pa.table(
                {
                    "vid": b.column("vid"),
                    "scc": b.column("scc"),
                    "kind": pa.array(
                        np.ones(b.num_rows, dtype=np.int64), type=pa.int64()
                    ),
                }
            )

        out_parts.append(assigned.map_batches(_kind1, batch_format="pyarrow"))
        if peel < peels - 1:

            def _keep(b: pa.Table) -> pa.Table:
                return pa.table({"vid": b.column("vid")})

            # survivors = core minus the pivot-assigned set: the
            # anti-side of the same co-shuffle (tag assigned as the
            # "dead" marker and keep unmarked vertices)
            def _tag_v(b: pa.Table) -> pa.Table:
                key = b.column("vid").to_numpy(zero_copy_only=False).astype(np.uint64)
                return pa.table(
                    {
                        "key": pa.array(key.view(np.int64), type=pa.int64()),
                        "vid": b.column("vid"),
                        "dead": pa.array(
                            np.zeros(len(key), dtype=np.int8), type=pa.int8()
                        ),
                    }
                )

            def _tag_a(b: pa.Table) -> pa.Table:
                key = b.column("vid").to_numpy(zero_copy_only=False).astype(np.uint64)
                return pa.table(
                    {
                        "key": pa.array(key.view(np.int64), type=pa.int64()),
                        "vid": b.column("vid"),
                        "dead": pa.array(
                            np.ones(len(key), dtype=np.int8), type=pa.int8()
                        ),
                    }
                )

            def _alive(g: pa.Table) -> pa.Table:
                dead = g.column("dead").to_numpy(zero_copy_only=False)
                if (dead == 1).any():
                    mask = np.zeros(len(dead), dtype=bool)
                else:
                    mask = dead == 0
                return pa.table({"vid": g.column("vid").filter(pa.array(mask))})

            survivors = (
                core.map_batches(_tag_v, batch_format="pyarrow")
                .union(
                    assigned.map_batches(_keep, batch_format="pyarrow").map_batches(
                        _tag_a, batch_format="pyarrow"
                    )
                )
                .groupby("key")
                .map_groups(_alive, batch_format="pyarrow")
            )
            cur = filter_edges_to_vertices(cur, survivors).materialize()
            if cur.count() == 0:
                break

    out = out_parts[0]
    for ds in out_parts[1:]:
        out = out.union(ds)
    return out


def smallest_vids(edges, k: int = 4) -> np.ndarray:
    """The k smallest vertex ids of an edge table — per-block partial
    bottom-k over both endpoint columns, then a tiny driver merge."""

    def _partial(batch: pa.Table) -> pa.Table:
        u = batch.column("src").to_numpy(zero_copy_only=False)
        v = batch.column("dst").to_numpy(zero_copy_only=False)
        x = np.unique(np.concatenate([u, v]).astype(np.uint64))[:k]
        return pa.table({"vid": pa.array(x, type=_U64)})

    parts = edges.map_batches(_partial, batch_format="pyarrow").take_all()
    cand = np.unique(np.array([r["vid"] for r in parts], dtype=np.uint64))
    return cand[:k]
