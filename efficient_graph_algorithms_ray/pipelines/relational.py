"""Relational + graph queries over the driver's testdata tables.

Each function here takes ``sf_dir`` and returns a Dataset / pyarrow
Table whose row count, schema AND values must match the paired ANSI
SQL in ``__ray_entry__.oracle_sql()`` (DuckDB). Rules that keep the
value-hash comparison meaningful:

- identical column names on both sides;
- integer outputs wherever possible (sums of money as cents →
  BIGINT: exact in float64 well below 2^53, so no float-rounding
  hazards);
- floats only where unavoidable, rounded identically on both sides;
- vids in these queries are the testdata's own int64 keys (offset to
  disambiguate the two endpoints' key spaces), not hashed — SQL can
  reproduce them.

Graph queries run the *real engine* (build_graph → supersteps) over
edge tables derived from lineitem/orders, so the driver's DuckDB
check exercises the full distributed path end-to-end.
"""

from __future__ import annotations

import os
import tempfile

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import ray.data as rd
from ray.data.aggregate import Count, Sum

from ..config import EngineConfig
from ..pipelines.components import connected_components
from ..pipelines.degrees import degree_table
from ..pipelines.graph_build import build_graph
from ..pipelines.pagerank import pagerank
from ..pipelines.triangles import triangle_count
from ..util import parts_dataset

SUPP_OFFSET = 10_000_000  # supplier vid = l_suppkey + SUPP_OFFSET
ORDER_OFFSET = 100_000_000  # order vid = o_orderkey + ORDER_OFFSET


def _read(sf_dir: str, table: str, columns=None):
    return rd.read_parquet(os.path.join(sf_dir, f"{table}.parquet"), columns=columns)


def _ckpt(name: str) -> str:
    return tempfile.mkdtemp(prefix=f"ega_ray_{name}_", dir="/tmp")


# Built-graph cache: the driver runs every query in ONE Ray session, and
# ~10 queries share the same co-occurrence / part-supplier graph — each
# build is a full groupby shuffle + CSR pack (~4-5 s at sf0.01), so
# pinning the ShardedGraph once per (kind, sf_dir) cuts the whole gate
# by ~30%. ObjectRefs stay valid for the session; a new session starts
# with an empty cache.
_GRAPH_CACHE: dict = {}


def _coocc_graph(sf_dir: str):
    key = ("coocc", sf_dir)
    if key not in _GRAPH_CACHE:
        _GRAPH_CACHE[key] = build_graph(
            part_cooccurrence_edges(sf_dir), EngineConfig(num_partitions=16), directed=False
        )
    return _GRAPH_CACHE[key]


def _coocc_w_graph(sf_dir: str):
    """Weighted co-occurrence graph: w(u,v) = number of orders the pair
    shares (unit weights per generated pair, duplicates summed at CSR
    pack). Shared by the weighted-PageRank and MSF queries."""
    key = ("coocc_w", sf_dir)
    if key not in _GRAPH_CACHE:

        def _with_w(batch: pa.Table) -> pa.Table:
            return batch.append_column(
                "w", pa.array(np.ones(batch.num_rows), type=pa.float64())
            )

        edges = part_cooccurrence_edges(sf_dir).map_batches(
            _with_w, batch_format="pyarrow"
        )
        _GRAPH_CACHE[key] = build_graph(
            edges, EngineConfig(num_partitions=16), directed=False
        )
    return _GRAPH_CACHE[key]


def _partsupp_graph(sf_dir: str):
    key = ("partsupp", sf_dir)
    if key not in _GRAPH_CACHE:
        _GRAPH_CACHE[key] = build_graph(
            partsupp_edges(sf_dir), EngineConfig(num_partitions=16), directed=True
        )
    return _GRAPH_CACHE[key]


def _coocc_dir_graphs(sf_dir: str):
    """(fwd, rev) directed builds of the hash-oriented co-occurrence
    graph — same edge table with src/dst swapped, same partition count,
    so per-partition vid layouts are identical (pivot_scc asserts)."""
    key = ("coocc_dir", sf_dir)
    if key not in _GRAPH_CACHE:
        edges = directed_coocc_edges(sf_dir)

        def _swap(batch: pa.Table) -> pa.Table:
            return pa.table({"src": batch.column("dst"), "dst": batch.column("src")})

        fwd = build_graph(edges, EngineConfig(num_partitions=16), directed=True)
        rev = build_graph(
            directed_coocc_edges(sf_dir).map_batches(_swap, batch_format="pyarrow"),
            EngineConfig(num_partitions=16),
            directed=True,
        )
        _GRAPH_CACHE[key] = (fwd, rev)
    return _GRAPH_CACHE[key]


# --------------------------------------------------------------------------
# edge tables derived from testdata (int64 keys, SQL-reproducible)
# --------------------------------------------------------------------------

def partsupp_edges(sf_dir: str):
    """Directed bipartite graph: part → supplier (distinct lineitem pairs).

    Suppliers have out-degree 0 → the whole supplier side is dangling
    mass, a strong test of the damping/dangling arithmetic.
    """

    def _fn(batch: pa.Table) -> pa.Table:
        src = batch.column("l_partkey").to_numpy(zero_copy_only=False).astype(np.uint64)
        dst = (
            batch.column("l_suppkey").to_numpy(zero_copy_only=False) + SUPP_OFFSET
        ).astype(np.uint64)
        return pa.table(
            {
                "src": pa.array(src, type=pa.uint64()),
                "dst": pa.array(dst, type=pa.uint64()),
            }
        )

    return _read(sf_dir, "lineitem", ["l_partkey", "l_suppkey"]).map_batches(
        _fn, batch_format="pyarrow"
    )


def customer_order_edges(sf_dir: str):
    """Star forest: customer → order (one edge per order)."""

    def _fn(batch: pa.Table) -> pa.Table:
        src = batch.column("o_custkey").to_numpy(zero_copy_only=False).astype(np.uint64)
        dst = (
            batch.column("o_orderkey").to_numpy(zero_copy_only=False) + ORDER_OFFSET
        ).astype(np.uint64)
        return pa.table(
            {
                "src": pa.array(src, type=pa.uint64()),
                "dst": pa.array(dst, type=pa.uint64()),
            }
        )

    return _read(sf_dir, "orders", ["o_custkey", "o_orderkey"]).map_batches(
        _fn, batch_format="pyarrow"
    )


def directed_coocc_edges(sf_dir: str):
    """Hash-oriented directed version of the co-occurrence graph.

    Each undirected pair (a < b) is oriented by h = splitmix64(a ⊕
    splitmix64(b)): h % 4 == 0 → BOTH directions (2-cycles seed the
    SCCs), else h odd → a→b, h even → b→a. Deterministic and
    SQL-replayable (the oracle inlines the identical splitmix chain);
    random orientation of a dense co-occurrence topology yields
    non-trivial strongly connected cores."""
    from ..sources.edges_synth import _splitmix64

    def _orient(batch: pa.Table) -> pa.Table:
        a = batch.column("src").to_numpy(zero_copy_only=False).astype(np.uint64)
        b = batch.column("dst").to_numpy(zero_copy_only=False).astype(np.uint64)
        h = _splitmix64(a ^ _splitmix64(b))
        both = (h % np.uint64(4)) == 0
        fwd = ((h % np.uint64(2)) == 1) | both
        rev = ~fwd | both
        src = np.concatenate([a[fwd], b[rev]])
        dst = np.concatenate([b[fwd], a[rev]])
        return pa.table(
            {
                "src": pa.array(src, type=pa.uint64()),
                "dst": pa.array(dst, type=pa.uint64()),
            }
        )

    return part_cooccurrence_edges(sf_dir).map_batches(
        _orient, batch_format="pyarrow"
    )


COOCC_PAIR_PARTS = 64  # order-hash partitions for pair generation


def part_cooccurrence_edges(sf_dir: str, keep_orders=None):
    """Undirected part–part edges: parts sharing an order (dense, has
    triangles). Pairs generated per order, a < b (distinct parts of the
    order in ascending order, upper-triangle enumeration).

    One groupby over ``l_orderkey % COOCC_PAIR_PARTS`` (not per-order
    groups: that made one pandas task per ORDER — thousands of tiny
    Python calls). Each partition task handles all of its orders in one
    vectorized pass: lexsort by (order, part), adjacent-dedup, then for
    each distinct per-order part-count k gather the orders of that size
    into an (m, k) matrix and emit its triu pairs in one shot — the
    loop is over DISTINCT k values (≤ max lineitems per order, ~7),
    never over orders. Per-task memory is O(rows / partitions); raise
    ``COOCC_PAIR_PARTS`` with data size."""

    def _with_part(b: pa.Table) -> pa.Table:
        if keep_orders is not None:  # order-subset variant (crawl-delta)
            ok0 = b.column("l_orderkey").to_numpy(zero_copy_only=False)
            b = b.filter(pa.array(keep_orders(ok0)))
        ok = b.column("l_orderkey").to_numpy(zero_copy_only=False)
        return b.append_column(
            "part", pa.array((ok % COOCC_PAIR_PARTS).astype(np.int64))
        )

    def _pairs(group: pa.Table) -> pa.Table:
        ok = group.column("l_orderkey").to_numpy(zero_copy_only=False)
        pk = group.column("l_partkey").to_numpy(zero_copy_only=False).astype(np.uint64)
        srt = np.lexsort((pk, ok))
        ok, pk = ok[srt], pk[srt]
        # drop duplicate (order, part) rows (np.unique-per-order parity)
        keep = np.concatenate(([True], (ok[1:] != ok[:-1]) | (pk[1:] != pk[:-1])))
        ok, pk = ok[keep], pk[keep]
        starts = np.flatnonzero(np.concatenate(([True], ok[1:] != ok[:-1])))
        counts = np.diff(np.append(starts, len(ok)))
        src_out, dst_out = [], []
        for k in np.unique(counts):
            if k < 2:
                continue
            mat = pk[starts[counts == k][:, None] + np.arange(k)[None, :]]
            ia, ib = np.triu_indices(int(k), 1)
            src_out.append(mat[:, ia].ravel())
            dst_out.append(mat[:, ib].ravel())
        src = np.concatenate(src_out) if src_out else np.empty(0, np.uint64)
        dst = np.concatenate(dst_out) if dst_out else np.empty(0, np.uint64)
        return pa.table(
            {
                "src": pa.array(src, type=pa.uint64()),
                "dst": pa.array(dst, type=pa.uint64()),
            }
        )

    return (
        _read(sf_dir, "lineitem", ["l_orderkey", "l_partkey"])
        .map_batches(_with_part, batch_format="pyarrow")
        .groupby("part")
        .map_groups(_pairs, batch_format="pyarrow")
    )


def _vid_to_int64(ds, value_cols: dict[str, pa.DataType]):
    """Cast uint64 vid → int64 'vid' plus typed value columns."""

    def _fn(batch: pa.Table) -> pa.Table:
        cols = {"vid": batch.column("vid").cast(pa.int64())}
        for name, typ in value_cols.items():
            cols[name] = batch.column(name).cast(typ)
        return pa.table(cols)

    return ds.map_batches(_fn, batch_format="pyarrow")


# --------------------------------------------------------------------------
# graph queries (engine end-to-end, SQL-oracled)
# --------------------------------------------------------------------------

def q_degree_partsupp(sf_dir: str):
    g = _partsupp_graph(sf_dir)
    return _vid_to_int64(
        degree_table(g), {"out_deg": pa.int64(), "in_deg": pa.int64()}
    )


def q_pagerank_partsupp_k4(sf_dir: str):
    g = _partsupp_graph(sf_dir)
    ranks, _ = pagerank(g, _ckpt("prk4"), damping=0.85, tol=0.0, max_iters=4)

    def _round(batch: pa.Table) -> pa.Table:
        return pa.table(
            {
                "vid": batch.column("vid").cast(pa.int64()),
                "rank_r9": pc.round(batch.column("rank"), ndigits=9),
            }
        )

    return ranks.map_batches(_round, batch_format="pyarrow")


def q_avg_rank_small_parts(sf_dir: str):
    """get_average_projection parity: mean 4-step PageRank over the
    part vertices with p_size <= 10 — SQL-oracled (unrolled recurrence
    + AVG over the joined subset)."""
    import pyarrow.parquet as pq_  # noqa: N813

    from .pagerank import average_projection

    g = _partsupp_graph(sf_dir)
    ranks, _ = pagerank(g, _ckpt("prk4avg"), damping=0.85, tol=0.0, max_iters=4)
    part_tbl = pq_.read_table(
        os.path.join(sf_dir, "part.parquet"), columns=["p_partkey", "p_size"]
    )
    keys = part_tbl.column("p_partkey").to_numpy()
    sizes = part_tbl.column("p_size").to_numpy()
    subset = keys[sizes <= 10].astype(np.uint64)
    avg = average_projection(ranks, subset, col="rank")

    def _round(batch: pa.Table) -> pa.Table:
        return pa.table(
            {
                "avg_rank_r9": pc.round(batch.column("avg_rank"), ndigits=9),
                "n_vertices": batch.column("n_vertices"),
            }
        )

    return avg.map_batches(_round, batch_format="pyarrow")


def q_cc_customer_orders(sf_dir: str):
    g = build_graph(
        customer_order_edges(sf_dir), EngineConfig(num_partitions=16), directed=False
    )
    comp, _ = connected_components(g, _ckpt("cco"))
    return _vid_to_int64(comp, {"component": pa.int64()})


def q_cocitation_partsupp(sf_dir: str, k: int = 100):
    """Co-citation (Small 1973) over the directed part→supplier graph:
    supplier pairs ranked by how many parts cite both — THE classic
    link-graph similarity measure (its transpose, bibliographic
    coupling, is the same pipeline on the reversed edge). One bucketed
    co-shuffle (part % P) co-locates each citing part's supplier list
    (bounded per part), pairs emit with map-side combining, then a
    combiner-backed groupby + top-k. Returns (u, v, n_shared)."""
    from collections import Counter

    P = 32

    def _bucket(batch: pa.Table) -> pa.Table:
        part = batch.column("l_partkey").to_numpy(zero_copy_only=False).astype(np.int64)
        return pa.table(
            {
                "bucket": pa.array(part % P, type=pa.int64()),
                "part": pa.array(part, type=pa.int64()),
                "supp": batch.column("l_suppkey").cast(pa.int64()),
            }
        )

    def _pairs(g: pa.Table) -> pa.Table:
        part = g.column("part").to_numpy(zero_copy_only=False)
        supp = g.column("supp").to_numpy(zero_copy_only=False)
        order = np.lexsort((supp, part))
        part, supp = part[order], supp[order]
        c: Counter = Counter()
        i = 0
        while i < len(part):
            j = i
            while j < len(part) and part[j] == part[i]:
                j += 1
            ss = np.unique(supp[i:j])  # distinct (part, supplier) citations
            for a in range(len(ss)):
                for b in range(a + 1, len(ss)):
                    c[(ss[a], ss[b])] += 1
            i = j
        if not c:
            return pa.table(
                {
                    "u": pa.array([], type=pa.int64()),
                    "v": pa.array([], type=pa.int64()),
                    "n": pa.array([], type=pa.int64()),
                }
            )
        us, vs = zip(*c.keys())
        return pa.table(
            {
                "u": pa.array(list(us), type=pa.int64()),
                "v": pa.array(list(vs), type=pa.int64()),
                "n": pa.array(list(c.values()), type=pa.int64()),
            }
        )

    from ray.data.aggregate import Sum

    return (
        _read(sf_dir, "lineitem", ["l_partkey", "l_suppkey"])
        .map_batches(_bucket, batch_format="pyarrow")
        .groupby("bucket")
        .map_groups(_pairs, batch_format="pyarrow")
        .groupby(["u", "v"])
        .aggregate(Sum("n", alias_name="n_shared"))
        .sort(["n_shared", "u", "v"], descending=[True, False, False])
        .limit(k)
    )


def q_cc_incremental(sf_dir: str):
    """Incremental connected components (crawl-delta, CC edition):
    cold CC on the 90%-orders subgraph (o_orderkey % 10 != 0) seeds a
    warm run over the FULL customer–order graph
    (pipelines/components.py:connected_components_warm). The warm run
    converges to exactly the cold full-graph answer, so the existing
    CC SQL oracle checks it end-to-end."""
    from .components import connected_components, connected_components_warm

    def _subset_edges():
        def _fn(batch: pa.Table) -> pa.Table:
            ok = batch.column("o_orderkey").to_numpy(zero_copy_only=False) % 10 != 0
            keep = batch.filter(pa.array(ok))
            src = keep.column("o_custkey").to_numpy(zero_copy_only=False).astype(np.uint64)
            dst = (
                keep.column("o_orderkey").to_numpy(zero_copy_only=False) + ORDER_OFFSET
            ).astype(np.uint64)
            return pa.table(
                {
                    "src": pa.array(src, type=pa.uint64()),
                    "dst": pa.array(dst, type=pa.uint64()),
                }
            )

        return _read(sf_dir, "orders", ["o_custkey", "o_orderkey"]).map_batches(
            _fn, batch_format="pyarrow"
        )

    g_old = build_graph(_subset_edges(), EngineConfig(num_partitions=16), directed=False)
    old_dir = _ckpt("ccw_old")
    _, old_summary = connected_components(g_old, old_dir)

    g_new = build_graph(
        customer_order_edges(sf_dir), EngineConfig(num_partitions=16), directed=False
    )
    comp, _ = connected_components_warm(
        g_new,
        _ckpt("ccw_new"),
        warm_graph=g_old,
        warm_final_dir=old_summary["final_iter_dir"],
    )
    return _vid_to_int64(comp, {"component": pa.int64()})


def q_triangles_coocc(sf_dir: str):
    g = _coocc_graph(sf_dir)
    return _vid_to_int64(triangle_count(g), {"triangles": pa.int64()})


# --------------------------------------------------------------------------
# relational queries (vectorized map_batches + partial aggregation)
# --------------------------------------------------------------------------

def q_pricing_summary(sf_dir: str):
    """TPC-H Q1 shape with exact integer aggregates (cents)."""

    def _partial(batch: pa.Table) -> pa.Table:
        # Arrow-native hash aggregate — zero pandas round-trip
        t = pa.table(
            {
                "l_returnflag": batch.column("l_returnflag"),
                "l_linestatus": batch.column("l_linestatus"),
                "sum_qty": pa.array(
                    batch.column("l_quantity").to_numpy(zero_copy_only=False).astype(np.int64)
                ),
                "sum_price_cents": pa.array(
                    np.floor(
                        batch.column("l_extendedprice").to_numpy(zero_copy_only=False) * 100
                    ).astype(np.int64)
                ),
            }
        )
        out = t.group_by(["l_returnflag", "l_linestatus"]).aggregate(
            [("sum_qty", "sum"), ("sum_price_cents", "sum"), ("sum_qty", "count")]
        )
        out = out.rename_columns(
            ["l_returnflag", "l_linestatus", "sum_qty", "sum_price_cents", "n"]
        )
        return out.set_column(4, "n", out.column("n").cast(pa.int64()))

    partials = _read(
        sf_dir, "lineitem", ["l_returnflag", "l_linestatus", "l_quantity", "l_extendedprice"]
    ).map_batches(_partial, batch_format="pyarrow")
    return partials.groupby(["l_returnflag", "l_linestatus"]).aggregate(
        Sum("sum_qty", alias_name="sum_qty"),
        Sum("sum_price_cents", alias_name="sum_price_cents"),
        Sum("n", alias_name="n"),
    )


def q_top_customers(sf_dir: str):
    """Top 10 customers by order count (ties → lower custkey), exact cents."""
    orders = _read(sf_dir, "orders", ["o_custkey", "o_totalprice"])

    def _prep(batch: pa.Table) -> pa.Table:
        return pa.table(
            {
                "custkey": batch.column("o_custkey"),
                "cents": pa.array(
                    np.floor(
                        batch.column("o_totalprice").to_numpy(zero_copy_only=False) * 100
                    ).astype(np.int64),
                    type=pa.int64(),
                ),
            }
        )

    agg = (
        orders.map_batches(_prep, batch_format="pyarrow")
        .groupby("custkey")
        .aggregate(Count(alias_name="n_orders"), Sum("cents", alias_name="total_cents"))
    )
    return agg.sort(["n_orders", "custkey"], descending=[True, False]).limit(10)


def q_events_hourly(sf_dir: str):
    """Tumbling 1-hour window aggregate over the events stream table."""

    def _prep(batch: pa.Table) -> pa.Table:
        return pa.table(
            {
                "event_type": batch.column("event_type"),
                # cast: floor_temporal can downscale the unit; DuckDB's
                # date_trunc stays timestamp[us] and the driver compares schemas
                "hour": pc.floor_temporal(batch.column("ts"), unit="hour").cast(
                    pa.timestamp("us")
                ),
                "cents": pa.array(
                    np.floor(batch.column("value").to_numpy(zero_copy_only=False) * 100).astype(
                        np.int64
                    ),
                    type=pa.int64(),
                ),
            }
        )

    agg = (
        _read(sf_dir, "events", ["event_type", "ts", "value"])
        .map_batches(_prep, batch_format="pyarrow")
        .groupby(["event_type", "hour"])
        .aggregate(Count(alias_name="n"), Sum("cents", alias_name="cents"))
    )

    # Ray's shuffle can downscale timestamp precision; DuckDB's
    # date_trunc output stays timestamp[us] and the driver compares schemas.
    def _fix(batch: pa.Table) -> pa.Table:
        return batch.set_column(
            batch.schema.get_field_index("hour"),
            "hour",
            batch.column("hour").cast(pa.timestamp("us")),
        )

    return agg.map_batches(_fix, batch_format="pyarrow")


def q_walk2_coocc(sf_dir: str):
    """2-step undamped random walk over the part co-occurrence graph —
    ``random_walk_kernel`` semantics (graph_kernels.py:66-68), SQL-oracled."""
    from .walks import k_step_walk

    g = _coocc_graph(sf_dir)
    mass, _ = k_step_walk(g, _ckpt("walk2"), k=2)

    def _round(batch: pa.Table) -> pa.Table:
        return pa.table(
            {
                "vid": batch.column("vid").cast(pa.int64()),
                "mass_r9": pc.round(batch.column("mass"), ndigits=9),
            }
        )

    return mass.map_batches(_round, batch_format="pyarrow")


def q_ppr_parts(sf_dir: str):
    """Personalized PageRank over the part→supplier graph seeded at the
    5 lowest partkeys (get_projection seed-set scoring analogue) —
    SQL-oracled via the unrolled seeded recurrence (fixed k=20 steps,
    tol=0 → both sides run the identical 20 updates); convergence-mode
    exactness is pytest-verified vs the dense generalized-walk oracle."""
    from .walks import personalized_pagerank

    g = _partsupp_graph(sf_dir)
    seeds = [1, 2, 3, 4, 5]
    scores, _ = personalized_pagerank(g, _ckpt("ppr"), seeds, tol=0.0, max_iters=20)

    def _shape(batch: pa.Table) -> pa.Table:
        return pa.table(
            {
                "vid": batch.column("vid").cast(pa.int64()),
                "score_r9": pc.round(batch.column("score"), ndigits=9),
            }
        )

    return scores.map_batches(_shape, batch_format="pyarrow").sort(
        ["score_r9", "vid"], descending=[True, False]
    ).limit(20)


def q_heat_smooth_coocc(sf_dir: str):
    """4 explicit-Euler heat steps of p_retailprice over the part
    co-occurrence graph (heat_kernel semantics, graph_kernels.py:101-105)
    — SQL-oracled via the unrolled recurrence."""
    import pyarrow.parquet as pq_  # noqa: N813

    from .diffusion import heat_kernel_smooth
    from .walks import vertex_lookup_init

    g = _coocc_graph(sf_dir)
    part_tbl = pq_.read_table(
        os.path.join(sf_dir, "part.parquet"), columns=["p_partkey", "p_retailprice"]
    )
    init = vertex_lookup_init(
        part_tbl.column("p_partkey").to_numpy().astype(np.uint64),
        part_tbl.column("p_retailprice").to_numpy().astype(np.float64),
    )
    out, _ = heat_kernel_smooth(g, _ckpt("heat"), init, t=0.01, steps=4)

    def _round(batch: pa.Table) -> pa.Table:
        return pa.table(
            {
                "vid": batch.column("vid").cast(pa.int64()),
                "value_r4": pc.round(batch.column("value"), ndigits=4),
            }
        )

    return out.map_batches(_round, batch_format="pyarrow")


def q_walk_corpus_coocc(sf_dir: str):
    """Deterministic DeepWalk-style training sequences over the part
    co-occurrence graph (undirected → full-length walks): L map_batches
    steps, zero-shuffle, broadcast CSR reads. SQL-oracled: the full
    8-vertex sequence per walk, replayed hop-by-hop in DuckDB from the
    same splitmix64 recurrence. Returns (start, v1..v7)."""
    from .walk_corpus import random_walk_corpus

    g = _coocc_graph(sf_dir)
    walk_len = 8
    walks = random_walk_corpus(g, walk_len=walk_len, walks_per_vertex=1, seed=7)

    def _shape(batch: pa.Table) -> pa.Table:
        from ..util import list_rows

        seqs = list_rows(batch, "seq")
        mat = (
            np.vstack(seqs).astype(np.int64)
            if seqs
            else np.empty((0, walk_len), dtype=np.int64)
        )
        cols = {"start": pa.array(mat[:, 0], type=pa.int64())}
        for t in range(1, walk_len):
            cols[f"v{t}"] = pa.array(mat[:, t], type=pa.int64())
        return pa.table(cols)

    return walks.map_batches(_shape, batch_format="pyarrow")


def q_weighted_walk_coocc(sf_dir: str):
    """Weighted DeepWalk corpus over the co-occurrence-count graph
    (hop probability ∝ shared-order multiplicity), walk_len=6 —
    SQL-oracled via the cumulative-weight threshold replay.
    Returns (start, v1..v5)."""
    from .walk_corpus import weighted_walk_corpus

    g = _coocc_w_graph(sf_dir)
    walk_len = 6
    walks = weighted_walk_corpus(g, walk_len=walk_len, seed=7)

    def _shape(batch: pa.Table) -> pa.Table:
        from ..util import list_rows

        seqs = list_rows(batch, "seq")
        mat = (
            np.vstack(seqs).astype(np.int64)
            if seqs
            else np.empty((0, walk_len), dtype=np.int64)
        )
        cols = {"start": pa.array(mat[:, 0], type=pa.int64())}
        for t in range(1, walk_len):
            cols[f"v{t}"] = pa.array(mat[:, t], type=pa.int64())
        return pa.table(cols)

    return walks.map_batches(_shape, batch_format="pyarrow")


def q_richclub_coocc(sf_dir: str):
    """Rich-club coefficient φ(k) = E_k / C(N_k, 2) of the
    co-occurrence graph at k ∈ {2, 4, 8, 16}: the edge density among
    vertices of degree > k (Colizza et al., Nat. Phys. 2006). Exact
    integer counts + one rounded division — SQL-oracled.

    Plan: per-shard map tasks count their own rich vertices and their
    rich (u < v) edge endpoints using the broadcast degree index for
    neighbor degrees (16 B/vertex — the same no-funnel orientation
    lookup the triangle pipeline uses); a tiny groupby(k) merges the
    P×|ks| partial rows. No edge shuffle."""
    import ray
    import ray.data as rd
    from ray.data.aggregate import Sum

    from .triangles import _degree_index

    g = _coocc_graph(sf_dir)
    deg_refs = _degree_index(g)
    refs = g.refs
    P = g.num_partitions
    ks = np.array([2, 4, 8, 16], dtype=np.int64)

    def _partials(batch: pa.Table) -> pa.Table:
        out_k, out_n, out_e = [], [], []
        for p in batch.column("part").to_numpy(zero_copy_only=False):
            csr = ray.get(refs[int(p)])
            vids, deg = csr["vids"], csr["deg"].astype(np.int64)
            indptr, nbrs = csr["indptr"], csr["indices"]
            # neighbor degrees via the broadcast per-partition slices
            ndeg = np.zeros(len(nbrs), dtype=np.int64)
            nparts = (nbrs % np.uint64(P)).astype(np.int64)
            for q in np.unique(nparts):
                sl = ray.get(deg_refs[int(q)])
                sel = nparts == q
                pos = np.searchsorted(sl["vids"], nbrs[sel])
                ndeg[sel] = sl["deg"][pos]
            udeg = np.repeat(deg, deg)  # deg(u) aligned to each edge slot
            uvid = np.repeat(vids, deg)
            fwd = nbrs > uvid  # count each undirected edge once (u < v)
            for k in ks:
                out_k.append(int(k))
                out_n.append(int((deg > k).sum()))
                out_e.append(int((fwd & (udeg > k) & (ndeg > k)).sum()))
        return pa.table(
            {
                "k": pa.array(np.array(out_k, dtype=np.int64)),
                "n_k": pa.array(np.array(out_n, dtype=np.int64)),
                "e_k": pa.array(np.array(out_e, dtype=np.int64)),
            }
        )

    parts_ds = rd.from_arrow(
        pa.table({"part": pa.array(sorted(g.parts), type=pa.int64())})
    ).repartition(len(g.parts))
    merged = (
        parts_ds.map_batches(_partials, batch_format="pyarrow", batch_size=1)
        .groupby("k")
        .aggregate(Sum("n_k", alias_name="n_k"), Sum("e_k", alias_name="e_k"))
    )

    def _phi(b: pa.Table) -> pa.Table:
        n = b.column("n_k").to_numpy(zero_copy_only=False).astype(np.float64)
        e = b.column("e_k").to_numpy(zero_copy_only=False).astype(np.float64)
        denom = n * (n - 1.0)
        phi = np.where(denom > 0, 2.0 * e / np.where(denom > 0, denom, 1.0), 0.0)
        return b.append_column("phi_r9", pa.array(np.round(phi, 9), type=pa.float64()))

    return merged.map_batches(_phi, batch_format="pyarrow")


def q_negative_samples_coocc(sf_dir: str):
    """Degree-proportional negative-sampling table (1024 draws, the
    word2vec negatives companion to `skipgram_coocc`) — SQL-oracled
    against the window-cumsum threshold replay. Returns (i, vid)."""
    from .walk_corpus import negative_sample_table

    return negative_sample_table(_coocc_graph(sf_dir), m=1024, seed=13)


def q_skipgram_coocc(sf_dir: str):
    """Skip-gram (center, context, n) training pairs at window 2 from
    the deterministic DeepWalk corpus — the word2vec data product;
    SQL-oracled by enumerating the offset pairs of the replayed
    sequences."""
    from .walk_corpus import random_walk_corpus, skipgram_pairs

    g = _coocc_graph(sf_dir)
    walks = random_walk_corpus(g, walk_len=8, walks_per_vertex=1, seed=7)
    return skipgram_pairs(walks, window=2)


def q_node2vec_coocc(sf_dir: str):
    """node2vec biased training walks (p=2, q=4 → integer weights
    2:4:1) over the part co-occurrence graph, walk_len=6 — the
    2nd-order extension of `walk_corpus_coocc`; SQL-oracled by
    replaying the cumulative-weight threshold selection per hop.
    Returns (start, v1..v5)."""
    from .walk_corpus import node2vec_walk_corpus

    g = _coocc_graph(sf_dir)
    walk_len = 6
    walks = node2vec_walk_corpus(g, walk_len=walk_len, seed=7)

    def _shape(batch: pa.Table) -> pa.Table:
        from ..util import list_rows

        seqs = list_rows(batch, "seq")
        mat = (
            np.vstack(seqs).astype(np.int64)
            if seqs
            else np.empty((0, walk_len), dtype=np.int64)
        )
        cols = {"start": pa.array(mat[:, 0], type=pa.int64())}
        for t in range(1, walk_len):
            cols[f"v{t}"] = pa.array(mat[:, t], type=pa.int64())
        return pa.table(cols)

    return walks.map_batches(_shape, batch_format="pyarrow")


def q_clustering_coeff_coocc(sf_dir: str):
    """Per-vertex local clustering coefficient (2T/deg(deg−1) as
    FLOOR-ppm) over the part co-occurrence graph — SQL-oracled
    (composition of the exact triangle counts and degrees)."""
    from .triangles import clustering_coefficient

    g = _coocc_graph(sf_dir)
    return _vid_to_int64(
        clustering_coefficient(g),
        {"triangles": pa.int64(), "deg": pa.int64(), "cc_ppm": pa.int64()},
    )


def q_multi_ppr_coocc(sf_dir: str):
    """Multi-source PageRank (get_projections_batch parity): 3 seed
    sets scored in ONE [n, 3] vector-field superstep run, fixed k=6
    undamped... damped steps — SQL-oracled via 3 unrolled seeded
    recurrences. Returns (vid, set_id, score_r9) exploded."""
    from .walks import multi_source_pagerank

    g = _coocc_graph(sf_dir)
    seed_sets = [[1, 2], [3, 4, 5], [6]]
    scores, _ = multi_source_pagerank(
        g, _ckpt("mppr"), seed_sets, damping=0.85, tol=0.0, max_iters=6
    )

    def _explode(batch: pa.Table) -> pa.Table:
        from ..util import list_rows

        vids = batch.column("vid").to_numpy(zero_copy_only=False).astype(np.int64)
        rows = list_rows(batch, "scores")
        mat = np.vstack(rows) if rows else np.empty((0, len(seed_sets)))
        d = mat.shape[1]
        return pa.table(
            {
                "vid": pa.array(np.repeat(vids, d), type=pa.int64()),
                "set_id": pa.array(
                    np.tile(np.arange(d, dtype=np.int64), len(vids)), type=pa.int64()
                ),
                "score_r9": pa.array(np.round(mat.reshape(-1), 9), type=pa.float64()),
            }
        )

    return scores.map_batches(_explode, batch_format="pyarrow")


def q_matvec_coocc(sf_dir: str):
    """Raw adjacency matvec A·x (the unnormalized gather underlying the
    diffusion integrators): one superstep over retailprice — SQL-oracled
    via the direct neighbor sum. Returns (vid, value_r6)."""
    import pyarrow.parquet as pq_  # noqa: N813

    from .diffusion import adjacency_matvec
    from .walks import vertex_lookup_init

    g = _coocc_graph(sf_dir)
    part_tbl = pq_.read_table(
        os.path.join(sf_dir, "part.parquet"), columns=["p_partkey", "p_retailprice"]
    )
    init = vertex_lookup_init(
        part_tbl.column("p_partkey").to_numpy().astype(np.uint64),
        part_tbl.column("p_retailprice").to_numpy().astype(np.float64),
    )
    out, _ = adjacency_matvec(g, _ckpt("matvec"), init, k=1)

    def _shape(batch: pa.Table) -> pa.Table:
        return pa.table(
            {
                "vid": batch.column("vid").cast(pa.int64()),
                "value_r6": pc.round(batch.column("value"), ndigits=6),
            }
        )

    return out.map_batches(_shape, batch_format="pyarrow")


def q_barycenter_coocc(sf_dir: str):
    """Convolutional Wasserstein barycenter of the price and size
    distributions over the part co-occurrence graph
    (ConvolutionalBarycenter parity) — SQL-oracled via the fully
    unrolled Bregman loop. Returns (vid, barycenter_r6)."""
    import pyarrow.parquet as pq_  # noqa: N813

    from .diffusion import convolutional_barycenter
    from .walks import vertex_lookup_init

    g = _coocc_graph(sf_dir)
    part_tbl = pq_.read_table(
        os.path.join(sf_dir, "part.parquet"),
        columns=["p_partkey", "p_retailprice", "p_size"],
    )
    keys = part_tbl.column("p_partkey").to_numpy().astype(np.uint64)
    price = part_tbl.column("p_retailprice").to_numpy().astype(np.float64)
    size = part_tbl.column("p_size").to_numpy().astype(np.float64)
    marg = vertex_lookup_init(
        keys, np.stack([price / price.sum(), size / size.sum()], axis=1), width=2
    )
    out, _ = convolutional_barycenter(
        g, _ckpt("bary"), marg, 2, blur_t=0.01, blur_steps=3, n_iters=3
    )

    # scale by the GLOBAL N before rounding so r6 keeps ~5
    # significant digits (barycenter entries are ~1/N)
    N = g.n_vertices

    def _shape2(batch: pa.Table) -> pa.Table:
        vals = batch.column("barycenter").to_numpy(zero_copy_only=False)
        return pa.table(
            {
                "vid": batch.column("vid").cast(pa.int64()),
                "barycenter_r6": pa.array(np.round(vals * N, 6), type=pa.float64()),
            }
        )

    return out.map_batches(_shape2, batch_format="pyarrow")


def q_label_prop_coocc(sf_dir: str):
    """Seeded min-label propagation over the part co-occurrence graph
    (node_cluster_assignment parity): parts 1–3 seed labels 100/200/300,
    every vertex adopts the min reachable seed label (unreached → −1).
    SQL-oracled via unrolled min rounds. Returns (vid, label)."""
    from .components import label_propagation

    g = _coocc_graph(sf_dir)
    labels, _ = label_propagation(g, _ckpt("labelprop"), {1: 100, 2: 200, 3: 300})

    def _shape(batch: pa.Table) -> pa.Table:
        from ..config import UNLABELED

        lab = batch.column("label").to_numpy(zero_copy_only=False).astype(np.uint64)
        out = np.where(lab == np.uint64(UNLABELED), -1, lab.astype(np.int64))
        return pa.table(
            {
                "vid": batch.column("vid").cast(pa.int64()),
                "label": pa.array(out, type=pa.int64()),
            }
        )

    return labels.map_batches(_shape, batch_format="pyarrow")


def q_percolation_coocc(sf_dir: str, thresholds=(1, 2, 3)):
    """Edge-weight percolation curve: connected-component structure of
    the co-occurrence graph restricted to pairs sharing ≥ t orders,
    for each threshold t — the graph-resilience sweep (how the giant
    component dissolves as weak ties drop). One engine CC superstep
    run per threshold, capped at 16 rounds on BOTH sides (a converged
    run makes the extra unrolled-SQL rounds no-ops, an unconverged one
    stops at the same fixed count — equal either way). Returns
    (threshold, n_vertices, n_components, largest_size), all exact
    integers."""
    from ray.data.aggregate import Count, Max, Sum

    from .components import connected_components

    def _canon(b: pa.Table) -> pa.Table:
        return pa.table(
            {
                "u": pa.array(
                    b.column("src").to_numpy(zero_copy_only=False).astype(np.uint64),
                    type=pa.uint64(),
                ),
                "v": pa.array(
                    b.column("dst").to_numpy(zero_copy_only=False).astype(np.uint64),
                    type=pa.uint64(),
                ),
            }
        )

    pairs = (
        part_cooccurrence_edges(sf_dir)
        .map_batches(_canon, batch_format="pyarrow")
        .groupby(["u", "v"])
        .aggregate(Count(alias_name="w"))
        .materialize()
    )
    out_t, out_nv, out_nc, out_ls = [], [], [], []
    for t in thresholds:

        def _flt(b: pa.Table, t=t) -> pa.Table:
            keep = b.column("w").to_numpy(zero_copy_only=False) >= t
            return pa.table(
                {
                    "src": b.column("u").filter(pa.array(keep)),
                    "dst": b.column("v").filter(pa.array(keep)),
                }
            )

        edges_t = pairs.map_batches(_flt, batch_format="pyarrow")
        g = build_graph(edges_t, EngineConfig(num_partitions=16), directed=False)
        comp, _ = connected_components(g, _ckpt(f"perc{t}"), max_iters=16)
        sizes = comp.groupby("component").aggregate(Count(alias_name="n"))
        stats = sizes.aggregate(
            Count(alias_name="n_components"),
            Max("n", alias_name="largest"),
            Sum("n", alias_name="n_vertices"),
        )
        out_t.append(t)
        out_nv.append(int(stats["n_vertices"]))
        out_nc.append(int(stats["n_components"]))
        out_ls.append(int(stats["largest"]))
    return pa.table(
        {
            "threshold": pa.array(out_t, type=pa.int64()),
            "n_vertices": pa.array(out_nv, type=pa.int64()),
            "n_components": pa.array(out_nc, type=pa.int64()),
            "largest_size": pa.array(out_ls, type=pa.int64()),
        }
    )


def q_powerlaw_coocc(sf_dir: str, dmin: int = 2):
    """Power-law degree-distribution MLE (Clauset, Shalizi & Newman
    2009): α̂ = 1 + n / Σ ln(d/dmin) over vertices with degree ≥ dmin
    — the standard web-graph heavy-tail diagnostic. Distributed
    per-block (n, Σln) partials; one tiny aggregate; ROUND 6 (the sum
    order differs from SQL by ~1e-14). Returns one row (n_tail,
    alpha_r6)."""
    from ray.data.aggregate import Count, Sum

    def _canon(b: pa.Table) -> pa.Table:
        return pa.table(
            {
                "u": pa.array(
                    np.concatenate(
                        [
                            b.column("src").to_numpy(zero_copy_only=False),
                            b.column("dst").to_numpy(zero_copy_only=False),
                        ]
                    ).astype(np.uint64),
                    type=pa.uint64(),
                ),
                "v": pa.array(
                    np.concatenate(
                        [
                            b.column("dst").to_numpy(zero_copy_only=False),
                            b.column("src").to_numpy(zero_copy_only=False),
                        ]
                    ).astype(np.uint64),
                    type=pa.uint64(),
                ),
            }
        )

    deg = (
        part_cooccurrence_edges(sf_dir)
        .map_batches(_canon, batch_format="pyarrow")
        .groupby(["u", "v"])
        .aggregate(Count(alias_name="one"))
        .groupby("u")
        .aggregate(Count(alias_name="d"))
    )

    def _partial(b: pa.Table) -> pa.Table:
        d = b.column("d").to_numpy(zero_copy_only=False).astype(np.float64)
        sel = d >= dmin
        return pa.table(
            {
                "n": pa.array([int(sel.sum())], type=pa.int64()),
                "s": pa.array([float(np.log(d[sel] / dmin).sum())], type=pa.float64()),
            }
        )

    tot = deg.map_batches(_partial, batch_format="pyarrow").aggregate(
        Sum("n", alias_name="n"), Sum("s", alias_name="s")
    )
    n, s = int(tot["n"]), float(tot["s"])
    return pa.table(
        {
            "n_tail": pa.array([n], type=pa.int64()),
            "alpha_r6": pa.array([round(1.0 + n / s, 6)], type=pa.float64()),
        }
    )


def q_sweepcut_coocc(sf_dir: str, T: int = 16):
    """PPR sweep-cut local community detection (the Andersen-Chung-Lang
    pattern with a fixed-k PPR): seed-1 personalized PageRank (8
    unrolled supersteps, damping 0.85) over the undirected
    co-occurrence graph; candidates = top-T vertices by
    ROUND(score/deg, 9) (ties → smaller vid); for every prefix S_i of
    that order, conductance φ(S_i) = cut(S_i) / min(vol(S_i),
    2m − vol(S_i)) — cut and vol are exact integers, φ one IEEE
    division, so the whole sweep is SQL-replayable. The cut counters
    come from per-block difference-array partials over the distinct
    pair list (each edge contributes to prefixes a ≤ i < b where a, b
    are its endpoints' candidate positions) — no per-prefix pass, one
    scan regardless of T. Returns (i, vid, cut, vol, phi)."""
    import ray
    from ray.data.aggregate import Count, Sum

    from ..state.ckpt import read_state_part
    from .walks import personalized_pagerank

    g = _coocc_graph(sf_dir)
    _, summ = personalized_pagerank(g, _ckpt("sweep"), [1], tol=0.0, max_iters=8)
    final_dir = summ["final_iter_dir"]
    refs = g.refs

    def _emit(batch: pa.Table) -> pa.Table:
        parts = batch.column("part").to_numpy(zero_copy_only=False)
        vid_o, sc_o, dg_o = [], [], []
        for p in parts:
            csr = ray.get(refs[int(p)])
            st = np.asarray(read_state_part(final_dir, int(p)), dtype=np.float64)
            vid_o.append(csr["vids"])
            sc_o.append(st)
            dg_o.append(csr["deg"].astype(np.int64))
        vid = np.concatenate(vid_o)
        sc = np.concatenate(sc_o)
        dg = np.concatenate(dg_o)
        return pa.table(
            {
                "vid": pa.array(vid, type=pa.uint64()),
                "ratio_r9": pa.array(np.round(sc / dg, 9), type=pa.float64()),
                "deg": pa.array(dg, type=pa.int64()),
            }
        )

    parts_ds = parts_dataset(g.parts)
    top = (
        parts_ds.map_batches(_emit, batch_format="pyarrow", batch_size=4)
        .sort(["ratio_r9", "vid"], descending=[True, False])
        .limit(T)
        .take_all()
    )
    cand_vids = np.array([r["vid"] for r in top], dtype=np.uint64)
    cand_degs = np.array([r["deg"] for r in top], dtype=np.int64)
    order = np.argsort(cand_vids, kind="stable")
    sorted_vids = cand_vids[order]
    sorted_pos = (np.arange(len(cand_vids), dtype=np.int64) + 1)[order]

    def _canon(b: pa.Table) -> pa.Table:
        return pa.table(
            {
                "u": pa.array(
                    b.column("src").to_numpy(zero_copy_only=False).astype(np.uint64),
                    type=pa.uint64(),
                ),
                "v": pa.array(
                    b.column("dst").to_numpy(zero_copy_only=False).astype(np.uint64),
                    type=pa.uint64(),
                ),
            }
        )

    pairs = (
        part_cooccurrence_edges(sf_dir)
        .map_batches(_canon, batch_format="pyarrow")
        .groupby(["u", "v"])
        .aggregate(Count(alias_name="n"))
    )
    m2 = 2 * int(pairs.count())

    def _pos(x: np.ndarray) -> np.ndarray:
        p = np.searchsorted(sorted_vids, x)
        p = np.clip(p, 0, len(sorted_vids) - 1)
        out = np.where(sorted_vids[p] == x, sorted_pos[p], 99)
        return out.astype(np.int64)

    def _cut_partial(b: pa.Table) -> pa.Table:
        pu = _pos(b.column("u").to_numpy(zero_copy_only=False))
        pv = _pos(b.column("v").to_numpy(zero_copy_only=False))
        a = np.minimum(pu, pv)
        z = np.maximum(pu, pv)
        diff = np.zeros(T + 2, dtype=np.int64)
        sel = (a <= T) & (a < z)
        np.add.at(diff, a[sel], 1)
        np.add.at(diff, np.minimum(z[sel], T + 1), -1)
        cut = np.cumsum(diff)[1 : T + 1]
        return pa.table(
            {
                "i": pa.array(np.arange(1, T + 1, dtype=np.int64), type=pa.int64()),
                "c": pa.array(cut, type=pa.int64()),
            }
        )

    cuts = (
        pairs.map_batches(_cut_partial, batch_format="pyarrow")
        .groupby("i")
        .aggregate(Sum("c", alias_name="cut"))
        .take_all()
    )
    cut_by_i = {int(r["i"]): int(r["cut"]) for r in cuts}
    vol = np.cumsum(cand_degs)
    rows_i, rows_vid, rows_cut, rows_vol, rows_phi = [], [], [], [], []
    for i in range(1, len(cand_vids) + 1):
        c = cut_by_i.get(i, 0)
        vl = int(vol[i - 1])
        rows_i.append(i)
        rows_vid.append(int(cand_vids[i - 1]))
        rows_cut.append(c)
        rows_vol.append(vl)
        rows_phi.append(c / min(vl, m2 - vl))
    return pa.table(
        {
            "i": pa.array(rows_i, type=pa.int64()),
            "vid": pa.array(rows_vid, type=pa.int64()),
            "cut": pa.array(rows_cut, type=pa.int64()),
            "vol": pa.array(rows_vol, type=pa.int64()),
            "phi": pa.array(rows_phi, type=pa.float64()),
        }
    )


def q_backbone_coocc(sf_dir: str, k: int = 5):
    """Graph backbone sparsification: keep each vertex's top-k
    strongest neighbors (w = number of shared orders, ties → smaller
    neighbor vid) — the degree-bounded skeleton that tames hub fan-out
    before expensive downstream ops (the simplified disparity-filter
    pattern). One ``groupby(u, v)`` count + one ``groupby(u)``
    per-group vectorized top-k; group width = vertex degree, the same
    bound every CSR shard already carries. SQL-oracled (ROW_NUMBER
    replay). Returns (u, v, w, rk)."""
    from ray.data.aggregate import Count

    def _canon(b: pa.Table) -> pa.Table:
        return pa.table(
            {
                "u": pa.array(
                    b.column("src").to_numpy(zero_copy_only=False).astype(np.uint64),
                    type=pa.uint64(),
                ),
                "v": pa.array(
                    b.column("dst").to_numpy(zero_copy_only=False).astype(np.uint64),
                    type=pa.uint64(),
                ),
            }
        )

    pairs = (
        part_cooccurrence_edges(sf_dir)
        .map_batches(_canon, batch_format="pyarrow")
        .groupby(["u", "v"])
        .aggregate(Count(alias_name="w"))
    )

    def _both(b: pa.Table) -> pa.Table:
        u = b.column("u").to_numpy(zero_copy_only=False)
        v = b.column("v").to_numpy(zero_copy_only=False)
        w = b.column("w").to_numpy(zero_copy_only=False)
        return pa.table(
            {
                "u": pa.array(np.concatenate([u, v]), type=pa.uint64()),
                "v": pa.array(np.concatenate([v, u]), type=pa.uint64()),
                "w": pa.array(np.concatenate([w, w]).astype(np.int64), type=pa.int64()),
            }
        )

    def _topk(g: pa.Table) -> pa.Table:
        u = g.column("u").to_numpy(zero_copy_only=False)
        v = g.column("v").to_numpy(zero_copy_only=False)
        w = g.column("w").to_numpy(zero_copy_only=False)
        # per-u rank by (w DESC, v ASC)
        o = np.lexsort((v, -w, u))
        u, v, w = u[o], v[o], w[o]
        new = np.concatenate(([True], u[1:] != u[:-1]))
        idx = np.arange(len(u))
        start = np.maximum.accumulate(np.where(new, idx, 0))
        rk = idx - start + 1
        keep = rk <= k
        return pa.table(
            {
                "u": pa.array(u[keep].astype(np.int64), type=pa.int64()),
                "v": pa.array(v[keep].astype(np.int64), type=pa.int64()),
                "w": pa.array(w[keep], type=pa.int64()),
                "rk": pa.array(rk[keep].astype(np.int64), type=pa.int64()),
            }
        )

    return (
        pairs.map_batches(_both, batch_format="pyarrow")
        .groupby("u")
        .map_groups(_topk, batch_format="pyarrow")
    )


def q_pagerank_incremental_coocc(sf_dir: str):
    """Incremental PageRank (crawl-delta pattern, rows-only): converge
    ranks on a deterministic ~90% edge subset of the co-occurrence
    graph, then warm-start the FULL graph's run from that checkpoint
    (pipelines/pagerank.pagerank_warm) and compare against the cold
    full-graph run. Returns one row (iters_cold, iters_warm,
    ranks_close) — warm must converge in fewer supersteps to the same
    fixed point (max |Δ| < 1e-5 at tol=1e-8). The rank comparison is a
    distributed co-shuffle max-|diff|, not a driver table."""
    from ray.data.aggregate import Max

    from ..sources.edges_synth import _splitmix64
    from .pagerank import pagerank, pagerank_warm

    def _subset(batch: pa.Table) -> pa.Table:
        s = batch.column("src").to_numpy(zero_copy_only=False).astype(np.uint64)
        d = batch.column("dst").to_numpy(zero_copy_only=False).astype(np.uint64)
        keep = (_splitmix64(s ^ _splitmix64(d)) % np.uint64(10)) != 0
        return pa.table(
            {
                "src": pa.array(s[keep], type=pa.uint64()),
                "dst": pa.array(d[keep], type=pa.uint64()),
            }
        )

    old_edges = part_cooccurrence_edges(sf_dir).map_batches(
        _subset, batch_format="pyarrow"
    )
    g_old = build_graph(old_edges, EngineConfig(num_partitions=16), directed=False)
    _, s_old = pagerank(g_old, _ckpt("princ_old"), tol=1e-8, max_iters=200)

    g_new = _coocc_graph(sf_dir)
    r_cold, s_cold = pagerank(g_new, _ckpt("princ_cold"), tol=1e-8, max_iters=200)
    r_warm, s_warm = pagerank_warm(
        g_new,
        _ckpt("princ_warm"),
        warm_graph=g_old,
        warm_final_dir=s_old["final_iter_dir"],
        tol=1e-8,
        max_iters=200,
    )

    def _tag(sign: float):
        def _fn(b: pa.Table) -> pa.Table:
            r = b.column("rank").to_numpy(zero_copy_only=False)
            return pa.table(
                {
                    "vid": b.column("vid"),
                    "r": pa.array(sign * r, type=pa.float64()),
                }
            )

        return _fn

    from ray.data.aggregate import Sum

    diff = (
        r_cold.map_batches(_tag(1.0), batch_format="pyarrow")
        .union(r_warm.map_batches(_tag(-1.0), batch_format="pyarrow"))
        .groupby("vid")
        .aggregate(Sum("r", alias_name="d"))
    )

    def _absmax(b: pa.Table) -> pa.Table:
        d = b.column("d").to_numpy(zero_copy_only=False)
        m = float(np.abs(d).max()) if len(d) else 0.0
        return pa.table({"m": pa.array([m], type=pa.float64())})

    mx = diff.map_batches(_absmax, batch_format="pyarrow").aggregate(
        Max("m", alias_name="m")
    )
    return pa.table(
        {
            "iters_cold": pa.array([int(s_cold["iterations"])], type=pa.int64()),
            "iters_warm": pa.array([int(s_warm["iterations"])], type=pa.int64()),
            "ranks_close": pa.array([float(mx["m"]) < 1e-5]),
        }
    )


def q_louvain_coocc(sf_dir: str):
    """One-level parallel Louvain (2 synchronous greedy modularity
    rounds, exact integer gain scores) over the distinct co-occurrence
    pairs. SQL-oracled: the unrolled oracle replays both rounds
    bit-for-bit (no floats anywhere). Returns (vid, community)."""
    from ray.data.aggregate import Count

    from .louvain import louvain_moves

    def _uv(b: pa.Table) -> pa.Table:
        return pa.table(
            {
                "u": pa.array(
                    b.column("src").to_numpy(zero_copy_only=False).astype(np.uint64),
                    type=pa.uint64(),
                ),
                "v": pa.array(
                    b.column("dst").to_numpy(zero_copy_only=False).astype(np.uint64),
                    type=pa.uint64(),
                ),
            }
        )

    distinct = (
        part_cooccurrence_edges(sf_dir)
        .map_batches(_uv, batch_format="pyarrow")
        .groupby(["u", "v"])
        .aggregate(Count(alias_name="n"))
        .select_columns(["u", "v"])
    )
    return louvain_moves(distinct, rounds=2)


def q_louvain_modularity(sf_dir: str):
    """Newman modularity of the 2-round Louvain communities — exact
    integer numerators (Q = (m2·A − B)/m2², one IEEE division).
    SQL-oracled by replaying the move rounds plus the intra/total
    sums. Returns (n_communities, intra_slots, sq_tot, q)."""
    from ray.data.aggregate import Count

    from .louvain import louvain_modularity

    def _uv(b: pa.Table) -> pa.Table:
        return pa.table(
            {
                "u": pa.array(
                    b.column("src").to_numpy(zero_copy_only=False).astype(np.uint64),
                    type=pa.uint64(),
                ),
                "v": pa.array(
                    b.column("dst").to_numpy(zero_copy_only=False).astype(np.uint64),
                    type=pa.uint64(),
                ),
            }
        )

    distinct = (
        part_cooccurrence_edges(sf_dir)
        .map_batches(_uv, batch_format="pyarrow")
        .groupby(["u", "v"])
        .aggregate(Count(alias_name="n"))
        .select_columns(["u", "v"])
    )
    return louvain_modularity(distinct, rounds=2)


def q_louvain_quotient(sf_dir: str):
    """Community-contraction graph after 2 Louvain rounds: ordered
    community pairs with inter/intra directed-slot weights — the next
    Louvain level's input. SQL-oracled. Returns (cu, cv, w)."""
    from ray.data.aggregate import Count

    from .louvain import louvain_quotient

    def _uv(b: pa.Table) -> pa.Table:
        return pa.table(
            {
                "u": pa.array(
                    b.column("src").to_numpy(zero_copy_only=False).astype(np.uint64),
                    type=pa.uint64(),
                ),
                "v": pa.array(
                    b.column("dst").to_numpy(zero_copy_only=False).astype(np.uint64),
                    type=pa.uint64(),
                ),
            }
        )

    distinct = (
        part_cooccurrence_edges(sf_dir)
        .map_batches(_uv, batch_format="pyarrow")
        .groupby(["u", "v"])
        .aggregate(Count(alias_name="n"))
        .select_columns(["u", "v"])
    )
    return louvain_quotient(distinct, rounds=2)


def q_reciprocity_coocc(sf_dir: str):
    """Edge reciprocity of the hash-oriented directed co-occurrence
    graph (Newman): the fraction of directed edges whose reverse edge
    also exists. One ``groupby(lo, hi)`` count over canonical pairs
    (edges are distinct, so a pair with count 2 is reciprocal), then
    per-block partial sums into a single-row total — reciprocity is
    ONE IEEE division of two exact integers (SQL-parity). Returns
    (n_edges, n_reciprocal, reciprocity)."""
    from ray.data.aggregate import Max, Min, Sum

    edges = directed_coocc_edges(sf_dir)

    def _canon(batch: pa.Table) -> pa.Table:
        s = batch.column("src").to_numpy(zero_copy_only=False)
        d = batch.column("dst").to_numpy(zero_copy_only=False)
        return pa.table(
            {
                "lo": pa.array(np.minimum(s, d), type=pa.uint64()),
                "hi": pa.array(np.maximum(s, d), type=pa.uint64()),
                # direction bit; input rows may repeat (the raw edge
                # stream is pre-dedup), so reciprocity is decided by
                # DISTINCT directions per pair: min<max ⇔ both occur
                "b": pa.array((s > d).astype(np.int64), type=pa.int64()),
            }
        )

    pairs = edges.map_batches(_canon, batch_format="pyarrow").groupby(
        ["lo", "hi"]
    ).aggregate(Min("b", alias_name="bmin"), Max("b", alias_name="bmax"))

    def _partial(batch: pa.Table) -> pa.Table:
        recip = (
            batch.column("bmin").to_numpy(zero_copy_only=False)
            < batch.column("bmax").to_numpy(zero_copy_only=False)
        )
        return pa.table(
            {
                "e": pa.array([int(len(recip) + recip.sum())], type=pa.int64()),
                "r": pa.array([int(2 * recip.sum())], type=pa.int64()),
            }
        )

    tot = pairs.map_batches(_partial, batch_format="pyarrow").aggregate(
        Sum("e", alias_name="n_edges"), Sum("r", alias_name="n_reciprocal")
    )
    e, r = int(tot["n_edges"]), int(tot["n_reciprocal"])
    return pa.table(
        {
            "n_edges": pa.array([e], type=pa.int64()),
            "n_reciprocal": pa.array([r], type=pa.int64()),
            "reciprocity": pa.array([r / e], type=pa.float64()),
        }
    )


def q_scc_coocc(sf_dir: str):
    """Pivot FW-BW strongly connected components over the
    hash-oriented directed co-occurrence graph: pivots = the 4
    smallest vertex ids, hop radius 8 per side; vertex v is assigned
    to the smallest pivot p with v ∈ fwd-reach(p) ∩ bwd-reach(p).
    SQL-oracled via unrolled directed reachability CTEs. Returns
    (vid, scc) over assigned vertices."""
    from .scc import pivot_scc, smallest_vids

    fwd, rev = _coocc_dir_graphs(sf_dir)
    pivots = smallest_vids(directed_coocc_edges(sf_dir), k=4)
    out, _, _ = pivot_scc(fwd, rev, _ckpt("scc"), pivots, rounds=8)
    return _vid_to_int64(out, {"scc": pa.int64()})


def q_trim_coocc(sf_dir: str):
    """Iterative source/sink peeling ("trim") of the hash-oriented
    directed co-occurrence graph, 6 rounds: per round, alive vertices
    with no alive in-neighbor or no alive out-neighbor are removed.
    trim_round = removal round (1-based), 0 = survives (the directed
    core every SCC pipeline hands to FW-BW). One weighted superstep
    run (din + K·dout fused gather). SQL-oracled. Returns
    (vid, trim_round)."""
    from .scc import directed_trim_rounds, trim_message_edges

    key = ("coocc_trim", sf_dir)
    if key not in _GRAPH_CACHE:
        _GRAPH_CACHE[key] = build_graph(
            trim_message_edges(directed_coocc_edges(sf_dir)),
            EngineConfig(num_partitions=16),
            directed=True,
        )
    out, _ = directed_trim_rounds(_GRAPH_CACHE[key], _ckpt("trim"), rounds=6)
    return _vid_to_int64(out, {"trim_round": pa.int64()})


def q_coloring_coocc(sf_dir: str):
    """Jones–Plassmann greedy coloring over the co-occurrence graph,
    4 fixed rounds: an uncolored vertex whose bijective priority beats
    every uncolored neighbor takes color = round; −1 if uncolored
    after the rounds. Proper by construction, SQL-oracled via
    unrolled rounds. Returns (vid, color)."""
    from .mis import greedy_coloring

    return greedy_coloring(
        part_cooccurrence_edges(sf_dir), rounds=4, num_partitions=16, seed=13
    )


def q_khop_sample_coocc(sf_dir: str):
    """Deterministic GraphSAGE fanout sampling over the co-occurrence
    graph: roots {1,2,3}, fanouts (3,2) — per hop each frontier vertex
    keeps the neighbors of smallest splitmix64 rank. SQL-oracled
    (identical hash chain + ROW_NUMBER replay). Returns
    (root, hop, src, dst)."""
    from .walk_corpus import khop_neighbor_sample

    g = _coocc_graph(sf_dir)
    out = khop_neighbor_sample(g, [1, 2, 3], fanouts=(3, 2), seed=7)

    def _shape(b: pa.Table) -> pa.Table:
        return pa.table(
            {
                "root": b.column("root").cast(pa.int64()),
                "hop": b.column("hop"),
                "src": b.column("src").cast(pa.int64()),
                "dst": b.column("dst").cast(pa.int64()),
            }
        )

    return out.map_batches(_shape, batch_format="pyarrow")


def q_scc_decompose_coocc(sf_dir: str):
    """Full SCC peel loop over the hash-oriented directed
    co-occurrence graph: 2 peels of (trim 2 rounds → exact singleton
    SCCs, kind 0) + (pivot FW-BW, 4 smallest surviving vids, radius 4,
    kind 1), edge set shrunk between stages by co-shuffle semi-joins.
    SQL-oracled (full replay). Returns (vid, scc, kind)."""
    from .scc import scc_decompose

    out = scc_decompose(
        directed_coocc_edges(sf_dir),
        EngineConfig(num_partitions=16),
        _ckpt("sccdec"),
        peels=2,
        trim_rounds=2,
        pivots_k=4,
        reach_rounds=4,
    )
    return _vid_to_int64(out, {"scc": pa.int64(), "kind": pa.int64()})


def q_bowtie_coocc(sf_dir: str):
    """Bowtie decomposition (Broder et al., WWW 2000) of the
    hash-oriented directed co-occurrence graph around the smallest-vid
    pivot, hop radius 8: cls 0 = core (pivot's SCC), 1 = in, 2 = out,
    3 = other. SQL-oracled. Returns (vid, cls) over all vertices."""
    from .scc import bowtie_classes, smallest_vids

    fwd, rev = _coocc_dir_graphs(sf_dir)
    pivot = int(smallest_vids(directed_coocc_edges(sf_dir), k=1)[0])
    out, _, _ = bowtie_classes(fwd, rev, _ckpt("bowtie"), pivot, rounds=8)
    return _vid_to_int64(out, {"cls": pa.int64()})


def q_interpolate_coocc(sf_dir: str):
    """Masked neighbor interpolation (Interpolator parity,
    interpolator.py:5-33): retailprice known on parts with p_size ≤ 25,
    interpolated elsewhere as Σ(F·mask)/deg ⊘ Σ mask/deg over one
    normalized gather each — SQL-oracled. Returns (vid, value_r6)."""
    import pyarrow.parquet as pq_  # noqa: N813

    from .walks import masked_neighbor_interpolate, vertex_lookup_init

    g = _coocc_graph(sf_dir)
    part_tbl = pq_.read_table(
        os.path.join(sf_dir, "part.parquet"),
        columns=["p_partkey", "p_retailprice", "p_size"],
    )
    keys = part_tbl.column("p_partkey").to_numpy().astype(np.uint64)
    price = part_tbl.column("p_retailprice").to_numpy().astype(np.float64)
    size = part_tbl.column("p_size").to_numpy()
    mask = (size <= 25).astype(np.float64)
    value_init = vertex_lookup_init(keys, price)
    mask_init = vertex_lookup_init(keys, mask)
    out = masked_neighbor_interpolate(g, _ckpt("interp"), value_init, mask_init)

    def _shape(batch: pa.Table) -> pa.Table:
        return pa.table(
            {
                "vid": batch.column("vid").cast(pa.int64()),
                "value_r6": pc.round(batch.column("value"), ndigits=6),
            }
        )

    return out.map_batches(_shape, batch_format="pyarrow")


def q_coreness_coocc(sf_dir: str):
    """k-core decomposition of the part co-occurrence graph via the
    distributed h-index iteration (rows-only at the driver;
    peeling-oracle-exact in pytest). cap=256 bounds representable
    coreness (dense graph)."""
    from .kcore import coreness

    g = _coocc_graph(sf_dir)
    out, _ = coreness(g, _ckpt("kcore"), cap=256)
    return _vid_to_int64(out, {"coreness": pa.int64()})


def q_anf_coocc(sf_dir: str):
    """HyperANF neighborhood function of the part co-occurrence graph
    (mode='max' HLL-register supersteps; rows-only at the driver,
    engine ≡ dense replica + exact-ball tolerance in pytest).
    Returns (t, n_t_r2) plus the interpolated effective diameter."""
    from .anf import neighborhood_function

    g = _coocc_graph(sf_dir)
    res = neighborhood_function(g, _ckpt("anf"), p=6)
    import ray.data as rd

    t = np.arange(len(res["n_t"]), dtype=np.int64)
    return rd.from_arrow(
        pa.table(
            {
                "t": pa.array(t, type=pa.int64()),
                "n_t_r2": pa.array(np.round(res["n_t"], 2), type=pa.float64()),
                "effective_diameter_r3": pa.array(
                    np.full(len(t), round(res["effective_diameter"], 3)),
                    type=pa.float64(),
                ),
            }
        )
    )


def q_sssp_partsupp(sf_dir: str):
    """Weighted shortest-path forest over the part–supplier graph,
    edge length 1/Σquantity (high-volume links are close): Bellman–Ford
    supersteps with quantized edge shifts (rows-only at the driver;
    bit-exact vs the dense replica in pytest)."""
    from .paths import shortest_path_forest

    g = _weighted_partsupp_graph(sf_dir)
    sources = np.array([1, 2, 3], dtype=np.uint64)  # partkeys 1–3
    out, _ = shortest_path_forest(g, sources, _ckpt("sssp"))

    def _shape(batch: pa.Table) -> pa.Table:
        return pa.table(
            {
                "vid": batch.column("vid").cast(pa.int64()),
                "dist_q": batch.column("dist_q"),
                "parent_id": batch.column("parent_id"),
                "reached": batch.column("reached"),
            }
        )

    return out.map_batches(_shape, batch_format="pyarrow")


def _forest_graphs(sf_dir: str):
    """Both orientations of the min-neighbor forest of the
    co-occurrence graph (cached — shared by the tree-DP and tree-kernel
    queries); aligned shards, see tree_dp.forest_graphs."""
    from .tree_dp import forest_graphs, min_neighbor_forest_edges

    key = ("forest2", sf_dir)
    if key not in _GRAPH_CACHE:
        g = _coocc_graph(sf_dir)
        _GRAPH_CACHE[key] = forest_graphs(
            min_neighbor_forest_edges(g), num_partitions=16
        )
    return _GRAPH_CACHE[key]


def q_subtree_sizes_forest(sf_dir: str):
    """Two-pass tree DP over the canonical min-neighbor forest of the
    co-occurrence graph — the fully DATASET-NATIVE path: both forest
    orientations share aligned shards, so child counts, roots and the
    depth/size merge all resolve partition-locally (no driver-side
    forest table at any point). SQL-oracled via recursive CTEs (depth
    chase + ancestor-closure counts) — the forest is defined so DuckDB
    can rebuild it exactly (parent(v) = min neighbor < v). Returns
    (vid, subtree_size, depth)."""
    import ray

    from ..state.ckpt import read_state_part
    from .tree_dp import subtree_aggregate_g, topdown_prefix_g

    g_up, g_down = _forest_graphs(sf_dir)
    ones = lambda v: np.ones(len(v))  # noqa: E731
    _, s_up = subtree_aggregate_g(g_up, g_down, ones, _ckpt("treedp"))
    _, s_dn = topdown_prefix_g(g_up, g_down, ones, _ckpt("treedepth"))
    up_dir, dn_dir = s_up["final_iter_dir"], s_dn["final_iter_dir"]
    refs = g_up.refs

    def _emit(batch: pa.Table) -> pa.Table:
        vid_o, sz_o, dp_o = [], [], []
        for p in batch.column("part").to_numpy(zero_copy_only=False):
            p = int(p)
            csr = ray.get(refs[p])
            vid_o.append(csr["vids"].astype(np.int64))
            sz_o.append(read_state_part(up_dir, p)[:, 0].astype(np.int64))
            # prefix of the all-ones field counts root→v path vertices
            # (root included) = depth + 1
            dp_o.append((read_state_part(dn_dir, p)[:, 0] - 1.0).astype(np.int64))
        return pa.table(
            {
                "vid": pa.array(np.concatenate(vid_o), type=pa.int64()),
                "subtree_size": pa.array(np.concatenate(sz_o), type=pa.int64()),
                "depth": pa.array(np.concatenate(dp_o), type=pa.int64()),
            }
        )

    parts_ds = parts_dataset(g_up.parts)
    return parts_ds.map_batches(_emit, batch_format="pyarrow", batch_size=4)


def q_tree_kernel_forest(sf_dir: str):
    """Tree-metric kernel field integration y = exp(a·dist_T)·x over
    the min-neighbor forest, x = p_retailprice, a = −0.5 — the
    reference's TreeGFIntegrator readout (trees.py:93-125) as two
    scaled gated DP passes. SQL-oracled via the LCA distance identity
    (dist = depth(u)+depth(v)−2·depth(lca)) over recursive ancestor
    closures. Returns (vid, integral_r4)."""
    import pyarrow.parquet as pq_  # noqa: N813

    from .tree_dp import integrate_tree_field_g, make_vid_lookup

    g_up, g_down = _forest_graphs(sf_dir)
    part_tbl = pq_.read_table(
        os.path.join(sf_dir, "part.parquet"), columns=["p_partkey", "p_retailprice"]
    )
    x_lookup = make_vid_lookup(
        part_tbl.column("p_partkey").to_numpy().astype(np.uint64),
        part_tbl.column("p_retailprice").to_numpy().astype(np.float64),
    )
    out, _ = integrate_tree_field_g(g_up, g_down, x_lookup, a=-0.5, ckpt_dir=_ckpt("tkern"))

    def _shape(batch: pa.Table) -> pa.Table:
        return pa.table(
            {
                "vid": batch.column("vid").cast(pa.int64()),
                "integral_r4": pc.round(batch.column("integral"), ndigits=4),
            }
        )

    return out.map_batches(_shape, batch_format="pyarrow")


def q_tree_ensemble_coocc(sf_dir: str):
    """Random-spanning-tree ensemble kernel y = (1/k)·Σ_T
    exp(−0.5·dist_T)·p_retailprice over the co-occurrence graph, k=2 —
    the reference's Bartal/FRT tree-ensemble readout (frt_trees.py:
    41-46) on seeded random-weight MSF trees. SQL-oracled: per-seed
    hashed-weight Borůvka + recursive orientation + LCA distance
    kernel, averaged. Returns (vid, integral_r4)."""
    import pyarrow.parquet as pq_  # noqa: N813

    from .tree_dp import make_vid_lookup
    from .tree_ensemble import tree_ensemble_kernel

    g = _coocc_graph(sf_dir)
    part_tbl = pq_.read_table(
        os.path.join(sf_dir, "part.parquet"), columns=["p_partkey", "p_retailprice"]
    )
    x_lookup = make_vid_lookup(
        part_tbl.column("p_partkey").to_numpy().astype(np.uint64),
        part_tbl.column("p_retailprice").to_numpy().astype(np.float64),
    )
    out, _ = tree_ensemble_kernel(
        g, x_lookup, a=-0.5, ckpt_dir=_ckpt("tens"), n_trees=2, seed=42,
        num_partitions=16,
    )

    def _shape(batch: pa.Table) -> pa.Table:
        return pa.table(
            {
                "vid": batch.column("vid").cast(pa.int64()),
                "integral_r4": pc.round(batch.column("integral"), ndigits=4),
            }
        )

    return out.map_batches(_shape, batch_format="pyarrow")


def _weighted_partsupp_graph(sf_dir: str):
    """1/Σquantity-weighted part–supplier graph (cached — shared by the
    SSSP and distance-bucket queries)."""
    key = ("wpartsupp", sf_dir)
    if key not in _GRAPH_CACHE:
        def _weighted(batch: pa.Table) -> pa.Table:
            qty = batch.column("l_quantity").to_numpy(zero_copy_only=False).astype(np.float64)
            return pa.table(
                {
                    "src": batch.column("l_partkey").cast(pa.uint64()),
                    "dst": pc.add(
                        batch.column("l_suppkey").cast(pa.int64()), SUPP_OFFSET
                    ).cast(pa.uint64()),
                    "w": pa.array(1.0 / np.maximum(qty, 1.0), type=pa.float64()),
                }
            )

        edges = _read(
            sf_dir, "lineitem", ["l_partkey", "l_suppkey", "l_quantity"]
        ).map_batches(_weighted, batch_format="pyarrow")
        _GRAPH_CACHE[key] = build_graph(edges, EngineConfig(num_partitions=16), directed=False)
    return _GRAPH_CACHE[key]


def q_pagerank_weighted_coocc_k4(sf_dir: str):
    """Weighted PageRank (4 fixed steps, damping 0.85) on the weighted
    co-occurrence graph — exercises the engine's edge-weight path
    end-to-end: wdeg normalizer + per-edge scatter weights make the
    walk matrix row-stochastic in w. No dangling vertices (every
    vertex has wdeg > 0). SQL-oracled with the weighted recurrence
    SUM(r / wdeg * w), associated exactly as the engine computes it."""
    g = _coocc_w_graph(sf_dir)
    ranks, _ = pagerank(g, _ckpt("prw4"), damping=0.85, tol=0.0, max_iters=4)

    def _round(batch: pa.Table) -> pa.Table:
        return pa.table(
            {
                "vid": batch.column("vid").cast(pa.int64()),
                "rank_r9": pc.round(batch.column("rank"), ndigits=9),
            }
        )

    return ranks.map_batches(_round, batch_format="pyarrow")


def _partsupp_und_graph(sf_dir: str):
    key = ("partsupp_und", sf_dir)
    if key not in _GRAPH_CACHE:
        _GRAPH_CACHE[key] = build_graph(
            partsupp_edges(sf_dir), EngineConfig(num_partitions=16), directed=False
        )
    return _GRAPH_CACHE[key]


def q_hits_partsupp(sf_dir: str):
    """HITS hubs (parts) & authorities (suppliers) on the symmetrized
    part–supplier graph, k=1: hub = h₁ (superstep 2), authority = a₂
    (superstep 3) of one symmetric power chain from x₀ = 1; each side
    L2-normalized. Scores before normalization are integer-valued
    neighbor-count sums, so both the norm and the quotient are
    bit-identical in DuckDB — SQL-oracled (unrolled x₁..x₃ CTEs)."""
    from .hits import hits, l2_normalize

    g = _partsupp_und_graph(sf_dir)
    hub, auth, _ = hits(g, _ckpt("hits"), k=1)

    def _side(kind: str):
        lo, hi = (0, SUPP_OFFSET) if kind == "hub" else (SUPP_OFFSET, 1 << 62)

        def _f(b: pa.Table) -> pa.Table:
            vid = b.column("vid").to_numpy(zero_copy_only=False)
            keep = (vid >= lo) & (vid < hi)
            return b.filter(pa.array(keep))

        return _f

    def _shape(kind: str, col: str):
        def _f(b: pa.Table) -> pa.Table:
            return pa.table(
                {
                    "vid": b.column("vid").cast(pa.int64()),
                    "kind": pa.array([kind] * b.num_rows, type=pa.string()),
                    "score_r9": pc.round(b.column(col), ndigits=9),
                }
            )

        return _f

    hub = l2_normalize(
        hub.map_batches(_side("hub"), batch_format="pyarrow"), "hub"
    ).map_batches(_shape("hub", "hub"), batch_format="pyarrow")
    auth = l2_normalize(
        auth.map_batches(_side("auth"), batch_format="pyarrow"), "auth"
    ).map_batches(_shape("auth", "auth"), batch_format="pyarrow")
    return hub.union(auth)


def q_salsa_partsupp(sf_dir: str):
    """SALSA hubs (parts) & authorities (suppliers) on the symmetrized
    part–supplier graph, k=2 alternating iterations: the degree-
    normalized walk chain from x₀ = 1 on the supplier side, read at
    supersteps 3 (hub = h₂) and 4 (authority = a₂). SQL-oracled via
    unrolled normalized-walk CTEs; raw walk mass ROUND 9 (the repo's
    sum-monoid convention). Returns (vid, kind, score_r9)."""
    from .hits import salsa

    g = _partsupp_und_graph(sf_dir)
    hub, auth, _ = salsa(
        g, _ckpt("salsa"), k=2, auth_pred=lambda v: v >= np.uint64(SUPP_OFFSET)
    )

    def _shape(kind: str, col: str, lo: int, hi: int):
        def _f(b: pa.Table) -> pa.Table:
            vid = b.column("vid").to_numpy(zero_copy_only=False)
            b = b.filter(pa.array((vid >= lo) & (vid < hi)))
            return pa.table(
                {
                    "vid": b.column("vid").cast(pa.int64()),
                    "kind": pa.array([kind] * b.num_rows, type=pa.string()),
                    "score_r9": pc.round(b.column(col), ndigits=9),
                }
            )

        return _f

    hub = hub.map_batches(
        _shape("hub", "hub", 0, SUPP_OFFSET), batch_format="pyarrow"
    )
    auth = auth.map_batches(
        _shape("auth", "auth", SUPP_OFFSET, 1 << 62), batch_format="pyarrow"
    )
    return hub.union(auth)


def q_distance_buckets_partsupp(sf_dir: str):
    """Distance-bucketed clustering histogram (base_compute_clustering
    parity, separator_utils.py:28-57): ⌊dist/unit⌋ buckets of the
    weighted SSSP metric from parts 1–3 — SQL-oracled via the unrolled
    Bellman–Ford + integer division. Returns (bucket, n)."""
    from .paths import distance_bucket_aggregate

    g = _weighted_partsupp_graph(sf_dir)
    out, _ = distance_bucket_aggregate(
        g, np.array([1, 2, 3], dtype=np.uint64), _ckpt("dbuck"), unit_q=256
    )
    return out


def q_sgns_embeddings_coocc(sf_dir: str):
    """Trained SGNS vertex embeddings over the co-occurrence graph's
    walk corpus (pipelines/embedding_train.py): walks → skip-gram
    pairs → synchronous full-batch SGNS GD with broadcast parameters
    and combiner-backed gradient reduction. Returns one row per vertex
    (vid, l2norm rounded to 1e-6). Rows-only: gradient sums are
    float-order-dependent at round-off, so value invariants (loss
    decrease, community cosine separation, determinism of the corpus
    and negatives) are pytest-verified (tests/test_sgns.py)."""
    import pyarrow as pa

    from .embedding_train import sgns_train_embeddings

    emb_ds, _ = sgns_train_embeddings(
        _coocc_graph(sf_dir), dim=8, epochs=3, walk_len=6, n_neg=2, seed=7
    )

    def _norms(batch: pa.Table) -> pa.Table:
        from ..util import list_rows

        vecs = list_rows(batch, "emb")
        n = np.array([float(np.linalg.norm(v)) for v in vecs])
        return pa.table(
            {
                "vid": batch.column("vid").cast(pa.int64()),
                "l2norm_r6": pa.array(np.round(n, 6), type=pa.float64()),
            }
        )

    return emb_ds.map_batches(_norms, batch_format="pyarrow")


def q_gw_graph_distance(sf_dir: str):
    """Gromov–Wasserstein discrepancy between engine-coarsened graphs
    (gromov_wasserstein_discrepancy parity): k=32 hash-sampled vertices
    per graph, structure costs from ONE distributed multi-source walk
    run each, entropic proximal-point solver on the k×k blocks.
    Self-match lands ≈0; co-occurrence vs the customer→order star
    forest separates. Rows-only: the solver is an iterative
    data-dependent optimization (early-break + restarts) with no SQL
    form; invariants are pytest-verified (tests/test_matching.py)."""
    from .matching import gromov_wasserstein, sampled_cost_matrix

    g1 = _coocc_graph(sf_dir)
    g2 = build_graph(
        customer_order_edges(sf_dir), EngineConfig(num_partitions=16), directed=False
    )
    c1, _ = sampled_cost_matrix(g1, _ckpt("gw1"), k=32, walk_k=2)
    c1b, _ = sampled_cost_matrix(g1, _ckpt("gw1b"), k=32, walk_k=2, seed=43)
    c2, _ = sampled_cost_matrix(g2, _ckpt("gw2"), k=32, walk_k=2)
    _, d_self = gromov_wasserstein(c1, c1b, beta=0.05, n_restarts=3)
    _, d_cross = gromov_wasserstein(c1, c2, beta=0.05, n_restarts=3)
    return pa.table(
        {
            "pair": pa.array(["coocc_vs_coocc", "coocc_vs_custorders"], type=pa.string()),
            "gw_r6": pa.array(
                [round(d_self, 6), round(d_cross, 6)], type=pa.float64()
            ),
        }
    )


def q_gw_barycenter_summary(sf_dir: str):
    """GW barycenter over three engine-coarsened graph views
    (gromov_wasserstein_barycenter parity, gromov_wasserstein_graphs
    .py:638-715): k=24 sampled costs of the co-occurrence graph under
    three sample seeds, 16-node barycenter; reports the summed
    discrepancy at start/end of the fixed point and the barycenter's
    mean off-diagonal cost. Rows-only: iterative data-dependent
    optimization with no SQL form; structural invariants are
    pytest-verified (tests/test_matching.py)."""
    from .matching import gromov_wasserstein_barycenter, sampled_cost_matrix

    g = _coocc_graph(sf_dir)
    costs = []
    for i, sd in enumerate((42, 43, 44)):
        c, _ = sampled_cost_matrix(g, _ckpt(f"gwb{i}"), k=24, walk_k=2, seed=sd)
        costs.append(c)
    bary, transports, d_hist = gromov_wasserstein_barycenter(
        costs, n_center=16, beta=0.05, max_iter=15
    )
    off = bary[~np.eye(len(bary), dtype=bool)]
    return pa.table(
        {
            "stat": pa.array(
                ["d_sum_first", "d_sum_last", "bary_offdiag_mean", "n_center"],
                type=pa.string(),
            ),
            "value_r6": pa.array(
                [
                    round(float(d_hist[0]), 6),
                    round(float(d_hist[-1]), 6),
                    round(float(off.mean()), 6),
                    float(len(bary)),
                ],
                type=pa.float64(),
            ),
        }
    )


def q_dsd_pairs_coocc(sf_dir: str):
    """Exact Diffusion State Distance between the 4 lowest partkeys on
    the co-occurrence graph (diffusion_state_distance parity for a
    bounded query set — the all-pairs matrix cannot exist at scale).
    SQL-oracled via unrolled walk powers + L1 aggregation. Returns
    (qa, qb, dsd_r9)."""
    from .walks import diffusion_state_distance_pairs

    g = _coocc_graph(sf_dir)
    pairs, _ = diffusion_state_distance_pairs(g, _ckpt("dsd"), [1, 2, 3, 4], n_rw=3)
    return pa.table(
        {
            "qa": pa.array([int(r[0]) for r in pairs], type=pa.int64()),
            "qb": pa.array([int(r[1]) for r in pairs], type=pa.int64()),
            "dsd_r9": pa.array([round(float(r[2]), 9) for r in pairs], type=pa.float64()),
        }
    )


def q_ldd_coocc(sf_dir: str):
    """Random-shift low-diameter decomposition (Bartal/FRT-family
    parity via Miller–Peng–Xu) of the part co-occurrence graph —
    rows-only at the driver; bit-exact vs the dense replica in pytest."""
    from .decomposition import low_diameter_decomposition

    g = _coocc_graph(sf_dir)
    # β sized to this graph: the co-occurrence graph has diameter ≈ 4,
    # so small β (radius O(log n / β) > diameter) degenerates to one
    # cluster; β=4 yields ~1000 clusters with largest ≈ 110 at sf0.01.
    out, _ = low_diameter_decomposition(g, _ckpt("ldd"), beta=4.0)

    def _shape(batch: pa.Table) -> pa.Table:
        return pa.table(
            {
                "vid": batch.column("vid").cast(pa.int64()),
                "cluster": batch.column("cluster"),
                "is_center": batch.column("is_center"),
            }
        )

    return out.map_batches(_shape, batch_format="pyarrow")


def q_cluster_slices_coocc(sf_dir: str):
    """Distance-bucketed cluster aggregation over the part
    co-occurrence graph (SURVEY §2.1 #10 — the reference separator
    stack's ``base_compute_clustering``, separator_utils.py:28-57,
    re-expressed on LDD clusters): per (cluster, hop-band) vertex
    count and degree sum. All-integer → exact SQL parity."""
    from .decomposition import cluster_distance_slices

    g = _coocc_graph(sf_dir)
    return cluster_distance_slices(
        g, _ckpt("cslices"), beta=4.0, seed=42, unit=1
    )


def q_cluster_field_integrate_coocc(sf_dir: str):
    """Banded kernel-field integration within LDD clusters (the
    SeparationGFIntegrator core re-expressed on hop bands —
    pipelines/decomposition.cluster_sliced_integrate): per vertex,
    Σ over its cluster's bands of band-degree-sum / (1 + band
    distance). Float output rounded half-even at 6 → SQL parity."""
    from .decomposition import cluster_sliced_integrate

    g = _coocc_graph(sf_dir)
    return cluster_sliced_integrate(
        g, _ckpt("cfint"), beta=4.0, seed=42, unit=1
    )


def q_cluster_cross_integrate_coocc(sf_dir: str):
    """Cross-cluster Hankel kernel-field integration over the part
    co-occurrence graph (SURVEY §2 #12 remainder — the reference's A↔B
    cross-terms with the geometric fast-multiply,
    separator_utils.py:239-268,310-332, re-expressed on an LDD
    parity split): per vertex, the floor-quantized geometric-kernel
    contribution of every opposite-side cluster's band sums. SQL
    parity via oracles/sql.cluster_cross_integrate_coocc_sql."""
    from .decomposition import cluster_cross_integrate

    g = _coocc_graph(sf_dir)
    return cluster_cross_integrate(
        g, _ckpt("ccross"), beta=4.0, seed=42, unit=1
    )


def q_sinkhorn_coocc(sf_dir: str):
    """Entropic OT distances from the retailprice mass distribution to
    (0) itself and (1) the size-proportional distribution, over the part
    co-occurrence graph — convolutional Sinkhorn (rows-only at the
    driver; engine ≡ dense-replica oracle in pytest). The self-distance
    landing strictly below the cross-distance is the semantic check."""
    import pyarrow.parquet as pq_  # noqa: N813

    from .diffusion import sinkhorn_distance

    g = _coocc_graph(sf_dir)
    part_tbl = pq_.read_table(
        os.path.join(sf_dir, "part.parquet"),
        columns=["p_partkey", "p_retailprice", "p_size"],
    )
    keys = part_tbl.column("p_partkey").to_numpy().astype(np.uint64)
    price = part_tbl.column("p_retailprice").to_numpy().astype(np.float64)
    size = part_tbl.column("p_size").to_numpy().astype(np.float64)

    from .walks import vertex_lookup_init

    mu_lookup = vertex_lookup_init(keys, price / price.sum())
    nu_lookup = vertex_lookup_init(
        keys, np.stack([price / price.sum(), size / size.sum()], axis=1), width=2
    )

    dist, _ = sinkhorn_distance(
        g, _ckpt("sinkhorn"), mu_lookup, nu_lookup, 2,
        blur_t=0.01, blur_steps=3, n_iters=4,
    )
    import ray.data as rd

    return rd.from_arrow(
        pa.table(
            {
                "target": pa.array([0, 1], type=pa.int64()),
                "dist_r6": pa.array(np.round(dist, 6), type=pa.float64()),
            }
        )
    )


def q_msf_coocc(sf_dir: str):
    """Minimum spanning forest of the part co-occurrence graph, edge
    weight = co-occurrence count (duplicate pairs sum at CSR pack) —
    Borůvka rounds; SQL-oracled (unrolled Borůvka rounds) and
    Kruskal-exact in pytest."""
    from .mst import minimum_spanning_forest

    g = _coocc_w_graph(sf_dir)
    forest, _ = minimum_spanning_forest(g)

    def _shape(batch: pa.Table) -> pa.Table:
        return pa.table(
            {
                "a": batch.column("a").cast(pa.int64()),
                "b": batch.column("b").cast(pa.int64()),
                "w": batch.column("w"),
            }
        )

    return forest.map_batches(_shape, batch_format="pyarrow")


EVENT_WINDOW_PARTS = 64  # user-hash partitions for window-op grouping


def _events_by_part(sf_dir: str, extra_cols=()):
    """events with a ``part = user_id % EVENT_WINDOW_PARTS`` column —
    window ops group by PARTITION (≤ EVENT_WINDOW_PARTS vectorized
    tasks over many users each), not by user (one Python call per user;
    the round-2 shape). Per-task memory is O(rows / partitions)."""

    def _with_part(b: pa.Table) -> pa.Table:
        uid = b.column("user_id").to_numpy(zero_copy_only=False)
        return b.append_column(
            "part", pa.array((uid % EVENT_WINDOW_PARTS).astype(np.int64))
        )

    cols = ["event_id", "user_id", "ts", *extra_cols]
    return _read(sf_dir, "events", cols).map_batches(_with_part, batch_format="pyarrow")


def _sorted_user_ts(group: pa.Table):
    """(uid, ts_us:int64, eid) of a partition group, lexsorted by
    (user, ts, event_id), plus the new-user boundary mask."""
    uid = group.column("user_id").to_numpy(zero_copy_only=False)
    ts = (
        group.column("ts")
        .cast(pa.timestamp("us"))
        .to_numpy(zero_copy_only=False)
        .astype("datetime64[us]")
        .view(np.int64)
    )
    eid = group.column("event_id").to_numpy(zero_copy_only=False)
    srt = np.lexsort((eid, ts, uid))
    uid, ts, eid = uid[srt], ts[srt], eid[srt]
    new_user = np.concatenate(([True], uid[1:] != uid[:-1]))
    return uid, ts, eid, new_user


def q_events_prev_gap(sf_dir: str):
    """Per-user LAG: microseconds since the user's previous event
    (-1 for the first) — ordered-log window op, SQL-oracled. One
    vectorized diff per partition task; no per-user Python calls."""

    def _lag(group: pa.Table) -> pa.Table:
        _, ts, eid, new_user = _sorted_user_ts(group)
        gap = np.empty(len(ts), dtype=np.int64)
        gap[:1] = -1
        if len(ts) > 1:
            gap[1:] = ts[1:] - ts[:-1]
        gap[new_user] = -1
        return pa.table(
            {
                "event_id": pa.array(eid, type=pa.int64()),
                "gap_us": pa.array(gap, type=pa.int64()),
            }
        )

    return (
        _events_by_part(sf_dir)
        .groupby("part")
        .map_groups(_lag, batch_format="pyarrow")
    )


def q_event_transitions(sf_dir: str):
    """First-order Markov transition graph over the event log: per
    user (ordered by ts, event_id), consecutive event_type pairs →
    global transition counts + per-source transition probabilities
    (one IEEE division of exact integer counts). The per-user ordering
    runs inside EVENT_WINDOW_PARTS vectorized partition tasks (the
    events-window idiom); per-group pair counts pre-aggregate before
    the tiny ``groupby(src, dst)``. SQL-oracled (LAG replay). Returns
    (src_type, dst_type, n, prob)."""
    from collections import Counter

    from ray.data.aggregate import Sum

    def _trans(group: pa.Table) -> pa.Table:
        uid = group.column("user_id").to_numpy(zero_copy_only=False)
        ts = (
            group.column("ts")
            .cast(pa.timestamp("us"))
            .to_numpy(zero_copy_only=False)
            .astype("datetime64[us]")
            .view(np.int64)
        )
        eid = group.column("event_id").to_numpy(zero_copy_only=False)
        et = np.asarray(group.column("event_type").to_pylist(), dtype=object)
        srt = np.lexsort((eid, ts, uid))
        uid, et = uid[srt], et[srt]
        same_user = uid[1:] == uid[:-1]
        c: Counter = Counter(
            zip(et[:-1][same_user].tolist(), et[1:][same_user].tolist())
        )
        return pa.table(
            {
                "src_type": pa.array([k[0] for k in c], type=pa.string()),
                "dst_type": pa.array([k[1] for k in c], type=pa.string()),
                "n": pa.array(list(c.values()), type=pa.int64()),
            }
        )

    counts = (
        _events_by_part(sf_dir, extra_cols=("event_type",))
        .groupby("part")
        .map_groups(_trans, batch_format="pyarrow")
        .groupby(["src_type", "dst_type"])
        .aggregate(Sum("n", alias_name="n"))
    )

    def _prob(group: pa.Table) -> pa.Table:
        n = group.column("n").to_numpy(zero_copy_only=False)
        t = int(n.sum())
        return pa.table(
            {
                "src_type": group.column("src_type"),
                "dst_type": group.column("dst_type"),
                "n": group.column("n"),
                "prob": pa.array(n.astype(np.float64) / float(t), type=pa.float64()),
            }
        )

    return counts.groupby("src_type").map_groups(_prob, batch_format="pyarrow")


SESSION_GAP_US = 3_600_000_000  # 1 hour


def q_events_sessions(sf_dir: str):
    """Gap-based session windows (1 h inactivity): per (user, session):
    event count and bounds — the guide's session-window pattern
    (sorted keys + cumsum of gap flags), SQL-oracled. All users of a
    hash partition are segmented in ONE vectorized pass (lexsort +
    boundary masks); session ids restart per user via a grouped
    running-maximum, not a per-user loop."""

    def _sessions(group: pa.Table) -> pa.Table:
        uid, ts, _, new_user = _sorted_user_ts(group)
        n = len(uid)
        if not n:
            return pa.table(
                {
                    "user_id": pa.array([], type=pa.int64()),
                    "session_id": pa.array([], type=pa.int64()),
                    "n_events": pa.array([], type=pa.int64()),
                    "start_ts": pa.array([], type=pa.timestamp("us")),
                    "end_ts": pa.array([], type=pa.timestamp("us")),
                }
            )
        gap = np.empty(n, dtype=np.int64)
        gap[:1] = 0
        gap[1:] = ts[1:] - ts[:-1]
        new_s = new_user | (gap > SESSION_GAP_US)
        starts = np.flatnonzero(new_s)
        n_events = np.diff(np.append(starts, n))
        # per-user 1-based session counter over the partition's segments
        seg_idx = np.arange(len(starts))
        base = np.where(new_user[starts], seg_idx, 0)
        session_id = seg_idx - np.maximum.accumulate(base) + 1
        ends = starts + n_events - 1  # last row = max ts (sorted within user)
        return pa.table(
            {
                "user_id": pa.array(uid[starts].astype(np.int64)),
                "session_id": pa.array(session_id.astype(np.int64)),
                "n_events": pa.array(n_events.astype(np.int64)),
                "start_ts": pa.array(ts[starts].view("datetime64[us]")),
                "end_ts": pa.array(ts[ends].view("datetime64[us]")),
            }
        )

    return (
        _events_by_part(sf_dir)
        .groupby("part")
        .map_groups(_sessions, batch_format="pyarrow")
    )


def q_events_props_stats(sf_dir: str):
    """Semi-structured extraction: pull the integer ``k`` out of the
    events ``props`` JSON column with one compiled vectorized regex
    (no per-row json.loads) and aggregate per event_type —
    (event_type, n, sum_k, min_k, max_k). SQL-oracled via the same
    regexp_extract."""
    from ray.data.aggregate import Count, Max, Min, Sum

    def _extract(b: pa.Table) -> pa.Table:
        import pandas as pd

        props = b.column("props").to_pandas()
        k = (
            props.str.extract(r'"k":\s*(-?\d+)', expand=False)
            .fillna("0")
            .astype(np.int64)
        )
        return pa.table(
            {
                "event_type": b.column("event_type"),
                "k": pa.array(k.to_numpy(), type=pa.int64()),
            }
        )

    return (
        _read(sf_dir, "events", ["event_type", "props"])
        .map_batches(_extract, batch_format="pyarrow")
        .groupby("event_type")
        .aggregate(
            Count(alias_name="n"),
            Sum("k", alias_name="sum_k"),
            Min("k", alias_name="min_k"),
            Max("k", alias_name="max_k"),
        )
    )


WEEK_US = 7 * 24 * 3_600_000_000


def q_events_cohort_retention(sf_dir: str):
    """Weekly cohort retention matrix: cohort = epoch-week of the
    user's FIRST event; for every (cohort_week, week_offset) count the
    distinct users of that cohort active in that week. SQL-oracled —
    pure integer counts.

    Plan: the user-hash partition pass computes each user's first-event
    week and distinct active weeks in one lexsorted sweep (a user
    contributes ≤1 per (cohort, offset) by construction, so partition
    partials ARE distinct-user counts); one tiny groupby merges them."""
    from ray.data.aggregate import Sum

    def _cohort(group: pa.Table) -> pa.Table:
        uid, ts, _, new_user = _sorted_user_ts(group)
        if len(uid) == 0:
            return pa.table(
                {
                    "cohort_week": pa.array([], type=pa.int64()),
                    "week_offset": pa.array([], type=pa.int64()),
                    "n_users": pa.array([], type=pa.int64()),
                }
            )
        week = ts // WEEK_US
        # first-event week per user, aligned to every row of that user
        uidx = np.cumsum(new_user) - 1
        first_week = week[new_user][uidx]
        offset = week - first_week
        # distinct (user, cohort, offset): consecutive after the sort
        key_new = new_user | np.concatenate(([True], offset[1:] != offset[:-1]))
        cw, off = first_week[key_new], offset[key_new]
        order = np.lexsort((off, cw))
        cw, off = cw[order], off[order]
        grp_new = np.concatenate(
            ([True], (cw[1:] != cw[:-1]) | (off[1:] != off[:-1]))
        )
        gid = np.cumsum(grp_new) - 1
        n = np.bincount(gid)
        return pa.table(
            {
                "cohort_week": pa.array(cw[grp_new].astype(np.int64), type=pa.int64()),
                "week_offset": pa.array(off[grp_new].astype(np.int64), type=pa.int64()),
                "n_users": pa.array(n.astype(np.int64), type=pa.int64()),
            }
        )

    return (
        _events_by_part(sf_dir)
        .groupby("part")
        .map_groups(_cohort, batch_format="pyarrow")
        .groupby(["cohort_week", "week_offset"])
        .aggregate(Sum("n_users", alias_name="n_users"))
    )


FUNNEL_WINDOW_US = 24 * 3_600_000_000  # 24 h


def q_events_funnel(sf_dir: str):
    """Signup→purchase conversion funnel: per user take the FIRST
    signup event; the user converts if any purchase lands in
    (signup_ts, signup_ts + 24 h]. Output grouped by the signup's hour
    of day: (hour, n_signups, n_converted, conv_rate_r6). SQL-oracled
    (exact integer counts; ONE division after the final merge).

    Plan: a user-hash partition pass resolves every user's funnel in
    one vectorized sweep (lexsort + first-of-run + searchsorted
    purchase membership — no per-user Python), emitting ≤24 partial
    rows per partition; a tiny ``groupby(hour).sum`` merges them."""
    from ray.data.aggregate import Sum

    def _funnel(group: pa.Table) -> pa.Table:
        uid = group.column("user_id").to_numpy(zero_copy_only=False)
        ts = (
            group.column("ts")
            .cast(pa.timestamp("us"))
            .to_numpy(zero_copy_only=False)
            .astype("datetime64[us]")
            .view(np.int64)
        )
        eid = group.column("event_id").to_numpy(zero_copy_only=False)
        et = np.asarray(group.column("event_type").to_pylist(), dtype=object)
        srt = np.lexsort((eid, ts, uid))
        uid, ts, et = uid[srt], ts[srt], et[srt]
        mask_s = et == "signup"
        su, sts_ = uid[mask_s], ts[mask_s]
        if len(su) == 0:
            return pa.table(
                {
                    "hour": pa.array([], type=pa.int64()),
                    "n_signups": pa.array([], type=pa.int64()),
                    "n_converted": pa.array([], type=pa.int64()),
                }
            )
        firsts = np.concatenate(([True], su[1:] != su[:-1]))
        fs_u, fs_ts = su[firsts], sts_[firsts]
        mask_p = et == "purchase"
        pu, pts = uid[mask_p], ts[mask_p]
        conv_flag = np.zeros(len(fs_u), dtype=bool)
        if len(pu):
            pos = np.searchsorted(fs_u, pu)
            ok = pos < len(fs_u)
            ok[ok] = fs_u[pos[ok]] == pu[ok]
            w = np.flatnonzero(ok)
            hit = (pts[w] > fs_ts[pos[w]]) & (pts[w] <= fs_ts[pos[w]] + FUNNEL_WINDOW_US)
            conv_flag[np.unique(pos[w[hit]])] = True
        hour = ((fs_ts // 3_600_000_000) % 24).astype(np.int64)
        n_sign = np.bincount(hour, minlength=24)
        n_conv = np.bincount(hour[conv_flag], minlength=24)
        nz = np.flatnonzero(n_sign)
        return pa.table(
            {
                "hour": pa.array(nz.astype(np.int64), type=pa.int64()),
                "n_signups": pa.array(n_sign[nz].astype(np.int64), type=pa.int64()),
                "n_converted": pa.array(n_conv[nz].astype(np.int64), type=pa.int64()),
            }
        )

    merged = (
        _events_by_part(sf_dir, extra_cols=("event_type",))
        .groupby("part")
        .map_groups(_funnel, batch_format="pyarrow")
        .groupby("hour")
        .aggregate(
            Sum("n_signups", alias_name="n_signups"),
            Sum("n_converted", alias_name="n_converted"),
        )
    )

    def _rate(b: pa.Table) -> pa.Table:
        s = b.column("n_signups").to_numpy(zero_copy_only=False).astype(np.float64)
        c = b.column("n_converted").to_numpy(zero_copy_only=False).astype(np.float64)
        return b.append_column(
            "conv_rate_r6", pa.array(np.round(c / s, 6), type=pa.float64())
        )

    return merged.map_batches(_rate, batch_format="pyarrow")


def q_events_asof_last_order(sf_dir: str):
    """As-of join as a partitioned sort-merge: each event matched to the
    user's most recent order date ≤ event ts. Both sides are tagged into
    ONE superset schema, a single ``groupby(user_id % P)`` co-locates
    each user's events with their orders, and the partition task
    resolves ALL of its users in one vectorized pass: lexsort by
    (user, ts, kind) with orders before events at equal ts, then a
    per-user-resetting running maximum over order-row indices (the
    grouped-cummax offset trick) forward-fills "last order seen so
    far". No per-user Python calls; neither side is ever materialized
    on the driver. SQL-oracled via DuckDB ASOF JOIN."""
    sentinel = np.datetime64("1970-01-01T00:00:00", "us")

    def _tag_events(b: pa.Table) -> pa.Table:
        uid = b.column("user_id").cast(pa.int64())
        return pa.table(
            {
                "part": pa.array(
                    uid.to_numpy(zero_copy_only=False) % EVENT_WINDOW_PARTS,
                    type=pa.int64(),
                ),
                "user_id": uid,
                "event_id": b.column("event_id").cast(pa.int64()),
                "ts": b.column("ts").cast(pa.timestamp("us")),
                "o_ts": pa.nulls(b.num_rows, type=pa.timestamp("us")),
            }
        )

    def _tag_orders(b: pa.Table) -> pa.Table:
        uid = b.column("o_custkey").cast(pa.int64())
        return pa.table(
            {
                "part": pa.array(
                    uid.to_numpy(zero_copy_only=False) % EVENT_WINDOW_PARTS,
                    type=pa.int64(),
                ),
                "user_id": uid,
                "event_id": pa.nulls(b.num_rows, type=pa.int64()),
                "ts": pa.nulls(b.num_rows, type=pa.timestamp("us")),
                "o_ts": b.column("o_orderdate").cast(pa.timestamp("us")),
            }
        )

    both = _read(sf_dir, "events", ["event_id", "user_id", "ts"]).map_batches(
        _tag_events, batch_format="pyarrow"
    ).union(
        _read(sf_dir, "orders", ["o_custkey", "o_orderdate"]).map_batches(
            _tag_orders, batch_format="pyarrow"
        )
    )

    def _asof(g: pa.Table) -> pa.Table:
        uid = g.column("user_id").to_numpy(zero_copy_only=False)
        eid = (
            g.column("event_id")
            .fill_null(-1)
            .cast(pa.int64())
            .to_numpy(zero_copy_only=False)
        )
        is_event = eid >= 0
        ev_ts = (
            g.column("ts")
            .cast(pa.timestamp("us"))
            .to_numpy(zero_copy_only=False)
            .astype("datetime64[us]")
            .view(np.int64)
        )
        od_ts = (
            g.column("o_ts")
            .cast(pa.timestamp("us"))
            .to_numpy(zero_copy_only=False)
            .astype("datetime64[us]")
            .view(np.int64)
        )
        t = np.where(is_event, ev_ts, od_ts)
        # orders sort BEFORE events at equal (user, ts): order at == ts counts
        srt = np.lexsort((is_event, t, uid))
        uid_s, t_s, eid_s, is_ev_s = uid[srt], t[srt], eid[srt], is_event[srt]
        n = len(uid_s)
        gid = np.cumsum(np.concatenate(([True], uid_s[1:] != uid_s[:-1]))) - 1
        # per-user cummax of order-row indices: the gid*(n+1) offset makes
        # a fresh user's "no order yet" floor exceed every prior user's max
        idx = np.arange(n, dtype=np.int64)
        score = gid * np.int64(n + 1) + np.where(is_ev_s, np.int64(-1), idx)
        last = np.maximum.accumulate(score) - gid * np.int64(n + 1)
        ev_rows = np.flatnonzero(is_ev_s)
        last_ev = last[ev_rows]
        out = np.full(len(ev_rows), sentinel.astype(np.int64), dtype=np.int64)
        has = last_ev >= 0
        out[has] = t_s[last_ev[has]]
        return pa.table(
            {
                "event_id": pa.array(eid_s[ev_rows], type=pa.int64()),
                "last_order_ts": pa.array(out.view("datetime64[us]")),
            }
        )

    merged = both.groupby("part").map_groups(_asof, batch_format="pyarrow")

    def _shape(batch: pa.Table) -> pa.Table:  # re-cast after the shuffle
        return pa.table(
            {
                "event_id": batch.column("event_id").cast(pa.int64()),
                "last_order_ts": batch.column("last_order_ts").cast(pa.timestamp("us")),
            }
        )

    return merged.map_batches(_shape, batch_format="pyarrow")


def q_approx_distinct_users(sf_dir: str):
    """HLL approximate distinct users per event_type — mergeable-sketch
    aggregation (rows-only; ±3% vs exact asserted in pytest)."""
    from ..functions.sketches import approx_distinct_by_key

    return approx_distinct_by_key(
        _read(sf_dir, "events", ["event_type", "user_id"]), "event_type", "user_id"
    )


def q_top3_orders_per_customer_segment(sf_dir: str):
    """Top-3 orders by price within each customer market segment —
    per-group top-k (ROW_NUMBER parity), SQL-oracled."""
    orders = _read(sf_dir, "orders", ["o_orderkey", "o_custkey", "o_totalprice"])
    cust = _read(sf_dir, "customer", ["c_custkey", "c_mktsegment"])
    import ray

    # broadcast the SMALL side as two parallel sorted numpy arrays
    # (custkey → segment code) — searchsorted lookup per batch, no
    # Python dict and no per-row loop
    keys_parts, seg_parts = [], []
    for b in cust.iter_batches(batch_size=None, batch_format="pyarrow"):
        keys_parts.append(b.column("c_custkey").to_numpy(zero_copy_only=False))
        seg_parts.append(b.column("c_mktsegment").to_numpy(zero_copy_only=False))
    keys = np.concatenate(keys_parts)
    segs_all = np.concatenate(seg_parts)
    seg_names, seg_codes_all = np.unique(segs_all, return_inverse=True)
    order = np.argsort(keys, kind="stable")
    ref = ray.put((keys[order], seg_codes_all[order].astype(np.int64)))
    names_ref = ray.put(seg_names.astype(str))

    def _attach_top3(batch: pa.Table) -> pa.Table:
        # attach segment code + per-block partial top-3 per segment:
        # each block forwards ≤ 3×|segments| rows into the groupby
        ck_sorted, code_sorted = ray.get(ref)
        ck = batch.column("o_custkey").to_numpy(zero_copy_only=False)
        code = code_sorted[np.searchsorted(ck_sorted, ck)]
        cents = np.floor(
            batch.column("o_totalprice").to_numpy(zero_copy_only=False) * 100
        ).astype(np.int64)
        okey = batch.column("o_orderkey").to_numpy(zero_copy_only=False)
        # top-3 by (-cents, o_orderkey) within segment: lexsort then
        # rank-within-group via grouped cumcount
        srt = np.lexsort((okey, -cents, code))
        code_s, cents_s, okey_s = code[srt], cents[srt], okey[srt]
        grp_start = np.concatenate(([True], code_s[1:] != code_s[:-1]))
        idx = np.arange(len(code_s))
        rank = idx - np.maximum.accumulate(np.where(grp_start, idx, 0))
        keep = rank < 3
        return pa.table(
            {
                "segcode": pa.array(code_s[keep], type=pa.int64()),
                "o_orderkey": pa.array(okey_s[keep], type=pa.int64()),
                "cents": pa.array(cents_s[keep], type=pa.int64()),
            }
        )

    def _top3(group: pd.DataFrame) -> pd.DataFrame:
        names = ray.get(names_ref)
        g = group.sort_values(["cents", "o_orderkey"], ascending=[False, True]).head(3)
        return pd.DataFrame(
            {
                "segment": names[g["segcode"].to_numpy()],
                "o_orderkey": g["o_orderkey"].to_numpy(),
                "cents": g["cents"].to_numpy(),
            }
        )

    return (
        orders.map_batches(_attach_top3, batch_format="pyarrow")
        .groupby("segcode")
        .map_groups(_top3, batch_format="pandas")
    )


def q_customers_without_orders(sf_dir: str):
    """Anti-join: customers with no orders (broadcast key-set filter —
    the guide's semi/anti-join pattern), SQL-oracled."""
    import ray

    # distributed distinct FIRST (per-block unique combiner, then the
    # groupby-backed Dataset.unique) — only the small distinct key set
    # (≤ |customers|) ever reaches the driver, never the orders table
    def _block_unique(b: pa.Table) -> pa.Table:
        ck = np.unique(b.column("o_custkey").to_numpy(zero_copy_only=False))
        return pa.table({"o_custkey": pa.array(ck, type=pa.int64())})

    orders = _read(sf_dir, "orders", ["o_custkey"]).map_batches(
        _block_unique, batch_format="pyarrow"
    )
    have = orders.unique("o_custkey")
    ref = ray.put(np.sort(np.asarray(have, dtype=np.int64)))

    def _anti(batch: pa.Table) -> pa.Table:
        keys = ray.get(ref)
        ck = batch.column("c_custkey").to_numpy(zero_copy_only=False)
        pos = np.searchsorted(keys, ck)
        ok = pos < len(keys)
        hit = np.zeros(len(ck), dtype=bool)
        hit[ok] = keys[pos[ok]] == ck[ok]
        return pa.table({"c_custkey": pa.array(ck[~hit], type=pa.int64())})

    out = _read(sf_dir, "customer", ["c_custkey"]).map_batches(
        _anti, batch_format="pyarrow"
    )
    # empty results drop their schema through Ray's empty-block pruning;
    # return an explicit-schema Arrow table so the driver's schema check
    # holds even for 0 rows
    schema = pa.schema([("c_custkey", pa.int64())])
    batches = list(out.iter_batches(batch_size=None, batch_format="pyarrow"))
    return (
        pa.concat_tables([b.cast(schema) for b in batches])
        if batches
        else schema.empty_table()
    )


# --------------------------------------------------------------------------
# graph summary statistics (round 3): assortativity, modularity, link pred
# --------------------------------------------------------------------------

def q_assortativity_coocc(sf_dir: str):
    """Degree assortativity of the co-occurrence graph as one raw
    superstep: with x = degree vector, the slot sums the Pearson
    formula needs are Σdeg, Σdeg², Σdeg³ and degᵀ·(A·deg) — the last
    one is the engine's adjacency matvec applied to the degree field
    (interconnected_kernel-style reuse). All four sums are exact
    integers at fixture scale (< 2^53); r = (sxy/m − (sx/m)²) /
    (sxx/m − (sx/m)²) is the identical IEEE expression in SQL.
    Returns one row (m_slots, s_x, s_xx, s_xy, assortativity_r6)."""
    from ..state.superstep import run_supersteps, state_vertex_dataset
    from ..util import list_rows

    g = _coocc_graph(sf_dir)

    def init_fn(csr):
        n = len(csr["vids"])
        out = np.zeros((n, 2), dtype=np.float64)
        out[:, 0] = csr["deg"]
        return out

    def apply_fn(agg, old, T, dm, csr):
        # col0 keeps deg; col1 receives (A·deg)
        return np.stack([old[:, 0], agg[:, 0]], axis=1)

    summary = run_supersteps(
        g, _ckpt("assort"), "sum", init_fn,
        tol=0.0, max_iters=1, normalize=False, apply_fn=apply_fn,
    )
    st = state_vertex_dataset(g, summary["final_iter_dir"], "dv")

    def _partial(batch: pa.Table) -> pa.Table:
        rows = list_rows(batch, "dv")
        if not rows:
            mat = np.zeros((0, 2))
        else:
            mat = np.stack(rows)
        d, y = mat[:, 0], mat[:, 1]
        return pa.table(
            {
                "m": pa.array([d.sum()], type=pa.float64()),
                "sx": pa.array([(d * d).sum()], type=pa.float64()),
                "sxx": pa.array([(d * d * d).sum()], type=pa.float64()),
                "sxy": pa.array([(d * y).sum()], type=pa.float64()),
            }
        )

    agg = st.map_batches(_partial, batch_format="pyarrow").aggregate(
        Sum("m", alias_name="m"),
        Sum("sx", alias_name="sx"),
        Sum("sxx", alias_name="sxx"),
        Sum("sxy", alias_name="sxy"),
    )
    m, sx, sxx, sxy = (float(agg[c]) for c in ("m", "sx", "sxx", "sxy"))
    r = (sxy / m - (sx / m) * (sx / m)) / (sxx / m - (sx / m) * (sx / m))
    return pa.table(
        {
            "m_slots": pa.array([int(m)], type=pa.int64()),
            "s_x": pa.array([int(sx)], type=pa.int64()),
            "s_xx": pa.array([int(sxx)], type=pa.int64()),
            "s_xy": pa.array([int(sxy)], type=pa.int64()),
            "assortativity_r6": pa.array([np.round(r, 6)], type=pa.float64()),
        }
    )


def q_modularity_coocc(sf_dir: str):
    """Newman modularity of the label-propagation communities, per
    community: Q_c = intra_slots_c/m₂ − (deg_sum_c/m₂)². Labels come
    from the SAME seeded min-label run as q_label_prop_coocc (its
    final checkpoint seeds the second superstep via per-part state
    files — no driver-side vertex table). The second superstep is one
    raw gather of the [one-hot(label) | 1] field: A·x_c gives
    per-vertex same-label neighbor counts, A·1 gives degrees.
    Returns (label, intra_slots, deg_sum, q_r6)."""
    from ..config import UNLABELED
    from ..state.ckpt import read_state_part
    from ..state.superstep import run_supersteps, state_vertex_dataset
    from ..util import list_rows
    from .components import label_propagation

    g = _coocc_graph(sf_dir)
    # ONE propagation round: the converged min-label flood would merge a
    # connected graph into a single community (degenerate Q); one round
    # yields the seeds' 1-hop clusters + the unreached group — four real
    # communities on this fixture, a far stronger value check
    _, lp_summary = label_propagation(
        g, _ckpt("labelprop_mod"), {1: 100, 2: 200, 3: 300}, max_iters=1
    )
    lab_dir = lp_summary["final_iter_dir"]
    lab_values = np.array([100, 200, 300, UNLABELED], dtype=np.uint64)

    def init_fn(csr):
        lab = read_state_part(lab_dir, csr["part"]).astype(np.uint64)
        x = (lab[:, None] == lab_values[None, :]).astype(np.float64)  # [n, 4]
        n = len(lab)
        # width stays 9 across the superstep (the engine diffs new vs
        # old state): [x (4) | scratch (4) | 1]
        return np.concatenate([x, np.zeros((n, 4)), np.ones((n, 1))], axis=1)

    def apply_fn(agg, old, T, dm, csr):
        # [x (4) | A·x (4) | deg (1)] — everything the reduction needs
        return np.concatenate([old[:, :4], agg[:, :4], agg[:, 8:9]], axis=1)

    summary = run_supersteps(
        g, _ckpt("modularity"), "sum", init_fn,
        tol=0.0, max_iters=1, normalize=False, apply_fn=apply_fn,
    )
    st = state_vertex_dataset(g, summary["final_iter_dir"], "xy")

    def _partial(batch: pa.Table) -> pa.Table:
        rows = list_rows(batch, "xy")
        mat = np.stack(rows) if rows else np.zeros((0, 9))
        x, y, deg = mat[:, :4], mat[:, 4:8], mat[:, 8]
        return pa.table(
            {
                "m2": pa.array([deg.sum()], type=pa.float64()),
                **{
                    f"intra{c}": pa.array([(x[:, c] * y[:, c]).sum()], type=pa.float64())
                    for c in range(4)
                },
                **{
                    f"dsum{c}": pa.array([(x[:, c] * deg).sum()], type=pa.float64())
                    for c in range(4)
                },
            }
        )

    aggs = [Sum("m2", alias_name="m2")]
    for c in range(4):
        aggs.append(Sum(f"intra{c}", alias_name=f"intra{c}"))
        aggs.append(Sum(f"dsum{c}", alias_name=f"dsum{c}"))
    res = st.map_batches(_partial, batch_format="pyarrow").aggregate(*aggs)
    m2 = float(res["m2"])
    labels, intra, dsum, q = [], [], [], []
    out_labels = [100, 200, 300, -1]
    for c in range(4):
        d_c = float(res[f"dsum{c}"])
        if d_c <= 0:
            continue
        i_c = float(res[f"intra{c}"])
        labels.append(out_labels[c])
        intra.append(int(i_c))
        dsum.append(int(d_c))
        q.append(np.round(i_c / m2 - (d_c / m2) * (d_c / m2), 6))
    return pa.table(
        {
            "label": pa.array(labels, type=pa.int64()),
            "intra_slots": pa.array(intra, type=pa.int64()),
            "deg_sum": pa.array(dsum, type=pa.int64()),
            "q_r6": pa.array(q, type=pa.float64()),
        }
    )


def q_adamic_adar_coocc(sf_dir: str):
    """Top-100 non-adjacent co-occurrence pairs by Adamic-Adar score
    (common-neighbor link prediction; see pipelines/linkpred.py) —
    SQL-oracled via the wedge self-join. Returns (u, v, cn, aa_r6)."""
    from .linkpred import adamic_adar_topk

    return adamic_adar_topk(_coocc_graph(sf_dir), k=100)


def q_orders_events_range_join(sf_dir: str):
    """Range join: per order, the count and exact-cents value sum of the
    customer's events inside [o_orderdate, o_orderdate + 7 days).

    Partitioned sort-merge like the as-of join: both sides tagged into
    one superset schema, ONE ``groupby(user % P)`` co-locates a user's
    orders with their events, and each partition task resolves all its
    users via per-user prefix sums + two ``searchsorted`` probes per
    order (windows overlap, so per-order sums are prefix-sum
    differences — no event is ever scanned twice). Event values enter
    as floor(value·100) cents BIGINTs so sums are exact integers in
    any summation order (the proven floor-cents pattern).
    Returns (o_orderkey, n_events, cents_sum) — one row per order,
    zero-match orders included."""
    window_us = np.int64(7 * 24 * 3600) * np.int64(1_000_000)

    def _tag_orders(b: pa.Table) -> pa.Table:
        uid = b.column("o_custkey").cast(pa.int64())
        return pa.table(
            {
                "part": pa.array(
                    uid.to_numpy(zero_copy_only=False) % EVENT_WINDOW_PARTS,
                    type=pa.int64(),
                ),
                "user_id": uid,
                "o_orderkey": b.column("o_orderkey").cast(pa.int64()),
                "o_ts": b.column("o_orderdate").cast(pa.timestamp("us")),
                "ts": pa.nulls(b.num_rows, type=pa.timestamp("us")),
                "cents": pa.nulls(b.num_rows, type=pa.int64()),
            }
        )

    def _tag_events(b: pa.Table) -> pa.Table:
        uid = b.column("user_id").cast(pa.int64())
        cents = np.floor(
            b.column("value").to_numpy(zero_copy_only=False) * 100.0
        ).astype(np.int64)
        return pa.table(
            {
                "part": pa.array(
                    uid.to_numpy(zero_copy_only=False) % EVENT_WINDOW_PARTS,
                    type=pa.int64(),
                ),
                "user_id": uid,
                "o_orderkey": pa.nulls(b.num_rows, type=pa.int64()),
                "o_ts": pa.nulls(b.num_rows, type=pa.timestamp("us")),
                "ts": b.column("ts").cast(pa.timestamp("us")),
                "cents": pa.array(cents, type=pa.int64()),
            }
        )

    both = _read(sf_dir, "orders", ["o_orderkey", "o_custkey", "o_orderdate"]).map_batches(
        _tag_orders, batch_format="pyarrow"
    ).union(
        _read(sf_dir, "events", ["user_id", "ts", "value"]).map_batches(
            _tag_events, batch_format="pyarrow"
        )
    )

    def _range_join(g: pa.Table) -> pa.Table:
        okey = g.column("o_orderkey").fill_null(-1).to_numpy(zero_copy_only=False)
        is_order = okey >= 0
        uid = g.column("user_id").to_numpy(zero_copy_only=False)
        ev_uid = uid[~is_order]
        ev_ts = (
            g.column("ts")
            .cast(pa.timestamp("us"))
            .to_numpy(zero_copy_only=False)
            .astype("datetime64[us]")
            .view(np.int64)[~is_order]
        )
        ev_cents = g.column("cents").to_numpy(zero_copy_only=False)[~is_order]
        o_uid = uid[is_order]
        o_key = okey[is_order]
        o_ts = (
            g.column("o_ts")
            .cast(pa.timestamp("us"))
            .to_numpy(zero_copy_only=False)
            .astype("datetime64[us]")
            .view(np.int64)[is_order]
        )
        # events sorted by (user, ts) with per-user prefix sums of cents
        es = np.lexsort((ev_ts, ev_uid))
        ev_uid, ev_ts, ev_cents = ev_uid[es], ev_ts[es], ev_cents[es]
        csum = np.concatenate(([0], np.cumsum(ev_cents)))
        # orders sorted by user → one slice of events per user run
        os_ = np.lexsort((o_ts, o_uid))
        o_uid, o_key, o_ts = o_uid[os_], o_key[os_], o_ts[os_]
        n_ev = np.zeros(len(o_key), dtype=np.int64)
        c_sum = np.zeros(len(o_key), dtype=np.int64)
        starts = np.searchsorted(ev_uid, o_uid, side="left")
        ends = np.searchsorted(ev_uid, o_uid, side="right")
        run_start = np.concatenate(([True], o_uid[1:] != o_uid[:-1]))
        for i0 in np.flatnonzero(run_start):
            u0, u1 = starts[i0], ends[i0]
            if u0 == u1:
                continue
            i1 = i0 + np.searchsorted(o_uid[i0:], o_uid[i0], side="right")
            seg = ev_ts[u0:u1]
            lo = u0 + np.searchsorted(seg, o_ts[i0:i1], side="left")
            hi = u0 + np.searchsorted(seg, o_ts[i0:i1] + window_us, side="left")
            n_ev[i0:i1] = hi - lo
            c_sum[i0:i1] = csum[hi] - csum[lo]
        return pa.table(
            {
                "o_orderkey": pa.array(o_key, type=pa.int64()),
                "n_events": pa.array(n_ev, type=pa.int64()),
                "cents_sum": pa.array(c_sum, type=pa.int64()),
            }
        )

    return both.groupby("part").map_groups(_range_join, batch_format="pyarrow")


def q_ktruss_coocc(sf_dir: str):
    """4-truss of the co-occurrence graph, 2 fixed peel rounds (see
    pipelines/truss.py for the three-exchange round plan). Returns the
    surviving edges (u, v, support) with the last round's support."""
    from .truss import k_truss

    return k_truss(part_cooccurrence_edges(sf_dir), k=4, rounds=2)


def q_basket_lift(sf_dir: str, min_support: int = 3, k: int = 50):
    """Market-basket association lift (Agrawal et al., SIGMOD '93):
    for part pairs sharing ≥ min_support orders,
    lift = n_uv·N / (n_u·n_v) with N = #distinct orders — the ratio of
    observed to independence-expected co-occurrence. Top-k by
    (lift_r6 desc, u, v). SQL-oracled.

    Plan: the pair counts ride the existing order-partitioned pair
    generator + one groupby; per-item order counts come from the same
    order-partitioned pass (orders co-locate, so per-group distinct is
    global) and broadcast as two sorted arrays (ray.put once) for the
    map-side lift computation; global sort+limit on the tiny
    filtered result."""
    import ray
    from ray.data.aggregate import Count, Sum

    pairs = (
        part_cooccurrence_edges(sf_dir)
        .groupby(["src", "dst"])
        .aggregate(Count(alias_name="n_uv"))
    )

    def _with_part(b: pa.Table) -> pa.Table:
        ok = b.column("l_orderkey").to_numpy(zero_copy_only=False)
        return b.append_column(
            "part", pa.array((ok % COOCC_PAIR_PARTS).astype(np.int64))
        )

    def _item_partials(g: pa.Table) -> pa.Table:
        ok = g.column("l_orderkey").to_numpy(zero_copy_only=False)
        pk = g.column("l_partkey").to_numpy(zero_copy_only=False).astype(np.int64)
        srt = np.lexsort((pk, ok))
        ok, pk = ok[srt], pk[srt]
        keep = np.concatenate(([True], (ok[1:] != ok[:-1]) | (pk[1:] != pk[:-1])))
        ok, pk = ok[keep], pk[keep]
        order = np.argsort(pk, kind="stable")
        pk = pk[order]
        first = np.concatenate(([True], pk[1:] != pk[:-1]))
        gid = np.cumsum(first) - 1
        cnt = np.bincount(gid)
        n_orders = len(np.unique(ok))
        return pa.table(
            {
                "p": pa.array(np.append(pk[first], -1), type=pa.int64()),
                "c": pa.array(
                    np.append(cnt.astype(np.int64), n_orders), type=pa.int64()
                ),
            }
        )

    items = (
        _read(sf_dir, "lineitem", ["l_orderkey", "l_partkey"])
        .map_batches(_with_part, batch_format="pyarrow")
        .groupby("part")
        .map_groups(_item_partials, batch_format="pyarrow")
        .groupby("p")
        .aggregate(Sum("c", alias_name="c"))
    )
    itbl = pa.concat_tables(
        items.iter_batches(batch_size=None, batch_format="pyarrow")
    )
    ip = itbl.column("p").to_numpy(zero_copy_only=False)
    ic = itbl.column("c").to_numpy(zero_copy_only=False)
    N = int(ic[ip == -1][0])
    mask = ip >= 0
    ip, ic = ip[mask], ic[mask]
    order = np.argsort(ip)
    ref = ray.put((ip[order], ic[order]))

    def _lift(b: pa.Table) -> pa.Table:
        p, c = ray.get(ref)
        u = b.column("src").to_numpy(zero_copy_only=False).astype(np.int64)
        v = b.column("dst").to_numpy(zero_copy_only=False).astype(np.int64)
        n_uv = b.column("n_uv").to_numpy(zero_copy_only=False)
        keep = n_uv >= min_support
        u, v, n_uv = u[keep], v[keep], n_uv[keep]
        nu = c[np.searchsorted(p, u)].astype(np.float64)
        nv = c[np.searchsorted(p, v)].astype(np.float64)
        lift = (n_uv.astype(np.float64) * float(N)) / (nu * nv)
        return pa.table(
            {
                "u": pa.array(u, type=pa.int64()),
                "v": pa.array(v, type=pa.int64()),
                "n_uv": pa.array(n_uv, type=pa.int64()),
                "lift_r6": pa.array(np.round(lift, 6), type=pa.float64()),
            }
        )

    return (
        pairs.map_batches(_lift, batch_format="pyarrow")
        .sort(["lift_r6", "u", "v"], descending=[True, False, False])
        .limit(k)
    )


def q_ship_latency_percentiles(sf_dir: str):
    """Order-to-ship latency distribution: exact p50/p90/p99 of
    (l_shipdate − o_orderdate) in whole days, per order priority.
    The lineitem⋈orders equi-join is the canonical LARGE-LARGE hash
    join: both sides tagged into one superset schema, ONE
    ``groupby(o_orderkey % P)`` co-shuffle, and each partition task
    resolves all of its orders with a vectorized searchsorted — no
    broadcast (at 10^12 rows neither side fits a worker). Percentiles
    via the grouped bounded-domain histogram. SQL-oracled."""
    from ..functions.stats import exact_percentiles_by

    P = 32

    def _ts_us(col):
        return (
            col.cast(pa.timestamp("us"))
            .to_numpy(zero_copy_only=False)
            .astype("datetime64[us]")
            .view(np.int64)
        )

    def _tag_orders(b: pa.Table) -> pa.Table:
        o = b.column("o_orderkey").to_numpy(zero_copy_only=False)
        return pa.table(
            {
                "part": pa.array((o % P).astype(np.int64)),
                "tag": pa.array(np.zeros(len(o), dtype=np.int64)),
                "o": pa.array(o, type=pa.int64()),
                "ts": pa.array(_ts_us(b.column("o_orderdate"))),
                "prio": b.column("o_orderpriority"),
            }
        )

    def _tag_items(b: pa.Table) -> pa.Table:
        o = b.column("l_orderkey").to_numpy(zero_copy_only=False)
        return pa.table(
            {
                "part": pa.array((o % P).astype(np.int64)),
                "tag": pa.array(np.ones(len(o), dtype=np.int64)),
                "o": pa.array(o, type=pa.int64()),
                "ts": pa.array(_ts_us(b.column("l_shipdate"))),
                "prio": pa.array([""] * len(o), type=pa.string()),
            }
        )

    def _join(g: pa.Table) -> pa.Table:
        tag = g.column("tag").to_numpy(zero_copy_only=False)
        o = g.column("o").to_numpy(zero_copy_only=False)
        ts = g.column("ts").to_numpy(zero_copy_only=False)
        prio = np.asarray(g.column("prio").to_pylist(), dtype=object)
        is_o = tag == 0
        oo, ot, op_ = o[is_o], ts[is_o], prio[is_o]
        order = np.argsort(oo, kind="stable")
        oo, ot, op_ = oo[order], ot[order], op_[order]
        lo, lt = o[~is_o], ts[~is_o]
        pos = np.searchsorted(oo, lo)
        days = (lt - ot[pos]) // 86_400_000_000
        return pa.table(
            {
                "o_orderpriority": pa.array(op_[pos].tolist(), type=pa.string()),
                "latency_days": pa.array(days.astype(np.int64), type=pa.int64()),
            }
        )

    joined = (
        _read(sf_dir, "orders", ["o_orderkey", "o_orderdate", "o_orderpriority"])
        .map_batches(_tag_orders, batch_format="pyarrow")
        .union(
            _read(sf_dir, "lineitem", ["l_orderkey", "l_shipdate"]).map_batches(
                _tag_items, batch_format="pyarrow"
            )
        )
        .groupby("part")
        .map_groups(_join, batch_format="pyarrow")
    )
    return exact_percentiles_by(
        joined, "o_orderpriority", "latency_days", [0.5, 0.9, 0.99]
    )


def q_frequent_triples(sf_dir: str, k: int = 30):
    """Frequent 3-itemsets (the Apriori level after `basket_lift`):
    part triples a < b < c sharing an order, top-k by
    (support desc, a, b, c). SQL-oracled.

    Plan: the same order-partitioned vectorized generator as the pair
    explode, but emitting 3-combinations per distinct per-order
    part-count (orders are small — ≤ ~7 parts — so C(k,3) stays tiny);
    per-batch pre-aggregation, one groupby, global sort+limit."""
    from itertools import combinations

    from ray.data.aggregate import Sum

    def _with_part(b: pa.Table) -> pa.Table:
        ok = b.column("l_orderkey").to_numpy(zero_copy_only=False)
        return b.append_column(
            "part", pa.array((ok % COOCC_PAIR_PARTS).astype(np.int64))
        )

    def _triples(group: pa.Table) -> pa.Table:
        ok = group.column("l_orderkey").to_numpy(zero_copy_only=False)
        pk = group.column("l_partkey").to_numpy(zero_copy_only=False).astype(np.uint64)
        srt = np.lexsort((pk, ok))
        ok, pk = ok[srt], pk[srt]
        keep = np.concatenate(([True], (ok[1:] != ok[:-1]) | (pk[1:] != pk[:-1])))
        ok, pk = ok[keep], pk[keep]
        starts = np.flatnonzero(np.concatenate(([True], ok[1:] != ok[:-1])))
        counts = np.diff(np.append(starts, len(ok)))
        aa, bb, cc = [], [], []
        for kk in np.unique(counts):
            if kk < 3:
                continue
            mat = pk[starts[counts == kk][:, None] + np.arange(kk)[None, :]]
            idx = np.array(list(combinations(range(int(kk)), 3)), dtype=np.int64)
            aa.append(mat[:, idx[:, 0]].ravel())
            bb.append(mat[:, idx[:, 1]].ravel())
            cc.append(mat[:, idx[:, 2]].ravel())
        if not aa:
            return pa.table(
                {
                    "a": pa.array([], type=pa.int64()),
                    "b": pa.array([], type=pa.int64()),
                    "c": pa.array([], type=pa.int64()),
                    "support": pa.array([], type=pa.int64()),
                }
            )
        a = np.concatenate(aa).astype(np.int64)
        b = np.concatenate(bb).astype(np.int64)
        c = np.concatenate(cc).astype(np.int64)
        order = np.lexsort((c, b, a))
        a, b, c = a[order], b[order], c[order]
        new = np.concatenate(
            ([True], (a[1:] != a[:-1]) | (b[1:] != b[:-1]) | (c[1:] != c[:-1]))
        )
        gid = np.cumsum(new) - 1
        n = np.bincount(gid)
        return pa.table(
            {
                "a": pa.array(a[new], type=pa.int64()),
                "b": pa.array(b[new], type=pa.int64()),
                "c": pa.array(c[new], type=pa.int64()),
                "support": pa.array(n.astype(np.int64), type=pa.int64()),
            }
        )

    return (
        _read(sf_dir, "lineitem", ["l_orderkey", "l_partkey"])
        .map_batches(_with_part, batch_format="pyarrow")
        .groupby("part")
        .map_groups(_triples, batch_format="pyarrow")
        .groupby(["a", "b", "c"])
        .aggregate(Sum("support", alias_name="support"))
        .sort(["support", "a", "b", "c"], descending=[True, False, False, False])
        .limit(k)
    )


def q_local_bridges_coocc(sf_dir: str):
    """Local bridges (Easley–Kleinberg §3.2: edges with NO common
    neighbor, i.e. span ≥ 3 — triangle support 0) of the co-occurrence
    graph. One support pass of the truss machinery with k=2 (nothing
    peeled), then a filter. SQL-oracled via NOT EXISTS. Returns (u, v)."""
    from .truss import k_truss

    sup = k_truss(part_cooccurrence_edges(sf_dir), k=2, rounds=1)

    def _bridges(b: pa.Table) -> pa.Table:
        keep = pc.equal(b.column("support"), pa.scalar(0, type=pa.int64()))
        out = b.filter(keep)
        return pa.table({"u": out.column("u"), "v": out.column("v")})

    ds = sup.map_batches(_bridges, batch_format="pyarrow")
    # a fully-empty Dataset loses its schema through Ray's sort-groupby
    # (schema-less empty blocks) — pin it by concatenating into one
    # typed Arrow table (the bridge set is a sparse edge subset; a
    # production run would write_parquet the Dataset instead)
    schema = pa.schema([("u", pa.int64()), ("v", pa.int64())])
    tbls = [schema.empty_table()]
    for b in ds.iter_batches(batch_size=None, batch_format="pyarrow"):
        if b.num_rows:
            tbls.append(b.select(["u", "v"]).cast(schema))
    return pa.concat_tables(tbls)


def q_butterflies_partsupp(sf_dir: str):
    """Per-part butterfly (K2,2) counts over the bipartite part–supplier
    graph (see pipelines/bipartite.py for the two-exchange plan).
    Returns (l_partkey, butterflies) for parts in at least one butterfly."""
    from .bipartite import butterfly_counts

    def _t(b: pa.Table) -> pa.Table:
        return pa.table(
            {
                "left": b.column("l_partkey").cast(pa.int64()),
                "right": b.column("l_suppkey").cast(pa.int64()),
            }
        )

    edges = _read(sf_dir, "lineitem", ["l_partkey", "l_suppkey"]).map_batches(
        _t, batch_format="pyarrow"
    )
    out = butterfly_counts(edges)

    def _rename(b: pa.Table) -> pa.Table:
        return b.rename_columns(["l_partkey", "butterflies"])

    return out.map_batches(_rename, batch_format="pyarrow")


def q_closeness_coocc(sf_dir: str):
    """Closeness centrality of 4 seed parts over the (unweighted)
    co-occurrence graph: one BFS shortest-path forest per seed
    (pipelines/paths.py min-monoid supersteps, scale=1 → dist_q =
    hops), reduced to (seed, n_reached, sum_hops, closeness).
    closeness = n_reached / sum_hops as ONE raw IEEE division —
    replayed exactly by the unrolled-BFS SQL oracle. Bounded seed set
    → K graph passes, the same contract as the DSD query."""
    from .paths import shortest_path_forest

    g = _coocc_graph(sf_dir)
    seeds = [1, 2, 3, 4]
    out_seed, out_n, out_sum, out_c = [], [], [], []
    for s in seeds:
        out, _ = shortest_path_forest(
            g, np.array([s], dtype=np.uint64), _ckpt(f"close{s}"), scale=1
        )

        def _partial(batch: pa.Table, s=s) -> pa.Table:
            vid = batch.column("vid").to_numpy(zero_copy_only=False)
            dq = batch.column("dist_q").to_numpy(zero_copy_only=False)
            reached = batch.column("reached").to_numpy(zero_copy_only=False)
            sel = reached & (vid != s)
            return pa.table(
                {
                    "n": pa.array([int(sel.sum())], type=pa.int64()),
                    "sd": pa.array([int(dq[sel].sum())], type=pa.int64()),
                }
            )

        agg = out.map_batches(_partial, batch_format="pyarrow").aggregate(
            Sum("n", alias_name="n"), Sum("sd", alias_name="sd")
        )
        n, sd = int(agg["n"]), int(agg["sd"])
        out_seed.append(s)
        out_n.append(n)
        out_sum.append(sd)
        out_c.append(float(n) / float(sd) if sd else 0.0)
    return pa.table(
        {
            "seed": pa.array(out_seed, type=pa.int64()),
            "n_reached": pa.array(out_n, type=pa.int64()),
            "sum_hops": pa.array(out_sum, type=pa.int64()),
            "closeness": pa.array(out_c, type=pa.float64()),
        }
    )


def q_degree_histogram_coocc(sf_dir: str):
    """Log2-binned degree distribution of the co-occurrence graph (the
    power-law sanity check every link-graph run starts with). Degrees
    stream out of the CSR shards; bins are computed with INTEGER bit
    arithmetic (floor(log2 d) via the binary representation length on
    both sides — no libm/floor boundary ambiguity).
    Returns (bin, n_vertices, min_deg, max_deg, sum_deg)."""
    from ray.data.aggregate import Count, Max, Min

    g = _coocc_graph(sf_dir)
    degs = degree_table(g)
    pows = np.power(2.0, np.arange(1, 63)).astype(np.uint64)  # 2,4,8,…

    def _bin(batch: pa.Table) -> pa.Table:
        d = batch.column("out_deg").to_numpy(zero_copy_only=False).astype(np.uint64)
        b = np.searchsorted(pows, d, side="right").astype(np.int64)
        return pa.table(
            {
                "bin": pa.array(b, type=pa.int64()),
                "deg": pa.array(d.astype(np.int64), type=pa.int64()),
            }
        )

    return (
        degs.map_batches(_bin, batch_format="pyarrow")
        .groupby("bin")
        .aggregate(
            Count(alias_name="n_vertices"),
            Min("deg", alias_name="min_deg"),
            Max("deg", alias_name="max_deg"),
            Sum("deg", alias_name="sum_deg"),
        )
    )


def q_jaccard_coocc(sf_dir: str):
    """Top-100 non-adjacent co-occurrence pairs by neighborhood Jaccard
    similarity (pipelines/linkpred.py; raw IEEE quotient — bit-exact vs
    SQL). Returns (u, v, cn, jaccard)."""
    from .linkpred import jaccard_topk

    return jaccard_topk(_coocc_graph(sf_dir), k=100)


def q_spam_mass_partsupp(sf_dir: str):
    """TrustRank relative spam mass (Gyöngyi et al., VLDB'04): with
    pr = global PageRank and tr = PageRank personalized on a trusted
    seed set, sm(v) = (pr(v) − tr(v)) / pr(v) — the rank fraction NOT
    reachable from trusted pages. Both chains run the identical fixed
    k=4 updates (tol=0) so the SQL oracle unrolls them exactly.
    Returns (vid, rank_r9, trust_r9, spam_mass_r6) for every vertex.

    Plan: two superstep runs over the SAME pinned graph, then one
    vid-hash co-shuffle merging the two vertex tables with a vectorized
    searchsorted alignment per partition — no driver materialization.
    """
    from .pagerank import pagerank as _pr
    from .walks import personalized_pagerank

    P = 16
    g = _partsupp_graph(sf_dir)
    ranks, _ = _pr(g, _ckpt("smpr"), damping=0.85, tol=0.0, max_iters=4)
    trust, _ = personalized_pagerank(
        g, _ckpt("smtr"), [1, 2, 3, 4, 5], damping=0.85, tol=0.0, max_iters=4
    )

    def _tag(col: str, tag: int):
        def _fn(b: pa.Table) -> pa.Table:
            vid = b.column("vid").to_numpy(zero_copy_only=False).astype(np.uint64)
            return pa.table(
                {
                    "part": pa.array((vid % np.uint64(P)).astype(np.int64)),
                    "tag": pa.array(np.full(len(b), tag, dtype=np.int64)),
                    "vid": pa.array(vid, type=pa.uint64()),
                    "val": b.column(col).cast(pa.float64()),
                }
            )

        return _fn

    def _merge(grp: pa.Table) -> pa.Table:
        tag = grp.column("tag").to_numpy(zero_copy_only=False)
        vid = grp.column("vid").to_numpy(zero_copy_only=False).astype(np.uint64)
        val = grp.column("val").to_numpy(zero_copy_only=False)
        pv, pr_ = vid[tag == 0], val[tag == 0]
        tv, tr_ = vid[tag == 1], val[tag == 1]
        o1, o2 = np.argsort(pv, kind="stable"), np.argsort(tv, kind="stable")
        pv, pr_, tr_ = pv[o1], pr_[o1], tr_[o2]
        sm = (pr_ - tr_) / pr_
        return pa.table(
            {
                "vid": pa.array(pv.astype(np.int64), type=pa.int64()),
                "rank_r9": pa.array(np.round(pr_, 9), type=pa.float64()),
                "trust_r9": pa.array(np.round(tr_, 9), type=pa.float64()),
                "spam_mass_r6": pa.array(np.round(sm, 6), type=pa.float64()),
            }
        )

    merged = ranks.map_batches(_tag("rank", 0), batch_format="pyarrow").union(
        trust.map_batches(_tag("score", 1), batch_format="pyarrow")
    )
    return merged.groupby("part").map_groups(_merge, batch_format="pyarrow")


def q_spectral_moments_coocc(sf_dir: str):
    """Exact closed-walk counts and 4-cycle (rectangle) count of the
    co-occurrence graph (pipelines/linkpred.spectral_moments) — all
    integer arithmetic, hash-exact vs SQL. Returns one row (m,
    sum_deg_sq, wedges, sum_cn_sq, closed_4walks, c4)."""
    from .linkpred import spectral_moments

    return spectral_moments(_coocc_graph(sf_dir))


def q_mis_coocc(sf_dir: str):
    """3-round Luby maximal independent set over the co-occurrence
    graph (pipelines/mis.py). Returns (vid, status): 1 = in MIS,
    2 = excluded, 0 = still undecided after the fixed rounds."""
    from .mis import maximal_independent_set

    return maximal_independent_set(part_cooccurrence_edges(sf_dir), rounds=3)


def q_betweenness_coocc(sf_dir: str):
    """Seed-set Brandes betweenness (seeds 1–4, 6 BFS rounds) over the
    co-occurrence graph (pipelines/betweenness.py: forward σ/dist +
    backward δ supersteps, all seeds in one vector-state pair of
    runs). bc_r6 = ROUND(Σ_seeds δ excluding each seed's own column, 6).
    """
    from .betweenness import seed_betweenness

    g = _coocc_graph(sf_dir)
    seeds = [1, 2, 3, 4]
    out, _, _ = seed_betweenness(g, _ckpt("btw"), seeds, rounds=6)
    seeds_u64 = np.array(seeds, dtype=np.uint64)

    def _bc(batch: pa.Table) -> pa.Table:
        from ..util import list_rows

        vids = batch.column("vid").to_numpy(zero_copy_only=False)
        rows = list_rows(batch, "deltas")
        mat = np.stack(rows) if len(rows) else np.empty((0, len(seeds)))
        own = vids[:, None] == seeds_u64[None, :]
        mat = np.where(own, 0.0, mat)
        bc = mat[:, 0].copy()
        for j in range(1, mat.shape[1]):
            bc = bc + mat[:, j]  # fixed column order, like the SQL sum
        return pa.table(
            {
                "vid": pa.array(vids.astype(np.int64), type=pa.int64()),
                "bc_r6": pa.array(np.round(bc, 6), type=pa.float64()),
            }
        )

    return out.map_batches(_bc, batch_format="pyarrow")


def q_maxmatch_coocc(sf_dir: str):
    """3-round greedy maximal matching over the co-occurrence graph
    (pipelines/maxmatch.py). Returns matched edges (u, v, round)."""
    from .maxmatch import maximal_matching

    return maximal_matching(part_cooccurrence_edges(sf_dir), rounds=3)


def _bfs_argmax(forest_out):
    """(max hop distance, min vid attaining it) over a BFS forest
    Dataset — per-block partials, tiny driver merge."""
    def _pmax(batch: pa.Table) -> pa.Table:
        vid = batch.column("vid").to_numpy(zero_copy_only=False)
        dq = batch.column("dist_q").to_numpy(zero_copy_only=False)
        reached = batch.column("reached").to_numpy(zero_copy_only=False)
        if not reached.any():
            return pa.table(
                {"m": pa.array([], type=pa.int64()), "v": pa.array([], type=pa.int64())}
            )
        m = int(dq[reached].max())
        at = reached & (dq == m)
        return pa.table(
            {
                "m": pa.array([m], type=pa.int64()),
                "v": pa.array([int(vid[at].min())], type=pa.int64()),
            }
        )

    parts = forest_out.map_batches(_pmax, batch_format="pyarrow").to_pandas()
    m = int(parts["m"].max())
    v = int(parts.loc[parts["m"] == m, "v"].min())
    return m, v


def q_diameter_coocc(sf_dir: str):
    """Double-sweep diameter lower bound of the co-occurrence graph:
    BFS from seed 1 → farthest vertex a (tie-break min vid) → BFS from
    a → ecc(a) = diam lower bound + witness. Two shortest-path-forest
    runs (pipelines/paths.py), distributed per-block argmax partials."""
    from .paths import shortest_path_forest

    g = _coocc_graph(sf_dir)
    seed = 1
    out1, _ = shortest_path_forest(
        g, np.array([seed], dtype=np.uint64), _ckpt("diam1"), scale=1
    )
    ecc1, far1 = _bfs_argmax(out1)
    out2, _ = shortest_path_forest(
        g, np.array([far1], dtype=np.uint64), _ckpt("diam2"), scale=1
    )
    diam_lb, far2 = _bfs_argmax(out2)
    return pa.table(
        {
            "seed": pa.array([seed], type=pa.int64()),
            "ecc_seed": pa.array([ecc1], type=pa.int64()),
            "far1": pa.array([far1], type=pa.int64()),
            "diam_lb": pa.array([diam_lb], type=pa.int64()),
            "far2": pa.array([far2], type=pa.int64()),
        }
    )


LANDMARKS_COOCC = (1, 2, 3, 4)
LANDMARK_PAIRS_COOCC = ((5, 6), (7, 8), (9, 10), (11, 12), (13, 14), (15, 16), (5, 16), (6, 15))


def q_landmark_dist_coocc(sf_dir: str):
    """Landmark-based distance estimation (Potamias et al., CIKM 2009
    "Fast shortest path distance estimation in large networks"): one
    BFS shortest-path forest per landmark (pipelines/paths.py
    min-monoid supersteps, scale=1 → hop counts); for a bounded
    query-pair set, the triangle-inequality bounds over landmarks that
    reach both endpoints:

        d_ub(u,v) = min_L d(u,L) + d(L,v)
        d_lb(u,v) = max_L |d(u,L) − d(L,v)|

    Integer hop arithmetic — bit-exact vs the unrolled-BFS SQL oracle.
    The per-landmark forests stay distributed; only the ≤|pairs|·2
    involved vertices' distances are collected (bounded query set, the
    closeness/DSD contract). Pairs with no covering landmark emit −1.
    At 100 TB the landmark forests are k full BFS runs (k small), and
    the estimate for ANY pair is then two O(k) lookups — the point of
    the technique. Returns (u, v, d_lb, d_ub)."""
    from .paths import shortest_path_forest

    g = _coocc_graph(sf_dir)
    involved = np.array(
        sorted({v for p in LANDMARK_PAIRS_COOCC for v in p}), dtype=np.uint64
    )
    dist: dict[tuple[int, int], int] = {}
    for L in LANDMARKS_COOCC:
        out, _ = shortest_path_forest(
            g, np.array([L], dtype=np.uint64), _ckpt(f"lmk{L}"), scale=1
        )

        def _sel(batch: pa.Table) -> pa.Table:
            vid = batch.column("vid").to_numpy(zero_copy_only=False)
            dq = batch.column("dist_q").to_numpy(zero_copy_only=False)
            m = np.isin(vid, involved) & (dq >= 0)
            return pa.table(
                {
                    "vid": pa.array(vid[m].astype(np.int64), type=pa.int64()),
                    "d": pa.array(dq[m], type=pa.int64()),
                }
            )

        for row in out.map_batches(_sel, batch_format="pyarrow").take_all():
            dist[(L, int(row["vid"]))] = int(row["d"])

    us, vs, lbs, ubs = [], [], [], []
    for u, v in LANDMARK_PAIRS_COOCC:
        cov = [
            (dist[(L, u)], dist[(L, v)])
            for L in LANDMARKS_COOCC
            if (L, u) in dist and (L, v) in dist
        ]
        us.append(u)
        vs.append(v)
        ubs.append(min(du + dv for du, dv in cov) if cov else -1)
        lbs.append(max(abs(du - dv) for du, dv in cov) if cov else -1)
    return pa.table(
        {
            "u": pa.array(us, type=pa.int64()),
            "v": pa.array(vs, type=pa.int64()),
            "d_lb": pa.array(lbs, type=pa.int64()),
            "d_ub": pa.array(ubs, type=pa.int64()),
        }
    )


def q_eigencentrality_coocc(sf_dir: str):
    """Eigenvector-centrality estimate: 4 raw power steps x ← A·x from
    the all-ones vector (4-walk counts — integer-exact floats), one
    L1 normalization at the end (the norm is an exact integer sum, so
    the per-vertex quotient is a single IEEE division). ROUND 6.
    Returns (vid, ec_r6)."""
    from .diffusion import adjacency_matvec

    g = _coocc_graph(sf_dir)

    def _ones(csr):
        return np.ones(len(csr["vids"]), dtype=np.float64)

    out, _ = adjacency_matvec(g, _ckpt("eigc"), _ones, k=4)
    total = out.map_batches(
        lambda b: pa.table(
            {"s": pa.array([float(b.column("value").to_numpy(zero_copy_only=False).sum())])}
        ),
        batch_format="pyarrow",
    ).aggregate(Sum("s", alias_name="s"))
    norm = float(total["s"])

    def _shape(batch: pa.Table) -> pa.Table:
        v = batch.column("value").to_numpy(zero_copy_only=False)
        return pa.table(
            {
                "vid": batch.column("vid").cast(pa.int64()),
                "ec_r6": pa.array(np.round(v / norm, 6), type=pa.float64()),
            }
        )

    return out.map_batches(_shape, batch_format="pyarrow")


def q_katz_coocc(sf_dir: str):
    """Truncated Katz centrality x = Σ_{j≤4} α^j A^j 1 with α = 1/64
    (an exact power of two, so every per-vertex value is a dyadic
    rational with denominator 2^24 and an integer numerator ≪ 2^53 —
    float64 arithmetic is EXACT in any summation order, engine and SQL
    bit-identical with no rounding). Returns (vid, katz)."""
    g = _coocc_graph(sf_dir)

    def _ones(csr):
        return np.ones(len(csr["vids"]), dtype=np.float64)

    def _apply(agg, old, T, dm, csr):
        return agg / 64.0 + 1.0

    from ..state.superstep import run_supersteps, state_vertex_dataset

    summary = run_supersteps(
        g, _ckpt("katz"), "sum", _ones,
        tol=0.0, max_iters=4, normalize=False, apply_fn=_apply,
    )
    out = state_vertex_dataset(g, summary["final_iter_dir"], "value")

    def _shape(batch: pa.Table) -> pa.Table:
        return pa.table(
            {
                "vid": batch.column("vid").cast(pa.int64()),
                "katz": batch.column("value").cast(pa.float64()),
            }
        )

    return out.map_batches(_shape, batch_format="pyarrow")


def q_harmonic_coocc(sf_dir: str):
    """Harmonic centrality of 4 seed parts: one BFS forest per seed,
    per-block distance HISTOGRAMS (integer), then
    harmonic = Σ_d cnt_d / d summed in ascending-d order — the same
    fixed-order IEEE expression the SQL oracle spells out literally.
    Returns (seed, n_reached, harmonic)."""
    from .paths import shortest_path_forest

    g = _coocc_graph(sf_dir)
    seeds = [1, 2, 3, 4]
    rounds = 8
    out_seed, out_n, out_h = [], [], []
    for s in seeds:
        out, _ = shortest_path_forest(
            g, np.array([s], dtype=np.uint64), _ckpt(f"harm{s}"), scale=1
        )

        def _hist(batch: pa.Table, s=s) -> pa.Table:
            vid = batch.column("vid").to_numpy(zero_copy_only=False)
            dq = batch.column("dist_q").to_numpy(zero_copy_only=False)
            reached = batch.column("reached").to_numpy(zero_copy_only=False)
            sel = reached & (vid != s)
            cnt = np.bincount(
                np.minimum(dq[sel], rounds).astype(np.int64), minlength=rounds + 1
            )
            return pa.table(
                {f"c{d}": pa.array([int(cnt[d])], type=pa.int64()) for d in range(1, rounds + 1)}
            )

        agg = out.map_batches(_hist, batch_format="pyarrow").aggregate(
            *[Sum(f"c{d}", alias_name=f"c{d}") for d in range(1, rounds + 1)]
        )
        h = 0.0
        n = 0
        for d in range(1, rounds + 1):
            c = int(agg[f"c{d}"])
            n += c
            h = h + c / float(d)  # fixed ascending-d order, like the SQL
        out_seed.append(s)
        out_n.append(n)
        out_h.append(h)
    return pa.table(
        {
            "seed": pa.array(out_seed, type=pa.int64()),
            "n_reached": pa.array(out_n, type=pa.int64()),
            "harmonic": pa.array(out_h, type=pa.float64()),
        }
    )


def q_oddcycle_coocc(sf_dir: str):
    """Bipartiteness diagnostic: per-BFS-level counts of edges whose
    endpoints are equidistant from seed 1 (odd-cycle witnesses;
    pipelines/bipartite.py:frustrated_edges). Returns
    (dist, n_frustrated)."""
    from .bipartite import frustrated_edges
    from .paths import shortest_path_forest

    g = _coocc_graph(sf_dir)
    out, _ = shortest_path_forest(
        g, np.array([1], dtype=np.uint64), _ckpt("oddc"), scale=1
    )
    return frustrated_edges(out, part_cooccurrence_edges(sf_dir))


def q_component_sizes(sf_dir: str):
    """Component-size histogram of the customer–order bipartite graph:
    CC labels → per-component sizes → (size, n_components). The
    standard first summary of any components run."""
    from ray.data.aggregate import Count

    comp = q_cc_customer_orders(sf_dir)
    sizes = comp.groupby("component").aggregate(Count(alias_name="size"))
    return (
        sizes.groupby("size")
        .aggregate(Count(alias_name="n_components"))
        .map_batches(
            lambda b: pa.table(
                {
                    "size": b.column("size").cast(pa.int64()),
                    "n_components": b.column("n_components").cast(pa.int64()),
                }
            ),
            batch_format="pyarrow",
        )
    )


def _capacity_partsupp_graph(sf_dir: str):
    """Σquantity-capacity part–supplier graph (parallel lineitem links
    sum their quantities in the CSR pack — integer-valued floats, so
    the sums are exact and order-independent)."""
    key = ("cappartsupp", sf_dir)
    if key not in _GRAPH_CACHE:

        def _cap(batch: pa.Table) -> pa.Table:
            qty = batch.column("l_quantity").to_numpy(zero_copy_only=False).astype(
                np.float64
            )
            return pa.table(
                {
                    "src": batch.column("l_partkey").cast(pa.uint64()),
                    "dst": pc.add(
                        batch.column("l_suppkey").cast(pa.int64()), SUPP_OFFSET
                    ).cast(pa.uint64()),
                    "w": pa.array(qty, type=pa.float64()),
                }
            )

        edges = _read(
            sf_dir, "lineitem", ["l_partkey", "l_suppkey", "l_quantity"]
        ).map_batches(_cap, batch_format="pyarrow")
        _GRAPH_CACHE[key] = build_graph(
            edges, EngineConfig(num_partitions=16), directed=False
        )
    return _GRAPH_CACHE[key]


def q_widest_partsupp(sf_dir: str):
    """Widest-path (max-bottleneck) capacities from parts 1–3 over the
    Σquantity-capacity part–supplier graph — the max-min semiring on
    the superstep engine (pipelines/paths.py:widest_path_forest; pure
    LEAST/GREATEST selection, bit-exact vs SQL with no rounding).
    Sources excluded from the output; unreached vertices report 0."""
    from .paths import widest_path_forest

    g = _capacity_partsupp_graph(sf_dir)
    sources = np.array([1, 2, 3], dtype=np.uint64)
    out, _ = widest_path_forest(g, sources, _ckpt("widest"), max_iters=8)

    def _shape(batch: pa.Table) -> pa.Table:
        vid = batch.column("vid").to_numpy(zero_copy_only=False)
        keep = ~np.isin(vid, sources)
        sel = batch.filter(pa.array(keep))
        return pa.table(
            {
                "vid": sel.column("vid").cast(pa.int64()),
                "width": sel.column("width"),
            }
        )

    return out.map_batches(_shape, batch_format="pyarrow")


def q_events_rolling_spend(sf_dir: str):
    """Per-event trailing window: sum + count of the user's previous
    ≤3 events' integer cents (ROWS 3 PRECEDING … 1 PRECEDING) — the
    rolling-feature op of behavioral pipelines. One vectorized
    prefix-sum pass per hash partition (no per-user Python); cents are
    floor(value·100) on both sides. Returns
    (event_id, n_prev, prev_cents)."""

    def _roll(group: pa.Table) -> pa.Table:
        uid = group.column("user_id").to_numpy(zero_copy_only=False)
        ts = (
            group.column("ts")
            .cast(pa.timestamp("us"))
            .to_numpy(zero_copy_only=False)
            .astype("datetime64[us]")
            .view(np.int64)
        )
        eid = group.column("event_id").to_numpy(zero_copy_only=False)
        cents = np.floor(
            group.column("value").to_numpy(zero_copy_only=False) * 100.0
        ).astype(np.int64)
        srt = np.lexsort((eid, ts, uid))
        uid, eid, cents = uid[srt], eid[srt], cents[srt]
        n = len(uid)
        new_user = np.concatenate(([True], uid[1:] != uid[:-1]))
        idx = np.arange(n)
        ustart = idx.copy()
        ustart[~new_user] = 0
        ustart = np.maximum.accumulate(ustart)
        lo = np.maximum(idx - 3, ustart)
        csum = np.concatenate(([0], np.cumsum(cents)))
        prev_sum = csum[idx] - csum[lo]
        n_prev = idx - lo
        return pa.table(
            {
                "event_id": pa.array(eid, type=pa.int64()),
                "n_prev": pa.array(n_prev.astype(np.int64), type=pa.int64()),
                "prev_cents": pa.array(prev_sum.astype(np.int64), type=pa.int64()),
            }
        )

    return (
        _events_by_part(sf_dir, extra_cols=("value",))
        .groupby("part")
        .map_groups(_roll, batch_format="pyarrow")
    )


def q_orders_by_region(sf_dir: str):
    """Star-schema rollup: order count + total cents per region name.
    The big join (orders ⨝ customer on custkey) is a union-tag
    co-shuffle over custkey hash partitions; the nation→region-name
    dimension (25 rows) is broadcast and applied map-side; the final
    groupby touches ≤5 rows per task. Returns
    (r_name, n_orders, cents_sum)."""
    import ray
    from ray.data.aggregate import Sum

    # tiny dims → one broadcast dict custkey-side: nationkey → r_name
    nat = _read(sf_dir, "nation", ["n_nationkey", "n_regionkey"]).to_pandas()
    reg = _read(sf_dir, "region", ["r_regionkey", "r_name"]).to_pandas()
    n2r = dict(
        zip(
            nat["n_nationkey"].astype(int),
            reg.set_index("r_regionkey")["r_name"].reindex(nat["n_regionkey"]).to_numpy(),
        )
    )
    n2r_ref = ray.put(n2r)
    P = 32

    def _tag_orders(b: pa.Table) -> pa.Table:
        ck = b.column("o_custkey").cast(pa.int64())
        cents = np.floor(
            b.column("o_totalprice").to_numpy(zero_copy_only=False) * 100.0
        ).astype(np.int64)
        return pa.table(
            {
                "part": pa.array(
                    (ck.to_numpy(zero_copy_only=False) % P).astype(np.int64)
                ),
                "custkey": ck,
                "cents": pa.array(cents, type=pa.int64()),
                "nationkey": pa.array(np.full(b.num_rows, -1, dtype=np.int64)),
            }
        )

    def _tag_cust(b: pa.Table) -> pa.Table:
        ck = b.column("c_custkey").cast(pa.int64())
        return pa.table(
            {
                "part": pa.array(
                    (ck.to_numpy(zero_copy_only=False) % P).astype(np.int64)
                ),
                "custkey": ck,
                "cents": pa.array(np.full(b.num_rows, -1, dtype=np.int64)),
                "nationkey": b.column("c_nationkey").cast(pa.int64()),
            }
        )

    both = _read(sf_dir, "orders", ["o_custkey", "o_totalprice"]).map_batches(
        _tag_orders, batch_format="pyarrow"
    ).union(
        _read(sf_dir, "customer", ["c_custkey", "c_nationkey"]).map_batches(
            _tag_cust, batch_format="pyarrow"
        )
    )

    def _join(group: pa.Table) -> pa.Table:
        import ray as _ray

        ck = group.column("custkey").to_numpy(zero_copy_only=False)
        cents = group.column("cents").to_numpy(zero_copy_only=False)
        nk = group.column("nationkey").to_numpy(zero_copy_only=False)
        is_cust = nk >= 0
        cust_k = ck[is_cust]
        cust_n = nk[is_cust]
        order = np.argsort(cust_k)
        cust_k, cust_n = cust_k[order], cust_n[order]
        ok = ck[~is_cust]
        oc = cents[~is_cust]
        pos = np.searchsorted(cust_k, ok)
        valid = (pos < len(cust_k)) & (cust_k[np.minimum(pos, len(cust_k) - 1)] == ok)
        nkeys = cust_n[pos[valid]]
        ocents = oc[valid]
        lut = _ray.get(n2r_ref)
        uk, inv = (
            np.unique(nkeys, return_inverse=True)
            if len(nkeys)
            else (np.empty(0, np.int64), np.empty(0, np.int64))
        )
        cnt = np.bincount(inv, minlength=len(uk)).astype(np.int64)
        sums = (
            np.bincount(inv, weights=ocents, minlength=len(uk)).astype(np.int64)
            if len(uk)
            else np.empty(0, np.int64)
        )
        return pa.table(
            {
                "r_name": pa.array([lut[int(k)] for k in uk], type=pa.string()),
                "n": pa.array(cnt, type=pa.int64()),
                "cents": pa.array(sums, type=pa.int64()),
            }
        )

    return (
        both.groupby("part")
        .map_groups(_join, batch_format="pyarrow")
        .groupby("r_name")
        .aggregate(Sum("n", alias_name="n_orders"), Sum("cents", alias_name="cents_sum"))
    )


def q_wl_colors_coocc(sf_dir: str):
    """2-round Weisfeiler-Leman color refinement over the distinct
    co-occurrence pairs (init = degree, commutative splitmix64 multiset
    hashing — `pipelines/wl.py`). SQL-oracled: the unrolled oracle
    replays both rounds with exact HUGEINT mod-2^64 arithmetic.
    Returns (vid, color)."""
    from ray.data.aggregate import Count

    from .wl import wl_colors

    def _uv(b: pa.Table) -> pa.Table:
        return pa.table(
            {
                "u": pa.array(
                    b.column("src").to_numpy(zero_copy_only=False).astype(np.uint64),
                    type=pa.uint64(),
                ),
                "v": pa.array(
                    b.column("dst").to_numpy(zero_copy_only=False).astype(np.uint64),
                    type=pa.uint64(),
                ),
            }
        )

    distinct = (
        part_cooccurrence_edges(sf_dir)
        .map_batches(_uv, batch_format="pyarrow")
        .groupby(["u", "v"])
        .aggregate(Count(alias_name="n"))
        .select_columns(["u", "v"])
    )
    return wl_colors(distinct, rounds=2)


def q_coarsen_coocc(sf_dir: str):
    """Multilevel coarsening step (`pipelines/coarsen.py`): contract
    the 3-round greedy maximal matching over the WEIGHTED co-occurrence
    graph (w = shared-order count) into its quotient edge table.
    SQL-oracled end to end (matching rounds + contraction). Returns
    (u, v, w)."""
    from ray.data.aggregate import Count

    from .coarsen import coarsen_by_matching
    from .maxmatch import maximal_matching

    def _uv(b: pa.Table) -> pa.Table:
        return pa.table(
            {
                "u": pa.array(
                    b.column("src").to_numpy(zero_copy_only=False).astype(np.uint64),
                    type=pa.uint64(),
                ),
                "v": pa.array(
                    b.column("dst").to_numpy(zero_copy_only=False).astype(np.uint64),
                    type=pa.uint64(),
                ),
            }
        )

    ew = (
        part_cooccurrence_edges(sf_dir)
        .map_batches(_uv, batch_format="pyarrow")
        .groupby(["u", "v"])
        .aggregate(Count(alias_name="w"))
    )
    matching = maximal_matching(part_cooccurrence_edges(sf_dir), rounds=3)
    return coarsen_by_matching(ew, matching)


def q_degree_gini_coocc(sf_dir: str):
    """Gini coefficient of the co-occurrence degree distribution — the
    inequality summary behind every "1% of hosts hold 90% of links"
    crawl report. Computed by DISTRIBUTED ORDER STATISTICS: instead of
    a global sort plus a per-row rank (an all-to-all shuffle and a
    prefix-sum pass over every vertex), degrees collapse to a
    per-degree histogram (``groupby(d)`` — distinct degrees ≪
    vertices on a power-law graph), and the rank sum is recovered in
    closed form per equal-degree run: the c_d vertices tied at degree
    d after b_d lower-degree predecessors contribute
    d·(c_d·b_d + c_d(c_d+1)/2) to S = Σ rank_i·d_i (tie order is
    irrelevant because tied rows share d). The driver touches only
    the tiny histogram; all arithmetic is Python-int exact and the
    single final IEEE division matches DuckDB's window-rank oracle
    bit-for-bit:  G = (2S − (n+1)T) / (nT),  T = Σ d.
    Returns one row (n_vertices, sum_deg, gini)."""
    from ray.data.aggregate import Count

    def _canon(b: pa.Table) -> pa.Table:
        return pa.table(
            {
                "u": pa.array(
                    np.concatenate(
                        [
                            b.column("src").to_numpy(zero_copy_only=False),
                            b.column("dst").to_numpy(zero_copy_only=False),
                        ]
                    ).astype(np.uint64),
                    type=pa.uint64(),
                ),
                "v": pa.array(
                    np.concatenate(
                        [
                            b.column("dst").to_numpy(zero_copy_only=False),
                            b.column("src").to_numpy(zero_copy_only=False),
                        ]
                    ).astype(np.uint64),
                    type=pa.uint64(),
                ),
            }
        )

    hist = (
        part_cooccurrence_edges(sf_dir)
        .map_batches(_canon, batch_format="pyarrow")
        .groupby(["u", "v"])
        .aggregate(Count(alias_name="one"))
        .groupby("u")
        .aggregate(Count(alias_name="d"))
        .groupby("d")
        .aggregate(Count(alias_name="c"))
        .to_pandas()  # ≤ distinct-degree rows: tiny at any graph scale
    )
    hist = hist.sort_values("d").reset_index(drop=True)
    n = int(hist["c"].sum())
    T = 0
    S = 0
    base = 0
    for d, c in zip(hist["d"].astype(int), hist["c"].astype(int)):
        S += d * (c * base + c * (c + 1) // 2)
        T += d * c
        base += c
    gini = float(2 * S - (n + 1) * T) / float(n * T)
    return pa.table(
        {
            "n_vertices": pa.array([n], type=pa.int64()),
            "sum_deg": pa.array([T], type=pa.int64()),
            "gini": pa.array([gini], type=pa.float64()),
        }
    )


def q_rollup_sales(sf_dir: str, P: int = 32):
    """Revenue ROLLUP (nation → region → grand total) — the classic
    hierarchical report, Ray-Data-shaped: orders are pre-aggregated to
    per-customer (cents, n) partials BEFORE any join (the combiner cuts
    the shuffle from |orders| to |customer| rows), the customer⋈orders
    equi-join is the tagged one-co-shuffle large-large hash join
    (``groupby(custkey % P)`` + vectorized searchsorted — no broadcast:
    at 10^12 rows neither side fits a worker), and the nation-level
    aggregate (≤ 25 rows) rolls up to region and grand-total levels on
    the driver with Python-int-exact cent arithmetic. Money stays
    integer cents end-to-end (ROUND(price·100) — the same IEEE multiply
    both sides), so the DuckDB GROUP BY ROLLUP oracle hash-matches.
    Returns (lvl, r_name, n_name, revenue_cents, n_orders)."""
    import pyarrow.parquet as pq_
    from ray.data.aggregate import Count, Sum

    def _cust_partials(b: pa.Table) -> pa.Table:
        cents = np.round(
            b.column("o_totalprice").to_numpy(zero_copy_only=False) * 100.0
        ).astype(np.int64)
        return pa.table(
            {
                "key": b.column("o_custkey").cast(pa.int64()),
                "cents": pa.array(cents),
            }
        )

    orders_agg = (
        _read(sf_dir, "orders", ["o_custkey", "o_totalprice"])
        .map_batches(_cust_partials, batch_format="pyarrow")
        .groupby("key")
        .aggregate(Sum("cents", alias_name="cents"), Count(alias_name="n"))
    )

    def _tag_orders(b: pa.Table) -> pa.Table:
        k = b.column("key").to_numpy(zero_copy_only=False)
        return pa.table(
            {
                "part": pa.array((k % P).astype(np.int64)),
                "tag": pa.array(np.ones(len(k), dtype=np.int64)),
                "key": pa.array(k, type=pa.int64()),
                "nk": pa.array(np.zeros(len(k), dtype=np.int64)),
                "cents": b.column("cents").cast(pa.int64()),
                "n": b.column("n").cast(pa.int64()),
            }
        )

    def _tag_cust(b: pa.Table) -> pa.Table:
        k = b.column("c_custkey").to_numpy(zero_copy_only=False)
        z = np.zeros(len(k), dtype=np.int64)
        return pa.table(
            {
                "part": pa.array((k % P).astype(np.int64)),
                "tag": pa.array(z),
                "key": pa.array(k, type=pa.int64()),
                "nk": b.column("c_nationkey").cast(pa.int64()),
                "cents": pa.array(z),
                "n": pa.array(z),
            }
        )

    def _join(g: pa.Table) -> pa.Table:
        tag = g.column("tag").to_numpy(zero_copy_only=False)
        key = g.column("key").to_numpy(zero_copy_only=False)
        is_c = tag == 0
        ck, cnk = key[is_c], g.column("nk").to_numpy(zero_copy_only=False)[is_c]
        order = np.argsort(ck, kind="stable")
        ck, cnk = ck[order], cnk[order]
        ok = key[~is_c]
        pos = np.searchsorted(ck, ok)
        return pa.table(
            {
                "nk": pa.array(cnk[pos], type=pa.int64()),
                "cents": g.column("cents").filter(pa.array(~is_c)),
                "n": g.column("n").filter(pa.array(~is_c)),
            }
        )

    by_nation = (
        orders_agg.map_batches(_tag_orders, batch_format="pyarrow")
        .union(
            _read(sf_dir, "customer", ["c_custkey", "c_nationkey"]).map_batches(
                _tag_cust, batch_format="pyarrow"
            )
        )
        .groupby("part")
        .map_groups(_join, batch_format="pyarrow")
        .groupby("nk")
        .aggregate(Sum("cents", alias_name="cents"), Sum("n", alias_name="n"))
        .to_pandas()  # ≤ |nation| rows at any scale
    )
    nat = pq_.read_table(os.path.join(sf_dir, "nation.parquet")).to_pandas()
    reg = pq_.read_table(os.path.join(sf_dir, "region.parquet")).to_pandas()
    n2name = dict(zip(nat["n_nationkey"], nat["n_name"]))
    n2r = dict(zip(nat["n_nationkey"], nat["n_regionkey"]))
    r2name = dict(zip(reg["r_regionkey"], reg["r_name"]))
    rows = []
    reg_acc: dict = {}
    tot_c = tot_n = 0
    for nk, cents, n in zip(
        by_nation["nk"].astype(int),
        by_nation["cents"].astype(int),
        by_nation["n"].astype(int),
    ):
        rk = n2r[nk]
        rows.append((0, r2name[rk], n2name[nk], cents, n))
        c0, n0 = reg_acc.get(rk, (0, 0))
        reg_acc[rk] = (c0 + cents, n0 + n)
        tot_c += cents
        tot_n += n
    for rk, (c, n) in reg_acc.items():
        rows.append((1, r2name[rk], "ALL", c, n))
    rows.append((2, "ALL", "ALL", tot_c, tot_n))
    lvl, rname, nname, cents, n = zip(*rows)
    return pa.table(
        {
            "lvl": pa.array(lvl, type=pa.int64()),
            "r_name": pa.array(rname, type=pa.string()),
            "n_name": pa.array(nname, type=pa.string()),
            "revenue_cents": pa.array(cents, type=pa.int64()),
            "n_orders": pa.array(n, type=pa.int64()),
        }
    )


def q_regression_qty_discount(sf_dir: str):
    """Per-returnflag OLS regression + Pearson correlation of quantity
    (y) on discount-percent (x) — the mergeable-sufficient-statistics
    pattern: each block emits exact int64 partials (n, Σx, Σy, Σx²,
    Σy², Σxy) per group (a map-side combiner — six numbers per group
    per block, no row survives the map), one tiny ``groupby(flag)``
    merge, and the driver forms slope/intercept/corr from Python-int
    exact moments with single IEEE divisions, matching DuckDB
    bit-for-bit (corr uses √B·√C with B, C < 2^53 so every
    intermediate is an exact double). Returns
    (flag, n, slope, intercept, corr)."""
    from ray.data.aggregate import Sum

    def _partials(b: pa.Table) -> pa.Table:
        x = np.round(
            b.column("l_discount").to_numpy(zero_copy_only=False) * 100.0
        ).astype(np.int64)
        y = b.column("l_quantity").to_numpy(zero_copy_only=False).astype(np.int64)
        flags = np.asarray(b.column("l_returnflag").to_pylist(), dtype=object)
        uf, inv = np.unique(flags, return_inverse=True)
        out = {
            "flag": pa.array(uf.tolist(), type=pa.string()),
            "n": pa.array(np.bincount(inv).astype(np.int64)),
            "sx": pa.array(np.bincount(inv, weights=x).astype(np.int64)),
            "sy": pa.array(np.bincount(inv, weights=y).astype(np.int64)),
            "sxx": pa.array(np.bincount(inv, weights=x * x).astype(np.int64)),
            "syy": pa.array(np.bincount(inv, weights=y * y).astype(np.int64)),
            "sxy": pa.array(np.bincount(inv, weights=x * y).astype(np.int64)),
        }
        return pa.table(out)

    agg = (
        _read(sf_dir, "lineitem", ["l_returnflag", "l_quantity", "l_discount"])
        .map_batches(_partials, batch_format="pyarrow")
        .groupby("flag")
        .aggregate(
            Sum("n", alias_name="n"),
            Sum("sx", alias_name="sx"),
            Sum("sy", alias_name="sy"),
            Sum("sxx", alias_name="sxx"),
            Sum("syy", alias_name="syy"),
            Sum("sxy", alias_name="sxy"),
        )
        .to_pandas()  # one row per returnflag
    )
    rows = []
    for r in agg.itertuples(index=False):
        n, sx, sy = int(r.n), int(r.sx), int(r.sy)
        sxx, syy, sxy = int(r.sxx), int(r.syy), int(r.sxy)
        A = n * sxy - sx * sy
        B = n * sxx - sx * sx
        Cm = n * syy - sy * sy
        slope = float(A) / float(B)
        intercept = float(sy * sxx - sx * sxy) / float(B)
        corr = float(A) / (np.sqrt(float(B)) * np.sqrt(float(Cm)))
        rows.append((r.flag, n, slope, intercept, corr))
    flag, n, slope, intercept, corr = zip(*rows)
    return pa.table(
        {
            "flag": pa.array(flag, type=pa.string()),
            "n": pa.array(n, type=pa.int64()),
            "slope": pa.array(slope, type=pa.float64()),
            "intercept": pa.array(intercept, type=pa.float64()),
            "corr": pa.array(corr, type=pa.float64()),
        }
    )


def q_mode_event_type(sf_dir: str):
    """Per-user modal event type — grouped argmax with a deterministic
    tie-break (higher count wins, ties → lexicographically smaller
    type). Counts come from one ``groupby(user, type)`` (the shuffle
    carries ≤ |users|·|types| pre-combined rows, not events); the
    argmax is a second ``groupby(user)`` whose groups are bounded by
    the distinct-type cardinality, so no task ever sees more than a
    handful of rows per user. Returns (user_id, top_type, n_events)."""
    from ray.data.aggregate import Count

    def _argmax(g: pa.Table) -> pa.Table:
        cnt = g.column("n").to_numpy(zero_copy_only=False)
        types = np.asarray(g.column("event_type").to_pylist(), dtype=object)
        order = np.lexsort((types, -cnt))  # count desc, type asc
        i = order[0]
        return pa.table(
            {
                "user_id": g.column("user_id").slice(i, 1),
                "top_type": pa.array([types[i]], type=pa.string()),
                "n_events": pa.array([int(cnt[i])], type=pa.int64()),
            }
        )

    return (
        _read(sf_dir, "events", ["user_id", "event_type"])
        .groupby(["user_id", "event_type"])
        .aggregate(Count(alias_name="n"))
        .groupby("user_id")
        .map_groups(_argmax, batch_format="pyarrow")
    )


def q_approx_quantiles_sample(sf_dir: str, k: int = 256):
    """Approximate price quantiles from a DETERMINISTIC bottom-k
    uniform row sample — the mergeable alternative to a quantile
    sketch whose merge would be order-dependent: the k smallest
    splitmix64(16·orderkey ⊕ linenumber ⊕ seed) hashes form a uniform
    coordinated sample (stable at any parallelism), each block emits
    only its partial bottom-k (blocks×k candidate rows move, never the
    table), and p50/p90/p99 are the exact order statistics of the
    256-row sample — integer cents, so the replayed SQL hash-matches
    bit-for-bit while the estimate lands within the usual
    O(1/√k) band of the true quantile (pinned by the exact-percentile
    query at test scale). Returns (q_bp, cents)."""
    from ..config import HASH_SEED
    from ..sources.edges_synth import _splitmix64

    def _hash(b: pa.Table) -> pa.Table:
        ok = b.column("l_orderkey").to_numpy(zero_copy_only=False).astype(np.uint64)
        ln = b.column("l_linenumber").to_numpy(zero_copy_only=False).astype(np.uint64)
        cents = np.round(
            b.column("l_extendedprice").to_numpy(zero_copy_only=False) * 100.0
        ).astype(np.int64)
        with np.errstate(over="ignore"):
            h = _splitmix64((ok * np.uint64(16)) ^ ln ^ np.uint64(HASH_SEED))
        order = np.argsort(h)[:k]
        return pa.table(
            {
                "h": pa.array(h[order], type=pa.uint64()),
                "cents": pa.array(cents[order]),
            }
        )

    top = (
        _read(sf_dir, "lineitem", ["l_orderkey", "l_linenumber", "l_extendedprice"])
        .map_batches(_hash, batch_format="pyarrow")
        .sort("h")
        .limit(k)
        .to_pandas()
    )
    cents = np.sort(top["cents"].to_numpy())
    m = len(cents)
    out_q, out_c = [], []
    for bp in (5000, 9000, 9900):
        rank = -(-bp * m // 10000)  # ceil(q·m), 1-indexed
        out_q.append(bp)
        out_c.append(int(cents[rank - 1]))
    return pa.table(
        {
            "q_bp": pa.array(out_q, type=pa.int64()),
            "cents": pa.array(out_c, type=pa.int64()),
        }
    )


def q_median_price_bisect(sf_dir: str):
    """EXACT global median by distributed bisection — the selection
    algorithm that works when the value domain is too wide for a
    histogram and the table too big for a sort: O(log range) passes,
    each a count-below-pivot scan reduced to one scalar per block.
    The scanned column (price cents, int64) is materialized ONCE as a
    single-column dataset and re-consumed per pass (at 10^12 rows the
    re-reads stream from the object store, never the driver). Lower
    median (k = ⌈n/2⌉-th order statistic) so the result is an exact
    integer matching the SQL window-rank oracle. Returns
    (n, median_cents)."""
    from ray.data.aggregate import Count, Max, Min, Sum

    def _cents(b: pa.Table) -> pa.Table:
        return pa.table(
            {
                "cents": pa.array(
                    np.round(
                        b.column("l_extendedprice").to_numpy(zero_copy_only=False)
                        * 100.0
                    ).astype(np.int64)
                )
            }
        )

    ds = (
        _read(sf_dir, "lineitem", ["l_extendedprice"])
        .map_batches(_cents, batch_format="pyarrow")
        .materialize()
    )
    stats = ds.aggregate(
        Count(alias_name="n"), Min("cents", alias_name="lo"), Max("cents", alias_name="hi")
    )
    n, lo, hi = int(stats["n"]), int(stats["lo"]), int(stats["hi"])
    k = (n + 1) // 2
    while lo < hi:
        mid = (lo + hi) // 2

        def _below(b: pa.Table, _mid=mid) -> pa.Table:
            c = b.column("cents").to_numpy(zero_copy_only=False)
            return pa.table({"c": pa.array([int((c <= _mid).sum())], type=pa.int64())})

        cnt = ds.map_batches(_below, batch_format="pyarrow").aggregate(
            Sum("c", alias_name="c")
        )
        if int(cnt["c"]) >= k:
            hi = mid
        else:
            lo = mid + 1
    return pa.table(
        {
            "n": pa.array([n], type=pa.int64()),
            "median_cents": pa.array([lo], type=pa.int64()),
        }
    )


def q_triangles_doulion(sf_dir: str):
    """DOULION (Tsourakakis et al., KDD 2009) sampled triangle count:
    keep each distinct co-occurrence edge iff its splitmix64 hash
    falls below 2^62 (a DETERMINISTIC p = 1/4 coin — stable at any
    parallelism, replayable in SQL), count triangles exactly on the
    thinned graph with the engine's degree-oriented closure, and
    scale by 1/p³ = 64 — all integers, so the estimate is exact
    arithmetic over an exactly-reproducible sample while the expected
    work drops by p² per wedge. Returns
    (sampled_triangles, estimate_x64)."""
    from ray.data.aggregate import Count, Sum

    from ..sources.edges_synth import _splitmix64
    from .triangles import triangle_count

    def _canon(b: pa.Table) -> pa.Table:
        s = b.column("src").to_numpy(zero_copy_only=False).astype(np.uint64)
        d = b.column("dst").to_numpy(zero_copy_only=False).astype(np.uint64)
        u = np.minimum(s, d)
        v = np.maximum(s, d)
        return pa.table(
            {
                "u": pa.array(u, type=pa.uint64()),
                "v": pa.array(v, type=pa.uint64()),
            }
        )

    def _sample(b: pa.Table) -> pa.Table:
        # groupby may hand the keys back as int64 — force uint64 BEFORE
        # hashing (int64 ⊕ uint64 promotes to float64 and corrupts bits)
        u = b.column("u").to_numpy(zero_copy_only=False).astype(np.uint64)
        v = b.column("v").to_numpy(zero_copy_only=False).astype(np.uint64)
        with np.errstate(over="ignore"):
            h = _splitmix64((u << np.uint64(32)) ^ v)
        keep = h < np.uint64(1 << 62)
        return pa.table(
            {
                "src": pa.array(u[keep], type=pa.uint64()),
                "dst": pa.array(v[keep], type=pa.uint64()),
            }
        )

    edges = (
        part_cooccurrence_edges(sf_dir)
        .map_batches(_canon, batch_format="pyarrow")
        .groupby(["u", "v"])
        .aggregate(Count(alias_name="one"))
        .map_batches(_sample, batch_format="pyarrow")
    )
    g = build_graph(edges, EngineConfig(num_partitions=16), directed=False)
    tot = triangle_count(g).aggregate(Sum("triangles", alias_name="s"))
    s = int(tot["s"]) if tot["s"] is not None else 0
    t = s // 3  # each triangle counted at its 3 corners
    return pa.table(
        {
            "sampled_triangles": pa.array([t], type=pa.int64()),
            "estimate_x64": pa.array([t * 64], type=pa.int64()),
        }
    )


def q_dag_levels_coocc(sf_dir: str, rounds: int = 32):
    """Truncated longest-path layering of a DAG — the topological
    level a dependency scheduler / dataflow compiler assigns, on the
    superstep engine's MAX-PLUS semiring (the exact dual of SSSP's
    min-plus): orient each distinct co-occurrence pair from lower to
    higher (splitmix64(vid), vid) — a total order, so the result is
    acyclic by construction — then ``rounds`` rounds of l(v) ←
    max(l(v), 1 + max_{u→v} l(u)), i.e. level = min(longest-path,
    rounds). Selection arithmetic only → bit-exact vs the unrolled
    SQL oracle; early zero-change stop equals the truncated value by
    monotonicity. Returns (vid, level)."""
    from ray.data.aggregate import Count

    from ..sources.edges_synth import _splitmix64
    from ..state.superstep import run_supersteps, state_vertex_dataset

    def _canon(b: pa.Table) -> pa.Table:
        s = b.column("src").to_numpy(zero_copy_only=False).astype(np.uint64)
        d = b.column("dst").to_numpy(zero_copy_only=False).astype(np.uint64)
        return pa.table(
            {
                "u": pa.array(np.minimum(s, d), type=pa.uint64()),
                "v": pa.array(np.maximum(s, d), type=pa.uint64()),
            }
        )

    def _orient(b: pa.Table) -> pa.Table:
        u = b.column("u").to_numpy(zero_copy_only=False).astype(np.uint64)
        v = b.column("v").to_numpy(zero_copy_only=False).astype(np.uint64)
        hu, hv = _splitmix64(u), _splitmix64(v)
        fwd = (hu < hv) | ((hu == hv) & (u < v))
        return pa.table(
            {
                "src": pa.array(np.where(fwd, u, v), type=pa.uint64()),
                "dst": pa.array(np.where(fwd, v, u), type=pa.uint64()),
            }
        )

    edges = (
        part_cooccurrence_edges(sf_dir)
        .map_batches(_canon, batch_format="pyarrow")
        .groupby(["u", "v"])
        .aggregate(Count(alias_name="one"))
        .map_batches(_orient, batch_format="pyarrow")
    )
    g = build_graph(edges, EngineConfig(num_partitions=16), directed=True)

    def init_fn(csr):
        return np.zeros(len(csr["vids"]), dtype=np.float64)

    def edge_shift_fn(w_perm, csr):
        return np.ones(len(csr["indices"]), dtype=np.uint64)

    summary = run_supersteps(
        g,
        _ckpt("daglev"),
        "max",
        init_fn,
        tol=0.0,
        max_iters=rounds,
        edge_shift_fn=edge_shift_fn,
        ckpt_every=16,  # many cheap rounds — write 1-in-16 + final
    )
    lev = state_vertex_dataset(g, summary["final_iter_dir"], "level")

    def _cast(b: pa.Table) -> pa.Table:
        return pa.table(
            {
                "vid": b.column("vid").cast(pa.int64()),
                "level": pa.array(
                    b.column("level").to_numpy(zero_copy_only=False).astype(np.int64)
                ),
            }
        )

    return lev.map_batches(_cast, batch_format="pyarrow")


def part_cooccurrence_edges_filtered(sf_dir: str, which: str):
    """'base' = co-occurrence pairs from orders with key % 10 != 0 (the
    90% cold graph of the crawl-delta scenario); 'full' = all orders."""
    if which == "full":
        return part_cooccurrence_edges(sf_dir)
    return part_cooccurrence_edges(sf_dir, keep_orders=lambda ok: ok % 10 != 0)


def q_triangles_incremental(sf_dir: str, P: int = 32):
    """Incremental-view maintenance of the triangle count — the
    crawl-delta problem: a 90% base graph (orders with key % 10 ≠ 0)
    has its triangles counted once; when the remaining edges arrive,
    only work proportional to |Δ|·deg is done, never a full recount.
    Each new triangle is counted exactly once at its HIGHEST-RANK
    delta edge (rank = packed (u,v); base edges rank 0), the classic
    ordering trick that makes the delta exact: ΔT = Σ_{e=(u,v)∈Δ}
    |{w : (u,w), (v,w) present with rank < rank(e)}|. Two bounded
    co-shuffles (wedge generation keyed on u, closure keyed on the
    candidate pair), all partials integer. The SQL oracle computes
    the FULL count directly from the full graph — so the hash match
    proves base + Δ ≡ full. Returns
    (base_triangles, delta_added, full_triangles)."""
    from ray.data.aggregate import Count, Sum

    from .triangles import triangle_count

    def _pairs_of(pred):
        def _canon(b: pa.Table) -> pa.Table:
            s = b.column("src").to_numpy(zero_copy_only=False).astype(np.uint64)
            d = b.column("dst").to_numpy(zero_copy_only=False).astype(np.uint64)
            return pa.table(
                {
                    "u": pa.array(np.minimum(s, d), type=pa.uint64()),
                    "v": pa.array(np.maximum(s, d), type=pa.uint64()),
                }
            )

        src = part_cooccurrence_edges_filtered(sf_dir, pred)
        return (
            src.map_batches(_canon, batch_format="pyarrow")
            .groupby(["u", "v"])
            .aggregate(Count(alias_name="one"))
        )

    base_pairs = _pairs_of("base")
    full_pairs = _pairs_of("full")

    # ---- base count: the engine's standard degree-oriented closure
    def _as_edges(b: pa.Table) -> pa.Table:
        return pa.table(
            {
                "src": b.column("u").cast(pa.uint64()),
                "dst": b.column("v").cast(pa.uint64()),
            }
        )

    g_base = build_graph(
        base_pairs.map_batches(_as_edges, batch_format="pyarrow"),
        EngineConfig(num_partitions=16),
        directed=False,
    )
    base_t = int(
        triangle_count(g_base).aggregate(Sum("triangles", alias_name="s"))["s"]
    ) // 3

    # ---- delta = full \ base via one co-shuffle anti-join on the pair key
    def _tag(tag: int):
        def _f(b: pa.Table) -> pa.Table:
            u = b.column("u").to_numpy(zero_copy_only=False).astype(np.uint64)
            v = b.column("v").to_numpy(zero_copy_only=False).astype(np.uint64)
            key = (u << np.uint64(32)) | v
            return pa.table(
                {
                    "part": pa.array((key % np.uint64(P)).astype(np.int64)),
                    "key": pa.array(key, type=pa.uint64()),
                    "tag": pa.array(np.full(len(u), tag, dtype=np.int64)),
                }
            )

        return _f

    def _anti(g: pa.Table) -> pa.Table:
        key = g.column("key").to_numpy(zero_copy_only=False).astype(np.uint64)
        tag = g.column("tag").to_numpy(zero_copy_only=False)
        base_keys = np.sort(key[tag == 0])
        fk = key[tag == 1]
        pos = np.searchsorted(base_keys, fk)
        pos_c = np.minimum(pos, max(len(base_keys) - 1, 0))
        in_base = (
            (base_keys[pos_c] == fk) & (pos < len(base_keys))
            if len(base_keys)
            else np.zeros(len(fk), dtype=bool)
        )
        return pa.table({"key": pa.array(fk[~in_base], type=pa.uint64())})

    delta_keys = (
        base_pairs.map_batches(_tag(0), batch_format="pyarrow")
        .union(full_pairs.map_batches(_tag(1), batch_format="pyarrow"))
        .groupby("part")
        .map_groups(_anti, batch_format="pyarrow")
    )

    # ---- adjacency of the FULL graph with ranks (base 0, delta = key)
    def _rank_edges(g: pa.Table) -> pa.Table:
        key = g.column("key").to_numpy(zero_copy_only=False).astype(np.uint64)
        tag = g.column("tag").to_numpy(zero_copy_only=False)
        base_keys = np.sort(key[tag == 0])
        fk = key[tag == 1]
        pos = np.searchsorted(base_keys, fk)
        pos_c = np.minimum(pos, max(len(base_keys) - 1, 0))
        in_base = (
            (base_keys[pos_c] == fk) & (pos < len(base_keys))
            if len(base_keys)
            else np.zeros(len(fk), dtype=bool)
        )
        rk = np.where(in_base, np.uint64(0), fk)
        u = fk >> np.uint64(32)
        v = fk & np.uint64(0xFFFFFFFF)
        return pa.table(
            {
                "x": pa.array(np.concatenate([u, v]), type=pa.uint64()),
                "y": pa.array(np.concatenate([v, u]), type=pa.uint64()),
                "rk": pa.array(np.concatenate([rk, rk]), type=pa.uint64()),
            }
        )

    adj = (
        base_pairs.map_batches(_tag(0), batch_format="pyarrow")
        .union(full_pairs.map_batches(_tag(1), batch_format="pyarrow"))
        .groupby("part")
        .map_groups(_rank_edges, batch_format="pyarrow")
    )

    # ---- wedge generation: delta edge (u,v) × neighbors w of u with
    #      edge-rank(u,w) < rank(u,v); one co-shuffle keyed on x = u
    def _adj_side(b: pa.Table) -> pa.Table:
        x = b.column("x").to_numpy(zero_copy_only=False).astype(np.uint64)
        return pa.table(
            {
                "part": pa.array((x % np.uint64(P)).astype(np.int64)),
                "tag": pa.array(np.zeros(len(x), dtype=np.int64)),
                "x": b.column("x").cast(pa.uint64()),
                "y": b.column("y").cast(pa.uint64()),
                "rk": b.column("rk").cast(pa.uint64()),
            }
        )

    def _delta_side(b: pa.Table) -> pa.Table:
        key = b.column("key").to_numpy(zero_copy_only=False).astype(np.uint64)
        u = key >> np.uint64(32)
        return pa.table(
            {
                "part": pa.array((u % np.uint64(P)).astype(np.int64)),
                "tag": pa.array(np.ones(len(key), dtype=np.int64)),
                "x": pa.array(u, type=pa.uint64()),
                "y": pa.array(key & np.uint64(0xFFFFFFFF), type=pa.uint64()),
                "rk": pa.array(key, type=pa.uint64()),  # delta rank = its key
            }
        )

    def _wedges(g: pa.Table) -> pa.Table:
        tag = g.column("tag").to_numpy(zero_copy_only=False)
        x = g.column("x").to_numpy(zero_copy_only=False).astype(np.uint64)
        y = g.column("y").to_numpy(zero_copy_only=False).astype(np.uint64)
        rk = g.column("rk").to_numpy(zero_copy_only=False).astype(np.uint64)
        a = tag == 0
        ax, ay, ark = x[a], y[a], rk[a]
        order = np.argsort(ax, kind="stable")
        ax, ay, ark = ax[order], ay[order], ark[order]
        du, dv, drk = x[~a], y[~a], rk[~a]
        lo = np.searchsorted(ax, du, side="left")
        hi = np.searchsorted(ax, du, side="right")
        cnt = hi - lo
        if cnt.sum() == 0:
            return pa.table(
                {
                    "part": pa.array([], type=pa.int64()),
                    "ckey": pa.array([], type=pa.uint64()),
                    "erank": pa.array([], type=pa.uint64()),
                }
            )
        idx = np.concatenate([np.arange(l, h) for l, h in zip(lo, hi)])
        rep = np.repeat(np.arange(len(du)), cnt)
        w = ay[idx]
        wrk = ark[idx]
        ev, erk = dv[rep], drk[rep]
        keep = (wrk < erk) & (w != ev)
        w, ev, erk = w[keep], ev[keep], erk[keep]
        c1 = np.minimum(ev, w)
        c2 = np.maximum(ev, w)
        ckey = (c1 << np.uint64(32)) | c2
        return pa.table(
            {
                "part": pa.array((ckey % np.uint64(P)).astype(np.int64)),
                "ckey": pa.array(ckey, type=pa.uint64()),
                "erank": pa.array(erk, type=pa.uint64()),
            }
        )

    wedges = (
        adj.map_batches(_adj_side, batch_format="pyarrow")
        .union(delta_keys.map_batches(_delta_side, batch_format="pyarrow"))
        .groupby("part")
        .map_groups(_wedges, batch_format="pyarrow")
    )

    # ---- closure: candidate (v,w) must exist with rank < erank
    def _edge_keys(b: pa.Table) -> pa.Table:
        key = b.column("key").to_numpy(zero_copy_only=False).astype(np.uint64)
        tag = b.column("tag").to_numpy(zero_copy_only=False)
        base_keys = np.sort(key[tag == 0])
        fk = key[tag == 1]
        pos = np.searchsorted(base_keys, fk)
        pos_c = np.minimum(pos, max(len(base_keys) - 1, 0))
        in_base = (
            (base_keys[pos_c] == fk) & (pos < len(base_keys))
            if len(base_keys)
            else np.zeros(len(fk), dtype=bool)
        )
        rk = np.where(in_base, np.uint64(0), fk)
        return pa.table(
            {
                "part": pa.array((fk % np.uint64(P)).astype(np.int64)),
                "tag": pa.array(np.zeros(len(fk), dtype=np.int64)),
                "ckey": pa.array(fk, type=pa.uint64()),
                "erank": pa.array(rk, type=pa.uint64()),  # edge rank rides erank col
            }
        )

    def _close(g: pa.Table) -> pa.Table:
        tag = g.column("tag").to_numpy(zero_copy_only=False)
        ck = g.column("ckey").to_numpy(zero_copy_only=False).astype(np.uint64)
        er = g.column("erank").to_numpy(zero_copy_only=False).astype(np.uint64)
        is_e = tag == 0
        ek, erk = ck[is_e], er[is_e]
        order = np.argsort(ek, kind="stable")
        ek, erk = ek[order], erk[order]
        qk, qr = ck[~is_e], er[~is_e]
        pos = np.searchsorted(ek, qk)
        pos_c = np.minimum(pos, max(len(ek) - 1, 0))
        hit = (
            (ek[pos_c] == qk) & (pos < len(ek)) & (erk[pos_c] < qr)
            if len(ek)
            else np.zeros(len(qk), dtype=bool)
        )
        return pa.table({"c": pa.array([int(hit.sum())], type=pa.int64())})

    edge_keys = (
        base_pairs.map_batches(_tag(0), batch_format="pyarrow")
        .union(full_pairs.map_batches(_tag(1), batch_format="pyarrow"))
        .groupby("part")
        .map_groups(_edge_keys, batch_format="pyarrow")
    )

    def _as_query(b: pa.Table) -> pa.Table:
        return pa.table(
            {
                "part": b.column("part"),
                "tag": pa.array(np.ones(len(b), dtype=np.int64)),
                "ckey": b.column("ckey"),
                "erank": b.column("erank"),
            }
        )

    delta_t = int(
        edge_keys.union(wedges.map_batches(_as_query, batch_format="pyarrow"))
        .groupby("part")
        .map_groups(_close, batch_format="pyarrow")
        .aggregate(Sum("c", alias_name="s"))["s"]
        or 0
    )
    return pa.table(
        {
            "base_triangles": pa.array([base_t], type=pa.int64()),
            "delta_added": pa.array([delta_t], type=pa.int64()),
            "full_triangles": pa.array([base_t + delta_t], type=pa.int64()),
        }
    )


def q_hitting_time_coocc(sf_dir: str, k: int = 8):
    """Truncated expected hitting time to vertex 1 — the absorbing-walk
    LINEAR-SYSTEM solve (h = 1 + D⁻¹A·h off the target, h(T) = 0) by k
    Jacobi sweeps on the superstep engine: ``normalize=False`` gives
    the raw A·h gather, a custom ``apply_fn`` divides by own degree,
    adds the unit step cost and clamps the absorbing set — the same
    fixed-point control flow as PageRank with a different update rule
    (reference: the integrator-as-callback pattern,
    convolutional_barycenter.py:23-27). ROUND 9 (sum order differs
    from SQL by ~1e-15). Returns (vid, hit_r9)."""
    from ..state.superstep import run_supersteps, state_vertex_dataset

    g = _coocc_graph(sf_dir)

    def init_fn(csr):
        return np.zeros(len(csr["vids"]), dtype=np.float64)

    def apply_fn(acc, old, T, dm, csr):
        deg = csr["deg"].astype(np.float64)
        h = 1.0 + np.divide(acc, deg, out=np.zeros_like(acc), where=deg > 0)
        h[csr["vids"] == np.uint64(1)] = 0.0
        return h

    s = run_supersteps(
        g,
        _ckpt("hittime"),
        "sum",
        init_fn,
        tol=0.0,
        max_iters=k,
        normalize=False,
        apply_fn=apply_fn,
    )
    out = state_vertex_dataset(g, s["final_iter_dir"], "h")

    def _round(b: pa.Table) -> pa.Table:
        return pa.table(
            {
                "vid": b.column("vid").cast(pa.int64()),
                "hit_r9": pc.round(b.column("h"), ndigits=9),
            }
        )

    return out.map_batches(_round, batch_format="pyarrow")


def q_decayed_activity(sf_dir: str, tau_us: int = 86_400_000_000):
    """Exponentially time-decayed per-user activity score — the
    feature-store counter (recency-weighted engagement): score(u) =
    Σ_events exp((t − T)/τ), T = corpus max timestamp, τ = 1 day. One
    tiny Max aggregate fixes the horizon, then a single vectorized
    map computes per-event decays with map-side per-user partial sums
    before the groupby — the shuffle carries one float per (user,
    block). Timestamp diffs are exact int64 µs; ROUND 6 absorbs
    summation-order ulps. Returns (user_id, score_r6, n_events)."""
    from ray.data.aggregate import Max, Sum

    ev = _read(sf_dir, "events", ["user_id", "ts"])

    def _ts_us(col):
        return (
            col.cast(pa.timestamp("us"))
            .to_numpy(zero_copy_only=False)
            .astype("datetime64[us]")
            .view(np.int64)
        )

    def _tsmax(b: pa.Table) -> pa.Table:
        return pa.table({"t": pa.array([int(_ts_us(b.column("ts")).max())])})

    T = int(
        ev.map_batches(_tsmax, batch_format="pyarrow").aggregate(
            Max("t", alias_name="t")
        )["t"]
    )

    def _partial(b: pa.Table) -> pa.Table:
        from ..util import group_reduce

        u = b.column("user_id").to_numpy(zero_copy_only=False)
        t = _ts_us(b.column("ts"))
        d = np.exp((t - T) / float(tau_us))
        uk, su = group_reduce(u.astype(np.uint64), d, "sum")
        _, cn = group_reduce(u.astype(np.uint64), np.ones(len(u), dtype=np.int64), "sum")
        return pa.table(
            {
                "user_id": pa.array(uk.astype(np.int64)),
                "s": pa.array(su),
                "n": pa.array(cn),
            }
        )

    agg = (
        ev.map_batches(_partial, batch_format="pyarrow")
        .groupby("user_id")
        .aggregate(Sum("s", alias_name="s"), Sum("n", alias_name="n_events"))
    )

    def _round(b: pa.Table) -> pa.Table:
        return pa.table(
            {
                "user_id": b.column("user_id").cast(pa.int64()),
                "score_r6": pc.round(b.column("s"), ndigits=6),
                "n_events": b.column("n_events").cast(pa.int64()),
            }
        )

    return agg.map_batches(_round, batch_format="pyarrow")


def q_weekly_active_users(sf_dir: str):
    """Rolling 7-day distinct-user count (WAU per day) — the windowed
    COUNT(DISTINCT) every engagement dashboard needs, without a
    window function: dedup to (day, user) pairs first (the big
    shuffle shrinks to the distinct set), then each pair fans out to
    the ≤7 window-end days it supports — bounded ×7 amplification
    over a TINY domain — and a second distinct+count per day closes
    the window. Day arithmetic is exact integer µs. Returns
    (day, wau) for every day with ≥1 active user in window."""
    from ray.data.aggregate import Count

    DAY = 86_400_000_000

    def _daypairs(b: pa.Table) -> pa.Table:
        t = (
            b.column("ts")
            .cast(pa.timestamp("us"))
            .to_numpy(zero_copy_only=False)
            .astype("datetime64[us]")
            .view(np.int64)
        )
        return pa.table(
            {
                "day": pa.array(t // DAY),
                "user_id": b.column("user_id").cast(pa.int64()),
            }
        )

    pairs = (
        _read(sf_dir, "events", ["user_id", "ts"])
        .map_batches(_daypairs, batch_format="pyarrow")
        .groupby(["day", "user_id"])
        .aggregate(Count(alias_name="one"))
    )

    def _fan(b: pa.Table) -> pa.Table:
        d = b.column("day").to_numpy(zero_copy_only=False)
        u = b.column("user_id").to_numpy(zero_copy_only=False)
        off = np.arange(7, dtype=np.int64)
        return pa.table(
            {
                "day": pa.array((d[:, None] + off[None, :]).ravel()),
                "user_id": pa.array(np.repeat(u, 7)),
            }
        )

    return (
        pairs.map_batches(_fan, batch_format="pyarrow")
        .groupby(["day", "user_id"])
        .aggregate(Count(alias_name="one"))
        .groupby("day")
        .aggregate(Count(alias_name="wau"))
    )


def q_rbo_pagerank_vs_degree(sf_dir: str, k: int = 100, p: float = 0.9):
    """Rank-biased overlap (Webber, Moffat & Zobel, TOIS 2010) between
    the 4-step-PageRank and in-degree top-k rankings of the
    part→supplier graph — the IR-standard top-weighted ranking
    comparison (does link analysis agree with raw popularity?).
    Both top-k lists come off the engine distributed (sort on the
    rounded-r9 score with the vid tie-break — the SAME key the SQL
    orders by), the truncated RBO sum Σ (1−p)p^{d−1}·X_d/d runs on
    the driver over 2k rows. Returns (overlap_at_k, rbo_r9)."""
    g = _partsupp_graph(sf_dir)
    ranks, _ = pagerank(g, _ckpt("prk4rbo"), damping=0.85, tol=0.0, max_iters=4)

    def _round(batch: pa.Table) -> pa.Table:
        return pa.table(
            {
                "vid": batch.column("vid").cast(pa.int64()),
                "rank_r9": pc.round(batch.column("rank"), ndigits=9),
            }
        )

    top_a = (
        ranks.map_batches(_round, batch_format="pyarrow")
        .sort(["rank_r9", "vid"], descending=[True, False])
        .limit(k)
        .to_pandas()
    )
    top_b = (
        degree_table(g)
        .map_batches(
            lambda b: pa.table(
                {
                    "vid": b.column("vid").cast(pa.int64()),
                    "d": b.column("in_deg").cast(pa.int64()),
                }
            ),
            batch_format="pyarrow",
        )
        .sort(["d", "vid"], descending=[True, False])
        .limit(k)
        .to_pandas()
    )
    pa_pos = {v: i + 1 for i, v in enumerate(top_a["vid"])}
    m = np.array(
        sorted(
            max(pa_pos[v], i + 1)
            for i, v in enumerate(top_b["vid"])
            if v in pa_pos
        ),
        dtype=np.int64,
    )
    d = np.arange(1, k + 1, dtype=np.int64)
    x = np.searchsorted(m, d, side="right").astype(np.float64)
    rbo = float(((1.0 - p) * np.power(p, (d - 1).astype(np.float64)) * x / d).sum())
    return pa.table(
        {
            "overlap_at_k": pa.array([int(len(m))], type=pa.int64()),
            "rbo_r9": pa.array([round(rbo, 9)], type=pa.float64()),
        }
    )


def q_transitivity_coocc(sf_dir: str):
    """Global transitivity C = 3·triangles / wedges — the one-number
    clustering summary of a graph: triangle total from the engine's
    degree-oriented closure, wedge total Σ d(d−1)/2 from per-block
    degree partials (both exact integers; one final IEEE division
    matches SQL bit-for-bit). Returns
    (triangles, wedges, transitivity)."""
    from ray.data.aggregate import Sum

    from .triangles import triangle_count

    g = _coocc_graph(sf_dir)
    t = int(triangle_count(g).aggregate(Sum("triangles", alias_name="s"))["s"]) // 3

    def _wedges(b: pa.Table) -> pa.Table:
        d = b.column("out_deg").to_numpy(zero_copy_only=False).astype(np.int64)
        return pa.table({"w": pa.array([int((d * (d - 1) // 2).sum())])})

    w = int(
        degree_table(g)
        .map_batches(_wedges, batch_format="pyarrow")
        .aggregate(Sum("w", alias_name="w"))["w"]
    )
    return pa.table(
        {
            "triangles": pa.array([t], type=pa.int64()),
            "wedges": pa.array([w], type=pa.int64()),
            "transitivity": pa.array([float(3 * t) / float(w)], type=pa.float64()),
        }
    )


def q_laplacian_quadform_coocc(sf_dir: str, P: int = 32):
    """Graph-signal smoothness xᵀLx = Σ_{(u,v)∈E} (x_u − x_v)² of the
    part retail price (integer cents) over the co-occurrence graph —
    the Laplacian quadratic form behind the reference's heat-kernel /
    diffusion family (a smooth signal diffuses little). The vertex
    signal joins onto the distinct edge list by TWO tagged co-shuffles
    (gather x_u keyed on u, then x_v keyed on v) — no broadcast of the
    part table — and every difference-square is exact int64, so the
    single final division (normalized form xᵀLx / Σx²) matches SQL
    bit-for-bit. Returns (n_edges, quad_form, sum_x2)."""
    from ray.data.aggregate import Count, Sum

    def _canon(b: pa.Table) -> pa.Table:
        s = b.column("src").to_numpy(zero_copy_only=False).astype(np.uint64)
        d = b.column("dst").to_numpy(zero_copy_only=False).astype(np.uint64)
        return pa.table(
            {
                "u": pa.array(np.minimum(s, d), type=pa.uint64()),
                "v": pa.array(np.maximum(s, d), type=pa.uint64()),
            }
        )

    pairs = (
        part_cooccurrence_edges(sf_dir)
        .map_batches(_canon, batch_format="pyarrow")
        .groupby(["u", "v"])
        .aggregate(Count(alias_name="one"))
    )

    def _price_side(b: pa.Table) -> pa.Table:
        k = b.column("p_partkey").to_numpy(zero_copy_only=False).astype(np.int64)
        cents = np.round(
            b.column("p_retailprice").to_numpy(zero_copy_only=False) * 100.0
        ).astype(np.int64)
        return pa.table(
            {
                "part": pa.array(k % P),
                "tag": pa.array(np.zeros(len(k), dtype=np.int64)),
                "key": pa.array(k),
                "other": pa.array(np.zeros(len(k), dtype=np.int64)),
                "x": pa.array(cents),
            }
        )

    prices = _read(sf_dir, "part", ["p_partkey", "p_retailprice"]).map_batches(
        _price_side, batch_format="pyarrow"
    )

    def _edge_side(key_col: str, other_col: str):
        def _f(b: pa.Table) -> pa.Table:
            k = b.column(key_col).to_numpy(zero_copy_only=False).astype(np.int64)
            o = b.column(other_col).to_numpy(zero_copy_only=False).astype(np.int64)
            return pa.table(
                {
                    "part": pa.array(k % P),
                    "tag": pa.array(np.ones(len(k), dtype=np.int64)),
                    "key": pa.array(k),
                    "other": pa.array(o),
                    "x": pa.array(o * 0),
                }
            )

        return _f

    def _gather(g: pa.Table) -> pa.Table:
        tag = g.column("tag").to_numpy(zero_copy_only=False)
        key = g.column("key").to_numpy(zero_copy_only=False)
        is_p = tag == 0
        pk, px = key[is_p], g.column("x").to_numpy(zero_copy_only=False)[is_p]
        order = np.argsort(pk, kind="stable")
        pk, px = pk[order], px[order]
        ek = key[~is_p]
        eo = g.column("other").to_numpy(zero_copy_only=False)[~is_p]
        pos = np.searchsorted(pk, ek)
        return pa.table(
            {
                "u": pa.array(eo),  # re-key on the other endpoint
                "x_got": pa.array(px[pos]),
            }
        )

    # pass 1: x_u for every edge, output keyed on v
    with_xu = (
        pairs.map_batches(_edge_side("u", "v"), batch_format="pyarrow")
        .union(prices)
        .groupby("part")
        .map_groups(_gather, batch_format="pyarrow")
    )

    def _edge2(b: pa.Table) -> pa.Table:
        k = b.column("u").to_numpy(zero_copy_only=False).astype(np.int64)
        return pa.table(
            {
                "part": pa.array(k % P),
                "tag": pa.array(np.ones(len(k), dtype=np.int64)),
                "key": pa.array(k),
                "other": b.column("x_got"),  # carries x_u through
                "x": pa.array(k * 0),
            }
        )

    def _gather2(g: pa.Table) -> pa.Table:
        tag = g.column("tag").to_numpy(zero_copy_only=False)
        key = g.column("key").to_numpy(zero_copy_only=False)
        is_p = tag == 0
        pk, px = key[is_p], g.column("x").to_numpy(zero_copy_only=False)[is_p]
        order = np.argsort(pk, kind="stable")
        pk, px = pk[order], px[order]
        ek = key[~is_p]
        xu = g.column("other").to_numpy(zero_copy_only=False)[~is_p]
        pos = np.searchsorted(pk, ek)
        d = xu - px[pos]
        return pa.table(
            {
                "q": pa.array([int((d * d).sum())]),
                "n": pa.array([int(len(d))]),
            }
        )

    tot = (
        with_xu.map_batches(_edge2, batch_format="pyarrow")
        .union(prices)
        .groupby("part")
        .map_groups(_gather2, batch_format="pyarrow")
        .aggregate(Sum("q", alias_name="q"), Sum("n", alias_name="n"))
    )

    def _x2(b: pa.Table) -> pa.Table:
        cents = np.round(
            b.column("p_retailprice").to_numpy(zero_copy_only=False) * 100.0
        ).astype(np.int64)
        return pa.table({"s": pa.array([int((cents * cents).sum())])})

    sx2 = int(
        _read(sf_dir, "part", ["p_retailprice"])
        .map_batches(_x2, batch_format="pyarrow")
        .aggregate(Sum("s", alias_name="s"))["s"]
    )
    return pa.table(
        {
            "n_edges": pa.array([int(tot["n"])], type=pa.int64()),
            "quad_form": pa.array([int(tot["q"])], type=pa.int64()),
            "sum_x2": pa.array([sx2], type=pa.int64()),
        }
    )


def q_partition_cut_fraction(sf_dir: str, P: int = 16):
    """Partitioner telemetry: the fraction of distinct co-occurrence
    edges whose endpoints hash to DIFFERENT CSR shards (vid % P — the
    engine's actual placement rule). This is the number that prices
    every superstep's exchange: cut·|E| messages cross workers per
    round. Exact integer counts; one final division. Returns
    (n_edges, cut_edges, cut_fraction)."""
    from ray.data.aggregate import Count, Sum

    def _canon(b: pa.Table) -> pa.Table:
        s = b.column("src").to_numpy(zero_copy_only=False).astype(np.uint64)
        d = b.column("dst").to_numpy(zero_copy_only=False).astype(np.uint64)
        return pa.table(
            {
                "u": pa.array(np.minimum(s, d), type=pa.uint64()),
                "v": pa.array(np.maximum(s, d), type=pa.uint64()),
            }
        )

    def _cut(b: pa.Table) -> pa.Table:
        u = b.column("u").to_numpy(zero_copy_only=False).astype(np.uint64)
        v = b.column("v").to_numpy(zero_copy_only=False).astype(np.uint64)
        c = (u % np.uint64(P)) != (v % np.uint64(P))
        return pa.table(
            {
                "n": pa.array([len(u)], type=pa.int64()),
                "c": pa.array([int(c.sum())], type=pa.int64()),
            }
        )

    tot = (
        part_cooccurrence_edges(sf_dir)
        .map_batches(_canon, batch_format="pyarrow")
        .groupby(["u", "v"])
        .aggregate(Count(alias_name="one"))
        .map_batches(_cut, batch_format="pyarrow")
        .aggregate(Sum("n", alias_name="n"), Sum("c", alias_name="c"))
    )
    n, c = int(tot["n"]), int(tot["c"])
    return pa.table(
        {
            "n_edges": pa.array([n], type=pa.int64()),
            "cut_edges": pa.array([c], type=pa.int64()),
            "cut_fraction": pa.array([float(c) / float(n)], type=pa.float64()),
        }
    )


def q_config_model_triangles(sf_dir: str):
    """Triangle count vs its configuration-model (degree-preserving
    null) expectation E[T] ≈ (Σd(d−1))³ / (6·(Σd)³) — the analytic
    null behind the reference's CONFIGURATION_MODEL significance
    correction (graph_kernels.py get_projection), WITHOUT simulation:
    both moments are exact int64 degree sums off the CSR shards, the
    expectation one float expression, so the DuckDB replay matches
    bit-for-bit. Returns (triangles, sum_d, sum_d2m, expected_r6,
    ratio_r6)."""
    from ray.data.aggregate import Sum

    from .triangles import triangle_count

    g = _coocc_graph(sf_dir)
    t = int(triangle_count(g).aggregate(Sum("triangles", alias_name="s"))["s"]) // 3

    def _moments(b: pa.Table) -> pa.Table:
        d = b.column("out_deg").to_numpy(zero_copy_only=False).astype(np.int64)
        return pa.table(
            {
                "sd": pa.array([int(d.sum())]),
                "sd2": pa.array([int((d * (d - 1)).sum())]),
            }
        )

    mo = (
        degree_table(g)
        .map_batches(_moments, batch_format="pyarrow")
        .aggregate(Sum("sd", alias_name="sd"), Sum("sd2", alias_name="sd2"))
    )
    sd, sd2 = int(mo["sd"]), int(mo["sd2"])
    exp_t = (float(sd2) / float(sd)) ** 3 / 6.0
    return pa.table(
        {
            "triangles": pa.array([t], type=pa.int64()),
            "sum_d": pa.array([sd], type=pa.int64()),
            "sum_d2m": pa.array([sd2], type=pa.int64()),
            "expected_r6": pa.array([round(exp_t, 6)], type=pa.float64()),
            "ratio_r6": pa.array([round(t / exp_t, 6)], type=pa.float64()),
        }
    )


def q_revenue_mom(sf_dir: str):
    """Month-over-month revenue with deltas — LAG() without a window:
    the monthly aggregate is a bounded domain (one row per month), so
    after one exact-cents groupby the lag/delta pass is a driver-side
    array shift over ≤ a few hundred rows. Returns
    (month, revenue_cents, prev_cents, delta_cents) — all exact
    integers (months with no predecessor carry prev = 0 and delta =
    revenue, the SQL COALESCE convention)."""
    from ray.data.aggregate import Sum

    def _monthly(b: pa.Table) -> pa.Table:
        t = (
            b.column("o_orderdate")
            .cast(pa.timestamp("us"))
            .to_numpy(zero_copy_only=False)
            .astype("datetime64[M]")
            .astype(np.int64)
        )  # months since 1970-01
        cents = np.round(
            b.column("o_totalprice").to_numpy(zero_copy_only=False) * 100.0
        ).astype(np.int64)
        return pa.table({"month": pa.array(t), "cents": pa.array(cents)})

    monthly = (
        _read(sf_dir, "orders", ["o_orderdate", "o_totalprice"])
        .map_batches(_monthly, batch_format="pyarrow")
        .groupby("month")
        .aggregate(Sum("cents", alias_name="revenue_cents"))
        .to_pandas()
        .sort_values("month")
        .reset_index(drop=True)
    )
    rev = monthly["revenue_cents"].to_numpy()
    mon = monthly["month"].to_numpy()
    prev = np.zeros_like(rev)
    # previous CALENDAR month (gap months break the chain, like LAG
    # over a dense generate_series would see a zero)
    prev_map = dict(zip(mon, rev))
    prev = np.array([prev_map.get(m - 1, 0) for m in mon], dtype=np.int64)
    return pa.table(
        {
            "month": pa.array(mon, type=pa.int64()),
            "revenue_cents": pa.array(rev, type=pa.int64()),
            "prev_cents": pa.array(prev, type=pa.int64()),
            "delta_cents": pa.array(rev - prev, type=pa.int64()),
        }
    )


def q_cliques4_coocc(sf_dir: str):
    """Per-vertex 4-clique participation counts on the co-occurrence
    graph (two-level oriented closure, pipelines/cliques.py) —
    SQL-oracled against a 6-way self-join clique enumeration."""
    from .cliques import cliques4_count

    return _vid_to_int64(cliques4_count(_coocc_graph(sf_dir)), {"cliques4": pa.int64()})


def q_avg_neighbor_degree_coocc(sf_dir: str):
    """Average neighbor degree per vertex on the co-occurrence graph
    (zero-shuffle shard map over the broadcast degree index) —
    SQL-oracled; and_ppm = FLOOR(1e6·sum/deg), bit-identical both sides."""
    from .degrees import avg_neighbor_degree

    return _vid_to_int64(
        avg_neighbor_degree(_coocc_graph(sf_dir)),
        {"deg": pa.int64(), "nbr_deg_sum": pa.int64(), "and_ppm": pa.int64()},
    )


def q_triad_census_coocc(sf_dir: str):
    """Triangle triad census (7 Holland-Leinhardt all-connected
    classes) of the hash-oriented directed co-occurrence graph —
    SQL-oracled; dyad states are closed-form splitmix math inside the
    triangle-closure task, so the census is one 7-int partial per
    task over plain triangle counting."""
    from .triangles import triad_census

    return triad_census(_coocc_graph(sf_dir))


def q_revenue_gini(sf_dir: str):
    """Gini coefficient of order revenue — the "whales dominate GMV"
    inequality summary. Unlike q_degree_gini_coocc (whose degree
    histogram is tiny), distinct cent values are O(n_orders), so the
    closed-form rank sum runs DISTRIBUTED: groupby(cents) histogram →
    the 2-pass ordered prefix scan (functions/packing.py) attaches
    b_d = Σ count over smaller values → each block contributes
    S_d = d·(c_d·b_d + c_d(c_d+1)/2) with Python-int arithmetic
    (tie order irrelevant: tied rows share d). Partials are exact
    int64 (bound ~n²·max_cents — safe through ~10^8 orders; the
    documented upgrade is 128-bit partial pairs); the driver does one
    IEEE division on exact ints, matching DuckDB's HUGEINT→DOUBLE
    path bit-for-bit. Returns one row (n_orders, sum_cents, gini)."""
    from ray.data.aggregate import Sum as _Sum

    from ..functions.packing import ordered_prefix_sum

    def _cents(b: pa.Table) -> pa.Table:
        cents = np.round(
            b.column("o_totalprice").to_numpy(zero_copy_only=False) * 100.0
        ).astype(np.int64)
        return pa.table(
            {"cents": pa.array(cents), "c": pa.array(np.ones(len(cents), np.int64))}
        )

    hist = (
        _read(sf_dir, "orders", ["o_totalprice"])
        .map_batches(_cents, batch_format="pyarrow")
        .groupby("cents")
        .aggregate(_Sum("c", alias_name="c"))
    )
    pre = ordered_prefix_sum(hist, "cents", "c")

    def _partial(b: pa.Table) -> pa.Table:
        d = b.column("cents").to_numpy(zero_copy_only=False).astype(np.int64)
        c = b.column("c").to_numpy(zero_copy_only=False).astype(np.int64)
        bd = b.column("prefix_excl").to_numpy(zero_copy_only=False).astype(np.int64)
        s = int(sum(int(dv) * (int(cv) * int(bv) + int(cv) * (int(cv) + 1) // 2)
                    for dv, cv, bv in zip(d, c, bd)))
        return pa.table(
            {
                "s": pa.array([s], type=pa.int64()),
                "t": pa.array([int((d * c).sum())], type=pa.int64()),
                "n": pa.array([int(c.sum())], type=pa.int64()),
            }
        )

    tot = pre.map_batches(_partial, batch_format="pyarrow").aggregate(
        _Sum("s", alias_name="s"), _Sum("t", alias_name="t"), _Sum("n", alias_name="n")
    )
    S, T, n = int(tot["s"]), int(tot["t"]), int(tot["n"])
    gini = float(2 * S - (n + 1) * T) / float(n * T)
    return pa.table(
        {
            "n_orders": pa.array([n], type=pa.int64()),
            "sum_cents": pa.array([T], type=pa.int64()),
            "gini": pa.array([gini], type=pa.float64()),
        }
    )


def q_cc_by_degree_coocc(sf_dir: str):
    """C(k) profile: per degree class, vertex count, total triangles
    and summed local-clustering ppm — the hierarchical-structure
    signature curve (Ravasz-Barabasi, public measure). One
    combiner-backed groupby over the clustering-coefficient table;
    integer-exact end-to-end (no floats at all), SQL-oracled."""
    from ray.data.aggregate import Count as _Count, Sum as _Sum

    from .triangles import clustering_coefficient

    cc = clustering_coefficient(_coocc_graph(sf_dir))

    def _shape(b: pa.Table) -> pa.Table:
        return pa.table(
            {
                "deg": b.column("deg").cast(pa.int64()),
                "n_vertices": b.column("n_vertices").cast(pa.int64()),
                "sum_triangles": b.column("sum_triangles").cast(pa.int64()),
                "sum_cc_ppm": b.column("sum_cc_ppm").cast(pa.int64()),
            }
        )

    return (
        cc.groupby("deg")
        .aggregate(
            _Count(alias_name="n_vertices"),
            _Sum("triangles", alias_name="sum_triangles"),
            _Sum("cc_ppm", alias_name="sum_cc_ppm"),
        )
        .map_batches(_shape, batch_format="pyarrow")
    )


def q_kll_quantiles(sf_dir: str):
    """Deterministic KLL sketch quantiles of lineitem price cents
    (rows-only: compaction is not SQL-replayable; pytest pins the
    rank-error bound vs exact order statistics, weight conservation,
    merge symmetry and parallelism invariance — functions/sketches.py:
    kll_quantiles)."""
    from ..functions.sketches import kll_quantiles

    def _vals(group):
        return np.round(group["l_extendedprice"].to_numpy() * 100.0).astype(np.int64)

    return kll_quantiles(
        _read(sf_dir, "lineitem", ["l_orderkey", "l_extendedprice"]),
        _vals,
        "l_orderkey",
        bucket_step=512,
        k=128,
    )


def q_densest_coocc(sf_dir: str):
    """Densest-subgraph peeling rounds on the co-occurrence graph
    (Bahmani 2(1+eps)-approx). SQL-oracled since round 5: the
    all-integer kill threshold (2·den·deg·n_alive ≤ num·Σdeg) unrolls
    exactly in DuckDB (oracles/sql.densest_coocc_sql; extra rounds
    past exhaustion emit no rows); pytest additionally pins the
    approximation guarantee against exhaustive search.
    Returns (round, n_alive, edges2)."""
    from .densest import densest_subgraph

    table, _ = densest_subgraph(_coocc_graph(sf_dir))
    return table


def q_event_stationary(sf_dir: str, iters: int = 32):
    """Stationary distribution of the first-order event-type Markov
    chain — the steady-state behavior mix behind "what fraction of
    traffic ends up in checkout". The transition matrix comes from the
    distributed q_event_transitions pipeline (exact integer counts →
    single-division probabilities); the chain itself is |event_types|²
    ≤ dozens of cells, so the power iteration runs on the driver and
    the SQL oracle unrolls the same ``iters`` sparse vector-matrix
    products (ROUND 9 absorbs the ~1e-15 summation-order drift).
    Returns (event_type, stat_r9)."""
    tr = q_event_transitions(sf_dir).to_pandas()
    types = sorted(_read(sf_dir, "events", ["event_type"]).unique("event_type"))
    idx = {t: i for i, t in enumerate(types)}
    K = len(types)
    P = np.zeros((K, K), dtype=np.float64)
    for s, d, w in zip(tr["src_type"], tr["dst_type"], tr["prob"]):
        P[idx[s], idx[d]] = float(w)
    x = np.full(K, 1.0 / float(K), dtype=np.float64)
    for _ in range(iters):
        x = x @ P
    return pa.table(
        {
            "event_type": pa.array(types, type=pa.string()),
            "stat_r9": pa.array(np.round(x, 9), type=pa.float64()),
        }
    )


def q_ra_linkpred_coocc(sf_dir: str):
    """Top-100 non-adjacent pairs by resource-allocation index with
    preferential-attachment products (pipelines/linkpred.py:ra_pa_topk)
    — SQL-oracled via the wedge self-join."""
    from .linkpred import ra_pa_topk

    return ra_pa_topk(_coocc_graph(sf_dir), k=100)


def q_order_count_distribution(sf_dir: str):
    """TPC-H Q13 shape ("custdist"): distribution of customers by
    order count INCLUDING the zero-order bucket — the classic
    left-outer-join histogram. Distributed shape: per-block
    (custkey, n) Arrow partials → one ``groupby(custkey)`` sum → the
    per-custkey counts collapse to a tiny ``groupby(n_orders)``
    histogram. The zero bucket needs no outer join at any scale: it is
    |customer| − |distinct ordering custkeys|, and the second term is
    Σ n_customers of the histogram itself — two scalar counts, no
    customer row ever shuffles. Returns (n_orders, n_customers)."""

    def _partial(batch: pa.Table) -> pa.Table:
        t = pa.table({"custkey": batch.column("o_custkey")})
        out = t.group_by("custkey").aggregate([("custkey", "count")])
        return pa.table(
            {
                "custkey": out.column("custkey"),
                "n": out.column("custkey_count").cast(pa.int64()),
            }
        )

    per = (
        _read(sf_dir, "orders", ["o_custkey"])
        .map_batches(_partial, batch_format="pyarrow")
        .groupby("custkey")
        .aggregate(Sum("n", alias_name="n_orders"))
    )
    hist_t = (
        per.groupby("n_orders")
        .aggregate(Count(alias_name="n_customers"))
        .to_pandas()
    )
    n_cust = _read(sf_dir, "customer", ["c_custkey"]).count()
    zero = int(n_cust) - int(hist_t["n_customers"].sum())
    n_orders = hist_t["n_orders"].to_numpy(dtype=np.int64)
    n_customers = hist_t["n_customers"].to_numpy(dtype=np.int64)
    if zero > 0:
        n_orders = np.concatenate((n_orders, [0]))
        n_customers = np.concatenate((n_customers, [zero]))
    return pa.table(
        {
            "n_orders": pa.array(n_orders, type=pa.int64()),
            "n_customers": pa.array(n_customers, type=pa.int64()),
        }
    )


def q_large_orders(sf_dir: str, min_qty: int = 250):
    """TPC-H Q18 shape ("large volume customer"): orders whose total
    lineitem quantity is ≥ ``min_qty``, with the order's customer and
    exact-cents total price. Distributed shape: per-block Arrow
    (orderkey, qty) partials → one ``groupby(orderkey)`` sum → the
    HAVING filter leaves a tiny survivor set (≈0.2% of orders) that is
    broadcast as a sorted key array, and orders stream past it with a
    ``searchsorted`` semi-join — the big-big lineitem⋈orders join never
    happens. l_quantity is integral in the fixture, so qty sums are
    exact int64s. Returns (o_orderkey, o_custkey, qty_sum,
    total_cents)."""
    import ray

    def _qty_partial(batch: pa.Table) -> pa.Table:
        t = pa.table(
            {
                "okey": batch.column("l_orderkey"),
                "qty": pa.array(
                    batch.column("l_quantity")
                    .to_numpy(zero_copy_only=False)
                    .astype(np.int64)
                ),
            }
        )
        out = t.group_by("okey").aggregate([("qty", "sum")])
        return out.rename_columns(["okey", "qty"])

    def _having(batch: pa.Table) -> pa.Table:
        return batch.filter(
            pc.greater_equal(batch.column("qty_sum"), pa.scalar(int(min_qty)))
        )

    big = (
        _read(sf_dir, "lineitem", ["l_orderkey", "l_quantity"])
        .map_batches(_qty_partial, batch_format="pyarrow")
        .groupby("okey")
        .aggregate(Sum("qty", alias_name="qty_sum"))
        .map_batches(_having, batch_format="pyarrow")
        .to_pandas()
    )
    order = np.argsort(big["okey"].to_numpy())
    keys = big["okey"].to_numpy(dtype=np.int64)[order]
    qtys = big["qty_sum"].to_numpy(dtype=np.int64)[order]
    ref = ray.put((keys, qtys))

    def _semi(batch: pa.Table) -> pa.Table:
        k, q = ray.get(ref)
        ok = batch.column("o_orderkey").to_numpy(zero_copy_only=False)
        pos = np.searchsorted(k, ok)
        inb = pos < len(k)
        hit = np.zeros(len(ok), dtype=bool)
        hit[inb] = k[pos[inb]] == ok[inb]
        cents = np.floor(
            batch.column("o_totalprice").to_numpy(zero_copy_only=False)[hit] * 100
        ).astype(np.int64)
        return pa.table(
            {
                "o_orderkey": pa.array(ok[hit], type=pa.int64()),
                "o_custkey": pa.array(
                    batch.column("o_custkey").to_numpy(zero_copy_only=False)[hit],
                    type=pa.int64(),
                ),
                "qty_sum": pa.array(q[pos[hit]], type=pa.int64()),
                "total_cents": pa.array(cents, type=pa.int64()),
            }
        )

    return _read(
        sf_dir, "orders", ["o_orderkey", "o_custkey", "o_totalprice"]
    ).map_batches(_semi, batch_format="pyarrow")


def q_small_qty_revenue(sf_dir: str):
    """TPC-H Q17 shape ("small-quantity-order revenue"): Σ revenue of
    lineitems whose quantity is below 20% of their part's average
    quantity. The correlated per-part AVG subquery becomes a two-pass
    plan: pass 1 is a ``groupby(partkey)`` of exact int64 (Σqty, n)
    partials; the per-part table (≤ |part| rows) is broadcast as three
    sorted numpy arrays, and pass 2 streams lineitem past it with a
    ``searchsorted`` probe — no join shuffle. The threshold
    ``0.2·(Σqty/n)`` is a single IEEE divide+multiply on exact ints,
    reproduced verbatim in the oracle, so the float comparison is
    bit-identical. Returns one row (n_items, revenue_cents)."""
    import ray

    def _qty_partial(batch: pa.Table) -> pa.Table:
        t = pa.table(
            {
                "pk": batch.column("l_partkey"),
                "qty": pa.array(
                    batch.column("l_quantity")
                    .to_numpy(zero_copy_only=False)
                    .astype(np.int64)
                ),
                "one": pa.array(np.ones(batch.num_rows, dtype=np.int64)),
            }
        )
        out = t.group_by("pk").aggregate([("qty", "sum"), ("one", "sum")])
        return out.rename_columns(["pk", "sq", "n"])

    per = (
        _read(sf_dir, "lineitem", ["l_partkey", "l_quantity"])
        .map_batches(_qty_partial, batch_format="pyarrow")
        .groupby("pk")
        .aggregate(Sum("sq", alias_name="sq"), Sum("n", alias_name="n"))
        .to_pandas()
    )
    order = np.argsort(per["pk"].to_numpy())
    pk = per["pk"].to_numpy(dtype=np.int64)[order]
    thr = 0.2 * (
        per["sq"].to_numpy(dtype=np.float64)[order]
        / per["n"].to_numpy(dtype=np.float64)[order]
    )
    ref = ray.put((pk, thr))

    def _probe(batch: pa.Table) -> pa.Table:
        k, t = ray.get(ref)
        lpk = batch.column("l_partkey").to_numpy(zero_copy_only=False)
        qty = batch.column("l_quantity").to_numpy(zero_copy_only=False)
        pos = np.searchsorted(k, lpk)  # every l_partkey exists in k
        sel = qty < t[pos]
        cents = np.floor(
            batch.column("l_extendedprice").to_numpy(zero_copy_only=False)[sel] * 100
        ).astype(np.int64)
        return pa.table(
            {
                "n_items": pa.array([int(sel.sum())], type=pa.int64()),
                "revenue_cents": pa.array([int(cents.sum())], type=pa.int64()),
            }
        )

    parts = (
        _read(sf_dir, "lineitem", ["l_partkey", "l_quantity", "l_extendedprice"])
        .map_batches(_probe, batch_format="pyarrow")
        .to_pandas()
    )
    return pa.table(
        {
            "n_items": pa.array([int(parts["n_items"].sum())], type=pa.int64()),
            "revenue_cents": pa.array(
                [int(parts["revenue_cents"].sum())], type=pa.int64()
            ),
        }
    )


def q_priority_late_orders(sf_dir: str, late_days: int = 60, P: int = 32):
    """TPC-H Q4 shape ("order priority checking"): per order priority,
    the number of orders and the number whose latest lineitem shipped
    more than ``late_days`` after the order date (the EXISTS semi-join,
    folded to ``max(l_shipdate) > o_orderdate + Δ``). Distributed
    shape: per-block (okey, max_ts) Arrow partials → both sides tagged
    into one superset schema and co-located by ONE
    ``groupby(okey % P)`` — the big-big join is a per-partition
    vectorized ``searchsorted`` merge, and only (priority, n, n_late)
    partials leave each partition for a 5-row final sum. Returns
    (o_orderpriority, n_orders, n_late)."""
    late_us = np.int64(late_days) * np.int64(86_400) * np.int64(1_000_000)

    def _ship_partial(b: pa.Table) -> pa.Table:
        t = pa.table(
            {
                "okey": b.column("l_orderkey"),
                "ts": pa.array(
                    b.column("l_shipdate")
                    .cast(pa.timestamp("us"))
                    .to_numpy(zero_copy_only=False)
                    .astype("datetime64[us]")
                    .view(np.int64)
                ),
            }
        )
        out = t.group_by("okey").aggregate([("ts", "max")])
        return out.rename_columns(["okey", "max_ts"])

    from ray.data.aggregate import Max

    maxes = (
        _read(sf_dir, "lineitem", ["l_orderkey", "l_shipdate"])
        .map_batches(_ship_partial, batch_format="pyarrow")
        .groupby("okey")
        .aggregate(Max("max_ts", alias_name="max_ts"))
    )

    def _tag_max(b: pa.Table) -> pa.Table:
        ok = b.column("okey").to_numpy(zero_copy_only=False)
        return pa.table(
            {
                "part": pa.array(ok % P, type=pa.int64()),
                "okey": pa.array(ok, type=pa.int64()),
                "max_ts": b.column("max_ts").cast(pa.int64()),
                "o_ts": pa.nulls(b.num_rows, type=pa.int64()),
                "prio": pa.nulls(b.num_rows, type=pa.string()),
            }
        )

    def _tag_orders(b: pa.Table) -> pa.Table:
        ok = b.column("o_orderkey").to_numpy(zero_copy_only=False)
        return pa.table(
            {
                "part": pa.array(ok % P, type=pa.int64()),
                "okey": pa.array(ok, type=pa.int64()),
                "max_ts": pa.nulls(b.num_rows, type=pa.int64()),
                "o_ts": pa.array(
                    b.column("o_orderdate")
                    .cast(pa.timestamp("us"))
                    .to_numpy(zero_copy_only=False)
                    .astype("datetime64[us]")
                    .view(np.int64)
                ),
                "prio": b.column("o_orderpriority"),
            }
        )

    both = maxes.map_batches(_tag_max, batch_format="pyarrow").union(
        _read(
            sf_dir, "orders", ["o_orderkey", "o_orderdate", "o_orderpriority"]
        ).map_batches(_tag_orders, batch_format="pyarrow")
    )

    def _merge(g: pa.Table) -> pa.Table:
        is_order = g.column("prio").is_valid().to_numpy(zero_copy_only=False)
        okey = g.column("okey").to_numpy(zero_copy_only=False)
        m_ok = okey[~is_order]
        m_ts = g.column("max_ts").to_numpy(zero_copy_only=False)[~is_order]
        ms = np.argsort(m_ok)
        m_ok, m_ts = m_ok[ms], m_ts[ms]
        o_ok = okey[is_order]
        o_ts = g.column("o_ts").to_numpy(zero_copy_only=False)[is_order]
        prio = g.column("prio").filter(pa.array(is_order))
        pos = np.searchsorted(m_ok, o_ok)
        inb = pos < len(m_ok)
        hit = np.zeros(len(o_ok), dtype=bool)
        hit[inb] = m_ok[pos[inb]] == o_ok[inb]
        late = np.zeros(len(o_ok), dtype=np.int64)
        late[hit] = (m_ts[pos[hit]] > o_ts[hit] + late_us).astype(np.int64)
        t = pa.table(
            {
                "o_orderpriority": prio,
                "one": pa.array(np.ones(len(o_ok), dtype=np.int64)),
                "late": pa.array(late),
            }
        )
        out = t.group_by("o_orderpriority").aggregate(
            [("one", "sum"), ("late", "sum")]
        )
        return out.rename_columns(["o_orderpriority", "n_orders", "n_late"])

    return (
        both.groupby("part")
        .map_groups(_merge, batch_format="pyarrow")
        .groupby("o_orderpriority")
        .aggregate(
            Sum("n_orders", alias_name="n_orders"), Sum("n_late", alias_name="n_late")
        )
    )


def q_global_sales_opportunity(sf_dir: str, cutoff: str = "2000-01-01"):
    """TPC-H Q22 shape ("global sales opportunity"): per nation, the
    count and exact-cents balance sum of customers whose account
    balance beats the global average POSITIVE balance and who have no
    order since ``cutoff`` (lapsed high-balance customers — the
    fixture has no never-ordered customers, so the recency cutoff
    keeps the anti-join non-trivial). Three scalable pieces, no join
    shuffle: (a) the scalar subquery is a per-block (Σcents, n) int64
    partial pair merged to one IEEE division; (b) the anti-join key
    set is a distributed distinct of recent o_custkey broadcast as one
    sorted array (the proven q_customers_without_orders pattern); (c)
    customers stream past both. Returns (nationkey, n_custs,
    bal_cents)."""
    import ray

    cutoff_np = np.datetime64(cutoff, "us")

    def _bal_partial(b: pa.Table) -> pa.Table:
        bal = b.column("c_acctbal").to_numpy(zero_copy_only=False)
        pos = bal > 0
        cents = np.floor(bal[pos] * 100).astype(np.int64)
        return pa.table(
            {
                "s": pa.array([int(cents.sum())], type=pa.int64()),
                "n": pa.array([int(pos.sum())], type=pa.int64()),
            }
        )

    parts = (
        _read(sf_dir, "customer", ["c_acctbal"])
        .map_batches(_bal_partial, batch_format="pyarrow")
        .to_pandas()
    )
    avg_cents = float(parts["s"].sum()) / float(parts["n"].sum())

    def _block_unique(b: pa.Table) -> pa.Table:
        ts = (
            b.column("o_orderdate")
            .cast(pa.timestamp("us"))
            .to_numpy(zero_copy_only=False)
        )
        ck = np.unique(
            b.column("o_custkey").to_numpy(zero_copy_only=False)[ts >= cutoff_np]
        )
        return pa.table({"o_custkey": pa.array(ck, type=pa.int64())})

    have = (
        _read(sf_dir, "orders", ["o_custkey", "o_orderdate"])
        .map_batches(_block_unique, batch_format="pyarrow")
        .unique("o_custkey")
    )
    ref = ray.put(np.sort(np.asarray(have, dtype=np.int64)))

    def _probe(b: pa.Table) -> pa.Table:
        keys = ray.get(ref)
        ck = b.column("c_custkey").to_numpy(zero_copy_only=False)
        bal_cents = np.floor(
            b.column("c_acctbal").to_numpy(zero_copy_only=False) * 100
        ).astype(np.int64)
        pos = np.searchsorted(keys, ck)
        inb = pos < len(keys)
        ordered = np.zeros(len(ck), dtype=bool)
        ordered[inb] = keys[pos[inb]] == ck[inb]
        sel = (~ordered) & (bal_cents > avg_cents)
        t = pa.table(
            {
                "nationkey": pa.array(
                    b.column("c_nationkey")
                    .to_numpy(zero_copy_only=False)[sel]
                    .astype(np.int64)
                ),
                "one": pa.array(np.ones(int(sel.sum()), dtype=np.int64)),
                "cents": pa.array(bal_cents[sel], type=pa.int64()),
            }
        )
        out = t.group_by("nationkey").aggregate([("one", "sum"), ("cents", "sum")])
        return out.rename_columns(["nationkey", "n_custs", "bal_cents"])

    out = (
        _read(sf_dir, "customer", ["c_custkey", "c_nationkey", "c_acctbal"])
        .map_batches(_probe, batch_format="pyarrow")
        .groupby("nationkey")
        .aggregate(
            Sum("n_custs", alias_name="n_custs"),
            Sum("bal_cents", alias_name="bal_cents"),
        )
    )
    # explicit schema so an all-filtered (empty) result keeps its columns
    schema = pa.schema(
        [("nationkey", pa.int64()), ("n_custs", pa.int64()), ("bal_cents", pa.int64())]
    )
    batches = list(out.iter_batches(batch_size=None, batch_format="pyarrow"))
    return (
        pa.concat_tables([pa.table(b).cast(schema) for b in batches])
        if batches
        else schema.empty_table()
    )


def q_returned_items_topk(sf_dir: str, k: int = 20, P: int = 32):
    """TPC-H Q10 shape ("returned item reporting"): top-k customers by
    exact-cents revenue on returned lineitems (l_returnflag='R').
    Distributed shape: the R-filtered lineitem collapses to per-block
    (okey, cents) partials; orders and those partials are co-located
    by ONE ``groupby(okey % P)`` and each partition emits
    (custkey, cents) partial sums, so the big-big lineitem⋈orders join
    is a per-partition searchsorted merge; a final ``groupby(custkey)``
    sum + partial top-k sort yields k rows. Returns
    (c_custkey, revenue_cents), revenue desc, custkey asc ties."""

    def _ret_partial(b: pa.Table) -> pa.Table:
        rf = b.column("l_returnflag").to_numpy(zero_copy_only=False)
        sel = rf == "R"
        t = pa.table(
            {
                "okey": pa.array(
                    b.column("l_orderkey").to_numpy(zero_copy_only=False)[sel],
                    type=pa.int64(),
                ),
                "cents": pa.array(
                    np.floor(
                        b.column("l_extendedprice").to_numpy(zero_copy_only=False)[sel]
                        * 100
                    ).astype(np.int64),
                    type=pa.int64(),
                ),
            }
        )
        out = t.group_by("okey").aggregate([("cents", "sum")])
        return out.rename_columns(["okey", "cents"])

    def _tag_li(b: pa.Table) -> pa.Table:
        ok = b.column("okey").to_numpy(zero_copy_only=False)
        return pa.table(
            {
                "part": pa.array(ok % P, type=pa.int64()),
                "okey": pa.array(ok, type=pa.int64()),
                "cents": b.column("cents"),
                "custkey": pa.nulls(b.num_rows, type=pa.int64()),
            }
        )

    def _tag_orders(b: pa.Table) -> pa.Table:
        ok = b.column("o_orderkey").to_numpy(zero_copy_only=False)
        return pa.table(
            {
                "part": pa.array(ok % P, type=pa.int64()),
                "okey": pa.array(ok, type=pa.int64()),
                "cents": pa.nulls(b.num_rows, type=pa.int64()),
                "custkey": b.column("o_custkey").cast(pa.int64()),
            }
        )

    both = (
        _read(sf_dir, "lineitem", ["l_orderkey", "l_returnflag", "l_extendedprice"])
        .map_batches(_ret_partial, batch_format="pyarrow")
        .map_batches(_tag_li, batch_format="pyarrow")
        .union(
            _read(sf_dir, "orders", ["o_orderkey", "o_custkey"]).map_batches(
                _tag_orders, batch_format="pyarrow"
            )
        )
    )

    def _merge(g: pa.Table) -> pa.Table:
        is_order = g.column("custkey").is_valid().to_numpy(zero_copy_only=False)
        okey = g.column("okey").to_numpy(zero_copy_only=False)
        li_ok = okey[~is_order]
        li_c = g.column("cents").to_numpy(zero_copy_only=False)[~is_order]
        o_ok = okey[is_order]
        o_ck = g.column("custkey").to_numpy(zero_copy_only=False)[is_order]
        os_ = np.argsort(o_ok)
        o_ok, o_ck = o_ok[os_], o_ck[os_]
        pos = np.searchsorted(o_ok, li_ok)  # every lineitem has its order
        ck = o_ck[pos]
        t = pa.table(
            {
                "custkey": pa.array(ck, type=pa.int64()),
                "cents": pa.array(li_c, type=pa.int64()),
            }
        )
        out = t.group_by("custkey").aggregate([("cents", "sum")])
        return out.rename_columns(["custkey", "cents"])

    agg = (
        both.groupby("part")
        .map_groups(_merge, batch_format="pyarrow")
        .groupby("custkey")
        .aggregate(Sum("cents", alias_name="revenue_cents"))
    )
    top = agg.sort(["revenue_cents", "custkey"], descending=[True, False]).limit(k)

    def _rename(b: pa.Table) -> pa.Table:
        return b.rename_columns(["c_custkey", "revenue_cents"])

    return top.map_batches(_rename, batch_format="pyarrow")


def q_market_share_by_year(sf_dir: str, target_region: str = "ASIA"):
    """TPC-H Q8 shape ("national market share"): per ship year, the
    exact-cents revenue supplied by ``target_region`` suppliers and the
    total — the share is num/den, published as the two exact integers
    so the hash comparison needs no float rounding. The star-schema
    side (supplier→nation→region, ≤ a few thousand rows at any scale)
    folds to ONE broadcast boolean array indexed by s_suppkey position;
    lineitem streams past it with per-block (year, cents) Arrow
    partials — no shuffle except the ≤|years| final groupby. Returns
    (year, region_cents, total_cents)."""
    import ray

    sup = _read(sf_dir, "supplier", ["s_suppkey", "s_nationkey"]).to_pandas()
    nat = _read(sf_dir, "nation", ["n_nationkey", "n_regionkey"]).to_pandas()
    reg = _read(sf_dir, "region", ["r_regionkey", "r_name"]).to_pandas()
    n2r = dict(zip(nat["n_nationkey"].astype(int), nat["n_regionkey"].astype(int)))
    r2n = dict(zip(reg["r_regionkey"].astype(int), reg["r_name"]))
    skeys = np.sort(sup["s_suppkey"].to_numpy(dtype=np.int64))
    s2n = dict(zip(sup["s_suppkey"].astype(int), sup["s_nationkey"].astype(int)))
    in_region = np.array(
        [r2n[n2r[s2n[int(k)]]] == target_region for k in skeys], dtype=bool
    )
    ref = ray.put((skeys, in_region))

    def _partial(b: pa.Table) -> pa.Table:
        k, hit = ray.get(ref)
        sk = b.column("l_suppkey").to_numpy(zero_copy_only=False)
        ts = (
            b.column("l_shipdate")
            .cast(pa.timestamp("us"))
            .to_numpy(zero_copy_only=False)
        )
        year = ts.astype("datetime64[Y]").astype(np.int64) + 1970
        cents = np.floor(
            b.column("l_extendedprice").to_numpy(zero_copy_only=False) * 100
        ).astype(np.int64)
        pos = np.searchsorted(k, sk)  # referential integrity: every suppkey exists
        is_r = hit[pos]
        t = pa.table(
            {
                "year": pa.array(year, type=pa.int64()),
                "region_cents": pa.array(np.where(is_r, cents, 0), type=pa.int64()),
                "total_cents": pa.array(cents, type=pa.int64()),
            }
        )
        out = t.group_by("year").aggregate(
            [("region_cents", "sum"), ("total_cents", "sum")]
        )
        return out.rename_columns(["year", "region_cents", "total_cents"])

    return (
        _read(sf_dir, "lineitem", ["l_suppkey", "l_shipdate", "l_extendedprice"])
        .map_batches(_partial, batch_format="pyarrow")
        .groupby("year")
        .aggregate(
            Sum("region_cents", alias_name="region_cents"),
            Sum("total_cents", alias_name="total_cents"),
        )
    )


def q_shipping_priority_topk(
    sf_dir: str, segment: str = "BUILDING", cutoff: str = "1998-06-01", k: int = 10
):
    """TPC-H Q3 shape ("shipping priority"): top-k still-unshipped
    orders of one market segment by outstanding exact-integer net
    revenue Σ cents·(100−disc_pct). Distributed shape: the segment's
    custkeys fold to ONE broadcast sorted array (customer is the star
    dimension side); orders stream past it with a vectorized
    membership probe; revenue collapses to per-block (okey, net)
    partials; the big-big orders⋈lineitem join is ONE
    ``groupby(okey % P)`` co-shuffle resolved per partition by
    ``searchsorted``; each partition owns its okeys so only final
    (okey, odate, net) rows feed the global top-k sort. Returns
    (o_orderkey, odate_days, net_micents)."""
    import ray

    P = 32
    cut = np.datetime64(cutoff, "us").astype(np.int64)

    cust = _read(sf_dir, "customer", ["c_custkey", "c_mktsegment"]).to_pandas()
    ck = np.sort(
        cust.loc[cust["c_mktsegment"] == segment, "c_custkey"].to_numpy(dtype=np.int64)
    )
    ref = ray.put(ck)

    def _us(col):
        return (
            col.cast(pa.timestamp("us")).to_numpy(zero_copy_only=False).view(np.int64)
        )

    def _tag_orders(b: pa.Table) -> pa.Table:
        keys = ray.get(ref)
        okey = b.column("o_orderkey").to_numpy(zero_copy_only=False)
        ckey = b.column("o_custkey").to_numpy(zero_copy_only=False)
        ots = _us(b.column("o_orderdate"))
        pos = np.searchsorted(keys, ckey)
        pos[pos >= len(keys)] = 0
        sel = (ots < cut) & (len(keys) > 0) & (keys[pos] == ckey)
        okey, ots = okey[sel], ots[sel]
        return pa.table(
            {
                "part": pa.array((okey % P).astype(np.int64)),
                "okey": pa.array(okey, type=pa.int64()),
                "odate_days": pa.array(ots // 86_400_000_000, type=pa.int64()),
                "net": pa.nulls(len(okey), type=pa.int64()),
            }
        )

    def _li_partial(b: pa.Table) -> pa.Table:
        sel = _us(b.column("l_shipdate")) > cut
        okey = b.column("l_orderkey").to_numpy(zero_copy_only=False)[sel]
        cents = np.floor(
            b.column("l_extendedprice").to_numpy(zero_copy_only=False)[sel] * 100
        ).astype(np.int64)
        pct = np.round(
            b.column("l_discount").to_numpy(zero_copy_only=False)[sel] * 100
        ).astype(np.int64)
        t = pa.table(
            {"okey": pa.array(okey, type=pa.int64()), "net": cents * (100 - pct)}
        )
        out = t.group_by("okey").aggregate([("net", "sum")]).rename_columns(
            ["okey", "net"]
        )
        return pa.table(
            {
                "part": pc.cast(
                    pc.bit_wise_and(out.column("okey"), P - 1), pa.int64()
                ),
                "okey": out.column("okey"),
                "odate_days": pa.nulls(out.num_rows, type=pa.int64()),
                "net": out.column("net"),
            }
        )

    def _join(g: pa.Table) -> pa.Table:
        is_o = g.column("odate_days").is_valid().to_numpy(zero_copy_only=False)
        okey = g.column("okey").to_numpy(zero_copy_only=False)
        oo = okey[is_o]
        od = g.column("odate_days").to_numpy(zero_copy_only=False)[is_o]
        order = np.argsort(oo)
        oo, od = oo[order], od[order]
        lo = okey[~is_o]
        ln = g.column("net").to_numpy(zero_copy_only=False)[~is_o]
        if len(oo) == 0 or len(lo) == 0:
            return pa.table(
                {
                    "o_orderkey": pa.array([], type=pa.int64()),
                    "odate_days": pa.array([], type=pa.int64()),
                    "net_micents": pa.array([], type=pa.int64()),
                }
            )
        pos = np.searchsorted(oo, lo)
        pos[pos >= len(oo)] = 0
        hit = oo[pos] == lo
        t = pa.table(
            {
                "okey": pa.array(lo[hit], type=pa.int64()),
                "net": pa.array(ln[hit], type=pa.int64()),
            }
        )
        agg = t.group_by("okey").aggregate([("net", "sum")]).rename_columns(
            ["okey", "net"]
        )
        ak = agg.column("okey").to_numpy(zero_copy_only=False)
        pos2 = np.searchsorted(oo, ak)
        return pa.table(
            {
                "o_orderkey": agg.column("okey"),
                "odate_days": pa.array(od[pos2], type=pa.int64()),
                "net_micents": agg.column("net"),
            }
        )

    both = (
        _read(sf_dir, "orders", ["o_orderkey", "o_custkey", "o_orderdate"])
        .map_batches(_tag_orders, batch_format="pyarrow")
        .union(
            _read(
                sf_dir,
                "lineitem",
                ["l_orderkey", "l_shipdate", "l_extendedprice", "l_discount"],
            ).map_batches(_li_partial, batch_format="pyarrow")
        )
    )
    return (
        both.groupby("part")
        .map_groups(_join, batch_format="pyarrow")
        .sort(["net_micents", "o_orderkey"], descending=[True, False])
        .limit(k)
    )


def q_forecast_revenue(sf_dir: str, year: str = "1997"):
    """TPC-H Q6 shape ("forecasting revenue change"): one-row scan
    aggregate — count and Σ cents·disc_pct over lineitems shipped in
    ``year`` with small quantity and mid-band discount. Pure streaming
    map_batches partials (no shuffle at all); discount is compared on
    its exact integer percent form so the float predicate is
    bit-identical to the oracle. Returns (n_items,
    disc_revenue_micents)."""
    lo = np.datetime64(f"{year}-01-01", "us").astype(np.int64)
    hi = np.datetime64(f"{int(year) + 1}-01-01", "us").astype(np.int64)

    def _partial(b: pa.Table) -> pa.Table:
        ts = (
            b.column("l_shipdate")
            .cast(pa.timestamp("us"))
            .to_numpy(zero_copy_only=False)
            .view(np.int64)
        )
        qty = b.column("l_quantity").to_numpy(zero_copy_only=False)
        pct = np.round(
            b.column("l_discount").to_numpy(zero_copy_only=False) * 100
        ).astype(np.int64)
        sel = (ts >= lo) & (ts < hi) & (qty < 24) & (pct >= 5) & (pct <= 7)
        cents = np.floor(
            b.column("l_extendedprice").to_numpy(zero_copy_only=False)[sel] * 100
        ).astype(np.int64)
        return pa.table(
            {
                "n_items": pa.array([int(sel.sum())], type=pa.int64()),
                "disc_revenue_micents": pa.array(
                    [int((cents * pct[sel]).sum())], type=pa.int64()
                ),
            }
        )

    parts = (
        _read(
            sf_dir,
            "lineitem",
            ["l_shipdate", "l_quantity", "l_discount", "l_extendedprice"],
        )
        .map_batches(_partial, batch_format="pyarrow")
        .to_pandas()
    )
    return pa.table(
        {
            "n_items": pa.array([int(parts["n_items"].sum())], type=pa.int64()),
            "disc_revenue_micents": pa.array(
                [int(parts["disc_revenue_micents"].sum())], type=pa.int64()
            ),
        }
    )


def q_linestatus_priority(sf_dir: str, year: str = "1997", P: int = 32):
    """TPC-H Q12 shape ("shipping modes and order priority", adapted to
    this schema's l_linestatus as the mode column): per linestatus,
    how many ``year``-shipped lineitems belong to high- vs low-priority
    orders. Distributed shape: lineitems collapse to per-block
    (okey, status, cnt) partials; orders ship only (okey, is_high);
    ONE ``groupby(okey % P)`` co-shuffle, per-partition searchsorted
    resolve, and only (status, high, low) partials leave each
    partition for a 2-row final sum. Returns
    (l_linestatus, high_items, low_items)."""
    lo = np.datetime64(f"{year}-01-01", "us").astype(np.int64)
    hi = np.datetime64(f"{int(year) + 1}-01-01", "us").astype(np.int64)

    def _li_partial(b: pa.Table) -> pa.Table:
        ts = (
            b.column("l_shipdate")
            .cast(pa.timestamp("us"))
            .to_numpy(zero_copy_only=False)
            .view(np.int64)
        )
        sel = (ts >= lo) & (ts < hi)
        t = pa.table(
            {
                "okey": pc.filter(b.column("l_orderkey"), pa.array(sel)),
                "status": pc.filter(b.column("l_linestatus"), pa.array(sel)),
                "cnt": pa.array(np.ones(int(sel.sum()), dtype=np.int64)),
            }
        )
        out = t.group_by(["okey", "status"]).aggregate([("cnt", "sum")])
        out = out.rename_columns(["okey", "status", "cnt"])
        ok = out.column("okey").to_numpy(zero_copy_only=False)
        return pa.table(
            {
                "part": pa.array((ok % P).astype(np.int64)),
                "okey": out.column("okey"),
                "status": out.column("status"),
                "cnt": out.column("cnt"),
                "is_high": pa.nulls(out.num_rows, type=pa.int64()),
            }
        )

    def _tag_orders(b: pa.Table) -> pa.Table:
        ok = b.column("o_orderkey").to_numpy(zero_copy_only=False)
        prio = b.column("o_orderpriority").to_numpy(zero_copy_only=False)
        high = np.isin(prio, ("1-URGENT", "2-HIGH")).astype(np.int64)
        return pa.table(
            {
                "part": pa.array((ok % P).astype(np.int64)),
                "okey": pa.array(ok, type=pa.int64()),
                "status": pa.nulls(len(ok), type=pa.string()),
                "cnt": pa.nulls(len(ok), type=pa.int64()),
                "is_high": pa.array(high, type=pa.int64()),
            }
        )

    def _join(g: pa.Table) -> pa.Table:
        is_o = g.column("is_high").is_valid().to_numpy(zero_copy_only=False)
        okey = g.column("okey").to_numpy(zero_copy_only=False)
        oo = okey[is_o]
        oh = g.column("is_high").to_numpy(zero_copy_only=False)[is_o]
        order = np.argsort(oo)
        oo, oh = oo[order], oh[order]
        lo_ = okey[~is_o]
        cnt = g.column("cnt").to_numpy(zero_copy_only=False)[~is_o]
        status = pc.filter(g.column("status"), pa.array(~is_o))
        if len(lo_) == 0:
            return pa.table(
                {
                    "l_linestatus": pa.array([], type=pa.string()),
                    "high_items": pa.array([], type=pa.int64()),
                    "low_items": pa.array([], type=pa.int64()),
                }
            )
        pos = np.searchsorted(oo, lo_)  # referential integrity
        high = oh[pos]
        t = pa.table(
            {
                "l_linestatus": status,
                "high_items": pa.array(cnt * high, type=pa.int64()),
                "low_items": pa.array(cnt * (1 - high), type=pa.int64()),
            }
        )
        out = t.group_by("l_linestatus").aggregate(
            [("high_items", "sum"), ("low_items", "sum")]
        )
        return out.rename_columns(["l_linestatus", "high_items", "low_items"])

    both = (
        _read(sf_dir, "lineitem", ["l_orderkey", "l_linestatus", "l_shipdate"])
        .map_batches(_li_partial, batch_format="pyarrow")
        .union(
            _read(sf_dir, "orders", ["o_orderkey", "o_orderpriority"]).map_batches(
                _tag_orders, batch_format="pyarrow"
            )
        )
    )
    return (
        both.groupby("part")
        .map_groups(_join, batch_format="pyarrow")
        .groupby("l_linestatus")
        .aggregate(
            Sum("high_items", alias_name="high_items"),
            Sum("low_items", alias_name="low_items"),
        )
    )


def q_promo_revenue(sf_dir: str, year: str = "1997"):
    """TPC-H Q14 shape ("promotion effect"): per ship month of
    ``year``, the exact-integer net revenue Σ cents·(100−pct) from
    PROMO-type parts and in total — the share is the ratio of the two
    published integers, so no float leaves the pipeline. The part
    dimension folds to ONE broadcast (sorted partkeys, is_promo bool)
    pair; lineitem streams past it with per-block (month, promo, total)
    Arrow partials; only the ≤12-row final groupby shuffles. Returns
    (month_id, promo_micents, total_micents)."""
    import ray

    lo = np.datetime64(f"{year}-01-01", "us").astype(np.int64)
    hi = np.datetime64(f"{int(year) + 1}-01-01", "us").astype(np.int64)

    part = _read(sf_dir, "part", ["p_partkey", "p_type"]).to_pandas()
    order = np.argsort(part["p_partkey"].to_numpy())
    pk = part["p_partkey"].to_numpy(dtype=np.int64)[order]
    promo = (part["p_type"].to_numpy() == "PROMO")[order]
    ref = ray.put((pk, promo))

    def _partial(b: pa.Table) -> pa.Table:
        k, isp = ray.get(ref)
        ts = (
            b.column("l_shipdate")
            .cast(pa.timestamp("us"))
            .to_numpy(zero_copy_only=False)
            .view(np.int64)
        )
        sel = (ts >= lo) & (ts < hi)
        lpk = b.column("l_partkey").to_numpy(zero_copy_only=False)[sel]
        cents = np.floor(
            b.column("l_extendedprice").to_numpy(zero_copy_only=False)[sel] * 100
        ).astype(np.int64)
        pct = np.round(
            b.column("l_discount").to_numpy(zero_copy_only=False)[sel] * 100
        ).astype(np.int64)
        net = cents * (100 - pct)
        m = ts[sel].astype("datetime64[us]").astype("datetime64[M]")
        month_id = (m.astype(np.int64) % 12 + 1) + (
            m.astype("datetime64[Y]").astype(np.int64) + 1970
        ) * 100
        pos = np.searchsorted(k, lpk)  # referential integrity
        is_promo = isp[pos]
        t = pa.table(
            {
                "month_id": pa.array(month_id, type=pa.int64()),
                "promo_micents": pa.array(np.where(is_promo, net, 0), type=pa.int64()),
                "total_micents": pa.array(net, type=pa.int64()),
            }
        )
        out = t.group_by("month_id").aggregate(
            [("promo_micents", "sum"), ("total_micents", "sum")]
        )
        return out.rename_columns(["month_id", "promo_micents", "total_micents"])

    return (
        _read(
            sf_dir,
            "lineitem",
            ["l_partkey", "l_shipdate", "l_extendedprice", "l_discount"],
        )
        .map_batches(_partial, batch_format="pyarrow")
        .groupby("month_id")
        .aggregate(
            Sum("promo_micents", alias_name="promo_micents"),
            Sum("total_micents", alias_name="total_micents"),
        )
    )


def _nation_maps(sf_dir: str):
    """Broadcast-ready star-dimension lookups: sorted custkey→natkey,
    sorted suppkey→natkey, and natkey→n_name (dense, natkeys are
    0..N-1). A few thousand rows at any TPC-H scale factor — the
    canonical ``ray.put`` small side."""
    cust = _read(sf_dir, "customer", ["c_custkey", "c_nationkey"]).to_pandas()
    sup = _read(sf_dir, "supplier", ["s_suppkey", "s_nationkey"]).to_pandas()
    nat = _read(sf_dir, "nation", ["n_nationkey", "n_name"]).to_pandas()
    co = np.argsort(cust["c_custkey"].to_numpy())
    ck = cust["c_custkey"].to_numpy(dtype=np.int64)[co]
    cn = cust["c_nationkey"].to_numpy(dtype=np.int64)[co]
    so = np.argsort(sup["s_suppkey"].to_numpy())
    sk = sup["s_suppkey"].to_numpy(dtype=np.int64)[so]
    sn = sup["s_nationkey"].to_numpy(dtype=np.int64)[so]
    names = np.empty(int(nat["n_nationkey"].max()) + 1, dtype=object)
    names[nat["n_nationkey"].to_numpy(dtype=np.int64)] = nat["n_name"].to_numpy()
    return ck, cn, sk, sn, names


def q_local_supplier_volume(sf_dir: str, year: str = "1997", P: int = 32):
    """TPC-H Q5 shape ("local supplier volume"): per nation, exact
    integer net revenue on lineitems whose supplier and ordering
    customer share that nation, for orders placed in ``year``.
    Distributed shape: supplier→nation resolves MAP-SIDE off a
    broadcast sorted array, so lineitem collapses to per-block
    (okey, s_nat, net) partials; the big-big join to orders (for the
    customer key) is ONE ``groupby(okey % P)`` co-shuffle with a
    per-partition searchsorted resolve; customer→nation also resolves
    from a broadcast array inside the partition; only ≤|nation| rows
    leave each partition. Returns (n_name, revenue_micents)."""
    import ray

    lo = np.datetime64(f"{year}-01-01", "us").astype(np.int64)
    hi = np.datetime64(f"{int(year) + 1}-01-01", "us").astype(np.int64)
    ck, cn, sk, sn, names = _nation_maps(sf_dir)
    ref = ray.put((ck, cn, sk, sn))

    def _li_partial(b: pa.Table) -> pa.Table:
        _, _, k, n, = ray.get(ref)
        okey = b.column("l_orderkey").to_numpy(zero_copy_only=False)
        skey = b.column("l_suppkey").to_numpy(zero_copy_only=False)
        cents = np.floor(
            b.column("l_extendedprice").to_numpy(zero_copy_only=False) * 100
        ).astype(np.int64)
        pct = np.round(
            b.column("l_discount").to_numpy(zero_copy_only=False) * 100
        ).astype(np.int64)
        s_nat = n[np.searchsorted(k, skey)]  # referential integrity
        t = pa.table(
            {
                "okey": pa.array(okey, type=pa.int64()),
                "s_nat": pa.array(s_nat, type=pa.int64()),
                "net": pa.array(cents * (100 - pct), type=pa.int64()),
            }
        )
        out = t.group_by(["okey", "s_nat"]).aggregate([("net", "sum")])
        out = out.rename_columns(["okey", "s_nat", "net"])
        ok = out.column("okey").to_numpy(zero_copy_only=False)
        return pa.table(
            {
                "part": pa.array((ok % P).astype(np.int64)),
                "okey": out.column("okey"),
                "s_nat": out.column("s_nat"),
                "net": out.column("net"),
                "custkey": pa.nulls(out.num_rows, type=pa.int64()),
            }
        )

    def _tag_orders(b: pa.Table) -> pa.Table:
        ts = (
            b.column("o_orderdate")
            .cast(pa.timestamp("us"))
            .to_numpy(zero_copy_only=False)
            .view(np.int64)
        )
        sel = (ts >= lo) & (ts < hi)
        ok = b.column("o_orderkey").to_numpy(zero_copy_only=False)[sel]
        cu = b.column("o_custkey").to_numpy(zero_copy_only=False)[sel]
        return pa.table(
            {
                "part": pa.array((ok % P).astype(np.int64)),
                "okey": pa.array(ok, type=pa.int64()),
                "s_nat": pa.nulls(len(ok), type=pa.int64()),
                "net": pa.nulls(len(ok), type=pa.int64()),
                "custkey": pa.array(cu, type=pa.int64()),
            }
        )

    def _join(g: pa.Table) -> pa.Table:
        k, n, _, _ = ray.get(ref)
        is_o = g.column("custkey").is_valid().to_numpy(zero_copy_only=False)
        okey = g.column("okey").to_numpy(zero_copy_only=False)
        oo = okey[is_o]
        ocu = g.column("custkey").to_numpy(zero_copy_only=False)[is_o]
        order = np.argsort(oo)
        oo, ocu = oo[order], ocu[order]
        li_ok = okey[~is_o]
        s_nat = g.column("s_nat").to_numpy(zero_copy_only=False)[~is_o]
        net = g.column("net").to_numpy(zero_copy_only=False)[~is_o]
        if len(oo) == 0 or len(li_ok) == 0:
            return pa.table(
                {
                    "natkey": pa.array([], type=pa.int64()),
                    "revenue_micents": pa.array([], type=pa.int64()),
                }
            )
        pos = np.searchsorted(oo, li_ok)
        pos[pos >= len(oo)] = 0
        hit = oo[pos] == li_ok  # orders are year-filtered: semi-join
        c_nat = n[np.searchsorted(k, ocu[pos])]
        keep = hit & (c_nat == s_nat)
        t = pa.table(
            {
                "natkey": pa.array(s_nat[keep], type=pa.int64()),
                "revenue_micents": pa.array(net[keep], type=pa.int64()),
            }
        )
        out = t.group_by("natkey").aggregate([("revenue_micents", "sum")])
        return out.rename_columns(["natkey", "revenue_micents"])

    agg = (
        _read(
            sf_dir,
            "lineitem",
            ["l_orderkey", "l_suppkey", "l_extendedprice", "l_discount"],
        )
        .map_batches(_li_partial, batch_format="pyarrow")
        .union(
            _read(sf_dir, "orders", ["o_orderkey", "o_custkey", "o_orderdate"])
            .map_batches(_tag_orders, batch_format="pyarrow")
        )
        .groupby("part")
        .map_groups(_join, batch_format="pyarrow")
        .groupby("natkey")
        .aggregate(Sum("revenue_micents", alias_name="revenue_micents"))
        .to_pandas()
    )
    return pa.table(
        {
            "n_name": pa.array(
                names[agg["natkey"].to_numpy(dtype=np.int64)].tolist(),
                type=pa.string(),
            ),
            "revenue_micents": pa.array(
                agg["revenue_micents"].to_numpy(dtype=np.int64), type=pa.int64()
            ),
        }
    )


def q_nation_volume_shipping(sf_dir: str, y0: str = "1997", y1: str = "1998", P: int = 32):
    """TPC-H Q7 shape ("volume shipping"): exact integer net revenue
    between every ordered (supplier nation, customer nation) pair with
    distinct nations, per ship year in [y0, y1]. Same distributed
    shape as Q5 — map-side supplier→nation, per-block
    (okey, s_nat, year, net) partials, ONE okey-co-shuffle to pick up
    the customer nation, cross-nation filter inside the partition —
    plus a packed (s_nat, c_nat, year) key for the tiny final groupby.
    Returns (supp_nation, cust_nation, l_year, revenue_micents)."""
    import ray

    lo = np.datetime64(f"{y0}-01-01", "us").astype(np.int64)
    hi = np.datetime64(f"{int(y1) + 1}-01-01", "us").astype(np.int64)
    ck, cn, sk, sn, names = _nation_maps(sf_dir)
    ref = ray.put((ck, cn, sk, sn))

    def _li_partial(b: pa.Table) -> pa.Table:
        _, _, k, n = ray.get(ref)
        ts = (
            b.column("l_shipdate")
            .cast(pa.timestamp("us"))
            .to_numpy(zero_copy_only=False)
            .view(np.int64)
        )
        sel = (ts >= lo) & (ts < hi)
        okey = b.column("l_orderkey").to_numpy(zero_copy_only=False)[sel]
        skey = b.column("l_suppkey").to_numpy(zero_copy_only=False)[sel]
        year = ts[sel].astype("datetime64[us]").astype("datetime64[Y]").astype(
            np.int64
        ) + 1970
        cents = np.floor(
            b.column("l_extendedprice").to_numpy(zero_copy_only=False)[sel] * 100
        ).astype(np.int64)
        pct = np.round(
            b.column("l_discount").to_numpy(zero_copy_only=False)[sel] * 100
        ).astype(np.int64)
        s_nat = n[np.searchsorted(k, skey)]
        t = pa.table(
            {
                "okey": pa.array(okey, type=pa.int64()),
                "sy": pa.array(s_nat * 10_000 + year, type=pa.int64()),
                "net": pa.array(cents * (100 - pct), type=pa.int64()),
            }
        )
        out = t.group_by(["okey", "sy"]).aggregate([("net", "sum")])
        out = out.rename_columns(["okey", "sy", "net"])
        ok = out.column("okey").to_numpy(zero_copy_only=False)
        return pa.table(
            {
                "part": pa.array((ok % P).astype(np.int64)),
                "okey": out.column("okey"),
                "sy": out.column("sy"),
                "net": out.column("net"),
                "custkey": pa.nulls(out.num_rows, type=pa.int64()),
            }
        )

    def _tag_orders(b: pa.Table) -> pa.Table:
        ok = b.column("o_orderkey").to_numpy(zero_copy_only=False)
        cu = b.column("o_custkey").to_numpy(zero_copy_only=False)
        return pa.table(
            {
                "part": pa.array((ok % P).astype(np.int64)),
                "okey": pa.array(ok, type=pa.int64()),
                "sy": pa.nulls(len(ok), type=pa.int64()),
                "net": pa.nulls(len(ok), type=pa.int64()),
                "custkey": pa.array(cu, type=pa.int64()),
            }
        )

    def _join(g: pa.Table) -> pa.Table:
        k, n, _, _ = ray.get(ref)
        is_o = g.column("custkey").is_valid().to_numpy(zero_copy_only=False)
        okey = g.column("okey").to_numpy(zero_copy_only=False)
        oo = okey[is_o]
        ocu = g.column("custkey").to_numpy(zero_copy_only=False)[is_o]
        order = np.argsort(oo)
        oo, ocu = oo[order], ocu[order]
        li_ok = okey[~is_o]
        sy = g.column("sy").to_numpy(zero_copy_only=False)[~is_o]
        net = g.column("net").to_numpy(zero_copy_only=False)[~is_o]
        if len(li_ok) == 0:
            return pa.table(
                {
                    "key": pa.array([], type=pa.int64()),
                    "revenue_micents": pa.array([], type=pa.int64()),
                }
            )
        pos = np.searchsorted(oo, li_ok)  # referential integrity
        c_nat = n[np.searchsorted(k, ocu[pos])]
        s_nat = sy // 10_000
        keep = c_nat != s_nat
        key = sy[keep] * 100 + c_nat[keep]  # (s_nat, year, c_nat) packed
        t = pa.table(
            {
                "key": pa.array(key, type=pa.int64()),
                "revenue_micents": pa.array(net[keep], type=pa.int64()),
            }
        )
        out = t.group_by("key").aggregate([("revenue_micents", "sum")])
        return out.rename_columns(["key", "revenue_micents"])

    agg = (
        _read(
            sf_dir,
            "lineitem",
            ["l_orderkey", "l_suppkey", "l_shipdate", "l_extendedprice", "l_discount"],
        )
        .map_batches(_li_partial, batch_format="pyarrow")
        .union(
            _read(sf_dir, "orders", ["o_orderkey", "o_custkey"]).map_batches(
                _tag_orders, batch_format="pyarrow"
            )
        )
        .groupby("part")
        .map_groups(_join, batch_format="pyarrow")
        .groupby("key")
        .aggregate(Sum("revenue_micents", alias_name="revenue_micents"))
        .to_pandas()
    )
    key = agg["key"].to_numpy(dtype=np.int64)
    c_nat = key % 100
    year = (key // 100) % 10_000
    s_nat = key // 1_000_000
    return pa.table(
        {
            "supp_nation": pa.array(names[s_nat].tolist(), type=pa.string()),
            "cust_nation": pa.array(names[c_nat].tolist(), type=pa.string()),
            "l_year": pa.array(year, type=pa.int64()),
            "revenue_micents": pa.array(
                agg["revenue_micents"].to_numpy(dtype=np.int64), type=pa.int64()
            ),
        }
    )


def q_profit_by_nation_year(sf_dir: str, p_type: str = "STANDARD"):
    """TPC-H Q9 shape ("product type profit", adapted: the schema has
    no ps_supplycost, so profit is the exact integer net revenue on
    ``p_type`` parts): per supplier nation and ship year. Pure
    map-side star join — both the part-type filter and
    supplier→nation resolve from broadcast sorted arrays inside
    map_batches, so the only shuffle is the ≤|nation|·|years| final
    groupby of per-block partials. Returns
    (n_name, l_year, profit_micents)."""
    import ray

    part = _read(sf_dir, "part", ["p_partkey", "p_type"]).to_pandas()
    po = np.argsort(part["p_partkey"].to_numpy())
    pk = part["p_partkey"].to_numpy(dtype=np.int64)[po]
    is_type = (part["p_type"].to_numpy() == p_type)[po]
    ck, cn, sk, sn, names = _nation_maps(sf_dir)
    ref = ray.put((pk, is_type, sk, sn))

    def _partial(b: pa.Table) -> pa.Table:
        k, hit, sk_, sn_ = ray.get(ref)
        lpk = b.column("l_partkey").to_numpy(zero_copy_only=False)
        sel = hit[np.searchsorted(k, lpk)]
        skey = b.column("l_suppkey").to_numpy(zero_copy_only=False)[sel]
        ts = (
            b.column("l_shipdate")
            .cast(pa.timestamp("us"))
            .to_numpy(zero_copy_only=False)
            .view(np.int64)[sel]
        )
        year = ts.astype("datetime64[us]").astype("datetime64[Y]").astype(
            np.int64
        ) + 1970
        cents = np.floor(
            b.column("l_extendedprice").to_numpy(zero_copy_only=False)[sel] * 100
        ).astype(np.int64)
        pct = np.round(
            b.column("l_discount").to_numpy(zero_copy_only=False)[sel] * 100
        ).astype(np.int64)
        s_nat = sn_[np.searchsorted(sk_, skey)]
        t = pa.table(
            {
                "key": pa.array(s_nat * 10_000 + year, type=pa.int64()),
                "profit_micents": pa.array(cents * (100 - pct), type=pa.int64()),
            }
        )
        out = t.group_by("key").aggregate([("profit_micents", "sum")])
        return out.rename_columns(["key", "profit_micents"])

    agg = (
        _read(
            sf_dir,
            "lineitem",
            ["l_partkey", "l_suppkey", "l_shipdate", "l_extendedprice", "l_discount"],
        )
        .map_batches(_partial, batch_format="pyarrow")
        .groupby("key")
        .aggregate(Sum("profit_micents", alias_name="profit_micents"))
        .to_pandas()
    )
    key = agg["key"].to_numpy(dtype=np.int64)
    return pa.table(
        {
            "n_name": pa.array(names[key // 10_000].tolist(), type=pa.string()),
            "l_year": pa.array(key % 10_000, type=pa.int64()),
            "profit_micents": pa.array(
                agg["profit_micents"].to_numpy(dtype=np.int64), type=pa.int64()
            ),
        }
    )


def q_top_supplier(sf_dir: str, q_start: str = "1997-01-01", q_end: str = "1997-04-01"):
    """TPC-H Q15 shape ("top supplier"): the supplier(s) with maximum
    exact integer net revenue over one quarter — ties all returned, as
    in the reference query's view+max formulation. Per-block
    (suppkey, net) Arrow partials → ONE ≤|supplier|-row groupby; the
    max+filter runs on that dimension-sized table. Returns
    (s_suppkey, total_micents)."""
    lo = np.datetime64(q_start, "us").astype(np.int64)
    hi = np.datetime64(q_end, "us").astype(np.int64)

    def _partial(b: pa.Table) -> pa.Table:
        ts = (
            b.column("l_shipdate")
            .cast(pa.timestamp("us"))
            .to_numpy(zero_copy_only=False)
            .view(np.int64)
        )
        sel = (ts >= lo) & (ts < hi)
        sk = b.column("l_suppkey").to_numpy(zero_copy_only=False)[sel]
        cents = np.floor(
            b.column("l_extendedprice").to_numpy(zero_copy_only=False)[sel] * 100
        ).astype(np.int64)
        pct = np.round(
            b.column("l_discount").to_numpy(zero_copy_only=False)[sel] * 100
        ).astype(np.int64)
        t = pa.table(
            {
                "s_suppkey": pa.array(sk, type=pa.int64()),
                "total_micents": pa.array(cents * (100 - pct), type=pa.int64()),
            }
        )
        out = t.group_by("s_suppkey").aggregate([("total_micents", "sum")])
        return out.rename_columns(["s_suppkey", "total_micents"])

    rev = (
        _read(
            sf_dir, "lineitem", ["l_suppkey", "l_shipdate", "l_extendedprice", "l_discount"]
        )
        .map_batches(_partial, batch_format="pyarrow")
        .groupby("s_suppkey")
        .aggregate(Sum("total_micents", alias_name="total_micents"))
        .to_pandas()
    )
    best = rev["total_micents"].max()
    out = rev[rev["total_micents"] == best]
    return pa.table(
        {
            "s_suppkey": pa.array(out["s_suppkey"].to_numpy(dtype=np.int64)),
            "total_micents": pa.array(out["total_micents"].to_numpy(dtype=np.int64)),
        }
    )


def q_important_parts(sf_dir: str):
    """TPC-H Q11 shape ("important stock identification", adapted to
    lineitem value): parts whose exact-cents extended-price mass
    exceeds 2× the mean part share — the scale-free integer predicate
    ``value·n_parts > 2·total`` needs no float threshold. Per-block
    (partkey, cents) partials → ONE ≤|part|-row groupby; the global
    total and the filter run on that dimension-sized table. Returns
    (l_partkey, value_cents)."""

    def _partial(b: pa.Table) -> pa.Table:
        t = pa.table(
            {
                "l_partkey": b.column("l_partkey"),
                "value_cents": pa.array(
                    np.floor(
                        b.column("l_extendedprice").to_numpy(zero_copy_only=False)
                        * 100
                    ).astype(np.int64)
                ),
            }
        )
        out = t.group_by("l_partkey").aggregate([("value_cents", "sum")])
        return out.rename_columns(["l_partkey", "value_cents"])

    v = (
        _read(sf_dir, "lineitem", ["l_partkey", "l_extendedprice"])
        .map_batches(_partial, batch_format="pyarrow")
        .groupby("l_partkey")
        .aggregate(Sum("value_cents", alias_name="value_cents"))
        .to_pandas()
    )
    tot = int(v["value_cents"].sum())
    n = len(v)
    out = v[v["value_cents"].to_numpy(dtype=np.int64) * n > 2 * tot]
    return pa.table(
        {
            "l_partkey": pa.array(out["l_partkey"].to_numpy(dtype=np.int64)),
            "value_cents": pa.array(out["value_cents"].to_numpy(dtype=np.int64)),
        }
    )


def q_parts_supplier_count(sf_dir: str):
    """TPC-H Q16 shape ("parts/supplier relationship"): distinct
    supplier count per (p_brand, p_type), excluding negative-balance
    suppliers. Distributed shape: per-block DISTINCT (partkey,
    suppkey) Arrow partials with the supplier blacklist applied
    map-side off a broadcast sorted array; part attributes fold to
    broadcast (brand_idx, type_idx) arrays so the pair rows map to a
    packed (brand, type, suppkey) key; ONE groupby dedups the triples
    and per-block (brand, type) count partials feed a tiny final sum.
    Returns (p_brand, p_type, supplier_cnt)."""
    import ray

    part = _read(sf_dir, "part", ["p_partkey", "p_brand", "p_type"]).to_pandas()
    po = np.argsort(part["p_partkey"].to_numpy())
    pk = part["p_partkey"].to_numpy(dtype=np.int64)[po]
    brands = sorted(part["p_brand"].unique().tolist())
    types = sorted(part["p_type"].unique().tolist())
    b2i = {b: i for i, b in enumerate(brands)}
    t2i = {t: i for i, t in enumerate(types)}
    bidx = part["p_brand"].map(b2i).to_numpy(dtype=np.int64)[po]
    tidx = part["p_type"].map(t2i).to_numpy(dtype=np.int64)[po]
    sup = _read(sf_dir, "supplier", ["s_suppkey", "s_acctbal"]).to_pandas()
    bad = np.sort(
        sup.loc[sup["s_acctbal"] < 0, "s_suppkey"].to_numpy(dtype=np.int64)
    )
    NT = len(types)
    SUPP_MULT = 1_000_000
    ref = ray.put((pk, bidx, tidx, bad))

    def _pairs(b: pa.Table) -> pa.Table:
        k, bi, ti, bad_ = ray.get(ref)
        lpk = b.column("l_partkey").to_numpy(zero_copy_only=False)
        lsk = b.column("l_suppkey").to_numpy(zero_copy_only=False)
        if len(bad_):
            pos = np.searchsorted(bad_, lsk)
            pos[pos >= len(bad_)] = 0
            keep = bad_[pos] != lsk
            lpk, lsk = lpk[keep], lsk[keep]
        p = np.searchsorted(k, lpk)  # referential integrity
        bt = bi[p] * NT + ti[p]
        key = bt * SUPP_MULT + lsk
        t = pa.table({"key": pa.array(key, type=pa.int64())})
        out = t.group_by("key").aggregate([])
        return out

    def _count_partial(b: pa.Table) -> pa.Table:
        key = b.column("key").to_numpy(zero_copy_only=False)
        bt = key // SUPP_MULT
        t = pa.table(
            {
                "bt": pa.array(bt, type=pa.int64()),
                "supplier_cnt": pa.array(np.ones(len(bt), dtype=np.int64)),
            }
        )
        out = t.group_by("bt").aggregate([("supplier_cnt", "sum")])
        return out.rename_columns(["bt", "supplier_cnt"])

    agg = (
        _read(sf_dir, "lineitem", ["l_partkey", "l_suppkey"])
        .map_batches(_pairs, batch_format="pyarrow")
        .groupby("key")
        .aggregate(Count(alias_name="n"))
        .map_batches(_count_partial, batch_format="pyarrow")
        .groupby("bt")
        .aggregate(Sum("supplier_cnt", alias_name="supplier_cnt"))
        .to_pandas()
    )
    bt = agg["bt"].to_numpy(dtype=np.int64)
    return pa.table(
        {
            "p_brand": pa.array(
                [brands[i] for i in (bt // NT).tolist()], type=pa.string()
            ),
            "p_type": pa.array(
                [types[i] for i in (bt % NT).tolist()], type=pa.string()
            ),
            "supplier_cnt": pa.array(
                agg["supplier_cnt"].to_numpy(dtype=np.int64), type=pa.int64()
            ),
        }
    )


def q_discounted_revenue(sf_dir: str):
    """TPC-H Q19 shape ("discounted revenue"): one-row exact integer
    sum over an OR-of-ANDs predicate spanning part attributes (brand,
    size — resolved MAP-SIDE off broadcast arrays) and lineitem
    attributes (quantity bands). No shuffle at all: per-block one-row
    partials are summed on the driver. Returns
    (n_items, revenue_micents)."""
    import ray

    part = _read(sf_dir, "part", ["p_partkey", "p_brand", "p_size"]).to_pandas()
    po = np.argsort(part["p_partkey"].to_numpy())
    pk = part["p_partkey"].to_numpy(dtype=np.int64)[po]
    brand = part["p_brand"].to_numpy()[po]
    size = part["p_size"].to_numpy(dtype=np.int64)[po]
    cases = (("Brand#3", 1, 5, 1, 11), ("Brand#13", 1, 10, 10, 20), ("Brand#23", 1, 15, 20, 30))
    ref = ray.put((pk, brand, size))

    def _partial(b: pa.Table) -> pa.Table:
        k, br, sz = ray.get(ref)
        lpk = b.column("l_partkey").to_numpy(zero_copy_only=False)
        qty = b.column("l_quantity").to_numpy(zero_copy_only=False)
        pos = np.searchsorted(k, lpk)  # referential integrity
        pbr, psz = br[pos], sz[pos]
        sel = np.zeros(len(lpk), dtype=bool)
        for cb, s0, s1, q0, q1 in cases:
            sel |= (pbr == cb) & (psz >= s0) & (psz <= s1) & (qty >= q0) & (qty <= q1)
        cents = np.floor(
            b.column("l_extendedprice").to_numpy(zero_copy_only=False)[sel] * 100
        ).astype(np.int64)
        pct = np.round(
            b.column("l_discount").to_numpy(zero_copy_only=False)[sel] * 100
        ).astype(np.int64)
        return pa.table(
            {
                "n_items": pa.array([int(sel.sum())], type=pa.int64()),
                "revenue_micents": pa.array(
                    [int((cents * (100 - pct)).sum())], type=pa.int64()
                ),
            }
        )

    parts = (
        _read(
            sf_dir,
            "lineitem",
            ["l_partkey", "l_quantity", "l_extendedprice", "l_discount"],
        )
        .map_batches(_partial, batch_format="pyarrow")
        .to_pandas()
    )
    return pa.table(
        {
            "n_items": pa.array([int(parts["n_items"].sum())], type=pa.int64()),
            "revenue_micents": pa.array(
                [int(parts["revenue_micents"].sum())], type=pa.int64()
            ),
        }
    )


def q_min_cost_supplier(sf_dir: str):
    """TPC-H Q2 shape ("minimum cost supplier", adapted: unit cost is
    the exact integer floor((cents·1000)/qty) over lineitems of each
    (part, supplier) pair — the schema has no ps_supplycost): per
    part, the cheapest supplier with min-suppkey tie-break. Per-block
    (pair, min unit) Arrow partials (min is associative, so map-side
    pre-reduction is exact) → ONE packed-pair groupby min → per-part
    argmin inside a second small groupby. Returns
    (p_partkey, s_suppkey, unit_millicents)."""
    SUPP_MULT = 1_000_000

    def _partial(b: pa.Table) -> pa.Table:
        pk = b.column("l_partkey").to_numpy(zero_copy_only=False)
        sk = b.column("l_suppkey").to_numpy(zero_copy_only=False)
        qty = b.column("l_quantity").to_numpy(zero_copy_only=False).astype(np.int64)
        cents = np.floor(
            b.column("l_extendedprice").to_numpy(zero_copy_only=False) * 100
        ).astype(np.int64)
        unit = (cents * 1000) // qty
        t = pa.table(
            {
                "pair": pa.array(pk * SUPP_MULT + sk, type=pa.int64()),
                "unit_millicents": pa.array(unit, type=pa.int64()),
            }
        )
        out = t.group_by("pair").aggregate([("unit_millicents", "min")])
        return out.rename_columns(["pair", "unit_millicents"])

    def _split(b: pa.Table) -> pa.Table:
        pair = b.column("pair").to_numpy(zero_copy_only=False)
        return pa.table(
            {
                "p_partkey": pa.array(pair // SUPP_MULT, type=pa.int64()),
                "s_suppkey": pa.array(pair % SUPP_MULT, type=pa.int64()),
                "unit_millicents": b.column("unit_millicents"),
            }
        )

    def _argmin(g: pa.Table) -> pa.Table:
        u = g.column("unit_millicents").to_numpy(zero_copy_only=False)
        sk = g.column("s_suppkey").to_numpy(zero_copy_only=False)
        i = np.lexsort((sk, u))[0]
        return g.take([int(i)])

    from ray.data.aggregate import Min

    return (
        _read(sf_dir, "lineitem", ["l_partkey", "l_suppkey", "l_quantity", "l_extendedprice"])
        .map_batches(_partial, batch_format="pyarrow")
        .groupby("pair")
        .aggregate(Min("unit_millicents", alias_name="unit_millicents"))
        .map_batches(_split, batch_format="pyarrow")
        .groupby("p_partkey")
        .map_groups(_argmin, batch_format="pyarrow")
    )


def q_promo_part_suppliers(sf_dir: str, year: str = "1997", min_qty: int = 50):
    """TPC-H Q20 shape ("potential part promotion"): suppliers that
    shipped more than ``min_qty`` units of PROMO-type parts in
    ``year``. The part filter resolves MAP-SIDE off a broadcast
    sorted-key boolean array; per-block (suppkey, qty) partials feed
    ONE ≤|supplier|-row groupby; the HAVING filter runs on that
    dimension-sized table. Returns (s_suppkey, total_qty)."""
    import ray

    lo = np.datetime64(f"{year}-01-01", "us").astype(np.int64)
    hi = np.datetime64(f"{int(year) + 1}-01-01", "us").astype(np.int64)
    part = _read(sf_dir, "part", ["p_partkey", "p_type"]).to_pandas()
    po = np.argsort(part["p_partkey"].to_numpy())
    pk = part["p_partkey"].to_numpy(dtype=np.int64)[po]
    promo = (part["p_type"].to_numpy() == "PROMO")[po]
    ref = ray.put((pk, promo))

    def _partial(b: pa.Table) -> pa.Table:
        k, isp = ray.get(ref)
        ts = (
            b.column("l_shipdate")
            .cast(pa.timestamp("us"))
            .to_numpy(zero_copy_only=False)
            .view(np.int64)
        )
        lpk = b.column("l_partkey").to_numpy(zero_copy_only=False)
        sel = (ts >= lo) & (ts < hi) & isp[np.searchsorted(k, lpk)]
        sk = b.column("l_suppkey").to_numpy(zero_copy_only=False)[sel]
        qty = b.column("l_quantity").to_numpy(zero_copy_only=False)[sel].astype(
            np.int64
        )
        t = pa.table(
            {
                "s_suppkey": pa.array(sk, type=pa.int64()),
                "total_qty": pa.array(qty, type=pa.int64()),
            }
        )
        out = t.group_by("s_suppkey").aggregate([("total_qty", "sum")])
        return out.rename_columns(["s_suppkey", "total_qty"])

    agg = (
        _read(sf_dir, "lineitem", ["l_partkey", "l_suppkey", "l_quantity", "l_shipdate"])
        .map_batches(_partial, batch_format="pyarrow")
        .groupby("s_suppkey")
        .aggregate(Sum("total_qty", alias_name="total_qty"))
        .to_pandas()
    )
    out = agg[agg["total_qty"] > min_qty]
    return pa.table(
        {
            "s_suppkey": pa.array(out["s_suppkey"].to_numpy(dtype=np.int64)),
            "total_qty": pa.array(out["total_qty"].to_numpy(dtype=np.int64)),
        }
    )


def q_attack_curve_coocc(sf_dir: str, ks=(0, 16, 64), rounds: int = 24):
    """Hub-attack robustness curve: component structure of the part
    co-occurrence graph after removing the top-k highest-degree
    vertices (degree desc, vid asc ties), for each k — the classic
    scale-free-network targeted-attack diagnostic (how fast the giant
    component shatters when hubs are taken out). Distributed shape:
    distinct pairs via ONE combiner-backed groupby; the degree table
    comes from per-block (vid, 1) partials; only the ≤max(k) hub list
    is collected and re-broadcast as a filter; one engine CC superstep
    run per k, capped at ``rounds`` on BOTH sides (a converged run
    makes the extra unrolled-SQL rounds no-ops). Returns
    (k, n_vertices, n_components, largest_size), all exact ints."""
    from ray.data.aggregate import Count, Max, Sum

    from .components import connected_components

    def _canon(b: pa.Table) -> pa.Table:
        return pa.table(
            {
                "u": pa.array(
                    b.column("src").to_numpy(zero_copy_only=False).astype(np.uint64),
                    type=pa.uint64(),
                ),
                "v": pa.array(
                    b.column("dst").to_numpy(zero_copy_only=False).astype(np.uint64),
                    type=pa.uint64(),
                ),
            }
        )

    pairs = (
        part_cooccurrence_edges(sf_dir)
        .map_batches(_canon, batch_format="pyarrow")
        .groupby(["u", "v"])
        .aggregate(Count(alias_name="w"))
        .materialize()
    )

    def _deg_partial(b: pa.Table) -> pa.Table:
        vid = np.concatenate(
            [
                b.column("u").to_numpy(zero_copy_only=False),
                b.column("v").to_numpy(zero_copy_only=False),
            ]
        ).astype(np.int64)
        t = pa.table(
            {
                "vid": pa.array(vid, type=pa.int64()),
                "d": pa.array(np.ones(len(vid), dtype=np.int64)),
            }
        )
        return (
            t.group_by("vid").aggregate([("d", "sum")]).rename_columns(["vid", "d"])
        )

    kmax = max(ks)
    hubs_all = np.array([], dtype=np.uint64)
    if kmax > 0:
        top = (
            pairs.map_batches(_deg_partial, batch_format="pyarrow")
            .groupby("vid")
            .aggregate(Sum("d", alias_name="d"))
            .sort(["d", "vid"], descending=[True, False])
            .limit(kmax)
            .to_pandas()
        )
        hubs_all = top["vid"].to_numpy(dtype=np.int64).astype(np.uint64)

    out_k, out_nv, out_nc, out_ls = [], [], [], []
    for k in ks:
        hub = np.sort(hubs_all[:k])

        def _flt(b: pa.Table, hub=hub) -> pa.Table:
            u = b.column("u").to_numpy(zero_copy_only=False)
            v = b.column("v").to_numpy(zero_copy_only=False)
            if len(hub):
                pu = np.searchsorted(hub, u)
                pu[pu >= len(hub)] = 0
                pv = np.searchsorted(hub, v)
                pv[pv >= len(hub)] = 0
                keep = (hub[pu] != u) & (hub[pv] != v)
            else:
                keep = np.ones(len(u), dtype=bool)
            return pa.table(
                {
                    "src": pa.array(u[keep], type=pa.uint64()),
                    "dst": pa.array(v[keep], type=pa.uint64()),
                }
            )

        edges_t = pairs.map_batches(_flt, batch_format="pyarrow")
        g = build_graph(edges_t, EngineConfig(num_partitions=16), directed=False)
        comp, _ = connected_components(g, _ckpt(f"atk{k}"), max_iters=rounds)
        sizes = comp.groupby("component").aggregate(Count(alias_name="n"))
        stats = sizes.aggregate(
            Count(alias_name="n_components"),
            Max("n", alias_name="largest"),
            Sum("n", alias_name="n_vertices"),
        )
        out_k.append(int(k))
        out_nv.append(int(stats["n_vertices"]))
        out_nc.append(int(stats["n_components"]))
        out_ls.append(int(stats["largest"]))
    return pa.table(
        {
            "k": pa.array(out_k, type=pa.int64()),
            "n_vertices": pa.array(out_nv, type=pa.int64()),
            "n_components": pa.array(out_nc, type=pa.int64()),
            "largest_size": pa.array(out_ls, type=pa.int64()),
        }
    )


def q_markov_prediction_accuracy(sf_dir: str):
    """Next-event prediction eval: train the first-order Markov
    transition matrix over per-user event sequences, predict each
    source type's modal successor (count desc, type asc ties), and
    score the prediction over the SAME transition instances — the
    standard majority-baseline sequence-model eval. The whole readout
    derives from the tiny (≤|types|²) transition-count table, so the
    only distributed work is the per-user pair extraction already
    used by q_event_transitions. Returns one row
    (n_transitions, correct, accuracy)."""
    from collections import Counter

    from ray.data.aggregate import Sum

    def _trans(group: pa.Table) -> pa.Table:
        uid = group.column("user_id").to_numpy(zero_copy_only=False)
        ts = (
            group.column("ts")
            .cast(pa.timestamp("us"))
            .to_numpy(zero_copy_only=False)
            .astype("datetime64[us]")
            .view(np.int64)
        )
        eid = group.column("event_id").to_numpy(zero_copy_only=False)
        et = np.asarray(group.column("event_type").to_pylist(), dtype=object)
        srt = np.lexsort((eid, ts, uid))
        uid, et = uid[srt], et[srt]
        same_user = uid[1:] == uid[:-1]
        c: Counter = Counter(
            zip(et[:-1][same_user].tolist(), et[1:][same_user].tolist())
        )
        return pa.table(
            {
                "src_type": pa.array([k[0] for k in c], type=pa.string()),
                "dst_type": pa.array([k[1] for k in c], type=pa.string()),
                "n": pa.array(list(c.values()), type=pa.int64()),
            }
        )

    tr = (
        _events_by_part(sf_dir, extra_cols=("event_type",))
        .groupby("part")
        .map_groups(_trans, batch_format="pyarrow")
        .groupby(["src_type", "dst_type"])
        .aggregate(Sum("n", alias_name="n"))
        .to_pandas()
    )
    pred: dict = {}
    for src, grp in tr.groupby("src_type"):
        g = grp.sort_values(["n", "dst_type"], ascending=[False, True])
        pred[src] = g.iloc[0]["dst_type"]
    n_total = int(tr["n"].sum())
    correct = int(
        tr[tr.apply(lambda r: pred[r["src_type"]] == r["dst_type"], axis=1)]["n"].sum()
    )
    return pa.table(
        {
            "n_transitions": pa.array([n_total], type=pa.int64()),
            "correct": pa.array([correct], type=pa.int64()),
            "accuracy": pa.array(
                [float(correct) / float(n_total)], type=pa.float64()
            ),
        }
    )


def q_rfm_segments(sf_dir: str):
    """Customer RFM segmentation: per customer, last order date
    (recency), order count (frequency) and exact-cents total spend
    (monetary), each quartile-bucketed (quantile_disc thresholds,
    bucket 0–3 ascending) into the classic 3-digit RFM code. One
    ≤|customer|-row groupby builds the per-customer table; the three
    quartile threshold sets come from the bounded-domain exact
    percentile machinery and are broadcast; bucketing is a vectorized
    map. Returns (c_custkey, last_odate_days, n_orders, total_cents,
    rfm_code)."""
    from ray.data.aggregate import Count, Max, Sum

    from ..functions.stats import exact_percentiles

    def _partial(b: pa.Table) -> pa.Table:
        ts = (
            b.column("o_orderdate")
            .cast(pa.timestamp("us"))
            .to_numpy(zero_copy_only=False)
            .view(np.int64)
        )
        return pa.table(
            {
                "c_custkey": b.column("o_custkey").cast(pa.int64()),
                "odate_days": pa.array(ts // 86_400_000_000, type=pa.int64()),
                "cents": pa.array(
                    np.floor(
                        b.column("o_totalprice").to_numpy(zero_copy_only=False) * 100
                    ).astype(np.int64),
                    type=pa.int64(),
                ),
                "one": pa.array(np.ones(b.num_rows, dtype=np.int64)),
            }
        )

    per = (
        _read(sf_dir, "orders", ["o_custkey", "o_orderdate", "o_totalprice"])
        .map_batches(_partial, batch_format="pyarrow")
        .groupby("c_custkey")
        .aggregate(
            Max("odate_days", alias_name="last_odate_days"),
            Sum("one", alias_name="n_orders"),
            Sum("cents", alias_name="total_cents"),
        )
        .materialize()
    )
    qs = [0.25, 0.5, 0.75]
    thr = {
        col: exact_percentiles(per, col, qs).to_pandas()["value"].to_numpy(
            dtype=np.int64
        )
        for col in ("last_odate_days", "n_orders", "total_cents")
    }

    def _bucket(x: np.ndarray, t: np.ndarray) -> np.ndarray:
        return (
            (x > t[0]).astype(np.int64)
            + (x > t[1]).astype(np.int64)
            + (x > t[2]).astype(np.int64)
        )

    def _code(b: pa.Table) -> pa.Table:
        r = _bucket(
            b.column("last_odate_days").to_numpy(zero_copy_only=False),
            thr["last_odate_days"],
        )
        f = _bucket(
            b.column("n_orders").to_numpy(zero_copy_only=False), thr["n_orders"]
        )
        m = _bucket(
            b.column("total_cents").to_numpy(zero_copy_only=False),
            thr["total_cents"],
        )
        return pa.table(
            {
                "c_custkey": b.column("c_custkey"),
                "last_odate_days": b.column("last_odate_days"),
                "n_orders": b.column("n_orders"),
                "total_cents": b.column("total_cents"),
                "rfm_code": pa.array(r * 100 + f * 10 + m, type=pa.int64()),
            }
        )

    return per.map_batches(_code, batch_format="pyarrow")


def q_sole_late_supplier(sf_dir: str, late_days: int = 90, P: int = 32):
    """TPC-H Q21 shape ("suppliers who kept orders waiting"): among
    finished ('F') multi-supplier orders, count per supplier the
    orders where that supplier was the ONLY one to ship later than
    ``late_days`` after the order date (the reference query's
    EXISTS + NOT-EXISTS pair, folded to per-order distinct/late
    supplier counts). Distributed shape: per-block
    (okey, suppkey, max_ts) Arrow partials and the filtered orders
    side are tagged into one superset schema and co-located by ONE
    ``groupby(okey % P)``; inside each partition the join, the
    (okey, suppkey) combine and the sole-late-supplier selection are
    all vectorized reduceat group passes, and only (s_suppkey, 1)
    partials leave for a ≤|supplier|-row final sum. Supplier names
    attach from a broadcast sorted-array lookup (small side never
    shuffles the fact table). Returns (s_suppkey, s_name, numwait)."""
    import ray

    late_us = np.int64(late_days) * np.int64(86_400) * np.int64(1_000_000)

    def _li_partial(b: pa.Table) -> pa.Table:
        t = pa.table(
            {
                "okey": b.column("l_orderkey"),
                "skey": b.column("l_suppkey"),
                "ts": pa.array(
                    b.column("l_shipdate")
                    .cast(pa.timestamp("us"))
                    .to_numpy(zero_copy_only=False)
                    .view(np.int64)
                ),
            }
        )
        out = t.group_by(["okey", "skey"]).aggregate([("ts", "max")])
        out = out.rename_columns(["okey", "skey", "max_ts"])
        ok = out.column("okey").to_numpy(zero_copy_only=False)
        return pa.table(
            {
                "part": pa.array(ok % P, type=pa.int64()),
                "okey": out.column("okey").cast(pa.int64()),
                "skey": out.column("skey").cast(pa.int64()),
                "max_ts": out.column("max_ts").cast(pa.int64()),
                "o_ts": pa.nulls(out.num_rows, type=pa.int64()),
            }
        )

    def _orders_f(b: pa.Table) -> pa.Table:
        st = b.column("o_orderstatus").to_numpy(zero_copy_only=False)
        keep = st == "F"
        b = b.filter(pa.array(keep))
        ok = b.column("o_orderkey").to_numpy(zero_copy_only=False)
        return pa.table(
            {
                "part": pa.array(ok % P, type=pa.int64()),
                "okey": pa.array(ok, type=pa.int64()),
                "skey": pa.nulls(b.num_rows, type=pa.int64()),
                "max_ts": pa.nulls(b.num_rows, type=pa.int64()),
                "o_ts": pa.array(
                    b.column("o_orderdate")
                    .cast(pa.timestamp("us"))
                    .to_numpy(zero_copy_only=False)
                    .view(np.int64)
                ),
            }
        )

    both = (
        _read(sf_dir, "lineitem", ["l_orderkey", "l_suppkey", "l_shipdate"])
        .map_batches(_li_partial, batch_format="pyarrow")
        .union(
            _read(
                sf_dir, "orders", ["o_orderkey", "o_orderstatus", "o_orderdate"]
            ).map_batches(_orders_f, batch_format="pyarrow")
        )
    )

    def _merge(g: pa.Table) -> pa.Table:
        is_order = g.column("skey").is_null().to_numpy(zero_copy_only=False)
        empty = pa.table(
            {"s_suppkey": pa.array([], type=pa.int64()), "n": pa.array([], type=pa.int64())}
        )
        o_ok = g.column("okey").to_numpy(zero_copy_only=False)[is_order]
        if len(o_ok) == 0:
            return empty
        o_ts = g.column("o_ts").to_numpy(zero_copy_only=False)[is_order]
        os_ = np.argsort(o_ok, kind="stable")
        o_ok, o_ts = o_ok[os_], o_ts[os_]
        l_ok = g.column("okey").to_numpy(zero_copy_only=False)[~is_order]
        if len(l_ok) == 0:
            return empty
        l_sk = g.column("skey").to_numpy(zero_copy_only=False)[~is_order]
        l_ts = g.column("max_ts").to_numpy(zero_copy_only=False)[~is_order]
        # inner join lineitem partials → their 'F' order's date
        pos = np.searchsorted(o_ok, l_ok)
        inb = pos < len(o_ok)
        hit = np.zeros(len(l_ok), dtype=bool)
        hit[inb] = o_ok[pos[inb]] == l_ok[inb]
        l_ok, l_sk, l_ts, pos = l_ok[hit], l_sk[hit], l_ts[hit], pos[hit]
        if len(l_ok) == 0:
            return empty
        late_row = l_ts > o_ts[pos] + late_us
        # combine block partials: per (okey, skey) any-late
        srt = np.lexsort((l_sk, l_ok))
        ok_s, sk_s, late_s = l_ok[srt], l_sk[srt], late_row[srt]
        new_pair = np.concatenate(
            ([True], (ok_s[1:] != ok_s[:-1]) | (sk_s[1:] != sk_s[:-1]))
        )
        starts = np.flatnonzero(new_pair)
        p_ok, p_sk = ok_s[starts], sk_s[starts]
        p_late = np.maximum.reduceat(late_s.astype(np.int64), starts)
        # per okey over the reduced (okey, suppkey) rows
        o_new = np.concatenate(([True], p_ok[1:] != p_ok[:-1]))
        o_starts = np.flatnonzero(o_new)
        n_supp = np.diff(np.append(o_starts, len(p_ok)))
        n_late = np.add.reduceat(p_late, o_starts)
        sk_late_sum = np.add.reduceat(p_sk * p_late, o_starts)
        sole = (n_supp >= 2) & (n_late == 1)
        waits = sk_late_sum[sole]  # == the single late suppkey
        if len(waits) == 0:
            return empty
        t = pa.table(
            {
                "s_suppkey": pa.array(waits, type=pa.int64()),
                "n": pa.array(np.ones(len(waits), dtype=np.int64)),
            }
        )
        return t.group_by("s_suppkey").aggregate([("n", "sum")]).rename_columns(
            ["s_suppkey", "n"]
        )

    counts = (
        both.groupby("part")
        .map_groups(_merge, batch_format="pyarrow")
        .groupby("s_suppkey")
        .aggregate(Sum("n", alias_name="numwait"))
    )

    # broadcast the supplier-name dimension (sorted-array lookup)
    sup = _read(sf_dir, "supplier", ["s_suppkey", "s_name"])
    sk_parts, nm_parts = [], []
    for b in sup.iter_batches(batch_size=None, batch_format="pyarrow"):
        sk_parts.append(b.column("s_suppkey").to_numpy(zero_copy_only=False))
        nm_parts.append(b.column("s_name").to_numpy(zero_copy_only=False))
    sk = np.concatenate(sk_parts)
    nm = np.concatenate(nm_parts).astype(str)
    srt = np.argsort(sk, kind="stable")
    ref = ray.put((sk[srt], nm[srt]))

    def _attach(b: pa.Table) -> pa.Table:
        sk_sorted, nm_sorted = ray.get(ref)
        k = b.column("s_suppkey").to_numpy(zero_copy_only=False)
        return pa.table(
            {
                "s_suppkey": pa.array(k, type=pa.int64()),
                "s_name": pa.array(nm_sorted[np.searchsorted(sk_sorted, k)]),
                "numwait": b.column("numwait").cast(pa.int64()),
            }
        )

    return counts.map_batches(_attach, batch_format="pyarrow")


def q_katz_coocc(sf_dir: str, alpha: float = 0.005, k: int = 6):
    """Truncated Katz centrality over the part co-occurrence graph
    (x ← 1 + α·A·x, k fixed supersteps — the damped path-count
    analogue of ``random_walk_kernel``'s undamped powers), SQL-oracled
    via the unrolled recurrence. Returns (vid, katz_r9)."""
    from .diffusion import katz_centrality

    g = _coocc_graph(sf_dir)
    out, _ = katz_centrality(g, _ckpt("katz"), alpha=alpha, k=k)

    def _shape(batch: pa.Table) -> pa.Table:
        # state is [p, acc]; the Katz value is the acc column (index 1)
        acc = pc.list_element(batch.column("value"), 1)
        return pa.table(
            {
                "vid": batch.column("vid").cast(pa.int64()),
                "katz_r9": pc.round(acc, ndigits=9),
            }
        )

    return out.map_batches(_shape, batch_format="pyarrow")


def q_effective_resistance_coocc(
    sf_dir: str, k: int = 12, src: int = 2, ground: int = 1
):
    """Grounded-Laplacian potential solve over the part co-occurrence
    graph — the electrical-network view of the diffusion kernels
    (reference: the same L-solve the heat/DSD family approximates;
    Doyle & Snell random-walk/electrical duality): inject unit current
    at ``src``, ground ``ground``, and run k Jacobi sweeps of

        x ← (b + A·x) / d   off the ground,   x(ground) = 0,

    b = e_src. x(src) after convergence IS the effective resistance
    R_eff(src, ground); truncation at fixed k keeps the run
    SQL-replayable (same integrator-as-callback pattern as
    q_hitting_time_coocc — ``normalize=False`` raw A·x gather plus a
    custom apply_fn). ROUND 9 absorbs summation-order ulps.
    Returns (vid, pot_r9) — the full potential landscape."""
    from ..state.superstep import run_supersteps, state_vertex_dataset

    g = _coocc_graph(sf_dir)
    s_u64, g_u64 = np.uint64(src), np.uint64(ground)

    def init_fn(csr):
        return np.zeros(len(csr["vids"]), dtype=np.float64)

    def apply_fn(acc, old, T, dm, csr):
        deg = csr["deg"].astype(np.float64)
        b = (csr["vids"] == s_u64).astype(np.float64)
        x = np.divide(b + acc, deg, out=np.zeros_like(acc), where=deg > 0)
        x[csr["vids"] == g_u64] = 0.0
        return x

    s = run_supersteps(
        g,
        _ckpt("effres"),
        "sum",
        init_fn,
        tol=0.0,
        max_iters=k,
        normalize=False,
        apply_fn=apply_fn,
    )
    out = state_vertex_dataset(g, s["final_iter_dir"], "x")

    def _round(b: pa.Table) -> pa.Table:
        return pa.table(
            {
                "vid": b.column("vid").cast(pa.int64()),
                "pot_r9": pc.round(b.column("x"), ndigits=9),
            }
        )

    return out.map_batches(_round, batch_format="pyarrow")


def q_clique_percolation_coocc(sf_dir: str):
    """k=3 clique-percolation communities (Palla et al. 2005) over the
    part co-occurrence graph: two triangles are in one community iff
    they are linked by a chain of edge-sharing triangles — equivalently
    the communities are the connected components of the TRIANGLE
    EDGE-GRAPH (vertices = graph edges that sit in ≥1 triangle, edges =
    same-triangle co-membership). Plan: the triangle pipeline's
    two-exchange enumeration (``triangle_triples`` — orientation
    map-side, closure partition-local) → per-triangle derived edge-graph
    rows (edge id = u·2³² + v, u < v — vids here are partkeys ≪ 2³¹ so
    the pack is exact BIGINT) → the engine's own min-label CC supersteps
    over the derived graph. Returns (u, v, community) per in-triangle
    edge, community = min edge-id in the component."""
    from .triangles import triangle_triples

    g = _coocc_graph(sf_dir)
    tri = triangle_triples(g)
    S = np.uint64(1 << 32)

    def _edge_graph(b: pa.Table) -> pa.Table:
        x = b.column("x").to_numpy(zero_copy_only=False).astype(np.uint64, copy=False)
        y = b.column("y").to_numpy(zero_copy_only=False).astype(np.uint64, copy=False)
        z = b.column("z").to_numpy(zero_copy_only=False).astype(np.uint64, copy=False)
        e1, e2, e3 = x * S + y, x * S + z, y * S + z
        return pa.table(
            {
                "src": pa.array(np.concatenate([e1, e1, e2]), type=pa.uint64()),
                "dst": pa.array(np.concatenate([e2, e3, e3]), type=pa.uint64()),
            }
        )

    edges = tri.map_batches(_edge_graph, batch_format="pyarrow")
    g2 = build_graph(edges, EngineConfig(num_partitions=16), directed=False)
    comp, summary = connected_components(g2, _ckpt("cperc"))
    # The SQL oracle unrolls min-label propagation a FIXED 16 rounds;
    # the engine runs to fixpoint. Enforce (don't assume) the oracle's
    # truncation bound so a deeper edge-graph fails loudly here rather
    # than as a silent parity divergence.
    if summary["iterations"] > 16:
        raise RuntimeError(
            f"clique_percolation edge-graph needed {summary['iterations']} "
            "CC rounds > the oracle's 16 unrolled rounds; raise `rounds` in "
            "oracles.sql.clique_percolation_coocc_sql to match"
        )

    def _decode(b: pa.Table) -> pa.Table:
        vid = b.column("vid").to_numpy(zero_copy_only=False).astype(np.uint64, copy=False)
        lab = b.column("component").to_numpy(zero_copy_only=False).astype(np.uint64, copy=False)
        return pa.table(
            {
                "u": pa.array((vid >> np.uint64(32)).astype(np.int64)),
                "v": pa.array((vid & np.uint64(0xFFFFFFFF)).astype(np.int64)),
                "community": pa.array(lab.astype(np.int64)),
            }
        )

    return comp.map_batches(_decode, batch_format="pyarrow")


def q_onion_layers_coocc(sf_dir: str, rounds: int = 16):
    """Truncated onion decomposition of the part co-occurrence graph
    (outer ``rounds`` shells; survivors get layer = k = −1). The k at
    removal equals the vertex's coreness — pytest cross-checks against
    the h-index pipeline. See pipelines/densest.onion_layers for the
    raw-task global-min-per-round plan. Returns (vid, layer, k)."""
    from .densest import onion_layers

    g = _coocc_graph(sf_dir)
    return onion_layers(g, max_rounds=rounds)


def q_rich_club_coocc(sf_dir: str, ks=(64, 90, 105, 120, 150)):
    """Rich-club coefficient φ(k) (Colizza et al., Nat. Phys. 2006) of
    the co-occurrence graph: among the N_k vertices with degree > k,
    φ(k) = 2·E_k / (N_k·(N_k−1)) where E_k counts edges with BOTH
    endpoints above k. Scale shape: ONE map pass over CSR shards — each
    shard already holds its vertices' adjacency and degrees; neighbor
    degrees come from the broadcast per-partition degree index (16
    B/vertex, the triangle-orientation pattern); u<v dedups the
    symmetrized edge. The shuffle is a len(ks)-row groupby. Returns
    (k, n_k, e_k, phi_r6) — SQL-oracled."""
    import ray

    from .triangles import _degree_index

    g = _coocc_graph(sf_dir)
    refs = g.refs
    deg_refs = _degree_index(g)
    P = g.num_partitions
    ks_arr = np.asarray(sorted(ks), dtype=np.int64)

    def _partials(batch: pa.Table) -> pa.Table:
        k_out, n_out, e_out = [], [], []
        for p in batch.column("part").to_numpy(zero_copy_only=False):
            csr = ray.get(refs[int(p)])
            vids, deg, v = csr["vids"], csr["deg"].astype(np.int64), csr["indices"]
            u_row = np.repeat(np.arange(len(vids), dtype=np.int64), deg)
            u, du = vids[u_row], deg[u_row]
            dv = np.empty(len(v), dtype=np.int64)
            vpart = (v % np.uint64(P)).astype(np.int64)
            for q in np.unique(vpart):
                sel = vpart == q
                dq = ray.get(deg_refs[int(q)])
                dv[sel] = dq["deg"][np.searchsorted(dq["vids"], v[sel])]
            once = u < v  # symmetrized CSR holds each edge twice
            for k in ks_arr:
                k_out.append(int(k))
                n_out.append(int((deg > k).sum()))
                e_out.append(int((once & (du > k) & (dv > k)).sum()))
        return pa.table(
            {
                "k": pa.array(k_out, type=pa.int64()),
                "n": pa.array(n_out, type=pa.int64()),
                "e": pa.array(e_out, type=pa.int64()),
            }
        )

    agg = (
        parts_dataset(g.parts)
        .map_batches(_partials, batch_format="pyarrow", batch_size=1)
        .groupby("k")
        .aggregate(Sum("n", alias_name="n_k"), Sum("e", alias_name="e_k"))
    )

    def _phi(batch: pa.Table) -> pa.Table:
        n = batch.column("n_k").to_numpy(zero_copy_only=False).astype(np.int64)
        e = batch.column("e_k").to_numpy(zero_copy_only=False).astype(np.int64)
        denom = np.maximum(n * (n - 1.0), 1.0)  # avoid 0/0 on the n<2 arm
        phi = np.where(n < 2, 0.0, np.round(2.0 * e / denom, 6))
        return pa.table(
            {
                "k": batch.column("k"),
                "n_k": pa.array(n, type=pa.int64()),
                "e_k": pa.array(e, type=pa.int64()),
                "phi_r6": pa.array(phi, type=pa.float64()),
            }
        )

    return agg.map_batches(_phi, batch_format="pyarrow")
