"""Coarsening contraction: exact quotient on a hand graph + invariants."""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray.data as rd

from efficient_graph_algorithms_ray.pipelines.coarsen import coarsen_by_matching


def _ds(rows, cols, types):
    arrs = {c: pa.array(np.array([r[i] for r in rows], dtype=t), type=pt)
            for i, (c, (t, pt)) in enumerate(zip(cols, types))}
    return rd.from_arrow(pa.table(arrs))


U64 = (np.uint64, pa.uint64())
I64 = (np.int64, pa.int64())


def test_hand_contraction(ray_session):
    # path 1-2-3-4 with weights; matching = {(1,2), (3,4)}
    edges = _ds([(1, 2, 5), (2, 3, 7), (3, 4, 1)], ["u", "v", "w"], [U64, U64, I64])
    matching = _ds([(1, 2), (3, 4)], ["u", "v"], [U64, U64])
    out = coarsen_by_matching(edges, matching, num_partitions=4).to_pandas()
    out = out.sort_values(["u", "v"]).reset_index(drop=True)
    # (1,2)→1, (3,4)→3: edge (1,2) is a self-loop (dropped); (2,3)→(1,3) w=7
    assert len(out) == 1
    assert (int(out.u[0]), int(out.v[0]), int(out.w[0])) == (1, 3, 7)


def test_parallel_edges_sum(ray_session):
    # square 1-2-3-4-1; matching {(1,2),(3,4)} → both cross edges merge
    edges = _ds(
        [(1, 2, 1), (2, 3, 10), (3, 4, 1), (1, 4, 100)],
        ["u", "v", "w"], [U64, U64, I64],
    )
    matching = _ds([(1, 2), (3, 4)], ["u", "v"], [U64, U64])
    out = coarsen_by_matching(edges, matching, num_partitions=4).to_pandas()
    assert len(out) == 1
    assert (int(out.u[0]), int(out.v[0]), int(out.w[0])) == (1, 3, 110)


def test_unmatched_vertices_survive(ray_session):
    # star around 9 with no matching rows → graph unchanged
    edges = _ds([(1, 9, 2), (2, 9, 3)], ["u", "v", "w"], [U64, U64, I64])
    matching = _ds([], ["u", "v"], [U64, U64])
    out = coarsen_by_matching(edges, matching, num_partitions=4).to_pandas()
    out = out.sort_values(["u", "v"]).reset_index(drop=True)
    assert [(int(r.u), int(r.v), int(r.w)) for r in out.itertuples()] == [
        (1, 9, 2), (2, 9, 3)
    ]


def test_weight_conservation(ray_session):
    # total quotient weight = total weight − weights absorbed as self-loops
    rng = np.random.default_rng(3)
    n = 30
    pairs = sorted({(int(a), int(b)) for a, b in rng.integers(0, n, (120, 2)) if a < b})
    ws = rng.integers(1, 9, len(pairs))
    edges = _ds([(u, v, int(w)) for (u, v), w in zip(pairs, ws)],
                ["u", "v", "w"], [U64, U64, I64])
    matching = _ds([(0, 1), (2, 3), (10, 11)], ["u", "v"], [U64, U64])
    out = coarsen_by_matching(edges, matching, num_partitions=4).to_pandas()
    absorbed = sum(
        int(w) for (u, v), w in zip(pairs, ws) if (u, v) in {(0, 1), (2, 3), (10, 11)}
    )
    assert int(out.w.sum()) == int(ws.sum()) - absorbed
