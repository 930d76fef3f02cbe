"""Closed-walk spectral moments vs dense numpy traces on small graphs."""

import numpy as np
import pyarrow as pa
import ray.data as rd

from efficient_graph_algorithms_ray.config import EngineConfig
from efficient_graph_algorithms_ray.pipelines.graph_build import build_graph
from efficient_graph_algorithms_ray.pipelines.linkpred import spectral_moments


def _moments(pairs, num_partitions=4):
    u = np.array([p[0] for p in pairs], dtype=np.uint64)
    v = np.array([p[1] for p in pairs], dtype=np.uint64)
    edges = rd.from_arrow(pa.table({"src": pa.array(u), "dst": pa.array(v)}))
    g = build_graph(edges, EngineConfig(num_partitions=num_partitions), directed=False)
    return spectral_moments(g).to_pandas().iloc[0]


def _dense(pairs):
    vids = sorted({x for p in pairs for x in p})
    idx = {v: i for i, v in enumerate(vids)}
    A = np.zeros((len(vids), len(vids)), dtype=np.int64)
    for a, b in pairs:
        A[idx[a], idx[b]] = A[idx[b], idx[a]] = 1
    A2 = A @ A
    A4 = A2 @ A2
    deg = A.sum(1)
    return {
        "m": int(A.sum()) // 2,
        "sum_deg_sq": int((deg * deg).sum()),
        "closed_4walks": int(np.trace(A4)),
    }


def test_square_has_one_rectangle():
    row = _moments([(1, 2), (2, 3), (3, 4), (4, 1)])
    assert int(row["c4"]) == 1
    assert int(row["m"]) == 4
    assert int(row["closed_4walks"]) == 32  # eigenvalues ±2, 0, 0


def test_k4_has_three_rectangles():
    row = _moments([(1, 2), (1, 3), (1, 4), (2, 3), (2, 4), (3, 4)])
    assert int(row["c4"]) == 3
    assert int(row["wedges"]) == 12  # 4 vertices x C(3,2)


def test_random_graph_matches_dense_traces():
    rng = np.random.default_rng(11)
    n = 40
    pairs = [
        (a, b)
        for a in range(1, n + 1)
        for b in range(a + 1, n + 1)
        if rng.random() < 0.12
    ]
    row = _moments(pairs, num_partitions=8)
    ref = _dense(pairs)
    assert int(row["m"]) == ref["m"]
    assert int(row["sum_deg_sq"]) == ref["sum_deg_sq"]
    assert int(row["closed_4walks"]) == ref["closed_4walks"]
    # rectangle identity holds with integer division exact
    assert (ref["closed_4walks"] - 2 * ref["sum_deg_sq"] + 2 * ref["m"]) % 8 == 0
