"""Minimum spanning forest (Borůvka) vs Kruskal oracle — exact."""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray.data as rd

from efficient_graph_algorithms_ray.config import EngineConfig
from efficient_graph_algorithms_ray.oracles.numpy_graph import msf_oracle
from efficient_graph_algorithms_ray.pipelines.graph_build import build_graph
from efficient_graph_algorithms_ray.pipelines.mst import minimum_spanning_forest
from efficient_graph_algorithms_ray.stages.hashing import hash_to_vid


def _edges_ds(src, dst, w=None):
    cols = {
        "src": pa.array(src, type=pa.uint64()),
        "dst": pa.array(dst, type=pa.uint64()),
    }
    if w is not None:
        cols["w"] = pa.array(w, type=pa.float64())
    return rd.from_arrow(pa.table(cols))


def _check(src, dst, w=None, P=5):
    g = build_graph(_edges_ds(src, dst, w), EngineConfig(num_partitions=P), directed=False)
    edges, s = minimum_spanning_forest(g)
    df = edges.to_pandas().sort_values(["a", "b"]).reset_index(drop=True)
    oa, ob, ow = msf_oracle(src, dst, w)
    oo = np.lexsort((ob, oa))
    assert np.array_equal(df["a"].to_numpy().astype(np.uint64), oa[oo]), "edge set mismatch"
    assert np.array_equal(df["b"].to_numpy().astype(np.uint64), ob[oo])
    assert np.allclose(df["w"].to_numpy(), ow[oo])
    assert abs(s["total_weight"] - ow.sum()) < 1e-9
    return s


def test_msf_weighted_random_graph():
    rng = np.random.Generator(np.random.Philox(key=[31, 0]))
    n = 120
    mask = np.triu(rng.random((n, n)) < 0.08, 1)
    si, di = np.nonzero(mask)
    vids = hash_to_vid([f"m{i}" for i in range(n)])
    w = np.round(rng.random(len(si)) * 10, 3)
    s = _check(vids[si], vids[di], w)
    assert s["rounds"] <= 8  # Borůvka halves components per round


def test_msf_unit_weights_spanning_tree_size():
    """Connected unweighted graph → exactly V-1 edges (a spanning tree)."""
    n = 40
    vids = hash_to_vid([f"c{i}" for i in range(n)])
    src = np.concatenate([vids[:-1], vids[: n // 2]])
    dst = np.concatenate([vids[1:], vids[n // 2 :]])
    s = _check(src, dst)
    assert s["n_edges"] == n - 1


def test_msf_disconnected_forest():
    """Two components → V - 2 edges total."""
    a = hash_to_vid([f"x{i}" for i in range(10)])
    b = hash_to_vid([f"y{i}" for i in range(7)])
    src = np.concatenate([a[:-1], b[:-1]])
    dst = np.concatenate([a[1:], b[1:]])
    rng = np.random.Generator(np.random.Philox(key=[7, 1]))
    w = np.round(rng.random(len(src)) * 3, 3)
    s = _check(src, dst, w, P=3)
    assert s["n_edges"] == 15  # (10-1) + (7-1)


def test_msf_chain_graph_deep_pointer_jumping():
    """Path graph with strictly increasing weights: every component
    hooks to its left neighbor, so round 0 merges the WHOLE chain via
    one hook chain of depth n — the pointer-doubling fixpoint loop
    (not the per-round halving) must do the contraction work."""
    n = 400
    vids = hash_to_vid([f"chain{i}" for i in range(n)])
    src, dst = vids[:-1], vids[1:]
    w = (np.arange(1, n) / 7.0).round(6)
    s = _check(src, dst, w, P=6)
    assert s["n_edges"] == n - 1
    assert s["rounds"] == 1  # one Borůvka round collapses the chain
    assert s["history"][0]["jumps"] >= 6  # log2(depth) doubling steps
