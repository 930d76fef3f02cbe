"""Triangle counts — exact vs ((A@A)*A).sum/2 dense oracle."""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray.data as rd

from efficient_graph_algorithms_ray.config import EngineConfig
from efficient_graph_algorithms_ray.oracles.numpy_graph import triangles_oracle
from efficient_graph_algorithms_ray.pipelines.graph_build import build_graph
from efficient_graph_algorithms_ray.pipelines.triangles import (
    total_triangles,
    triangle_count,
)
from efficient_graph_algorithms_ray.stages.hashing import hash_to_vid


def _edges_ds(src, dst):
    return rd.from_arrow(
        pa.table(
            {
                "src": pa.array(src, type=pa.uint64()),
                "dst": pa.array(dst, type=pa.uint64()),
            }
        )
    )


def _check(src, dst, P=4):
    g = build_graph(_edges_ds(src, dst), EngineConfig(num_partitions=P), directed=False)
    df = triangle_count(g).to_pandas().sort_values("vid").reset_index(drop=True)
    ovids, otri = triangles_oracle(src, dst)
    assert np.array_equal(df["vid"].to_numpy().astype(np.uint64), ovids)
    assert np.array_equal(df["triangles"].to_numpy().astype(np.int64), otri)
    return g, df


def _name_edges(pairs):
    names = sorted({x for p in pairs for x in p})
    vid = dict(zip(names, hash_to_vid(names)))
    src = np.array([vid[a] for a, b in pairs], dtype=np.uint64)
    dst = np.array([vid[b] for a, b in pairs], dtype=np.uint64)
    return src, dst


def test_single_triangle():
    src, dst = _name_edges([("a", "b"), ("b", "c"), ("c", "a")])
    g, df = _check(src, dst)
    assert df["triangles"].tolist() == [1, 1, 1]


def test_k4():
    pairs = [("a", "b"), ("a", "c"), ("a", "d"), ("b", "c"), ("b", "d"), ("c", "d")]
    src, dst = _name_edges(pairs)
    g, df = _check(src, dst)
    assert df["triangles"].tolist() == [3, 3, 3, 3]
    assert total_triangles(triangle_count(g)) == 4


def test_wedge_only():
    src, dst = _name_edges([("a", "b"), ("b", "c")])
    _, df = _check(src, dst)
    assert df["triangles"].tolist() == [0, 0, 0]


def test_erdos_renyi_triangles():
    rng = np.random.Generator(np.random.Philox(key=[7, 0]))
    n = 80
    mask = np.triu(rng.random((n, n)) < 0.15, 1)
    si, di = np.nonzero(mask)
    vids = hash_to_vid([f"t{i}" for i in range(n)])
    _check(vids[si], vids[di], P=6)


def test_web_fixture_triangles(tiny_edges):
    src, dst = tiny_edges
    _check(src, dst, P=8)
