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


def test_clustering_coefficient_path_and_triangle(tmp_path):
    """Path endpoints (deg 1 → cc 0 by guard) + a closed triangle (cc 1)."""
    import pyarrow as pa
    import ray.data as rd

    from efficient_graph_algorithms_ray.pipelines.triangles import clustering_coefficient

    names = [f"x{i}" for i in range(6)]
    vids = hash_to_vid(names)
    # path 0-1-2  +  triangle 3-4-5
    pairs = [(0, 1), (1, 2), (3, 4), (4, 5), (3, 5)]
    src = np.array([vids[a] for a, b in pairs], dtype=np.uint64)
    dst = np.array([vids[b] for a, b in pairs], dtype=np.uint64)
    ds = rd.from_arrow(pa.table(
        {"src": pa.array(src, type=pa.uint64()), "dst": pa.array(dst, type=pa.uint64())}
    ))
    g = build_graph(ds, EngineConfig(num_partitions=4), directed=False)
    df = clustering_coefficient(g).to_pandas().set_index("vid")
    # endpoints of the path: deg 1 → guard gives 0; middle: deg 2, no triangle → 0
    assert df.loc[vids[0], "cc_ppm"] == 0 and df.loc[vids[0], "deg"] == 1
    assert df.loc[vids[1], "cc_ppm"] == 0 and df.loc[vids[1], "deg"] == 2
    # triangle vertices: cc = 1.0 → 1_000_000 ppm
    for i in (3, 4, 5):
        assert df.loc[vids[i], "cc_ppm"] == 1_000_000
        assert df.loc[vids[i], "triangles"] == 1
