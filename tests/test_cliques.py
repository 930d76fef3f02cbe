"""4-clique counts — exact vs a dense brute-force oracle."""

from __future__ import annotations

from itertools import combinations

import numpy as np
import pyarrow as pa
import ray.data as rd

from efficient_graph_algorithms_ray.config import EngineConfig
from efficient_graph_algorithms_ray.pipelines.cliques import cliques4_count, total_cliques4
from efficient_graph_algorithms_ray.pipelines.graph_build import build_graph
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


def _cliques4_oracle(src, dst):
    """Brute force: per-vertex 4-clique participation over the edge set."""
    vids = np.unique(np.concatenate([src, dst]))
    idx = {v: i for i, v in enumerate(vids)}
    n = len(vids)
    adj = np.zeros((n, n), dtype=bool)
    for s, d in zip(src, dst):
        i, j = idx[s], idx[d]
        if i != j:
            adj[i, j] = adj[j, i] = True
    cnt = np.zeros(n, dtype=np.int64)
    for quad in combinations(range(n), 4):
        if all(adj[x, y] for x, y in combinations(quad, 2)):
            for x in quad:
                cnt[x] += 1
    return vids, cnt


def _check(src, dst, P=4):
    g = build_graph(_edges_ds(src, dst), EngineConfig(num_partitions=P), directed=False)
    df = cliques4_count(g).to_pandas().sort_values("vid").reset_index(drop=True)
    ovids, ocnt = _cliques4_oracle(src, dst)
    assert np.array_equal(df["vid"].to_numpy().astype(np.uint64), ovids)
    assert np.array_equal(df["cliques4"].to_numpy().astype(np.int64), ocnt)
    return g, df


def _name_edges(pairs):
    names = sorted({x for p in pairs for x in p})
    vid = dict(zip(names, hash_to_vid(names)))
    src = np.array([vid[a] for a, b in pairs], dtype=np.uint64)
    dst = np.array([vid[b] for a, b in pairs], dtype=np.uint64)
    return src, dst


def test_k4_is_one_clique():
    pairs = [("a", "b"), ("a", "c"), ("a", "d"), ("b", "c"), ("b", "d"), ("c", "d")]
    src, dst = _name_edges(pairs)
    g, df = _check(src, dst)
    assert df["cliques4"].tolist() == [1, 1, 1, 1]
    assert total_cliques4(cliques4_count(g)) == 1


def test_k5_counts():
    names = ["a", "b", "c", "d", "e"]
    pairs = list(combinations(names, 2))
    src, dst = _name_edges(pairs)
    g, df = _check(src, dst)
    # K5 has C(5,4)=5 4-cliques; each vertex is in C(4,3)=4 of them
    assert df["cliques4"].tolist() == [4, 4, 4, 4, 4]
    assert total_cliques4(cliques4_count(g)) == 5


def test_triangle_plus_tail_has_none():
    src, dst = _name_edges([("a", "b"), ("b", "c"), ("c", "a"), ("c", "d")])
    _, df = _check(src, dst)
    assert df["cliques4"].tolist() == [0, 0, 0, 0]


def test_erdos_renyi_cliques4():
    rng = np.random.Generator(np.random.Philox(key=[11, 0]))
    n = 40
    mask = np.triu(rng.random((n, n)) < 0.3, 1)
    si, di = np.nonzero(mask)
    vids = hash_to_vid([f"q{i}" for i in range(n)])
    _check(vids[si], vids[di], P=6)
