"""Densest-subgraph peeling — guarantee vs exhaustive search."""

from __future__ import annotations

from itertools import combinations

import numpy as np
import pyarrow as pa
import ray.data as rd

from efficient_graph_algorithms_ray.config import EngineConfig
from efficient_graph_algorithms_ray.pipelines.densest import densest_subgraph
from efficient_graph_algorithms_ray.pipelines.graph_build import build_graph
from efficient_graph_algorithms_ray.stages.hashing import hash_to_vid


def _graph(src, dst, P=4):
    ds = rd.from_arrow(
        pa.table(
            {
                "src": pa.array(src, type=pa.uint64()),
                "dst": pa.array(dst, type=pa.uint64()),
            }
        )
    )
    return build_graph(ds, EngineConfig(num_partitions=P), directed=False)


def _opt_density(pairs, names):
    best = 0.0
    for r in range(2, len(names) + 1):
        for sub in combinations(names, r):
            s = set(sub)
            m = sum(1 for a, b in pairs if a in s and b in s)
            best = max(best, m / len(s))
    return best


def test_planted_clique_found():
    rng = np.random.Generator(np.random.Philox(key=[13, 0]))
    clique = [f"c{i}" for i in range(8)]
    noise = [f"n{i}" for i in range(40)]
    pairs = list(combinations(clique, 2))
    for i, n in enumerate(noise):
        pairs.append((n, noise[(i + 1) % len(noise)]))
        pairs.append((n, clique[i % 8]))
    names = sorted({x for p in pairs for x in p})
    vid = dict(zip(names, hash_to_vid(names)))
    src = np.array([vid[a] for a, b in pairs], dtype=np.uint64)
    dst = np.array([vid[b] for a, b in pairs], dtype=np.uint64)
    g = _graph(src, dst)
    table, best = densest_subgraph(g)
    # K8 density is 3.5; guarantee floor is 3.5/2.5 = 1.4
    assert best["density"] >= 1.4
    assert best["density"] <= 3.5 + 1.0  # noise can only add so much
    assert table.num_rows >= 1


def test_guarantee_vs_exhaustive_small():
    rng = np.random.Generator(np.random.Philox(key=[17, 0]))
    names = [f"v{i}" for i in range(10)]
    pairs = [
        (a, b) for a, b in combinations(names, 2) if rng.random() < 0.35
    ]
    opt = _opt_density(pairs, names)
    vid = dict(zip(sorted({x for p in pairs for x in p}),
                   hash_to_vid(sorted({x for p in pairs for x in p}))))
    src = np.array([vid[a] for a, b in pairs], dtype=np.uint64)
    dst = np.array([vid[b] for a, b in pairs], dtype=np.uint64)
    g = _graph(src, dst)
    _, best = densest_subgraph(g)
    assert best["density"] >= opt / 2.5 - 1e-9
    assert best["density"] <= opt + 1e-9


def test_rounds_deterministic():
    names = [f"w{i}" for i in range(20)]
    pairs = [(names[i], names[(i + 1) % 20]) for i in range(20)] + [
        (names[i], names[(i + 2) % 20]) for i in range(20)
    ]
    vid = dict(zip(sorted(names), hash_to_vid(sorted(names))))
    src = np.array([vid[a] for a, b in pairs], dtype=np.uint64)
    dst = np.array([vid[b] for a, b in pairs], dtype=np.uint64)
    t1, b1 = densest_subgraph(_graph(src, dst, P=2))
    t2, b2 = densest_subgraph(_graph(src, dst, P=6))
    assert t1.to_pydict() == t2.to_pydict()
    assert b1 == b2
