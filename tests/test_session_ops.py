"""Invariant tests for the final-session operators (SQL parity covers
exactness at two SFs; these pin semantic invariants on crafted inputs)."""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray.data as rd

from efficient_graph_algorithms_ray.config import EngineConfig
from efficient_graph_algorithms_ray.pipelines.graph_build import build_graph


def _graph(pairs, parts=4):
    u = np.array([p[0] for p in pairs], dtype=np.uint64)
    v = np.array([p[1] for p in pairs], dtype=np.uint64)
    edges = rd.from_arrow(pa.table({"src": pa.array(u), "dst": pa.array(v)}))
    return build_graph(edges, EngineConfig(num_partitions=parts), directed=False)


def test_negative_samples_track_degree_distribution():
    from efficient_graph_algorithms_ray.pipelines.walk_corpus import (
        negative_sample_table,
    )

    # star: center 1 has degree 10, leaves degree 1 → center owns half
    # the cumulative-degree mass and should win ~half the draws
    pairs = [(1, i) for i in range(2, 12)]
    g = _graph(pairs)
    out = negative_sample_table(g, m=2000, seed=13).to_pandas()
    assert len(out) == 2000
    assert sorted(out["i"]) == list(range(2000))
    frac_center = (out["vid"] == 1).mean()
    assert 0.42 < frac_center < 0.58
    # determinism across runs
    out2 = negative_sample_table(g, m=2000, seed=13).to_pandas()
    assert out.sort_values("i")["vid"].tolist() == out2.sort_values("i")["vid"].tolist()


def test_skipgram_pairs_window_counts():
    from efficient_graph_algorithms_ray.pipelines.walk_corpus import skipgram_pairs

    # one fixed walk [1, 2, 3]: window 1 → ordered adjacent pairs only
    walks = rd.from_arrow(
        pa.table(
            {
                "walk_id": pa.array([np.uint64(7)], type=pa.uint64()),
                "seq": pa.array([[1, 2, 3]], type=pa.list_(pa.uint64())),
            }
        )
    )
    df = skipgram_pairs(walks, window=1).to_pandas()
    got = {(int(r.center), int(r.context)): int(r.n) for r in df.itertuples()}
    assert got == {(1, 2): 1, (2, 1): 1, (2, 3): 1, (3, 2): 1}


def test_spectral_moments_rectangle_free_on_tree():
    from efficient_graph_algorithms_ray.pipelines.linkpred import spectral_moments

    # a path graph has no cycles at all
    g = _graph([(1, 2), (2, 3), (3, 4), (4, 5)])
    row = spectral_moments(g).to_pandas().iloc[0]
    assert int(row["c4"]) == 0
    assert int(row["m"]) == 4
