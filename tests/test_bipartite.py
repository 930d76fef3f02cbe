"""Butterfly counting unit tests on hand-built bipartite graphs."""

import numpy as np
import pyarrow as pa
import pytest
import ray.data as rd

from efficient_graph_algorithms_ray.pipelines.bipartite import butterfly_counts


def _ds(pairs):
    return rd.from_arrow(
        pa.table(
            {
                "left": np.array([p[0] for p in pairs], dtype=np.int64),
                "right": np.array([p[1] for p in pairs], dtype=np.int64),
            }
        )
    )


def _result(ds):
    df = ds.to_pandas()
    return {int(r.left): int(r.butterflies) for r in df.itertuples()}


def test_k22_is_one_butterfly():
    out = _result(butterfly_counts(_ds([(0, 10), (0, 11), (1, 10), (1, 11)])))
    assert out == {0: 1, 1: 1}


def test_k23_is_three_butterflies_each():
    pairs = [(l, r) for l in (0, 1) for r in (10, 11, 12)]
    assert _result(butterfly_counts(_ds(pairs))) == {0: 3, 1: 3}


def test_duplicates_deduped_and_wedge_only_graph_empty():
    # repeated edges must not inflate counts
    pairs = [(0, 10), (0, 11), (1, 10), (1, 11)] * 3
    assert _result(butterfly_counts(_ds(pairs))) == {0: 1, 1: 1}
    # single shared right vertex → wedges but no butterfly
    assert _result(butterfly_counts(_ds([(0, 10), (1, 10), (2, 10)]))) == {}


@pytest.mark.parametrize("parts", [2, 16])
def test_partition_count_invariance(parts):
    rng = np.random.default_rng(7)
    pairs = list({(int(a), int(b)) for a, b in zip(rng.integers(0, 20, 300), rng.integers(100, 112, 300))})
    assert _result(butterfly_counts(_ds(pairs), num_partitions=parts)) == _result(
        butterfly_counts(_ds(pairs), num_partitions=4)
    )


def test_frustrated_edges_odd_and_even_cycle():
    import tempfile

    import ray.data as rd2

    from efficient_graph_algorithms_ray.config import EngineConfig
    from efficient_graph_algorithms_ray.pipelines.bipartite import frustrated_edges
    from efficient_graph_algorithms_ray.pipelines.graph_build import build_graph
    from efficient_graph_algorithms_ray.pipelines.paths import shortest_path_forest

    def run(edges):
        u = np.array([e[0] for e in edges], dtype=np.uint64)
        v = np.array([e[1] for e in edges], dtype=np.uint64)
        # duplicate every edge to exercise the in-group dedup
        ds = rd2.from_arrow(
            pa.table(
                {
                    "src": pa.array(np.concatenate([u, v])),
                    "dst": pa.array(np.concatenate([v, u])),
                }
            )
        )
        g = build_graph(ds, EngineConfig(num_partitions=4), directed=False)
        out, _ = shortest_path_forest(
            g, np.array([1], dtype=np.uint64), tempfile.mkdtemp(dir="/tmp"), scale=1
        )
        return {
            int(r["dist"]): int(r["n_frustrated"])
            for r in frustrated_edges(out, ds).to_pandas().to_dict("records")
        }

    # C5 (odd): 1-2-3-4-5-1 → exactly one frustrated edge at dist 2
    assert run([(1, 2), (2, 3), (3, 4), (4, 5), (5, 1)]) == {2: 1}
    # C4 (even, bipartite): no frustrated edges
    assert run([(1, 2), (2, 3), (3, 4), (4, 1)]) == {}


def test_exact_percentiles_by_group():
    import ray.data as rd2

    from efficient_graph_algorithms_ray.functions.stats import exact_percentiles_by

    rng = np.random.default_rng(2)
    langs = np.array(["en", "de", "fr"])[rng.integers(0, 3, 500)]
    vals = rng.integers(10, 5000, 500)
    ds = rd2.from_arrow(
        pa.table({"lang": pa.array(langs), "n": pa.array(vals, type=pa.int64())})
    )
    out = exact_percentiles_by(ds, "lang", "n", [0.25, 0.5, 0.9]).to_pandas()
    for lang in ("en", "de", "fr"):
        sub = np.sort(vals[langs == lang])
        for q in (0.25, 0.5, 0.9):
            want = sub[int(np.ceil(q * len(sub))) - 1]  # quantile_disc
            got = out[(out["lang"] == lang) & (out["q"] == q)]["value"].iloc[0]
            assert got == want, (lang, q, got, want)
