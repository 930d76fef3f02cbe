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
