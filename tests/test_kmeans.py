"""Exact-integer Lloyd k-means: cluster recovery + determinism."""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray.data as rd

from efficient_graph_algorithms_ray.functions.similarity import (
    _floor_div_exact,
    kmeans_quantized,
)


def _planted(n_per: int = 40, k: int = 3, d: int = 8, sep: float = 10.0):
    rng = np.random.default_rng(7)
    mats, ids = [], []
    for c in range(k):
        center = np.zeros(d)
        center[c] = sep
        mats.append(center + rng.normal(0, 0.3, size=(n_per, d)))
        ids.extend(range(c * n_per, (c + 1) * n_per))
    mat = np.vstack(mats).astype(np.float32)
    return rd.from_arrow(
        pa.table(
            {
                "vec_id": pa.array(np.array(ids, dtype=np.int64)),
                "embedding": pa.array(list(mat), type=pa.list_(pa.float32())),
            }
        )
    )


def test_planted_clusters_recovered(ray_session):
    ds = _planted()
    df = kmeans_quantized(ds, n_clusters=3, iters=3).to_pandas()
    # every planted block maps to ONE k-means cluster, and the three
    # blocks map to three distinct clusters
    lab = df.sort_values("vec_id").cluster.to_numpy()
    blocks = [set(lab[i * 40 : (i + 1) * 40]) for i in range(3)]
    assert all(len(b) == 1 for b in blocks)
    assert len(set().union(*blocks)) == 3


def test_block_layout_invariance(ray_session):
    # integer partial sums merge exactly → same result at any block count
    ds = _planted()
    a = kmeans_quantized(ds, n_clusters=3, iters=2).to_pandas().sort_values("vec_id")
    b = (
        kmeans_quantized(ds.repartition(13), n_clusters=3, iters=2)
        .to_pandas()
        .sort_values("vec_id")
    )
    assert np.array_equal(a.cluster.to_numpy(), b.cluster.to_numpy())
    assert np.array_equal(a.d2.to_numpy(), b.d2.to_numpy())


def test_floor_div_matches_numpy_floor_division():
    s = np.array([7, -7, 10, -10, 0, -1], dtype=np.int64)
    n = np.array([3, 3, 5, 4, 9, 2], dtype=np.int64)
    assert np.array_equal(_floor_div_exact(s, n), s // n)


def test_d2_is_exact_squared_distance(ray_session):
    ds = _planted(n_per=10, k=2, d=4)
    df = kmeans_quantized(ds, n_clusters=2, iters=1).to_pandas()
    assert (df.d2 >= 0).all()
    # d2 of a vector assigned to its own anchor-centroid cluster is
    # bounded by the planted noise scale (quantized): 4 dims, |x−c| ≤
    # ~2 σ-units → well below the cross-cluster separation (10)
    assert df.d2.min() < (2 * 0.3 * (1 << 20)) ** 2 * 4
