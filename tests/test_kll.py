"""KLL quantile sketch — exactness, error bound, determinism."""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray.data as rd

from efficient_graph_algorithms_ray.functions.sketches import KLL, kll_quantiles


def test_exact_when_k_exceeds_n():
    rng = np.random.Generator(np.random.Philox(key=[3, 0]))
    v = rng.integers(0, 10_000, 200).astype(np.int64)
    sk = KLL(k=512).add(v)
    sv = np.sort(v)
    assert sk.n() == len(v)
    for q in (0.01, 0.25, 0.5, 0.75, 0.99):
        # with no compaction the sketch IS the sorted array
        assert sk.quantile(q) == sv[min(int(np.searchsorted(np.arange(1, len(v) + 1), q * len(v))), len(v) - 1)]


def test_weight_conservation_and_rank_error():
    rng = np.random.Generator(np.random.Philox(key=[5, 0]))
    v = rng.integers(0, 1_000_000, 20_000).astype(np.int64)
    sk = KLL(k=128)
    for chunk in np.array_split(v, 37):
        sk.add(chunk)
    assert sk.n() == len(v)
    sv = np.sort(v)
    for q in np.linspace(0.05, 0.95, 19):
        est = sk.quantile(float(q))
        true_rank = np.searchsorted(sv, est, side="right")
        assert abs(true_rank - q * len(v)) <= 0.05 * len(v), (q, est)


def test_merge_symmetry():
    rng = np.random.Generator(np.random.Philox(key=[7, 0]))
    a = rng.integers(0, 10_000, 5_000).astype(np.int64)
    b = rng.integers(0, 10_000, 3_000).astype(np.int64)
    m1 = KLL(64).add(a).merge(KLL(64).add(b))
    m2 = KLL(64).add(b).merge(KLL(64).add(a))
    v1, w1 = m1.items()
    v2, w2 = m2.items()
    assert np.array_equal(v1, v2) and np.array_equal(w1, w2)


def test_pipeline_parallelism_invariance():
    rng = np.random.Generator(np.random.Philox(key=[9, 0]))
    n = 8_000
    t = pa.table(
        {
            "key": pa.array(np.arange(n, dtype=np.int64)),
            "x": pa.array(rng.integers(0, 500_000, n).astype(np.int64)),
        }
    )

    def _vals(group):
        return group["x"].to_numpy().astype(np.int64)

    outs = []
    for blocks in (2, 16):
        ds = rd.from_arrow(t).repartition(blocks)
        out = kll_quantiles(ds, _vals, "key", bucket_step=64, k=64)
        outs.append(out.to_pandas())
    assert outs[0].equals(outs[1])
    # estimates stay within the rank-error band
    sv = np.sort(t.column("x").to_numpy())
    for q, est in zip(outs[0]["q_pct"], outs[0]["est"]):
        true_rank = np.searchsorted(sv, est, side="right")
        assert abs(true_rank - q / 100 * n) <= 0.06 * n
