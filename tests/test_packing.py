"""Ordered prefix scan + token-budget sharding vs numpy oracle."""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray.data as rd

from efficient_graph_algorithms_ray.functions.packing import (
    ordered_prefix_sum,
    token_budget_bins,
)


def _ds(keys, weights, blocks=5):
    t = pa.table(
        {
            "k": pa.array(np.asarray(keys, dtype=np.int64), type=pa.int64()),
            "w": pa.array(np.asarray(weights, dtype=np.int64), type=pa.int64()),
        }
    )
    return rd.from_arrow(t).repartition(blocks)


def test_ordered_prefix_sum_matches_numpy():
    rng = np.random.Generator(np.random.Philox(key=[21, 0]))
    n = 2000
    keys = rng.permutation(n)  # arbitrary input order
    weights = rng.integers(1, 500, n)
    df = ordered_prefix_sum(_ds(keys, weights), "k", "w").to_pandas()
    df = df.sort_values("k").reset_index(drop=True)
    order = np.argsort(keys)
    want = np.concatenate(([0], np.cumsum(weights[order])[:-1]))
    np.testing.assert_array_equal(df["prefix_excl"].to_numpy(), want)
    # partition-count independence (the scan is a pure function of the
    # sorted order, not the block layout)
    df2 = ordered_prefix_sum(_ds(keys, weights, blocks=11), "k", "w").to_pandas()
    df2 = df2.sort_values("k").reset_index(drop=True)
    np.testing.assert_array_equal(df2["prefix_excl"].to_numpy(), want)


def test_token_budget_bins_contiguous_and_bounded():
    rng = np.random.Generator(np.random.Philox(key=[22, 0]))
    n = 1500
    keys = np.arange(n)
    weights = rng.integers(1, 900, n)
    budget = 10000
    df = (
        token_budget_bins(_ds(keys, weights), "k", "w", budget)
        .to_pandas()
        .sort_values("k")
        .reset_index(drop=True)
    )
    bins = df["bin"].to_numpy()
    assert (np.diff(bins) >= 0).all()  # contiguous in key order
    # every bin except possibly the last holds < budget + max_weight
    # tokens and at least one doc; total bin count ≈ total/budget
    totals = np.bincount(bins, weights=weights)
    assert (totals[:-1] >= budget - 900).all()  # bins fill up
    assert len(np.unique(bins)) == bins.max() + 1  # no gaps
