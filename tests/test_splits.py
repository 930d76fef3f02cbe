"""Deterministic corpus splitting: proportions, stability, partition
independence."""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray.data as rd

from efficient_graph_algorithms_ray.functions.splits import (
    assign_splits,
    split_thresholds,
)


def _ds(n, blocks=1):
    t = pa.table({"doc_id": pa.array(np.arange(n, dtype=np.int64), type=pa.int64())})
    ds = rd.from_arrow(t)
    return ds.repartition(blocks) if blocks > 1 else ds


def test_split_proportions_and_determinism():
    n = 20000
    df = assign_splits(_ds(n)).to_pandas()
    counts = df["split"].value_counts().to_dict()
    assert abs(counts["train"] / n - 0.9) < 0.01
    assert abs(counts["val"] / n - 0.05) < 0.005
    assert abs(counts["test"] / n - 0.05) < 0.005
    # identical assignment at a different partitioning (pure map)
    df2 = assign_splits(_ds(n, blocks=7)).to_pandas()
    m = df.set_index("doc_id")["split"]
    m2 = df2.set_index("doc_id")["split"]
    assert (m.sort_index() == m2.sort_index()).all()


def test_split_thresholds_cover_uint64():
    th = split_thresholds()
    assert th[-1][1] == 1 << 64  # every hash lands somewhere
    assert all(a[1] < b[1] for a, b in zip(th, th[1:]))


def test_custom_fractions_renormalize():
    th = split_thresholds((("a", 2.0), ("b", 2.0)))
    assert th[0][1] == int(0.5 * float(1 << 64))


def _strat_ds(n, blocks=1):
    langs = np.array(["en", "de", "zh", "fr"], dtype=object)[
        np.arange(n) % 4
    ]
    t = pa.table(
        {
            "doc_id": pa.array(np.arange(n, dtype=np.int64), type=pa.int64()),
            "lang": pa.array(langs, type=pa.string()),
        }
    )
    ds = rd.from_arrow(t)
    return ds.repartition(blocks) if blocks > 1 else ds


def test_stratified_sample_rates_and_partition_invariance():
    from efficient_graph_algorithms_ray.functions.splits import (
        stratified_sample_summary,
    )

    n = 40000
    df = (
        stratified_sample_summary(_strat_ds(n))
        .to_pandas()
        .set_index("lang")
        .sort_index()
    )
    # expected rates: en 0.5, de 0.25, zh 0.25, fr (other) 0.1
    for lang, rate in (("en", 0.5), ("de", 0.25), ("zh", 0.25), ("fr", 0.1)):
        frac = df.loc[lang, "n_sampled"] / df.loc[lang, "n_total"]
        assert abs(frac - rate) < 0.02, (lang, frac)
    # pure map → identical sampled SET at any partitioning
    df2 = (
        stratified_sample_summary(_strat_ds(n, blocks=9))
        .to_pandas()
        .set_index("lang")
        .sort_index()
    )
    assert (df == df2).all().all()
