"""Streaming statistics — the partial/final combine pattern.

Reference parity: Welford streaming mean/variance over samples
(``eval_kernel_statistics``, /root/reference/src/ega/algorithms/
graph_kernels.py:344-366) and the z-score / one-tail significance
helpers (graph_kernels.py:23-48).

Distributed shape: each batch computes a Welford (count, mean, M2)
partial; partials merge with Chan's parallel-combine formula in one
small ``groupby(key)`` — the shuffle carries 3 floats per (batch, key)
instead of the raw column.
"""

from __future__ import annotations

import math

import numpy as np
import pandas as pd
import pyarrow as pa


def _welford_partial(values: np.ndarray) -> tuple[int, float, float]:
    n = len(values)
    if n == 0:
        return 0, 0.0, 0.0
    mean = float(values.mean())
    m2 = float(((values - mean) ** 2).sum())
    return n, mean, m2


def _chan_merge(a, b):
    """(n, mean, M2) ⊕ (n, mean, M2) — Chan et al. parallel combine."""
    na, ma, m2a = a
    nb, mb, m2b = b
    if na == 0:
        return b
    if nb == 0:
        return a
    n = na + nb
    delta = mb - ma
    mean = ma + delta * nb / n
    m2 = m2a + m2b + delta * delta * na * nb / n
    return n, mean, m2


def welford_by_key(ds, key: str, col: str):
    """Dataset → (key, n, mean, var_pop, std_pop) via partial+merge."""

    def _partials(batch: pa.Table) -> pa.Table:
        df = pd.DataFrame(
            {key: batch.column(key).to_pandas(), col: batch.column(col).to_pandas()}
        )
        rows = []
        for k, g in df.groupby(key, sort=False):
            n, mean, m2 = _welford_partial(g[col].to_numpy().astype(np.float64))
            rows.append((k, n, mean, m2))
        out = pd.DataFrame(rows, columns=[key, "n", "mean", "m2"])
        return pa.Table.from_pandas(out, preserve_index=False)

    def _merge(group: pd.DataFrame) -> pd.DataFrame:
        acc = (0, 0.0, 0.0)
        for n, mean, m2 in zip(group["n"], group["mean"], group["m2"]):
            acc = _chan_merge(acc, (int(n), float(mean), float(m2)))
        n, mean, m2 = acc
        var = m2 / n if n else 0.0
        return pd.DataFrame(
            {
                key: [group[key].iloc[0]],
                "n": np.array([n], dtype=np.int64),
                "mean": [mean],
                "var_pop": [var],
                "std_pop": [math.sqrt(var)],
            }
        )

    return (
        ds.map_batches(_partials, batch_format="pyarrow")
        .groupby(key)
        .map_groups(_merge, batch_format="pandas")
    )


def welford_global(ds, col: str) -> tuple[int, float, float]:
    """Whole-dataset (n, mean, var_pop) — the Welford partial runs
    INSIDE map_batches; only per-block (n, mean, M2) triples reach the
    driver's Chan merge (the column itself never does)."""

    def _part(batch: pa.Table) -> pa.Table:
        vals = batch.column(col).to_numpy(zero_copy_only=False).astype(np.float64)
        n, mean, m2 = _welford_partial(vals)
        return pa.table(
            {
                "n": pa.array([n], type=pa.int64()),
                "mean": pa.array([mean], type=pa.float64()),
                "m2": pa.array([m2], type=pa.float64()),
            }
        )

    acc = (0, 0.0, 0.0)
    for b in ds.map_batches(_part, batch_format="pyarrow").iter_batches(
        batch_size=None, batch_format="pyarrow"
    ):
        for n_, mean_, m2_ in zip(
            b.column("n").to_pylist(), b.column("mean").to_pylist(), b.column("m2").to_pylist()
        ):
            acc = _chan_merge(acc, (int(n_), float(mean_), float(m2_)))
    n, mean, m2 = acc
    return n, mean, (m2 / n if n else 0.0)


def exact_percentiles(ds, col: str, qs: list[float]):
    """Exact distributed percentiles via a bounded value histogram.

    Map-side partial counting (np.unique per batch — the combiner),
    one small ``groupby(value)`` merge, then a driver-side cumsum over
    the (distinct value, count) table to select the 1-indexed rank
    ⌈q·n⌉ element — DuckDB ``quantile_disc`` semantics, empirically
    pinned. The shuffle carries one row per distinct value per block,
    so this is the 100 TB answer for bounded-domain columns (lengths,
    sizes, scores); unbounded/continuous domains need sort-based
    selection instead.

    Returns a 1-row-per-q Dataset (q, value) with ``value`` in the
    column's original integer type family (int64).
    """
    import ray.data as rd
    from ray.data.aggregate import Sum

    def _counts(batch: pa.Table) -> pa.Table:
        vals = batch.column(col).to_numpy(zero_copy_only=False)
        uniq, cnt = np.unique(vals, return_counts=True)
        return pa.table(
            {
                "value": pa.array(uniq.astype(np.int64), type=pa.int64()),
                "n": pa.array(cnt.astype(np.int64), type=pa.int64()),
            }
        )

    hist = (
        ds.map_batches(_counts, batch_format="pyarrow")
        .groupby("value")
        .aggregate(Sum("n", alias_name="n"))
        .sort("value")
    )
    btabs = list(hist.iter_batches(batch_size=None, batch_format="pyarrow"))
    if btabs:
        htbl = pa.concat_tables(btabs)
        values = htbl.column("value").to_numpy(zero_copy_only=False)
        counts = htbl.column("n").to_numpy(zero_copy_only=False)
    else:
        values = counts = np.empty(0, dtype=np.int64)
    cum = np.cumsum(counts)
    total = int(cum[-1]) if len(cum) else 0
    out_q, out_v = [], []
    for q in qs:
        rank = int(np.ceil(q * total)) if total else 0
        idx = int(np.searchsorted(cum, max(rank, 1)))
        out_q.append(float(q))
        out_v.append(int(values[idx]) if total else 0)
    return rd.from_arrow(
        pa.table(
            {
                "q": pa.array(out_q, type=pa.float64()),
                "value": pa.array(out_v, type=pa.int64()),
            }
        )
    )


def zscore(values: np.ndarray, mean: float, std: float) -> np.ndarray:
    """Standardize; std=0 → zeros (reference zscore, graph_kernels.py:23-38)."""
    if std <= 0:
        return np.zeros_like(values, dtype=np.float64)
    return (values - mean) / std


def onetail(z: np.ndarray) -> np.ndarray:
    """Upper-tail normal probability P(Z > z) (graph_kernels.py:41-48)."""
    erfc = np.vectorize(math.erfc)
    return 0.5 * erfc(np.asarray(z, dtype=np.float64) / math.sqrt(2.0))


def gaussian_kernel_column(ds, col: str, sigma: float, out_col: str | None = None):
    """Elementwise Gaussian kernel exp(−σ·x) — ``GaussianKernel``
    parity (/root/reference/src/ega/util/gaussian_kernel.py:5-17) as a
    vectorized column map."""
    out_col = out_col or f"{col}_gk"

    def _fn(batch: pa.Table) -> pa.Table:
        x = batch.column(col).to_numpy(zero_copy_only=False).astype(np.float64)
        return batch.append_column(out_col, pa.array(np.exp(-sigma * x)))

    return ds.map_batches(_fn, batch_format="pyarrow")


def zscore_column(ds, col: str, out_col: str | None = None):
    """Append a z-scored column (two passes: global Welford, then map)."""
    out_col = out_col or f"{col}_z"
    n, mean, var = welford_global(ds, col)
    std = math.sqrt(var)

    def _z(batch: pa.Table) -> pa.Table:
        vals = batch.column(col).to_numpy(zero_copy_only=False).astype(np.float64)
        return batch.append_column(out_col, pa.array(zscore(vals, mean, std)))

    return ds.map_batches(_z, batch_format="pyarrow")


def exact_percentiles_by(ds, group_col: str, col: str, qs: list[float]):
    """Grouped exact percentiles via the bounded-domain histogram
    (the per-group twin of :func:`exact_percentiles`): map-side
    (group, value) partial counts → one combiner-backed
    ``groupby([group, value])`` merge → per-group rank selection in a
    ``groupby(group).map_groups`` task (each group's DISTINCT-value
    histogram fits one task even when the group's row count does not).
    Returns (``group_col``, q, value) rows, DuckDB quantile_disc
    semantics.
    """
    import ray.data as rd  # noqa: F401
    from ray.data.aggregate import Sum

    def _counts(batch: pa.Table) -> pa.Table:
        df = batch.select([group_col, col]).to_pandas()
        cnt = df.groupby([group_col, col], sort=False).size().reset_index()
        return pa.table(
            {
                group_col: pa.array(cnt[group_col]),
                "value": pa.array(cnt[col].to_numpy().astype(np.int64), type=pa.int64()),
                "n": pa.array(cnt[0].to_numpy().astype(np.int64), type=pa.int64()),
            }
        )

    hist = (
        ds.map_batches(_counts, batch_format="pyarrow")
        .groupby([group_col, "value"])
        .aggregate(Sum("n", alias_name="n"))
    )

    def _select(group: pa.Table) -> pa.Table:
        g = group.column(group_col)[0].as_py()
        values = group.column("value").to_numpy(zero_copy_only=False)
        counts = group.column("n").to_numpy(zero_copy_only=False)
        order = np.argsort(values)
        values, counts = values[order], counts[order]
        cum = np.cumsum(counts)
        total = int(cum[-1]) if len(cum) else 0
        out_q, out_v = [], []
        for q in qs:
            rank = int(np.ceil(q * total)) if total else 0
            rank = max(rank, 1)
            idx = int(np.searchsorted(cum, rank))
            out_q.append(float(q))
            out_v.append(int(values[min(idx, len(values) - 1)]) if total else 0)
        return pa.table(
            {
                group_col: pa.array([g] * len(qs)),
                "q": pa.array(out_q, type=pa.float64()),
                "value": pa.array(out_v, type=pa.int64()),
            }
        )

    return hist.groupby(group_col).map_groups(_select, batch_format="pyarrow")
