"""Mergeable sketches — approximate distinct counting (HyperLogLog).

The guide's aggregation-at-scale pattern: emit one serialized sketch
per (batch, key), merge in a tiny second stage — sketches are designed
to be mergeable, so the shuffle carries 2^p bytes per partial instead
of the raw column. (The reference has no sketches — this is part of
the task-spec training-data additions.)

Standard HLL: p-bit bucket index + leading-zero rank of the remaining
hash bits; estimator with the usual alpha_m bias constant and
linear-counting small-range correction. Hashing is splitmix64 (shared
with sources/edges_synth.py) — deterministic, vectorized.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

from ..sources.edges_synth import _splitmix64

HLL_P = 12  # 4096 registers → ~1.6% standard error
_M = 1 << HLL_P
_ALPHA = 0.7213 / (1 + 1.079 / _M)


def _hash_any(values: np.ndarray) -> np.ndarray:
    if values.dtype.kind in "iu":
        return _splitmix64(values.astype(np.uint64))
    import polars as pl

    from ..config import HASH_SEED

    return pl.Series(values.astype(str)).hash(seed=HASH_SEED).to_numpy().astype(np.uint64)


def hll_sketch(values: np.ndarray) -> np.ndarray:
    """→ uint8[2^p] register array."""
    regs = np.zeros(_M, dtype=np.uint8)
    if len(values) == 0:
        return regs
    h = _hash_any(values)
    idx = (h >> np.uint64(64 - HLL_P)).astype(np.int64)
    rest = (h << np.uint64(HLL_P)) | np.uint64((1 << HLL_P) - 1)  # sentinel low bits
    # rank = leading zeros of `rest` + 1 (capped by construction)
    rank = np.zeros(len(h), dtype=np.uint8)
    probe = rest
    for shift in (32, 16, 8, 4, 2, 1):  # branchless CLZ
        mask = probe < (np.uint64(1) << np.uint64(64 - shift))
        rank[mask] += shift
        probe = np.where(mask, probe << np.uint64(shift), probe)
    rank += 1
    np.maximum.at(regs, idx, rank)
    return regs


def hll_merge(a: np.ndarray, b: np.ndarray) -> np.ndarray:
    return np.maximum(a, b)


def hll_estimate(regs: np.ndarray) -> float:
    est = _ALPHA * _M * _M / np.sum(np.exp2(-regs.astype(np.float64)))
    zeros = int((regs == 0).sum())
    if est <= 2.5 * _M and zeros > 0:
        est = _M * np.log(_M / zeros)  # linear counting
    return float(est)


def approx_distinct_by_key(ds, key: str, col: str):
    """Dataset → (key, approx_distinct BIGINT) via per-batch sketches +
    one merge groupby."""
    from ..util import list_array, list_rows

    def _partials(batch: pa.Table) -> pa.Table:
        df = pd.DataFrame(
            {key: batch.column(key).to_pandas(), col: batch.column(col).to_pandas()}
        )
        keys, sketches = [], []
        for k, g in df.groupby(key, sort=False):
            keys.append(k)
            sketches.append(hll_sketch(g[col].to_numpy()))
        return pa.table(
            {
                key: pa.array(keys),
                "sketch": list_array(sketches, np.uint8, pa.uint8()),
            }
        )

    def _merge(group: pa.Table) -> pa.Table:
        regs = np.zeros(_M, dtype=np.uint8)
        for r in list_rows(group, "sketch"):
            regs = hll_merge(regs, r.astype(np.uint8))
        return pa.table(
            {
                key: pa.array([group.column(key)[0].as_py()]),
                "approx_distinct": pa.array(
                    [int(round(hll_estimate(regs)))], type=pa.int64()
                ),
            }
        )

    return (
        ds.map_batches(_partials, batch_format="pyarrow")
        .groupby(key)
        .map_groups(_merge, batch_format="pyarrow")
    )
