"""Token-budget sequence sharding — distributed ordered prefix scan.

The training-data op behind sequence packing: assign each document to
a contiguous token-budget shard, bin(d) = ⌊prefix_sum_excl(tokens) /
budget⌋ over documents in key order — so shards hold ~budget tokens
each and the assignment is deterministic at any parallelism.

The primitive is a 2-pass distributed scan over a sorted Dataset:
pass 1 computes per-block (first_key, total_weight) partials (tiny),
the driver cumsums block totals into exclusive offsets (O(#blocks)),
and pass 2 adds the in-block exclusive cumsum to the block offset.
The offset lookup is keyed by each block's first key — sound because
the sort key is UNIQUE (no tie can straddle a block boundary).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa


def ordered_prefix_sum(ds, key: str, weight: str):
    """Sorted-by-``key`` Dataset → Dataset (key, weight, prefix_excl)
    where prefix_excl = Σ weight over strictly-smaller keys. ``key``
    values must be unique integers."""
    import ray

    sorted_ds = ds.sort(key).materialize()

    firsts, totals = [], []
    for b in sorted_ds.map_batches(
        _block_partial(key, weight), batch_format="pyarrow", batch_size=None
    ).iter_batches(batch_size=None, batch_format="pyarrow"):
        firsts.extend(b.column("first_key").to_pylist())
        totals.extend(b.column("total").to_pylist())
    order = np.argsort(np.asarray(firsts, dtype=np.int64), kind="stable")
    fk = np.asarray(firsts, dtype=np.int64)[order]
    tt = np.asarray(totals, dtype=np.int64)[order]
    offsets = np.concatenate(([0], np.cumsum(tt)[:-1]))
    off_ref = ray.put((fk, offsets))

    def _apply(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return pa.table(
                {
                    key: pa.array([], type=pa.int64()),
                    weight: pa.array([], type=pa.int64()),
                    "prefix_excl": pa.array([], type=pa.int64()),
                }
            )
        fk_, off_ = ray.get(off_ref)
        k = batch.column(key).to_numpy(zero_copy_only=False).astype(np.int64)
        w = batch.column(weight).to_numpy(zero_copy_only=False).astype(np.int64)
        base = off_[np.searchsorted(fk_, int(k[0]))]
        local_excl = np.concatenate(([0], np.cumsum(w)[:-1]))
        return pa.table(
            {
                key: pa.array(k, type=pa.int64()),
                weight: pa.array(w, type=pa.int64()),
                "prefix_excl": pa.array(base + local_excl, type=pa.int64()),
            }
        )

    return sorted_ds.map_batches(_apply, batch_format="pyarrow", batch_size=None)


def _block_partial(key: str, weight: str):
    def _fn(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return pa.table(
                {
                    "first_key": pa.array([], type=pa.int64()),
                    "total": pa.array([], type=pa.int64()),
                }
            )
        k = batch.column(key).to_numpy(zero_copy_only=False)
        w = batch.column(weight).to_numpy(zero_copy_only=False).astype(np.int64)
        return pa.table(
            {
                "first_key": pa.array([int(k[0])], type=pa.int64()),
                "total": pa.array([int(w.sum())], type=pa.int64()),
            }
        )

    return _fn


def token_budget_bins(ds, key: str, weight: str, budget: int):
    """Dataset → (key, bin): contiguous token-budget shard id per row,
    bin = ⌊prefix_excl / budget⌋ in key order."""
    pre = ordered_prefix_sum(ds, key, weight)

    def _bin(batch: pa.Table) -> pa.Table:
        p = batch.column("prefix_excl").to_numpy(zero_copy_only=False)
        return pa.table(
            {
                key: batch.column(key),
                "bin": pa.array((p // budget).astype(np.int64), type=pa.int64()),
            }
        )

    return pre.map_batches(_bin, batch_format="pyarrow")
