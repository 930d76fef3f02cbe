"""Deterministic corpus splitting — train/val/test assignment.

The training-data pipeline op every corpus run needs: assign each
document to a named split by hashing its id, so the assignment is
(a) stable across runs, cluster sizes and partitionings, (b) exactly
proportional in expectation, and (c) a pure map — no shuffle, no
state. split(doc) = first threshold t_i with
splitmix64(doc_id ⊕ seed) < t_i, where t_i = ⌊cum_frac_i · 2^64⌋ are
EXACT integer thresholds (no float boundary ambiguity — the same
comparison is replayable bit-for-bit in SQL).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from ..config import HASH_SEED
from ..sources.edges_synth import _splitmix64

DEFAULT_FRACTIONS = (("train", 0.9), ("val", 0.05), ("test", 0.05))


def split_thresholds(fractions=DEFAULT_FRACTIONS) -> list[tuple[str, int]]:
    """(name, exact uint64 cumulative threshold) per split; the last
    threshold is forced to 2^64 so every hash lands somewhere."""
    total = float(sum(f for _, f in fractions))
    out = []
    cum = 0.0
    for i, (name, f) in enumerate(fractions):
        cum += f / total
        t = (1 << 64) if i == len(fractions) - 1 else int(cum * float(1 << 64))
        out.append((name, t))
    return out


def assign_splits(
    ds,
    key: str = "doc_id",
    fractions=DEFAULT_FRACTIONS,
    seed: int = HASH_SEED,
):
    """Dataset → Dataset (key, split) — one vectorized map, zero
    shuffle, deterministic at any parallelism."""
    thresholds = split_thresholds(fractions)
    names = [n for n, _ in thresholds]
    bounds = np.array([t for _, t in thresholds[:-1]], dtype=np.uint64)

    def _fn(batch: pa.Table) -> pa.Table:
        ids = batch.column(key).to_numpy(zero_copy_only=False).astype(np.uint64)
        h = _splitmix64(ids ^ np.uint64(seed))
        idx = np.searchsorted(bounds, h, side="right")
        return pa.table(
            {
                key: batch.column(key),
                "split": pa.array(np.array(names, dtype=object)[idx], type=pa.string()),
            }
        )

    return ds.map_batches(_fn, batch_format="pyarrow")
