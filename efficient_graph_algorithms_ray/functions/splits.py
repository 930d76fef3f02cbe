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


DEFAULT_STRATA_RATES = (("en", 0.5), ("de", 0.25), ("zh", 0.25))
DEFAULT_STRATA_OTHER = 0.1


def strata_thresholds(
    rates=DEFAULT_STRATA_RATES, default_rate: float = DEFAULT_STRATA_OTHER
) -> tuple[dict[str, int], int]:
    """EXACT uint64 keep-thresholds per stratum (shared by the engine
    and the SQL oracle so the float→int conversion happens once)."""
    return (
        {name: int(r * float(1 << 64)) for name, r in rates},
        int(default_rate * float(1 << 64)),
    )


def stratified_sample_summary(
    ds,
    key: str = "doc_id",
    strata_col: str = "lang",
    rates=DEFAULT_STRATA_RATES,
    default_rate: float = DEFAULT_STRATA_OTHER,
    seed: int = HASH_SEED,
):
    """Deterministic per-stratum Bernoulli sampling — keep a row iff
    splitmix64(id ⊕ seed) < threshold(stratum) — reduced to a
    per-stratum audit table (stratum, n_total, n_sampled, id_checksum).

    The keep decision is a pure map (stable at any parallelism /
    cluster size — the 100-TB property that matters); only the tiny
    per-stratum partials shuffle. id_checksum = Σ sampled ids pins the
    exact sampled SET, not just its size."""
    from ray.data.aggregate import Sum

    thr_map, thr_other = strata_thresholds(rates, default_rate)

    def _fn(batch: pa.Table) -> pa.Table:
        ids = batch.column(key).to_numpy(zero_copy_only=False).astype(np.uint64)
        h = _splitmix64(ids ^ np.uint64(seed))
        strata = batch.column(strata_col).to_pylist()
        thr = np.array(
            [thr_map.get(s, thr_other) for s in strata], dtype=np.uint64
        )
        keep = (h < thr).astype(np.int64)
        return pa.table(
            {
                strata_col: batch.column(strata_col),
                "n_total": pa.array(np.ones(len(ids), np.int64)),
                "n_sampled": pa.array(keep),
                "id_checksum": pa.array(ids.astype(np.int64) * keep),
            }
        )

    return (
        ds.map_batches(_fn, batch_format="pyarrow")
        .groupby(strata_col)
        .aggregate(
            Sum("n_total", alias_name="n_total"),
            Sum("n_sampled", alias_name="n_sampled"),
            Sum("id_checksum", alias_name="id_checksum"),
        )
    )
