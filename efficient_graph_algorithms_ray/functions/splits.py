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


# (2^64 // 10^6, 2^64 % 10^6): exact integer split of the Bernoulli
# threshold (rem_ppm · 2^64) // 10^6 so the uint64 arithmetic never
# overflows: rem < 10^6 → rem·Q + (rem·R)//10^6 < 2^64.
_PPM_Q = (1 << 64) // 1_000_000
_PPM_R = (1 << 64) % 1_000_000


def quality_temperature_resample(
    docs_ds,
    temperature: int = 3,
    seed: int = HASH_SEED,
):
    """Quality-weighted epoch mixing (the 'repeat good data' step of an
    LLM data recipe): each document is replicated
    copies = ⌊q_ppm·T / 10^6⌋ + Bernoulli(remainder) times, where
    q_ppm = ⌊quality·10^6⌋ from the QualityScorer and the Bernoulli
    draw is the deterministic splitmix64(doc_id ⊕ seed) threshold test
    — exact integers end to end, replayable in SQL.

    A pure map (stable at any parallelism); only per-lang audit
    partials shuffle. Returns (lang, n_docs, n_copies, id_checksum =
    Σ doc_id·copies) — the checksum pins the exact multiset."""
    from ray.data.aggregate import Sum

    from .text import QualityScorer

    T = int(temperature)

    class _Resample(QualityScorer):
        def __call__(self, batch: pa.Table) -> pa.Table:  # type: ignore[override]
            q = QualityScorer.__call__(self, batch)
            qp = q.column("quality_ppm").to_numpy(zero_copy_only=False)
            ids = (
                batch.column("doc_id").to_numpy(zero_copy_only=False).astype(np.uint64)
            )
            tot = qp * T
            base = tot // 1_000_000
            rem = (tot % 1_000_000).astype(np.uint64)
            thr = rem * np.uint64(_PPM_Q) + (rem * np.uint64(_PPM_R)) // np.uint64(
                1_000_000
            )
            h = _splitmix64(ids ^ np.uint64(seed))
            copies = base + (h < thr)
            return pa.table(
                {
                    "lang": batch.column("lang"),
                    "n_docs": pa.array(np.ones(len(ids), np.int64)),
                    "n_copies": pa.array(copies.astype(np.int64)),
                    "id_checksum": pa.array(
                        ids.astype(np.int64) * copies.astype(np.int64)
                    ),
                }
            )

    return (
        docs_ds.map_batches(_Resample, batch_format="pyarrow", concurrency=(2, 8))
        .groupby("lang")
        .aggregate(
            Sum("n_docs", alias_name="n_docs"),
            Sum("n_copies", alias_name="n_copies"),
            Sum("id_checksum", alias_name="id_checksum"),
        )
    )


def split_labels(
    ids: np.ndarray, fractions=DEFAULT_FRACTIONS, seed: int = HASH_SEED
) -> np.ndarray:
    """Vectorized split name per id — the pure-function core of
    assign_splits, usable wherever an id column needs its split
    WITHOUT a join (the split is derivable, never stored)."""
    thresholds = split_thresholds(fractions)
    names = np.array([n for n, _ in thresholds], dtype=object)
    bounds = np.array([t for _, t in thresholds[:-1]], dtype=np.uint64)
    h = _splitmix64(ids.astype(np.uint64) ^ np.uint64(seed))
    return names[np.searchsorted(bounds, h, side="right")]
