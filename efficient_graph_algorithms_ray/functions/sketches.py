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


# ---- Count-Min sketch -----------------------------------------------------

def count_min_token_probe(docs_ds, *, width: int = 1024, depth: int = 4, top: int = 10):
    """Count-Min sketch (Cormode & Muthukrishnan 2005) over the corpus
    token stream, probed at the exact top-``top`` tokens.

    The counting twin of the HLL pattern: each block reduces its token
    stream to a local (depth × width) counter array — the sketch is a
    commutative monoid, so partials merge by addition — and emits only
    its NONZERO cells; one combiner-backed ``groupby(row, bucket).sum``
    produces the global sketch (≤ depth·width rows, independent of
    vocabulary size). The probe set comes from the existing exact
    Misra-Gries heavy-hitter pass, so nothing here shuffles the
    vocabulary either.

    Hashing: bucket_r(tok) = splitmix64(fnv1a(tok) XOR splitmix64(r+1))
    mod width — deterministic at any parallelism, replayed exactly in
    the SQL oracle. Returns (tok, exact_n, cms_n, overestimate) ordered
    by (exact_n DESC, tok); all integers → exact hash parity. The CMS
    guarantee cms_n ≥ exact_n holds by construction; overestimate
    quantifies collision noise at this width.
    """
    import ray.data as rd
    from collections import Counter

    from ray.data.aggregate import Sum

    from .terms import heavy_hitter_tokens
    from .text import _TOKEN_RE, hash_token

    salts = _splitmix64(np.arange(1, depth + 1, dtype=np.uint64))

    def _bucket(hs: np.ndarray, r: int) -> np.ndarray:
        return (_splitmix64(hs ^ salts[r]) % np.uint64(width)).astype(np.int64)

    def _partials(batch: pa.Table) -> pa.Table:
        c: Counter = Counter()
        for t in batch.column("text").to_pylist():
            c.update(_TOKEN_RE.findall(t or ""))
        cms = np.zeros((depth, width), dtype=np.int64)
        if c:
            hs = np.fromiter(
                (hash_token(t) for t in c), dtype=np.uint64, count=len(c)
            )
            cs = np.fromiter(c.values(), dtype=np.int64, count=len(c))
            for r in range(depth):
                np.add.at(cms[r], _bucket(hs, r), cs)
        rr, bb = np.nonzero(cms)
        return pa.table(
            {
                "r": pa.array(rr.astype(np.int64), type=pa.int64()),
                "b": pa.array(bb.astype(np.int64), type=pa.int64()),
                "c": pa.array(cms[rr, bb], type=pa.int64()),
            }
        )

    sketch_rows = (
        docs_ds.map_batches(_partials, batch_format="pyarrow")
        .groupby(["r", "b"])
        .aggregate(Sum("c", alias_name="c"))
    )
    cms = np.zeros((depth, width), dtype=np.int64)
    for blk in sketch_rows.iter_batches(batch_size=None, batch_format="pyarrow"):
        rr = blk.column("r").to_numpy(zero_copy_only=False)
        bb = blk.column("b").to_numpy(zero_copy_only=False)
        cms[rr, bb] = blk.column("c").to_numpy(zero_copy_only=False)

    probes = []
    for blk in heavy_hitter_tokens(docs_ds, top=top).iter_batches(
        batch_size=None, batch_format="pyarrow"
    ):
        probes.extend(zip(blk.column("tok").to_pylist(), blk.column("n").to_pylist()))

    toks = [t for t, _ in probes]
    exact = np.array([n for _, n in probes], dtype=np.int64)
    hs = np.fromiter((hash_token(t) for t in toks), dtype=np.uint64, count=len(toks))
    est = np.min(
        np.stack([cms[r, _bucket(hs, r)] for r in range(depth)]), axis=0
    ).astype(np.int64)
    out = pa.table(
        {
            "tok": pa.array(toks, type=pa.string()),
            "exact_n": pa.array(exact, type=pa.int64()),
            "cms_n": pa.array(est, type=pa.int64()),
            "overestimate": pa.array(est - exact, type=pa.int64()),
        }
    )
    return rd.from_arrow(out)


# ---- Bloom filter ----------------------------------------------------------

def bloom_membership_probe(
    docs_ds, *, m_bits: int = 65536, k_hashes: int = 4, eval_mod: int = 5,
    num_partitions: int = 32,
):
    """Bloom-filter membership (Bloom 1970) — the sketch behind
    incremental / cross-shard dedup: build a filter over the TRAIN
    slice's content fingerprints (doc_id % eval_mod ≠ 0), probe every
    EVAL doc, and report the Bloom verdict NEXT TO exact membership so
    the false-positive rate is observable.

    Scale shape: the filter is the broadcast (m_bits/8 bytes — the
    point of a Bloom filter); bit positions are computed map-side and
    deduplicated by one bounded ``groupby(pos)``; exact membership
    never broadcasts the train fingerprint set — it is the repo's
    bucketed co-shuffle (``fp % P`` groups see the full global
    membership of their hashes). Fingerprints and positions are
    FNV-1a/splitmix64 — deterministic, replayed exactly in SQL.

    Returns (doc_id, bloom_hit, exact_hit) over eval docs, both 0/1
    BIGINT; bloom_hit ≥ exact_hit always (no false negatives).
    """
    import ray
    import ray.data as rd
    from ray.data.aggregate import Max, Sum

    from .text import hash_token

    salts = _splitmix64(np.arange(1, k_hashes + 1, dtype=np.uint64))
    P = num_partitions

    def _fp(batch: pa.Table) -> pa.Table:
        ids = batch.column("doc_id").to_numpy(zero_copy_only=False).astype(np.int64)
        texts = batch.column("text").to_pylist()
        h = np.fromiter(
            (hash_token(t or "") for t in texts), dtype=np.uint64, count=len(texts)
        )
        return pa.table(
            {
                "doc_id": pa.array(ids, type=pa.int64()),
                "h": pa.array(h, type=pa.uint64()),
                "is_eval": pa.array(ids % eval_mod == 0),
            }
        )

    fp = docs_ds.map_batches(_fp, batch_format="pyarrow").materialize()

    # filter build: train-position rows → bounded distinct → broadcast bitmap
    def _positions(batch: pa.Table) -> pa.Table:
        h = batch.column("h").to_numpy(zero_copy_only=False)
        ev = batch.column("is_eval").to_numpy(zero_copy_only=False)
        th = h[~ev]
        pos = np.unique(
            np.concatenate(
                [(_splitmix64(th ^ s) % np.uint64(m_bits)) for s in salts]
            )
            if len(th)
            else np.empty(0, np.uint64)
        )
        return pa.table({"pos": pa.array(pos.astype(np.int64), type=pa.int64())})

    bitmap = np.zeros(m_bits, dtype=bool)
    for b in (
        fp.map_batches(_positions, batch_format="pyarrow")
        .groupby("pos")
        .count()
        .iter_batches(batch_size=None, batch_format="pyarrow")
    ):
        bitmap[b.column("pos").to_numpy(zero_copy_only=False)] = True
    bitmap_ref = ray.put(bitmap)

    # exact membership: bucketed co-shuffle, never a broadcast set
    def _bucket(batch: pa.Table) -> pa.Table:
        h = batch.column("h").to_numpy(zero_copy_only=False)
        return batch.append_column(
            "part", pa.array((h % np.uint64(P)).astype(np.int64), type=pa.int64())
        )

    def _mark(g: pa.Table) -> pa.Table:
        h = g.column("h").to_numpy(zero_copy_only=False)
        ev = g.column("is_eval").to_numpy(zero_copy_only=False)
        ids = g.column("doc_id").to_numpy(zero_copy_only=False)
        train_set = np.unique(h[~ev])
        keep = ev
        he = h[keep]
        pos = np.searchsorted(train_set, he)
        ok = pos < len(train_set)
        exact = np.zeros(len(he), dtype=bool)
        exact[ok] = train_set[pos[ok]] == he[ok]
        bm = ray.get(bitmap_ref)
        bloom = np.ones(len(he), dtype=bool)
        for s in salts:
            bloom &= bm[(_splitmix64(he ^ s) % np.uint64(m_bits)).astype(np.int64)]
        return pa.table(
            {
                "doc_id": pa.array(ids[keep], type=pa.int64()),
                "bloom_hit": pa.array(bloom.astype(np.int64), type=pa.int64()),
                "exact_hit": pa.array(exact.astype(np.int64), type=pa.int64()),
            }
        )

    return (
        fp.map_batches(_bucket, batch_format="pyarrow")
        .groupby("part")
        .map_groups(_mark, batch_format="pyarrow")
    )


# ---- KLL quantile sketch --------------------------------------------------


class KLL:
    """Deterministic KLL-style quantile sketch (Karnin–Lang–Liberty,
    FOCS 2016, public algorithm) with parity-alternating compaction
    instead of coin flips: each level tracks its compaction count and
    keeps the odd/even positions by count parity. Same O(k·log(n/k))
    space and mergeability; determinism is what lets the engine promise
    bit-stable results at any parallelism (the randomized variant's
    guarantees are probabilistic either way — the alternating rule is
    the classic derandomization used by streaming libraries' test
    modes).

    Levels hold SORTED int64 arrays; items at level i carry weight 2^i.
    """

    def __init__(self, k: int = 128):
        self.k = k
        self.levels: list[np.ndarray] = [np.empty(0, dtype=np.int64)]
        self.parity: list[int] = [0]

    def add(self, values: np.ndarray) -> "KLL":
        v = np.sort(np.asarray(values, dtype=np.int64))
        self.levels[0] = np.concatenate([self.levels[0], v])
        self._compress()
        return self

    def merge(self, other: "KLL") -> "KLL":
        while len(self.levels) < len(other.levels):
            self.levels.append(np.empty(0, dtype=np.int64))
            self.parity.append(0)
        for i, lv in enumerate(other.levels):
            self.levels[i] = np.concatenate([self.levels[i], lv])
            # parity counters also merge — keeps the result independent
            # of which operand absorbed which
            self.parity[i] = (self.parity[i] + other.parity[i]) % 2
        self._compress()
        return self

    def _compress(self) -> None:
        i = 0
        while i < len(self.levels):
            lv = np.sort(self.levels[i])
            if len(lv) <= self.k:
                self.levels[i] = lv
                i += 1
                continue
            # compact the whole level: an even-length body is halved —
            # every other item (parity-chosen) moves up at DOUBLE
            # weight, its neighbor is discarded (weight conserved:
            # m items · 2^i  →  m/2 items · 2^(i+1)); an odd leftover
            # item stays at this level
            m = len(lv) - (len(lv) % 2)
            body, leftover = lv[:m], lv[m:]
            promoted = body[self.parity[i] % 2 :: 2]
            self.levels[i] = leftover
            self.parity[i] += 1
            if i + 1 == len(self.levels):
                self.levels.append(np.empty(0, dtype=np.int64))
                self.parity.append(0)
            self.levels[i + 1] = np.concatenate([self.levels[i + 1], promoted])
            i += 1

    def items(self) -> tuple[np.ndarray, np.ndarray]:
        vals = np.concatenate(self.levels)
        wts = np.concatenate(
            [np.full(len(lv), 1 << i, dtype=np.int64) for i, lv in enumerate(self.levels)]
        )
        order = np.argsort(vals, kind="stable")
        return vals[order], wts[order]

    def n(self) -> int:
        return int(sum((1 << i) * len(lv) for i, lv in enumerate(self.levels)))

    def quantile(self, q: float) -> int:
        vals, wts = self.items()
        if not len(vals):
            return 0
        cum = np.cumsum(wts)
        target = q * cum[-1]
        return int(vals[min(int(np.searchsorted(cum, target)), len(vals) - 1)])

    def to_rows(self) -> pa.Table:
        rows_lvl, rows_val = [], []
        for i, lv in enumerate(self.levels):
            rows_lvl.extend([i] * len(lv))
            rows_val.extend(lv.tolist())
        return pa.table(
            {
                "lvl": pa.array(rows_lvl, type=pa.int64()),
                "val": pa.array(rows_val, type=pa.int64()),
                "par": pa.array(
                    [self.parity[min(i, len(self.parity) - 1)] for i in rows_lvl],
                    type=pa.int64(),
                ),
            }
        )

    @classmethod
    def from_rows(cls, lvl: np.ndarray, val: np.ndarray, par: np.ndarray, k: int) -> "KLL":
        sk = cls(k)
        top = int(lvl.max()) if len(lvl) else 0
        sk.levels = [np.sort(val[lvl == i]).astype(np.int64) for i in range(top + 1)]
        sk.parity = [
            int(par[lvl == i][0]) % 2 if (lvl == i).any() else 0 for i in range(top + 1)
        ]
        return sk


def kll_quantiles(
    ds,
    value_fn,
    bucket_col: str,
    *,
    bucket_step: int = 64,
    k: int = 128,
    quantiles: tuple = (0.01, 0.25, 0.5, 0.75, 0.99),
) -> pa.Table:
    """Distributed deterministic KLL quantiles.

    Parallelism-invariance by construction: rows are assigned to FIXED
    logical buckets (``bucket_col // bucket_step`` — not Ray blocks, so
    block boundaries can't leak into the result), one sketch is built
    per bucket inside a ``groupby(bucket)`` task, and bucket sketches
    merge on the driver in ascending bucket order (each sketch is
    O(k·log n) ints — the driver never sees raw values). Returns
    (q_pct, est, n) — rows-only in the driver contract (no SQL can
    replay compactions); pytest pins determinism across repartitions
    and the rank-error bound vs exact order statistics.
    """
    import pandas as pd

    def _bucket_sketch(group: pd.DataFrame) -> pd.DataFrame:
        vals = value_fn(group)
        sk = KLL(k).add(np.asarray(vals, dtype=np.int64))
        t = sk.to_rows()
        return pd.DataFrame(
            {
                "bucket": np.full(t.num_rows, int(group["__bucket"].iloc[0]), dtype=np.int64),
                "lvl": t.column("lvl").to_numpy(),
                "val": t.column("val").to_numpy(),
                "par": t.column("par").to_numpy(),
            }
        )

    def _with_bucket(b: pa.Table) -> pa.Table:
        key = b.column(bucket_col).to_numpy(zero_copy_only=False).astype(np.int64)
        return b.append_column(
            "__bucket", pa.array(key // bucket_step, type=pa.int64())
        )

    rows = (
        ds.map_batches(_with_bucket, batch_format="pyarrow")
        .groupby("__bucket")
        .map_groups(_bucket_sketch, batch_format="pandas")
        .to_pandas()
    )
    merged = KLL(k)
    for b in sorted(rows["bucket"].unique()):
        sub = rows[rows["bucket"] == b]
        merged.merge(
            KLL.from_rows(
                sub["lvl"].to_numpy(), sub["val"].to_numpy(), sub["par"].to_numpy(), k
            )
        )
    n = merged.n()
    return pa.table(
        {
            "q_pct": pa.array([int(q * 100) for q in quantiles], type=pa.int64()),
            "est": pa.array([merged.quantile(q) for q in quantiles], type=pa.int64()),
            "n": pa.array([n] * len(quantiles), type=pa.int64()),
        }
    )
