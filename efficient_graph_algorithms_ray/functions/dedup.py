"""Deduplication operators — exact and near-dup — over a documents table.

Scale shapes (per the Ray guide's aggregation-at-scale pattern):

- exact: content-hash column in a vectorized ``map_batches`` →
  ``groupby(hash)`` keeps one row per distinct content (min doc_id
  representative). The shuffle moves 16-byte hashes, never text.
- MinHash+LSH: per-batch vectorized signatures (k=128 perms via
  64-bit universal hashing over w-shingles) → explode to
  (band, band_hash, doc_id) rows → ``groupby(band, band_hash)`` →
  candidate pairs within buckets → signature-estimated Jaccard filter.
- SimHash: 64-bit sketch → 4×16-bit band buckets → candidates →
  exact Hamming verify.
- embedding cosine: random-hyperplane LSH buckets → exact cosine
  verify within bucket (see functions/similarity.py for the ANN path).

Near-dup *clusters* compose with the engine's own connected-components
superstep kernel: candidate pairs are just edges (pipelines.components).
Exactness at small scale is pytest-verified against brute-force
Jaccard / Hamming / cosine oracles (tests/test_dedup.py).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import polars as pl

from ..config import HASH_SEED
from .text import _TOKEN_RE, hash_token

MINHASH_PERMS = 128
LSH_BANDS = 16  # 16 bands × 8 rows
LSH_ROWS = MINHASH_PERMS // LSH_BANDS
_MERSENNE = np.uint64((1 << 61) - 1)
# skew guard: a degenerate bucket (empty docs, constant content) would be
# O(n²) pairs in ONE task — skip oversized buckets instead (real near-dups
# still collide in their other 15 bands / 3 bands with normal-sized buckets)
MAX_BUCKET = 512


def popcount64(x: np.ndarray) -> np.ndarray:
    """Vectorized 64-bit popcount (numpy<2 has no bitwise_count):
    one byte-view + unpackbits pass, no per-row Python."""
    if len(x) == 0:
        return np.zeros(0, dtype=np.int64)
    by = np.ascontiguousarray(x, dtype=np.uint64).view(np.uint8)
    return np.unpackbits(by).reshape(len(x), 64).sum(axis=1).astype(np.int64)


def _perm_params(k: int = MINHASH_PERMS, seed: int = HASH_SEED):
    rng = np.random.Generator(np.random.Philox(key=[seed, 0]))
    a = rng.integers(1, (1 << 61) - 1, size=k, dtype=np.uint64) | np.uint64(1)
    b = rng.integers(0, (1 << 61) - 1, size=k, dtype=np.uint64)
    return a, b


_PERM_A, _PERM_B = _perm_params()


def content_hash_batch(batch: pa.Table) -> pa.Table:
    """Vectorized 64-bit content hash of text (polars seeded xxhash).

    Emitted as the SIGNED int64 reinterpretation: Ray's sort-shuffle
    infers int64 for group keys, and uint64 values past 2^63 force a
    per-block pickled-object fallback (observed in the gate logs).
    Same bits, same collision behavior — only the key dtype changes."""
    h = pl.Series(pl.from_arrow(batch.column("text"))).hash(seed=HASH_SEED)
    return batch.append_column(
        "content_hash", pa.array(h.to_numpy().view(np.int64), type=pa.int64())
    )


def exact_dedup(docs_ds):
    """→ (rep_doc_id, n_copies) one row per distinct text content.

    groupby on the 8-byte hash, not the text; the min-doc_id
    representative matches the SQL ``GROUP BY text`` oracle (hash
    collisions at 2^64 are negligible and pytest cross-checks vs text
    grouping at small scale).
    """
    from ray.data.aggregate import Count, Min

    hashed = docs_ds.map_batches(content_hash_batch, batch_format="pyarrow")
    agg = hashed.groupby("content_hash").aggregate(
        Min("doc_id", alias_name="rep_doc_id"), Count(alias_name="n_copies")
    )
    return agg.select_columns(["rep_doc_id", "n_copies"])


def shingle_hashes(text: str, w: int = 3) -> np.ndarray:
    """Distinct 64-bit hashes of w-word shingles.

    Docs shorter than the shingle width have NO shingles (and thus
    never form near-dup pairs) — matching the SQL oracle's
    generate_series semantics exactly; padding such docs would give
    every short/empty doc an identical signature and pair them all."""
    toks = _TOKEN_RE.findall(text)
    if len(toks) < w:
        return np.empty(0, dtype=np.uint64)
    hs = np.array(
        [hash_token(" ".join(toks[i : i + w])) for i in range(len(toks) - w + 1)],
        dtype=np.uint64,
    )
    return np.unique(hs)


def winnow_fingerprints(text: str, w: int = 3, window: int = 4) -> np.ndarray:
    """Winnowing fingerprints (Schleimer, Wilkerson & Aiken, SIGMOD
    2003): the distinct minimum shingle-hash over every sliding window
    of ``window`` consecutive w-token shingles (positional, NOT the
    deduped set ``shingle_hashes`` returns). Guarantee: any two
    documents sharing a run of ``window + w - 1`` tokens share at
    least one fingerprint — the density-bounded alternative to keeping
    every shingle. Docs with fewer than ``window`` shingles (but ≥ 1)
    emit the single global minimum; docs shorter than ``w`` tokens
    emit none (the shingle_hashes convention)."""
    toks = _TOKEN_RE.findall(text)
    if len(toks) < w:
        return np.empty(0, dtype=np.uint64)
    hs = np.array(
        [hash_token(" ".join(toks[i : i + w])) for i in range(len(toks) - w + 1)],
        dtype=np.uint64,
    )
    if len(hs) < window:
        return np.array([hs.min()], dtype=np.uint64)
    from numpy.lib.stride_tricks import sliding_window_view

    return np.unique(sliding_window_view(hs, window).min(axis=1))


def winnow_batch(batch: pa.Table, w: int = 3, window: int = 4) -> pa.Table:
    """(doc_id, fp int64) — one row per distinct winnowing fingerprint
    per document (int64-reinterpreted, the content_hash convention)."""
    ids = batch.column("doc_id").to_pylist()
    texts = pc.fill_null(batch.column("text"), "").to_pylist()
    out_id: list[int] = []
    out_fp: list[np.ndarray] = []
    for doc_id, t in zip(ids, texts):
        fps = winnow_fingerprints(t, w=w, window=window)
        out_id.extend([doc_id] * len(fps))
        out_fp.append(fps)
    fp = (
        np.concatenate(out_fp).view(np.int64)
        if out_fp
        else np.empty(0, dtype=np.int64)
    )
    return pa.table(
        {
            "doc_id": pa.array(out_id, type=pa.int64()),
            "fp": pa.array(fp, type=pa.int64()),
        }
    )


def positional_shingle_hashes(text: str, w: int = 5) -> np.ndarray:
    """POSITIONAL w-token shingle hashes (one per occurrence, order
    kept — not the deduped set ``shingle_hashes`` returns). Docs
    shorter than ``w`` tokens emit none."""
    toks = _TOKEN_RE.findall(text)
    if len(toks) < w:
        return np.empty(0, dtype=np.uint64)
    return np.array(
        [hash_token(" ".join(toks[i : i + w])) for i in range(len(toks) - w + 1)],
        dtype=np.uint64,
    )


def dup_ngram_stats(docs_ds, *, w: int = 5, num_partitions: int = 32):
    """Per-document exact-substring duplication profile (the
    ExactSubstr statistic of Lee et al. 2022, "Deduplicating Training
    Data Makes Language Models Better", recast per document): for
    every document with ≥ w tokens, count how many of its positional
    w-token shingle OCCURRENCES also appear in at least one OTHER
    document. Returns (doc_id, n_shingles, n_dup, dup_frac) where
    dup_frac = n_dup / n_shingles as one IEEE division (SQL-parity).

    Plan (the contamination_counts co-shuffle shape): every doc emits
    one row per DISTINCT shingle hash carrying its occurrence count —
    pre-aggregated map-side, so the shuffle moves ≤ one row per
    (doc, distinct shingle) — bucketed by ``hash % P`` so each reduce
    group sees the full global membership of its hashes; a shingle is
    duplicated iff ≥ 2 distinct docs carry it in the bucket. Per-group
    per-doc partial sums feed a final combiner-backed
    ``groupby(doc_id).sum``. Two shuffles, no broadcast, no driver
    state; the corpus-wide shingle table never materializes in one
    place. At larger scale raise ``num_partitions`` with the cluster —
    buckets split uniformly by hash."""
    from ray.data.aggregate import Sum

    P = num_partitions

    def _sh(batch: pa.Table) -> pa.Table:
        ids = batch.column("doc_id").to_pylist()
        texts = pc.fill_null(batch.column("text"), "").to_pylist()
        out_id: list[np.ndarray] = []
        out_h: list[np.ndarray] = []
        out_c: list[np.ndarray] = []
        for i, t in zip(ids, texts):
            hs = positional_shingle_hashes(t, w=w)
            if len(hs):
                uh, cnt = np.unique(hs, return_counts=True)
                out_h.append(uh)
                out_c.append(cnt.astype(np.int64))
                out_id.append(np.full(len(uh), i, dtype=np.int64))
        h = np.concatenate(out_h) if out_h else np.empty(0, np.uint64)
        d = np.concatenate(out_id) if out_id else np.empty(0, np.int64)
        c = np.concatenate(out_c) if out_c else np.empty(0, np.int64)
        return pa.table(
            {
                "part": pa.array((h % np.uint64(P)).astype(np.int64)),
                "h": pa.array(h, type=pa.uint64()),
                "doc_id": pa.array(d, type=pa.int64()),
                "occ": pa.array(c, type=pa.int64()),
            }
        )

    def _mark(group: pa.Table) -> pa.Table:
        h = group.column("h").to_numpy(zero_copy_only=False)
        d = group.column("doc_id").to_numpy(zero_copy_only=False)
        occ = group.column("occ").to_numpy(zero_copy_only=False)
        # rows are unique per (doc, h) ⇒ docs-per-hash = group size of h
        order = np.argsort(h, kind="stable")
        hs, ds, os_ = h[order], d[order], occ[order]
        # run-length over sorted hashes
        starts = np.flatnonzero(np.r_[True, hs[1:] != hs[:-1]])
        sizes = np.diff(np.r_[starts, len(hs)])
        dup_mask = np.repeat(sizes >= 2, sizes)
        n_dup_rows = np.where(dup_mask, os_, 0)
        docs, inv = np.unique(ds, return_inverse=True)
        n_sh = np.bincount(inv, weights=os_).astype(np.int64)
        n_dup = np.bincount(inv, weights=n_dup_rows).astype(np.int64)
        return pa.table(
            {
                "doc_id": pa.array(docs, type=pa.int64()),
                "n_sh": pa.array(n_sh, type=pa.int64()),
                "n_dup": pa.array(n_dup, type=pa.int64()),
            }
        )

    def _frac(batch: pa.Table) -> pa.Table:
        n_sh = batch.column("n_shingles").to_numpy()
        n_dup = batch.column("n_dup").to_numpy()
        return pa.table(
            {
                "doc_id": batch.column("doc_id"),
                "n_shingles": batch.column("n_shingles"),
                "n_dup": batch.column("n_dup"),
                "dup_frac": pa.array(
                    n_dup.astype(np.float64) / n_sh.astype(np.float64),
                    type=pa.float64(),
                ),
            }
        )

    return (
        docs_ds.map_batches(_sh, batch_format="pyarrow")
        .groupby("part")
        .map_groups(_mark, batch_format="pyarrow")
        .groupby("doc_id")
        .aggregate(
            Sum("n_sh", alias_name="n_shingles"),
            Sum("n_dup", alias_name="n_dup"),
        )
        .map_batches(_frac, batch_format="pyarrow")
    )


def minhash_signature(shingles: np.ndarray) -> np.ndarray:
    """k-perm MinHash signature via universal hashing mod 2^61-1."""
    if len(shingles) == 0:
        return np.zeros(MINHASH_PERMS, dtype=np.uint64)
    s = shingles % _MERSENNE
    with np.errstate(over="ignore"):
        vals = (s[None, :] * _PERM_A[:, None] + _PERM_B[:, None]) % _MERSENNE
    return vals.min(axis=1).astype(np.uint64)


def minhash_batch(batch: pa.Table) -> pa.Table:
    """(doc_id, sig: list<uint64>[128]) per document."""
    from ..util import list_array

    texts = pc.fill_null(batch.column("text"), "").to_pylist()
    shingles = [shingle_hashes(t) for t in texts]
    keep = pa.array([len(s) > 0 for s in shingles])  # shingle-less docs drop out
    sigs = [minhash_signature(s) for s in shingles if len(s) > 0]
    return pa.table(
        {
            "doc_id": batch.column("doc_id").filter(keep),
            "sig": list_array(sigs, np.uint64, pa.uint64()),
        }
    )


def _band_rows(batch: pa.Table) -> pa.Table:
    """Explode signatures → (band, band_hash, doc_id, sig) LSH rows.

    The FULL signature rides along on every band row so the bucket
    group can verify candidates locally — a ×LSH_BANDS shuffle-volume
    amplification (16 KB/doc at k=128), bought to keep verification
    co-partitioned: no driver pass, no whole-corpus broadcast. (The
    alternative at extreme scale is a doc_id hash-join of candidate
    pairs back to the signature table.)"""
    from ..util import list_array, list_rows

    doc_ids = batch.column("doc_id").to_numpy(zero_copy_only=False)
    sigs = list_rows(batch, "sig")
    band, bhash, dids, sig_rep = [], [], [], []
    for did, sig in zip(doc_ids, sigs):
        bands = sig.reshape(LSH_BANDS, LSH_ROWS)
        with np.errstate(over="ignore"):
            bh = (bands * _PERM_A[:LSH_ROWS][None, :]).sum(axis=1, dtype=np.uint64)
        band.append(np.arange(LSH_BANDS, dtype=np.int64))
        bhash.append(bh)
        dids.append(np.full(LSH_BANDS, did, dtype=np.int64))
        sig_rep.extend([sig] * LSH_BANDS)
    return pa.table(
        {
            "band": pa.array(np.concatenate(band) if band else np.empty(0, np.int64), type=pa.int64()),
            "band_hash": pa.array(
                np.concatenate(bhash) if bhash else np.empty(0, np.uint64), type=pa.uint64()
            ),
            "doc_id": pa.array(
                np.concatenate(dids) if dids else np.empty(0, np.int64), type=pa.int64()
            ),
            "sig": list_array(sig_rep, np.uint64, pa.uint64()),
        }
    )


def restrict_bands_to(bands_ds, keep_ids_ds, num_partitions: int = 32):
    """Filter LSH band rows to the docs in ``keep_ids_ds`` (doc_id,)
    WITHOUT a broadcast membership set: marker rows (band = −1) ride
    one ``groupby(doc_id % P)`` co-shuffle next to the band rows, and
    each partition group does a vectorized ``np.isin`` — the keep set
    can be O(corpus) and never touches the driver."""
    from ..util import list_array

    def _markers(b: pa.Table) -> pa.Table:
        n = b.num_rows
        return pa.table(
            {
                "band": pa.array(np.full(n, -1, dtype=np.int64)),
                "band_hash": pa.array(np.zeros(n, dtype=np.uint64), type=pa.uint64()),
                "doc_id": b.column("doc_id").cast(pa.int64()),
                "sig": list_array(
                    [np.empty(0, np.uint64)] * n, np.uint64, pa.uint64()
                ),
            }
        )

    def _with_part(b: pa.Table) -> pa.Table:
        ids = b.column("doc_id").to_numpy(zero_copy_only=False)
        return b.append_column(
            "part", pa.array((ids % num_partitions).astype(np.int64))
        )

    both = (
        bands_ds.union(keep_ids_ds.map_batches(_markers, batch_format="pyarrow"))
        .map_batches(_with_part, batch_format="pyarrow")
    )

    def _filter(g: pa.Table) -> pa.Table:
        band = g.column("band").to_numpy(zero_copy_only=False)
        ids = g.column("doc_id").to_numpy(zero_copy_only=False)
        kept = np.unique(ids[band < 0])
        keep = (band >= 0) & np.isin(ids, kept)
        return g.drop_columns(["part"]).filter(pa.array(keep))

    return both.groupby("part").map_groups(_filter, batch_format="pyarrow")


def pairs_from_band_rows(bands, threshold: float):
    """(band, band_hash, doc_id, sig) rows → verified near-dup pairs
    (doc_a, doc_b, est_jaccard): bucket-local verify + one hash
    aggregate to collapse cross-band duplicates."""
    from ray.data.aggregate import Min

    def _bucket_verify(group: pa.Table) -> pa.Table:
        # pure pyarrow group fn (no pandas detour): dedupe-by-doc_id via
        # stable argsort + first-of-run (duplicate rows carry identical
        # sigs, so keep-first ≡ the old drop_duplicates), signatures as
        # one offsets-based reshape of the fixed-width list column.
        from ..util import flatten_list_column

        empty = pa.table(
            {
                "doc_a": pa.array([], type=pa.int64()),
                "doc_b": pa.array([], type=pa.int64()),
                "est_jaccard": pa.array([], type=pa.float64()),
            }
        )
        did = group.column("doc_id").to_numpy(zero_copy_only=False).astype(np.int64)
        order = np.argsort(did, kind="stable")
        d_s = did[order]
        firsts = np.ones(len(d_s), dtype=bool)
        firsts[1:] = d_s[1:] != d_s[:-1]
        rows = order[firsts]
        n = len(rows)
        if n < 2 or n > MAX_BUCKET:
            return empty
        sig_mat = flatten_list_column(group, "sig").reshape(len(group), -1)[rows]
        ids = did[rows]
        ia, ib = np.triu_indices(n, 1)
        est = (sig_mat[ia] == sig_mat[ib]).mean(axis=1)
        keep = est >= threshold
        # est = matches/128 is an exact binary fraction — emit it raw
        # (identical double in DuckDB; rounding a .5-boundary rational
        # would split on half-even vs half-away)
        return pa.table(
            {
                "doc_a": pa.array(ids[ia][keep], type=pa.int64()),
                "doc_b": pa.array(ids[ib][keep], type=pa.int64()),
                "est_jaccard": pa.array(est[keep], type=pa.float64()),
            }
        )

    pairs = (
        bands.groupby(["band", "band_hash"])
        .map_groups(_bucket_verify, batch_format="pyarrow")
    )
    out = pairs.groupby(["doc_a", "doc_b"]).aggregate(
        Min("est_jaccard", alias_name="est_jaccard")
    )
    return out.select_columns(["doc_a", "doc_b", "est_jaccard"])


def minhash_candidate_pairs(docs_ds, threshold: float = 0.5):
    """MinHash+LSH near-dup pairs with signature-estimated Jaccard ≥ threshold.

    Returns Dataset (doc_a, doc_b, est_jaccard). Verification happens
    INSIDE each (band, band_hash) bucket group against the signatures
    co-shuffled with the band rows — fully partition-local; buckets
    larger than MAX_BUCKET are skipped (degenerate-content skew guard).
    Cross-band duplicates collapse via one hash aggregate (the est is
    a pure function of the pair, identical in every band).
    """
    sigs = docs_ds.map_batches(minhash_batch, batch_format="pyarrow")
    bands = sigs.map_batches(_band_rows, batch_format="pyarrow")
    return pairs_from_band_rows(bands, threshold)


def minhash_exact_jaccard_pairs(docs_ds, threshold: float = 0.3):
    """Exact w-shingle Jaccard for MinHash-LSH candidate pairs — the
    verify step of the near-dup pipeline, fully partition-local.

    The distinct shingle-hash SET rides the band rows next to the
    signature (≈ sig-sized for normal prose), so each bucket group
    verifies exactly (est ≥ threshold gate, then exact |A∩B|/|A∪B|)
    with no driver text scan and no corpus broadcast (round 1 collected
    candidate texts through the driver). Returns (doc_a, doc_b,
    jaccard, an exact double); cross-band duplicates collapse via one hash aggregate.
    """
    from ray.data.aggregate import Min

    from ..util import list_array, list_rows

    def _sig_shingles(batch: pa.Table) -> pa.Table:
        texts = pc.fill_null(batch.column("text"), "").to_pylist()
        shingles = [shingle_hashes(t) for t in texts]
        keep = pa.array([len(s) > 0 for s in shingles])
        shingles = [s for s in shingles if len(s) > 0]
        sigs = [minhash_signature(s) for s in shingles]
        return pa.table(
            {
                "doc_id": batch.column("doc_id").filter(keep),
                "sig": list_array(sigs, np.uint64, pa.uint64()),
                "shingles": list_array(shingles, np.uint64, pa.uint64()),
            }
        )

    def _bands(batch: pa.Table) -> pa.Table:
        doc_ids = batch.column("doc_id").to_numpy(zero_copy_only=False)
        sigs = list_rows(batch, "sig")
        shingles = list_rows(batch, "shingles")
        band, bhash, dids, sig_rep, sh_rep = [], [], [], [], []
        for did, sig, sh in zip(doc_ids, sigs, shingles):
            bands = sig.reshape(LSH_BANDS, LSH_ROWS)
            with np.errstate(over="ignore"):
                bh = (bands * _PERM_A[:LSH_ROWS][None, :]).sum(axis=1, dtype=np.uint64)
            band.append(np.arange(LSH_BANDS, dtype=np.int64))
            bhash.append(bh)
            dids.append(np.full(LSH_BANDS, did, dtype=np.int64))
            sig_rep.extend([sig] * LSH_BANDS)
            sh_rep.extend([sh] * LSH_BANDS)
        return pa.table(
            {
                "band": pa.array(
                    np.concatenate(band) if band else np.empty(0, np.int64), type=pa.int64()
                ),
                "band_hash": pa.array(
                    np.concatenate(bhash) if bhash else np.empty(0, np.uint64), type=pa.uint64()
                ),
                "doc_id": pa.array(
                    np.concatenate(dids) if dids else np.empty(0, np.int64), type=pa.int64()
                ),
                "sig": list_array(sig_rep, np.uint64, pa.uint64()),
                "shingles": list_array(sh_rep, np.uint64, pa.uint64()),
            }
        )

    def _bucket_exact(group: pa.Table) -> pa.Table:
        from ..util import flatten_list_column, list_rows

        empty = pa.table(
            {
                "doc_a": pa.array([], type=pa.int64()),
                "doc_b": pa.array([], type=pa.int64()),
                "jaccard": pa.array([], type=pa.float64()),
            }
        )
        did = group.column("doc_id").to_numpy(zero_copy_only=False).astype(np.int64)
        order = np.argsort(did, kind="stable")
        d_s = did[order]
        firsts = np.ones(len(d_s), dtype=bool)
        firsts[1:] = d_s[1:] != d_s[:-1]
        rows_i = order[firsts]
        n = len(rows_i)
        if n < 2 or n > MAX_BUCKET:
            return empty
        ids = did[rows_i]
        sig_mat = flatten_list_column(group, "sig").reshape(len(group), -1)[rows_i]
        sh_all = list_rows(group, "shingles")
        sh = [sh_all[i] for i in rows_i]
        ia, ib = np.triu_indices(n, 1)
        est = (sig_mat[ia] == sig_mat[ib]).mean(axis=1)
        keep = np.flatnonzero(est >= threshold)
        out_a, out_b, out_j = [], [], []
        for kk in keep:  # est-gated pairs only — small per bucket
            x, y = int(ia[kk]), int(ib[kk])
            sa, sb = sh[x], sh[y]
            inter = len(np.intersect1d(sa, sb, assume_unique=True))
            union = len(sa) + len(sb) - inter
            # raw correctly-rounded double of two exact ints — identical
            # in DuckDB; rounding rationals risks half-even splits
            j = 1.0 if union == 0 else inter / union
            out_a.append(ids[x])
            out_b.append(ids[y])
            out_j.append(j)
        if not out_a:
            return empty
        return pa.table(
            {
                "doc_a": pa.array(np.array(out_a, dtype=np.int64), type=pa.int64()),
                "doc_b": pa.array(np.array(out_b, dtype=np.int64), type=pa.int64()),
                "jaccard": pa.array(np.array(out_j, dtype=np.float64), type=pa.float64()),
            }
        )

    rows = docs_ds.map_batches(_sig_shingles, batch_format="pyarrow").map_batches(
        _bands, batch_format="pyarrow"
    )
    pairs = rows.groupby(["band", "band_hash"]).map_groups(_bucket_exact, batch_format="pyarrow")
    out = pairs.groupby(["doc_a", "doc_b"]).aggregate(Min("jaccard", alias_name="jaccard"))
    return out.select_columns(["doc_a", "doc_b", "jaccard"])


def simhash_candidate_pairs(docs_ds, max_hamming: int = 8):
    """SimHash near-dup pairs: 4×16-bit band buckets → exact Hamming verify."""
    import pandas as pd

    from .text import simhash64_batch

    sigs = docs_ds.map_batches(simhash64_batch, batch_format="pyarrow").materialize()

    def _bands(batch: pa.Table) -> pa.Table:
        sh = batch.column("simhash").to_numpy(zero_copy_only=False).astype(np.uint64)
        did = batch.column("doc_id").to_numpy(zero_copy_only=False)
        bands, keys, ids, sims = [], [], [], []
        for b in range(4):
            bands.append(np.full(len(sh), b, dtype=np.int64))
            keys.append(((sh >> np.uint64(16 * b)) & np.uint64(0xFFFF)).astype(np.int64))
            ids.append(did)
            sims.append(sh)
        return pa.table(
            {
                "band": pa.array(np.concatenate(bands), type=pa.int64()),
                "key": pa.array(np.concatenate(keys), type=pa.int64()),
                "doc_id": pa.array(np.concatenate(ids), type=pa.int64()),
                "simhash": pa.array(np.concatenate(sims), type=pa.uint64()),
            }
        )

    def _pairs(group: pa.Table) -> pa.Table:
        empty = pa.table(
            {
                "doc_a": pa.array([], type=pa.int64()),
                "doc_b": pa.array([], type=pa.int64()),
                "hamming": pa.array([], type=pa.int64()),
            }
        )
        did = group.column("doc_id").to_numpy(zero_copy_only=False).astype(np.int64)
        shc = group.column("simhash").to_numpy(zero_copy_only=False).astype(np.uint64)
        order = np.argsort(did, kind="stable")
        d_s = did[order]
        firsts = np.ones(len(d_s), dtype=bool)
        firsts[1:] = d_s[1:] != d_s[:-1]
        rows_i = order[firsts]
        ids, sh = did[rows_i], shc[rows_i]
        if len(ids) < 2 or len(ids) > MAX_BUCKET:  # degenerate-bucket skew guard
            return empty
        ia, ib = np.triu_indices(len(ids), 1)
        ham = popcount64(sh[ia] ^ sh[ib])
        keep = ham <= max_hamming
        return pa.table(
            {
                "doc_a": pa.array(ids[ia][keep], type=pa.int64()),
                "doc_b": pa.array(ids[ib][keep], type=pa.int64()),
                "hamming": pa.array(ham[keep].astype(np.int64), type=pa.int64()),
            }
        )

    pairs = (
        sigs.map_batches(_bands, batch_format="pyarrow")
        .groupby(["band", "key"])
        .map_groups(_pairs, batch_format="pyarrow")
    )
    # hamming is a pure function of the pair — one hash aggregate
    # replaces the round-1 sort-shuffle + per-group pandas head(1)
    from ray.data.aggregate import Min

    out = pairs.groupby(["doc_a", "doc_b"]).aggregate(Min("hamming", alias_name="hamming"))
    return out.select_columns(["doc_a", "doc_b", "hamming"])


def exact_jaccard(text_a: str, text_b: str, w: int = 3) -> float:
    """Brute-force w-shingle Jaccard (the pytest oracle for MinHash)."""
    sa, sb = set(shingle_hashes(text_a, w)), set(shingle_hashes(text_b, w))
    if not sa and not sb:
        return 1.0
    return len(sa & sb) / len(sa | sb)


def neardup_clusters(
    docs_ds,
    pairs_ds,
    num_partitions: int = 8,
    ckpt_dir: str | None = None,
    carry: list[str] | None = None,
):
    """Near-dup pairs → clusters via the engine's own CC superstep kernel.

    Every doc is a vertex (so singletons keep their own cluster);
    candidate pairs are edges. Returns (doc_id, cluster) where
    cluster = min doc id of the connected near-dup group; ``carry``
    names extra doc columns to keep alongside (e.g. ``n_chars`` for a
    retention policy downstream).
    """
    import tempfile

    import ray.data as rd

    from ..config import EngineConfig
    from ..pipelines.components import connected_components
    from ..pipelines.graph_build import build_graph

    def _pair_edges(batch: pa.Table) -> pa.Table:
        return pa.table(
            {
                "src": batch.column("doc_a").cast(pa.uint64()),
                "dst": batch.column("doc_b").cast(pa.uint64()),
            }
        )

    extra = list(carry or [])
    edges = pairs_ds.map_batches(_pair_edges, batch_format="pyarrow")
    if edges.count() == 0:
        return docs_ds.map_batches(
            lambda b: pa.table(
                {
                    "doc_id": b.column("doc_id"),
                    "cluster": b.column("doc_id"),
                    **{c: b.column(c) for c in extra},
                }
            ),
            batch_format="pyarrow",
        )
    g = build_graph(edges, EngineConfig(num_partitions=num_partitions), directed=False)
    ckpt = ckpt_dir or tempfile.mkdtemp(prefix="ega_neardup_cc_", dir="/tmp")
    comp, _ = connected_components(g, ckpt)
    # broadcast the clustered set as two SORTED numpy arrays (16 B/row,
    # ray.put once) — vectorized searchsorted per batch, no Python dict,
    # no per-row loop. The clustered set is the docs that appeared in a
    # near-dup pair — a small fraction of the corpus; if it ever isn't,
    # flip to a doc_id-partitioned join of comp against docs.
    import ray

    ctbl = pa.concat_tables(
        comp.select_columns(["vid", "component"]).iter_batches(
            batch_size=None, batch_format="pyarrow"
        )
    )
    cvid = ctbl.column("vid").to_numpy(zero_copy_only=False).astype(np.int64)
    ccomp = ctbl.column("component").to_numpy(zero_copy_only=False).astype(np.int64)
    order = np.argsort(cvid)
    arr_ref = ray.put((cvid[order], ccomp[order]))

    def _fill(batch: pa.Table) -> pa.Table:
        cv, cc = ray.get(arr_ref)
        ids = batch.column("doc_id").to_numpy(zero_copy_only=False).astype(np.int64)
        cl = ids.copy()
        pos = np.searchsorted(cv, ids)
        ok = pos < len(cv)
        ok[ok] = cv[pos[ok]] == ids[ok]
        cl[ok] = cc[pos[ok]]
        return pa.table(
            {
                "doc_id": batch.column("doc_id"),
                "cluster": pa.array(cl, type=pa.int64()),
                **{c: batch.column(c) for c in extra},
            }
        )

    return docs_ds.map_batches(_fill, batch_format="pyarrow")


def neardup_keep_canonical(docs_ds, pairs_ds, num_partitions: int = 8):
    """Retention policy over near-dup clusters (the step RefinedWeb /
    Dolma run after clustering): keep ONE canonical document per
    cluster — the longest (``n_chars``), ties to the smallest doc_id.
    Returns (doc_id, cluster, n_chars) of the survivors.

    Plan: cluster labels ride the doc rows (``neardup_clusters`` with
    ``carry``); a per-block vectorized arg-best partial (lexsort +
    first-of-run) reduces each block to ≤ one row per cluster before
    the single small ``groupby(cluster).map_groups`` merge — the text
    never shuffles and no stage holds more than a block.
    """
    cl = neardup_clusters(
        docs_ds, pairs_ds, num_partitions=num_partitions, carry=["n_chars"]
    )

    def _best(tbl: pa.Table) -> pa.Table:
        c = tbl.column("cluster").to_numpy(zero_copy_only=False).astype(np.int64)
        d = tbl.column("doc_id").to_numpy(zero_copy_only=False).astype(np.int64)
        n = tbl.column("n_chars").to_numpy(zero_copy_only=False).astype(np.int64)
        if len(c) == 0:
            return pa.table(
                {
                    "doc_id": pa.array([], type=pa.int64()),
                    "cluster": pa.array([], type=pa.int64()),
                    "n_chars": pa.array([], type=pa.int64()),
                }
            )
        order = np.lexsort((d, -n, c))
        cs = c[order]
        first = np.ones(len(cs), dtype=bool)
        first[1:] = cs[1:] != cs[:-1]
        idx = order[first]
        return pa.table(
            {
                "doc_id": pa.array(d[idx], type=pa.int64()),
                "cluster": pa.array(c[idx], type=pa.int64()),
                "n_chars": pa.array(n[idx], type=pa.int64()),
            }
        )

    return (
        cl.map_batches(_best, batch_format="pyarrow")
        .groupby("cluster")
        .map_groups(_best, batch_format="pyarrow")
    )


def contamination_counts(
    docs_ds, *, eval_mod: int = 20, w: int = 8, num_partitions: int = 32
):
    """Benchmark-decontamination sweep: for every corpus document,
    count the distinct w-token shingles it shares with the "eval"
    slice (doc_id % eval_mod == 0 — a deterministic stand-in for a
    held-out benchmark set; real runs pass the benchmark table).
    Returns (doc_id, n_hits), contaminated docs only.

    Plan: both sides emit (shingle-hash, doc) rows pre-deduped per doc
    (``shingle_hashes`` returns distinct hashes), hash-bucketed by
    shingle so each reduce group holds the eval membership set for its
    bucket only — the eval n-gram set is co-shuffled, never broadcast
    (at 100 TB an eval suite can be millions of n-grams × hundreds of
    benchmarks). Per-group hits pre-aggregate per doc before the final
    combiner-backed ``groupby(doc_id).sum``.
    """
    from ray.data.aggregate import Sum

    P = num_partitions

    def _sh(batch: pa.Table) -> pa.Table:
        ids = batch.column("doc_id").to_pylist()
        texts = pc.fill_null(batch.column("text"), "").to_pylist()
        out_id: list[np.ndarray] = []
        out_h: list[np.ndarray] = []
        for i, t in zip(ids, texts):
            hs = shingle_hashes(t, w=w)
            if len(hs):
                out_h.append(hs)
                out_id.append(np.full(len(hs), i, dtype=np.int64))
        h = np.concatenate(out_h) if out_h else np.empty(0, np.uint64)
        d = np.concatenate(out_id) if out_id else np.empty(0, np.int64)
        return pa.table(
            {
                "part": pa.array((h % np.uint64(P)).astype(np.int64)),
                "h": pa.array(h, type=pa.uint64()),
                "doc_id": pa.array(d, type=pa.int64()),
            }
        )

    def _hits(group: pa.Table) -> pa.Table:
        h = group.column("h").to_numpy(zero_copy_only=False)
        d = group.column("doc_id").to_numpy(zero_copy_only=False)
        is_eval = d % eval_mod == 0
        ev = np.unique(h[is_eval])
        cand = ~is_eval
        hit = cand & np.isin(h, ev)
        if not hit.any():
            return pa.table(
                {
                    "doc_id": pa.array([], type=pa.int64()),
                    "n": pa.array([], type=pa.int64()),
                }
            )
        docs, cnt = np.unique(d[hit], return_counts=True)
        return pa.table(
            {
                "doc_id": pa.array(docs, type=pa.int64()),
                "n": pa.array(cnt.astype(np.int64), type=pa.int64()),
            }
        )

    out = (
        docs_ds.map_batches(_sh, batch_format="pyarrow")
        .groupby("part")
        .map_groups(_hits, batch_format="pyarrow")
        .groupby("doc_id")
        .aggregate(Sum("n", alias_name="n_hits"))
    )
    return out



def benchmark_contamination(docs_ds, *, bench_source: str = "src0", w: int = 13):
    """Exact w-gram benchmark-contamination check (the GPT-3 appendix-C
    decontamination shape: a training doc is contaminated iff it shares
    any 13-gram with the held-out benchmark).

    Scale shape: the benchmark side is the SMALL side by construction
    (a benchmark is ~10⁵ grams even at 100 TB of training data), so its
    distinct shingle hashes are reduced per-block, unioned once on the
    driver, and broadcast via ``ray.put``; the corpus side is ONE
    zero-shuffle ``map_batches`` pass doing a sorted-array
    ``searchsorted`` membership test per doc. Returns one row per
    contaminated corpus doc: (doc_id, n_grams, n_hit), exact int64.
    """
    import ray

    def _bench_block(b: pa.Table) -> pa.Table:
        src = b.column("source").to_numpy(zero_copy_only=False)
        txts = pc.fill_null(b.column("text"), "").to_pylist()
        hs = [
            shingle_hashes(t, w)
            for t, s in zip(txts, src)
            if s == bench_source
        ]
        u = (
            np.unique(np.concatenate(hs))
            if hs
            else np.empty(0, dtype=np.uint64)
        )
        return pa.table({"h": pa.array(u, type=pa.uint64())})

    parts = [
        b.column("h").to_numpy(zero_copy_only=False)
        for b in docs_ds.map_batches(_bench_block, batch_format="pyarrow")
        .iter_batches(batch_size=None, batch_format="pyarrow")
    ]
    bench = (
        np.unique(np.concatenate(parts)) if parts else np.empty(0, dtype=np.uint64)
    )
    ref = ray.put(bench)

    def _scan(b: pa.Table) -> pa.Table:
        bh = ray.get(ref)
        src = b.column("source").to_numpy(zero_copy_only=False)
        txts = pc.fill_null(b.column("text"), "").to_pylist()
        ids = b.column("doc_id").to_numpy(zero_copy_only=False)
        out_id, out_n, out_hit = [], [], []
        for did, t, s in zip(ids, txts, src):
            if s == bench_source:
                continue
            hs = shingle_hashes(t, w)
            if len(hs) == 0:
                continue
            pos = np.searchsorted(bh, hs)
            inb = pos < len(bh)
            n_hit = int(np.count_nonzero(bh[pos[inb]] == hs[inb]))
            if n_hit:
                out_id.append(int(did))
                out_n.append(len(hs))
                out_hit.append(n_hit)
        return pa.table(
            {
                "doc_id": pa.array(out_id, type=pa.int64()),
                "n_grams": pa.array(out_n, type=pa.int64()),
                "n_hit": pa.array(out_hit, type=pa.int64()),
            }
        )

    return docs_ds.map_batches(_scan, batch_format="pyarrow")


def ngram_novelty(docs_ds, *, w: int = 8, num_partitions: int = 32):
    """Per-document n-gram NOVELTY — the memorization/duplication proxy
    used to order training data (a doc whose windows all appeared in
    earlier docs contributes nothing new): for every document, the
    fraction of its DISTINCT w-token shingles whose global first
    occurrence (min doc_id over the corpus) is this document.

    Plan (same co-shuffle as ``contamination_counts``): both the
    first-seen reduction and the per-doc membership ride ONE
    hash-bucketed exchange of (shingle-hash, doc_id) rows — the group
    task computes min-doc per hash locally and folds per-doc (total,
    first-seen) partials before a combiner-backed ``groupby(doc_id)``.
    Docs shorter than ``w`` tokens have no shingles and no output row
    (the ``shingle_hashes`` convention). Returns
    (doc_id, n_shingles, n_first_seen, novelty_r6)."""
    from ray.data.aggregate import Sum

    P = num_partitions

    def _sh(batch: pa.Table) -> pa.Table:
        ids = batch.column("doc_id").to_pylist()
        texts = pc.fill_null(batch.column("text"), "").to_pylist()
        out_id: list[np.ndarray] = []
        out_h: list[np.ndarray] = []
        for i, t in zip(ids, texts):
            hs = shingle_hashes(t, w=w)
            if len(hs):
                out_h.append(hs)
                out_id.append(np.full(len(hs), i, dtype=np.int64))
        h = np.concatenate(out_h) if out_h else np.empty(0, np.uint64)
        d = np.concatenate(out_id) if out_id else np.empty(0, np.int64)
        return pa.table(
            {
                "part": pa.array((h % np.uint64(P)).astype(np.int64)),
                "h": pa.array(h, type=pa.uint64()),
                "doc_id": pa.array(d, type=pa.int64()),
            }
        )

    def _firsts(group: pa.Table) -> pa.Table:
        from ..util import group_reduce

        h = group.column("h").to_numpy(zero_copy_only=False).astype(np.uint64, copy=False)
        d = group.column("doc_id").to_numpy(zero_copy_only=False)
        hk, dmin = group_reduce(h, d, "min")
        idx = np.searchsorted(hk, h)
        is_first = d == dmin[idx]
        docs, tot = np.unique(d, return_counts=True)
        fk, fc = group_reduce(
            d[is_first].astype(np.uint64), np.ones(int(is_first.sum()), dtype=np.int64), "sum"
        )
        first = np.zeros(len(docs), dtype=np.int64)
        if len(fk):
            first[np.searchsorted(docs, fk.astype(np.int64))] = fc
        return pa.table(
            {
                "doc_id": pa.array(docs, type=pa.int64()),
                "n": pa.array(tot.astype(np.int64)),
                "f": pa.array(first),
            }
        )

    agg = (
        docs_ds.map_batches(_sh, batch_format="pyarrow")
        .groupby("part")
        .map_groups(_firsts, batch_format="pyarrow")
        .groupby("doc_id")
        .aggregate(Sum("n", alias_name="n_shingles"), Sum("f", alias_name="n_first_seen"))
    )

    def _ratio(b: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        n = b.column("n_shingles").to_numpy(zero_copy_only=False).astype(np.float64)
        f = b.column("n_first_seen").to_numpy(zero_copy_only=False).astype(np.float64)
        return pa.table(
            {
                "doc_id": b.column("doc_id"),
                "n_shingles": b.column("n_shingles"),
                "n_first_seen": b.column("n_first_seen"),
                "novelty_r6": pc.round(pa.array(f / n), ndigits=6),
            }
        )

    return agg.map_batches(_ratio, batch_format="pyarrow")
