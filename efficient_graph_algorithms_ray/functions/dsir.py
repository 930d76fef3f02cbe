"""DSIR-style data selection via importance resampling.

Implements the hashed-n-gram importance-weighting scheme of "Data
Selection for Language Models via Importance Resampling" (Xie et al.
2023, arXiv:2302.03169): score every raw document by the
log-likelihood ratio of a TARGET distribution (here: the corpus slice
in a chosen language — the stand-in for "high-quality target domain")
against the RAW distribution, both estimated over hashed unigram
buckets, then keep the top-k. The same two-distribution recipe covers
domain upsampling and quality-targeted selection at 100 TB.

Scale shape (this is the whole point of the hashing trick):

- the feature space is a FIXED number of hash buckets (default 4096),
  so the two distributions are two int64 arrays, never a vocabulary
  shuffle; per-batch partial counts are ``np.bincount`` partials and
  one combiner-backed ``groupby(bucket).sum`` over ≤ n_buckets rows;
- the bucket log-ratio table λ is broadcast ONCE via ``ray.put``
  (n_buckets·8 bytes) and every scoring task reads it zero-copy;
- per-doc scoring is one map pass; the final top-k is a global
  sort+limit over one small row per document.

Exact SQL parity: λ_b = floor((ln((t_b+1)/(T+B)) − ln((r_b+1)/(R+B)))
· 1e6) is quantized to int64 micro-nats once per bucket, so per-doc
sums are exact integers in any partition order; ``logratio`` is one
IEEE division from the integers. Token hashing is the repo-wide
FNV-1a (functions/text.py:hash_token), replayed byte-for-byte in
DuckDB.

Reference analogue: seeded random-feature scoring + z-score
significance corrections in ``get_projection``
(/root/reference/src/ega/algorithms/graph_kernels.py:387-519) — a
broadcast per-feature weight table applied per record; the reference
has no corpus operators, this is part of the engine's training-data
surface.
"""

from __future__ import annotations

from collections import Counter

import numpy as np
import pyarrow as pa
import ray
from ray.data.aggregate import Sum

from .text import _TOKEN_RE, hash_token

__all__ = ["dsir_importance_topk"]


def dsir_importance_topk(
    docs_ds,
    *,
    target_lang: str = "en",
    n_buckets: int = 4096,
    top_k: int = 256,
):
    """Top-``top_k`` documents by DSIR importance weight.

    ``docs_ds`` must carry (doc_id, text, lang). Returns
    (doc_id, n_tokens, w_num, logratio) ordered by
    (logratio DESC, doc_id): ``w_num`` is the exact integer
    Σ_i λ_bucket(tok_i) over token instances and
    ``logratio = w_num / (1e6 · n_tokens)`` the mean per-token
    log importance ratio in nats.
    """
    B = n_buckets

    def _bucket_partials(batch: pa.Table) -> pa.Table:
        texts = batch.column("text").to_pylist()
        langs = batch.column("lang").to_pylist()
        t_cnt = np.zeros(B, dtype=np.int64)
        r_cnt = np.zeros(B, dtype=np.int64)
        for text, lang in zip(texts, langs):
            cnt = Counter(_TOKEN_RE.findall(text or ""))
            if not cnt:
                continue
            hs = np.fromiter(
                (hash_token(t) % B for t in cnt), dtype=np.int64, count=len(cnt)
            )
            cs = np.fromiter(cnt.values(), dtype=np.int64, count=len(cnt))
            np.add.at(r_cnt, hs, cs)
            if lang == target_lang:
                np.add.at(t_cnt, hs, cs)
        nz = np.flatnonzero(r_cnt)
        return pa.table(
            {
                "bucket": pa.array(nz, type=pa.int64()),
                "tc": pa.array(t_cnt[nz], type=pa.int64()),
                "rc": pa.array(r_cnt[nz], type=pa.int64()),
            }
        )

    counts = (
        docs_ds.map_batches(_bucket_partials, batch_format="pyarrow")
        .groupby("bucket")
        .aggregate(Sum("tc", alias_name="tc"), Sum("rc", alias_name="rc"))
    )
    t_arr = np.zeros(B, dtype=np.int64)
    r_arr = np.zeros(B, dtype=np.int64)
    for b in counts.iter_batches(batch_size=None, batch_format="pyarrow"):
        idx = b.column("bucket").to_numpy(zero_copy_only=False)
        t_arr[idx] = b.column("tc").to_numpy(zero_copy_only=False)
        r_arr[idx] = b.column("rc").to_numpy(zero_copy_only=False)
    T = int(t_arr.sum())
    R = int(r_arr.sum())

    # Laplace-smoothed per-bucket log ratio, micro-nat int64 quantized
    # (the division-then-ln order matches the SQL replay expression).
    lam = np.floor(
        (
            np.log((t_arr + 1.0) / float(T + B))
            - np.log((r_arr + 1.0) / float(R + B))
        )
        * 1_000_000.0
    ).astype(np.int64)
    lam_ref = ray.put(lam)

    def _score(batch: pa.Table) -> pa.Table:
        lam_w = ray.get(lam_ref)
        ids = batch.column("doc_id").to_pylist()
        texts = batch.column("text").to_pylist()
        out_id: list[int] = []
        out_n: list[int] = []
        out_w: list[int] = []
        for doc_id, text in zip(ids, texts):
            cnt = Counter(_TOKEN_RE.findall(text or ""))
            if not cnt:
                continue
            hs = np.fromiter(
                (hash_token(t) % B for t in cnt), dtype=np.int64, count=len(cnt)
            )
            cs = np.fromiter(cnt.values(), dtype=np.int64, count=len(cnt))
            out_id.append(doc_id)
            out_n.append(int(cs.sum()))
            out_w.append(int((cs * lam_w[hs]).sum()))
        n = np.asarray(out_n, dtype=np.int64)
        w = np.asarray(out_w, dtype=np.int64)
        return pa.table(
            {
                "doc_id": pa.array(out_id, type=pa.int64()),
                "n_tokens": pa.array(n, type=pa.int64()),
                "w_num": pa.array(w, type=pa.int64()),
                "logratio": pa.array(
                    w.astype(np.float64) / (1_000_000.0 * n.astype(np.float64))
                    if len(n)
                    else np.empty(0, np.float64),
                    type=pa.float64(),
                ),
            }
        )

    return (
        docs_ds.map_batches(_score, batch_format="pyarrow")
        .sort(["logratio", "doc_id"], descending=[True, False])
        .limit(top_k)
    )
