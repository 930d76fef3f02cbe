"""Driver-checkable queries over the documents/embeddings tables.

SQL-oracled where DuckDB can express the semantics; heuristic /
sketch-based operators (language-ID, MinHash, SimHash, LSH) are
rows-only at the driver and exactness-tested in pytest against
brute-force oracles instead.
"""

from __future__ import annotations

import os

import numpy as np
import pyarrow as pa
import ray.data as rd
from ray.data.aggregate import Count

from ..functions import dedup as D
from ..functions import similarity as S
from ..functions import text as T


def _docs(sf_dir: str, columns=None):
    return rd.read_parquet(os.path.join(sf_dir, "documents.parquet"), columns=columns)


def _emb(sf_dir: str):
    return rd.read_parquet(os.path.join(sf_dir, "embeddings.parquet"))


# ---- SQL-oracled --------------------------------------------------------

def q_doc_stats(sf_dir: str):
    return _docs(sf_dir, ["doc_id", "text"]).map_batches(
        T.doc_stats_batch, batch_format="pyarrow"
    )


def q_lang_distribution(sf_dir: str):
    return (
        _docs(sf_dir, ["lang"]).groupby("lang").aggregate(Count(alias_name="n"))
    )


def q_top_docs_by_length(sf_dir: str):
    return (
        _docs(sf_dir, ["doc_id", "n_chars"])
        .sort(["n_chars", "doc_id"], descending=[True, False])
        .limit(10)
    )


def q_exact_dedup_docs(sf_dir: str):
    return D.exact_dedup(_docs(sf_dir, ["doc_id", "text"]))


def q_knn_vec0(sf_dir: str):
    knn = S.knn_brute_force(_emb(sf_dir), query_ids=[0], k=5)

    def _shape(batch: pa.Table) -> pa.Table:
        return pa.table(
            {
                "vec_id": batch.column("vec_id").cast(pa.int64()),
                "cosine_r5": pa.array(
                    np.round(batch.column("cosine").to_numpy(zero_copy_only=False), 5)
                ),
            }
        )

    return knn.map_batches(_shape, batch_format="pyarrow")


def q_embedding_norms(sf_dir: str):
    return S.embedding_norms(_emb(sf_dir))


# ---- rows-only (heuristic / sketch operators) ---------------------------

def q_quality_scores(sf_dir: str):
    """Heuristic quality signals — FLOOR-ppm integer columns, SQL-oracled
    (every ratio is floor(expr·1e6) of the identical IEEE expression)."""
    import ray

    total = int(ray.cluster_resources().get("CPU", 4))
    scored = _docs(sf_dir, ["doc_id", "text"]).map_batches(
        T.QualityScorer,
        batch_format="pyarrow",
        batch_size=1024,
        concurrency=max(2, total - 2),
    )
    return scored.select_columns(
        [
            "doc_id",
            "n_tokens",
            "mean_tok_len_ppm",
            "alpha_ppm",
            "digit_ppm",
            "punct_ppm",
            "upper_ppm",
            "stop_ppm",
            "quality_ppm",
        ]
    )


def q_epoch_shuffle(sf_dir: str, n_epochs: int = 2):
    """Deterministic per-epoch dataloader shuffle: each epoch orders
    the corpus by sort_key = splitmix64(doc_id ⊕ splitmix64(epoch+1))
    — the standard seeded hash-sort permutation for training loaders,
    reproducible at any parallelism and resumable mid-epoch (the key
    is recomputable per row; a restart seeks past consumed keys).
    Pure map; returns (epoch, doc_id, sort_key) with sort_key the
    int64 reinterpretation; SQL-oracled exactly."""
    from ..sources.edges_synth import _splitmix64

    def _keys(b: pa.Table) -> pa.Table:
        ids = b.column("doc_id").to_numpy(zero_copy_only=False).astype(np.uint64)
        eps, dids, hs = [], [], []
        for e in range(n_epochs):
            salt = _splitmix64(np.full(len(ids), e + 1, dtype=np.uint64))
            eps.append(np.full(len(ids), e, dtype=np.int64))
            dids.append(ids.astype(np.int64))
            hs.append(_splitmix64(ids ^ salt).view(np.int64))
        return pa.table(
            {
                "epoch": pa.array(np.concatenate(eps), type=pa.int64()),
                "doc_id": pa.array(np.concatenate(dids), type=pa.int64()),
                "sort_key": pa.array(np.concatenate(hs), type=pa.int64()),
            }
        )

    return _docs(sf_dir, ["doc_id"]).map_batches(_keys, batch_format="pyarrow")


def q_bloom_probe(sf_dir: str):
    """Bloom-filter membership probe for incremental dedup
    (functions/sketches.py:bloom_membership_probe): filter built over
    the train slice's content fingerprints, eval slice probed, Bloom
    verdict reported next to exact membership (false-positive rate
    observable). SQL-oracled exactly."""
    from ..functions.sketches import bloom_membership_probe

    return bloom_membership_probe(_docs(sf_dir, ["doc_id", "text"]))


def q_hrw_shards(sf_dir: str, n_shards: int = 16):
    """Rendezvous (highest-random-weight) shard assignment per doc —
    the consistent-placement primitive for shard routing at cluster
    scale (Thaler & Ravishankar 1998): shard(d) = argmax_s
    splitmix64(doc_id ⊕ salt_s); adding/removing a shard moves only
    1/S of the keys. Pure map, SQL-oracled exactly.
    Returns (doc_id, shard)."""
    from ..sources.edges_synth import _splitmix64

    salts = _splitmix64(np.arange(1, n_shards + 1, dtype=np.uint64))

    def _assign(b: pa.Table) -> pa.Table:
        ids = b.column("doc_id").to_numpy(zero_copy_only=False).astype(np.uint64)
        hs = np.stack([_splitmix64(ids ^ s) for s in salts])
        return pa.table(
            {
                "doc_id": pa.array(ids.astype(np.int64), type=pa.int64()),
                "shard": pa.array(np.argmax(hs, axis=0).astype(np.int64), type=pa.int64()),
            }
        )

    return _docs(sf_dir, ["doc_id"]).map_batches(_assign, batch_format="pyarrow")


def q_chunk_docs(sf_dir: str, size: int = 64, stride: int = 48):
    """Sliding-window document chunking (the RAG/context-window
    chunker): token windows of ``size`` every ``stride`` tokens
    (overlap = size − stride), one row per chunk with its token count
    and the FNV-1a fingerprint of the reconstructed chunk text — the
    dedup key for chunk-level pipelines. Pure map (no shuffle);
    SQL-oracled exactly. Returns (doc_id, chunk_id, start, n_tokens,
    chunk_fp)."""
    from ..functions.text import _TOKEN_RE, hash_token

    def _chunks(batch: pa.Table) -> pa.Table:
        ids = batch.column("doc_id").to_pylist()
        texts = batch.column("text").to_pylist()
        o_id, o_ck, o_st, o_n, o_fp = [], [], [], [], []
        for doc_id, text in zip(ids, texts):
            toks = _TOKEN_RE.findall(text or "")
            n = len(toks)
            ck = 0
            for start in range(0, max(n, 1), stride):
                if start >= n and n > 0:
                    break
                chunk = toks[start : start + size]
                if not chunk:
                    break
                o_id.append(doc_id)
                o_ck.append(ck)
                o_st.append(start)
                o_n.append(len(chunk))
                o_fp.append(
                    np.uint64(hash_token(" ".join(chunk))).astype(np.int64)
                )
                ck += 1
        return pa.table(
            {
                "doc_id": pa.array(o_id, type=pa.int64()),
                "chunk_id": pa.array(o_ck, type=pa.int64()),
                "start": pa.array(o_st, type=pa.int64()),
                "n_tokens": pa.array(o_n, type=pa.int64()),
                "chunk_fp": pa.array(np.asarray(o_fp, dtype=np.int64), type=pa.int64()),
            }
        )

    return _docs(sf_dir, ["doc_id", "text"]).map_batches(
        _chunks, batch_format="pyarrow"
    )


def q_suffix_array_docs(sf_dir: str):
    """Corpus suffix-rank table by distributed prefix doubling
    (functions/suffix.py) — the ExactSubstr-dedup primitive (Lee et
    al. 2022). One row per token position with the dense rank of its
    suffix among all corpus suffixes; every round is one distributed
    sort + one bucketed co-shuffle. All-integer → exact SQL parity
    (same DENSE_RANK doubling recurrence). Returns
    (doc_id, pos, srank)."""
    from ..functions.suffix import suffix_array_docs

    return suffix_array_docs(_docs(sf_dir, ["doc_id", "text"]))


def q_dup_window_profile(sf_dir: str):
    """Per-doc exact duplicate-window profile at power-of-two
    resolution (functions/suffix.dup_window_profile) — the
    suffix-array half of ExactSubstr dedup: longest corpus-recurring
    window per doc + positions starting a ≥8-token duplicated window.
    All-integer → exact SQL parity. Returns
    (doc_id, max_dup, n_dup_thresh, n_pos)."""
    from ..functions.suffix import dup_window_profile

    return dup_window_profile(_docs(sf_dir, ["doc_id", "text"]))


def q_exactsubstr_prune(sf_dir: str):
    """ExactSubstr span removal (Lee et al. 2022, pow2-resolution):
    every token covered by a corpus-recurring full window of ≥ 8
    tokens is removed; per-doc kept/removed accounting plus the exact
    FNV-1a fingerprint of the kept text (functions/suffix.
    exactsubstr_prune). Integer outputs → exact SQL parity. Returns
    (doc_id, n_pos, n_removed, kept_fp)."""
    from ..functions.suffix import exactsubstr_prune

    return exactsubstr_prune(_docs(sf_dir, ["doc_id", "text"]))


def q_bpe_merges(sf_dir: str):
    """BPE tokenizer training: the first 32 learned merges over the
    corpus word vocabulary (functions/bpe.py). Rows-only: each round's
    segmentation depends on the previous arg-max (no SQL form); the
    sequential Sennrich replica in tests/test_bpe.py is the oracle."""
    from ..functions.bpe import bpe_train_merges

    return bpe_train_merges(_docs(sf_dir, ["text"]), n_merges=32)


def q_bpe_packed_sequences(sf_dir: str):
    """Tokenize-and-pack: train 8 BPE merges, encode the corpus, pack
    into deterministic 128-token training sequences (functions/bpe.py:
    bpe_pack_sequences — distributed ordered prefix scan for offsets).
    Rows-only (BPE-dependent); the exact stream replica is
    pytest-verified (tests/test_bpe.py). Returns per-sequence
    (seq_id, n_ids, ids_sum)."""
    from ..functions.bpe import bpe_pack_sequences
    from ..util import list_rows

    seqs, _, _ = bpe_pack_sequences(
        _docs(sf_dir, ["doc_id", "text"]), n_merges=8, seq_len=128
    )

    def _summary(batch: pa.Table) -> pa.Table:
        rows = list_rows(batch, "ids")
        return pa.table(
            {
                "seq_id": batch.column("seq_id").cast(pa.int64()),
                "n_ids": pa.array(
                    np.array([len(r) for r in rows], dtype=np.int64), type=pa.int64()
                ),
                "ids_sum": pa.array(
                    np.array([int(np.sum(r, dtype=np.int64)) for r in rows]),
                    type=pa.int64(),
                ),
            }
        )

    return seqs.map_batches(_summary, batch_format="pyarrow")


def q_weighted_sample_docs(sf_dir: str, k: int = 64):
    """Deterministic weighted sample WITHOUT replacement (Efraimidis–
    Spirakis 2006 A-ES order sampling): key_i = −ln(u_i)/w_i with
    u_i = (splitmix64(doc_id ⊕ seed) + 1)/2^64 and weight w_i =
    n_chars; the k SMALLEST keys are exactly a weight-proportional
    without-replacement sample (the exponential-jumps formulation).
    Keys are floor-quantized to int64 pico-units so the global order
    is exact integer comparison (doc_id tie-break) and the SQL replay
    hash-matches. Same scale shape as the uniform bottom-k: per-block
    partial bottom-k, then a tiny global sort+limit — only blocks×k
    candidate rows ever move. Returns (doc_id, n_chars, key_q)."""
    from ..config import HASH_SEED
    from ..sources.edges_synth import _splitmix64

    def _key(b: pa.Table) -> pa.Table:
        ids = b.column("doc_id").to_numpy(zero_copy_only=False).astype(np.uint64)
        w = b.column("n_chars").to_numpy(zero_copy_only=False).astype(np.float64)
        keep = w > 0
        ids, w = ids[keep], w[keep]
        h = _splitmix64(ids ^ np.uint64(HASH_SEED))
        u = (h.astype(np.float64) + 1.0) / 18446744073709551616.0
        q = np.floor(-np.log(u) / w * 1e12).astype(np.int64)
        order = np.lexsort((ids, q))[:k]  # partial bottom-k per block
        return pa.table(
            {
                "doc_id": pa.array(ids[order].astype(np.int64), type=pa.int64()),
                "n_chars": pa.array(
                    w[order].astype(np.int64), type=pa.int64()
                ),
                "key_q": pa.array(q[order], type=pa.int64()),
            }
        )

    return (
        _docs(sf_dir, ["doc_id", "n_chars"])
        .map_batches(_key, batch_format="pyarrow")
        .sort(["key_q", "doc_id"])
        .limit(k)
    )


def q_langid(sf_dir: str):
    import ray

    total = int(ray.cluster_resources().get("CPU", 4))
    return _docs(sf_dir, ["doc_id", "text"]).map_batches(
        T.LangId, batch_format="pyarrow", batch_size=1024, concurrency=max(2, total - 2)
    )


def q_bottomk_sample_docs(sf_dir: str, k: int = 64):
    """Deterministic bottom-k uniform sample of documents: the k
    smallest splitmix64(doc_id ⊕ seed) hashes — the coordinated-sample
    primitive (a bottom-k sketch IS a uniform sample, mergeable across
    shards, stable at any parallelism and across runs). Per-block
    partial bottom-k (sort + head) before the tiny global sort+limit,
    so at 10^12 rows only blocks×k candidate rows move. SQL-oracled.
    Returns (rk, doc_id), rk = 1..k in hash order."""
    from ..config import HASH_SEED
    from ..sources.edges_synth import _splitmix64

    def _hash(b: pa.Table) -> pa.Table:
        ids = b.column("doc_id").to_numpy(zero_copy_only=False).astype(np.uint64)
        h = _splitmix64(ids ^ np.uint64(HASH_SEED))
        order = np.argsort(h)[:k]
        return pa.table(
            {
                "doc_id": pa.array(ids[order].astype(np.int64), type=pa.int64()),
                "h": pa.array(h[order], type=pa.uint64()),
            }
        )

    top = (
        _docs(sf_dir, ["doc_id"])
        .map_batches(_hash, batch_format="pyarrow")
        .sort("h")
        .limit(k)
    )
    tbl = pa.concat_tables(top.iter_batches(batch_size=None, batch_format="pyarrow"))
    return pa.table(
        {
            "rk": pa.array(np.arange(1, tbl.num_rows + 1, dtype=np.int64)),
            "doc_id": tbl.column("doc_id"),
        }
    )


def q_langid_confusion(sf_dir: str):
    """Language-ID evaluation: confusion counts between the labeled
    ``lang`` column and the marker-word LangId prediction —
    (lang, pred_lang, n). SQL-oracled (the prediction fragment is the
    identical marker-word CASE)."""
    import ray

    class _Conf(T.LangId):
        def __call__(self, batch: pa.Table) -> pa.Table:  # type: ignore[override]
            out = T.LangId.__call__(self, batch)
            return pa.table(
                {
                    "lang": batch.column("lang"),
                    "pred_lang": out.column("pred_lang"),
                }
            )

    total = int(ray.cluster_resources().get("CPU", 4))
    return (
        _docs(sf_dir, ["doc_id", "text", "lang"])
        .map_batches(
            _Conf, batch_format="pyarrow", batch_size=1024, concurrency=max(2, total - 2)
        )
        .groupby(["lang", "pred_lang"])
        .aggregate(Count(alias_name="n"))
    )


def q_fingerprints(sf_dir: str):
    return _docs(sf_dir, ["doc_id", "text"]).map_batches(
        T.fingerprint_batch, batch_format="pyarrow"
    )


# result cache: the near-dup pair set at threshold 0.5 feeds BOTH
# q_minhash_pairs and q_neardup_clusters — materialize once per session
_PAIR_CACHE: dict = {}


def _minhash_pairs_cached(sf_dir: str):
    key = ("minhash05", sf_dir)
    if key not in _PAIR_CACHE:
        _PAIR_CACHE[key] = D.minhash_candidate_pairs(
            _docs(sf_dir, ["doc_id", "text"]), threshold=0.5
        ).materialize()
    return _PAIR_CACHE[key]


def q_minhash_pairs(sf_dir: str):
    return _minhash_pairs_cached(sf_dir)


def q_simhash_pairs(sf_dir: str):
    return D.simhash_candidate_pairs(_docs(sf_dir, ["doc_id", "text"]), max_hamming=12)


def q_neardup_clusters(sf_dir: str):
    docs = _docs(sf_dir, ["doc_id", "text"])
    return D.neardup_clusters(docs, _minhash_pairs_cached(sf_dir))


def q_quality_resample(sf_dir: str):
    """Quality-weighted epoch mixing (T=3): per-lang audit of the
    deterministic replication counts — SQL-oracled exactly (integer
    thresholds, splitmix64 Bernoulli)."""
    from ..functions.splits import quality_temperature_resample

    return quality_temperature_resample(
        _docs(sf_dir, ["doc_id", "text", "lang"]), temperature=3
    )


def q_neardup_keep_canonical(sf_dir: str):
    """Canonical-doc retention per near-dup cluster: keep the longest
    document (ties → smallest doc_id). SQL-oracled."""
    docs = _docs(sf_dir, ["doc_id", "text", "n_chars"])
    return D.neardup_keep_canonical(docs, _minhash_pairs_cached(sf_dir))


def q_ann_lsh_pairs(sf_dir: str):
    # threshold sized to the fixture: sf0.01 embeddings top out at
    # cosine ≈ 0.51, so 0.9 exercised nothing (0 rows in round 1);
    # 0.25 / 6 bits yields a real verified-pair set
    return S.ann_lsh_pairs(_emb(sf_dir), threshold=0.25, n_bits=6)


def q_gaussian_doclen(sf_dir: str):
    """GaussianKernel parity: exp(−σ·n_chars) per document — SQL-oracled
    (same IEEE expression, rounded r9)."""
    from ..functions.stats import gaussian_kernel_column

    out = gaussian_kernel_column(_docs(sf_dir, ["doc_id", "n_chars"]), "n_chars", 0.01)

    def _shape(batch: pa.Table) -> pa.Table:
        return pa.table(
            {
                "doc_id": batch.column("doc_id"),
                "gk_r9": pa.array(
                    np.round(batch.column("n_chars_gk").to_numpy(zero_copy_only=False), 9)
                ),
            }
        )

    return out.map_batches(_shape, batch_format="pyarrow")


def q_doclen_percentiles(sf_dir: str):
    """Exact p25/p50/p90/p99 of document length via the bounded-domain
    histogram percentile operator — SQL-oracled vs quantile_disc."""
    from ..functions.stats import exact_percentiles

    return exact_percentiles(
        _docs(sf_dir, ["n_chars"]), "n_chars", [0.25, 0.5, 0.9, 0.99]
    )


def q_lowrank_diffusion(sf_dir: str):
    """DFGFIntegrator-parity low-rank diffusion of the norm field over
    the embedding point cloud (rows-only; engine ≡ dense-replica RFF
    oracle in pytest)."""
    from ..pipelines.diffusion import low_rank_diffusion_integrate

    def _with_field(batch: pa.Table) -> pa.Table:
        from ..util import list_rows

        rows = list_rows(batch, "embedding")
        norms = (
            np.sqrt([(r * r).sum() for r in rows]) if rows else np.empty(0)
        )
        return batch.append_column("f", pa.array(norms, type=pa.float64()))

    ds = _emb(sf_dir).map_batches(_with_field, batch_format="pyarrow")
    # λ sized to the Gram spectrum (s_max ≈ 400 on this fixture →
    # exp(λ·s_max) ≈ e²): exp(λK) grows with N·λ, exactly as in the
    # reference integrator, so λ must shrink as the cloud grows.
    out = low_rank_diffusion_integrate(
        ds, "f", lambda_par=0.005, num_rand_features=64, epsilon=2.0
    )

    def _round(batch: pa.Table) -> pa.Table:
        return pa.table(
            {
                "vec_id": batch.column("vec_id"),
                "value_r5": pa.array(
                    np.round(batch.column("value").to_numpy(zero_copy_only=False), 5)
                ),
            }
        )

    return out.map_batches(_round, batch_format="pyarrow")


def q_ann_ivf_knn(sf_dir: str):
    """IVF top-5 for three probe vectors, run at nprobe == n_clusters —
    exactly brute force by construction, so the FULL IVF path (sampled
    centroid training, per-cluster probe routing, partial top-k merge)
    is exercised while the output stays SQL-oracle-exact. The
    approximate regime (nprobe < C) is pytest-verified instead
    (planted-dup recall at nprobe=1)."""
    knn = S.knn_ivf(
        _emb(sf_dir), query_ids=[0, 7, 42], k=5, n_clusters=16, nprobe=16
    )

    def _shape(batch: pa.Table) -> pa.Table:
        return pa.table(
            {
                "query_id": batch.column("query_id").cast(pa.int64()),
                "vec_id": batch.column("vec_id").cast(pa.int64()),
                "cosine_r5": pa.array(
                    np.round(batch.column("cosine").to_numpy(zero_copy_only=False), 5)
                ),
            }
        )

    return knn.map_batches(_shape, batch_format="pyarrow")


def q_truncated_overlap(sf_dir: str):
    """Matryoshka truncation fidelity: top-5 cosine retrieval overlap
    between full 64-dim and first-16-dim embeddings for 3 probe
    queries. SQL-oracled. Returns (query_id, overlap_at_k)."""
    return S.truncated_dim_overlap(_emb(sf_dir), query_ids=[0, 7, 42], k=5, dims=16)


def q_int8_quantize(sf_dir: str):
    """Per-dim symmetric int8 quantization report over the embeddings
    table (reconstruction error + integer code checksum per vector).
    SQL-oracled. Returns (vec_id, err_r6, q_norm1)."""
    return S.int8_quantize_report(_emb(sf_dir))


def q_pca_embeddings(sf_dir: str):
    """2-component PCA projection of the embeddings (distributed
    covariance partials; d×d eig on the driver; broadcast projection).
    Rows-only at the driver (eigendecomposition is not
    SQL-expressible); exactness pytest vs the full-matrix numpy PCA.
    Returns (vec_id, pc list<float64>[2])."""
    return S.pca_project(_emb(sf_dir), n_components=2)


def q_heavy_hitters(sf_dir: str):
    """Exact top-10 corpus tokens via Misra-Gries candidates + exact
    recount (two passes, bounded sketch state — never a full-vocab
    shuffle). SQL-oracled. Returns (tok, n)."""
    from ..functions.terms import heavy_hitter_tokens

    return heavy_hitter_tokens(_docs(sf_dir, ["doc_id", "text"]), k_sketch=256, top=10)


def q_zipf_fit(sf_dir: str):
    """Zipf's-law slope/intercept over the top-256 corpus token
    frequencies (OLS on ln-ln, distributed counts + sort/limit, driver
    math on the bounded head only). SQL-oracled, ROUND 6."""
    from ..functions.terms import zipf_fit

    return zipf_fit(_docs(sf_dir, ["doc_id", "text"]), top_k=256)


def q_semantic_dedup(sf_dir: str):
    """SemDeDup over the embeddings table: 16 hash-anchor clusters,
    within-cluster cosine ≥ 0.4 marks duplicates (keep = smallest
    vec_id wins). SQL-oracled end to end (anchor choice, assignment,
    dup marking all replayed). Returns (vec_id, cluster, keep,
    dup_of)."""
    return S.semantic_dedup(_emb(sf_dir), n_clusters=16, threshold=0.4)


def q_dup_ngram_frac(sf_dir: str):
    """Exact-substring duplication profile (Lee et al. 2022): per doc
    (≥5 tokens), how many positional 5-token shingle occurrences also
    appear in another document, and the duplicated fraction. SQL-
    oracled (FNV shingle hashes + cross-doc membership replayed).
    Returns (doc_id, n_shingles, n_dup, dup_frac)."""
    return D.dup_ngram_stats(_docs(sf_dir, ["doc_id", "text"]), w=5)


def q_winnow_docs(sf_dir: str):
    """Winnowing document fingerprints (3-token shingles, window 4):
    one row per distinct selected min-hash per document — the
    density-bounded plagiarism/overlap fingerprint set. SQL-oracled
    (FNV shingle hashes + window minima replayed). Returns
    (doc_id, fp)."""
    return _docs(sf_dir, ["doc_id", "text"]).map_batches(
        D.winnow_batch, batch_format="pyarrow"
    )


def q_vocab_growth(sf_dir: str):
    """Heaps'-law vocabulary growth: per 64-doc bucket, total token
    occurrences and new vocabulary types (first-seen tokens).
    SQL-oracled. Returns (bucket, n_tokens, new_types)."""
    from ..functions.terms import vocab_growth

    return vocab_growth(_docs(sf_dir, ["doc_id", "text"]), step=64)


def q_ann_pq_adc(sf_dir: str):
    """Product-quantization ADC top-5 for three probe vectors, run
    with the SQL-replayable anchor codebooks (iters=0: the bottom-16
    hash-sampled corpus vectors, hash-ordered, split into 8 subspaces
    of 8 dims). The full PQ path — deterministic codebook selection,
    per-subspace argmin encoding, per-query LUT build, ADC partial
    top-k + merge — is exercised end-to-end; the Lloyd-refined regime
    (iters>0) is pytest-verified instead (planted-dup recall), the
    same contract split as IVF's nprobe trick."""
    emb = _emb(sf_dir)
    books = S.pq_train_codebooks(emb, m=8, n_codes=16, iters=0)
    knn = S.pq_adc_topk(emb, books, query_ids=[0, 7, 42], k=5)

    def _shape(batch: pa.Table) -> pa.Table:
        return pa.table(
            {
                "query_id": batch.column("query_id").cast(pa.int64()),
                "vec_id": batch.column("vec_id").cast(pa.int64()),
                "adc_r5": pa.array(
                    np.round(batch.column("adc").to_numpy(zero_copy_only=False), 5)
                ),
            }
        )

    return knn.map_batches(_shape, batch_format="pyarrow")


def q_audio_features(sf_dir: str):
    """Multimodal audio: deterministic synthetic PCM16 clips →
    actor-pool feature stage (REAL decode — PCM needs no codec;
    duration/RMS/ZCR/spectral centroid). Rows-only: byte-level binary
    decode has no SQL form; features are analytically pytest-verified
    (tests/test_text.py)."""
    from ..functions.multimodal import AudioFeatures, synthetic_audio

    clips = rd.from_arrow(synthetic_audio(128))
    return clips.map_batches(
        AudioFeatures, batch_format="pyarrow", batch_size=32, concurrency=2
    )


def q_video_frame_features(sf_dir: str):
    """Multimodal video: EGV1 frame sampling (real byte slicing) →
    EGA1 image features per sampled frame — the compose-through
    pipeline (sample → decode → features). Rows-only (binary decode)."""
    from ..functions.multimodal import ImageDecoder, frame_sample_ega1, synthetic_videos

    vids = rd.from_arrow(synthetic_videos(32, n_frames=12, size=16))
    frames = vids.map_batches(frame_sample_ega1, batch_format="pyarrow", batch_size=4)

    def _as_images(b: pa.Table) -> pa.Table:
        import pyarrow as pa_

        return pa_.table(
            {
                "img_id": pa.array(
                    (
                        np.asarray(b.column("vid_id")) * 1000
                        + np.asarray(b.column("frame"))
                    ).astype(np.int64),
                    type=pa.int64(),
                ),
                "image": b.column("image"),
            }
        )

    return frames.map_batches(_as_images, batch_format="pyarrow").map_batches(
        ImageDecoder, batch_format="pyarrow", batch_size=16, concurrency=2
    )


def q_image_features(sf_dir: str):
    """Multimodal plumbing demo: deterministic synthetic images →
    actor-pool decode/feature stage (fake EGA1 codec — real codecs
    are stubbed, see functions/multimodal.py)."""
    from ..functions.multimodal import ImageDecoder, synthetic_images

    imgs = rd.from_arrow(synthetic_images(256))
    return imgs.map_batches(
        ImageDecoder,
        fn_constructor_kwargs={"codec": "ega1"},
        batch_format="pyarrow",
        batch_size=64,
        concurrency=2,
    )


def q_jpeg_features(sf_dir: str):
    """REAL compressed-image pipeline: deterministic baseline-JPEG
    payloads (in-repo pure-numpy T.81 encoder) → actor-pool
    decode→resize→re-encode thumbnail stage → actor-pool JPEG
    decode/feature stage (functions/jpeg.py decoder: marker parse,
    stream-defined Huffman tables, dequant, IDCT, YCbCr→RGB). Rows-
    only at the driver (a JPEG entropy decoder is not
    SQL-expressible); codec exactness is pytest-verified (DCT
    orthonormality, roundtrip PSNR, q100 tightness)."""
    from ..functions.multimodal import ImageDecoder, jpeg_recompress, synthetic_jpegs

    imgs = rd.from_arrow(synthetic_jpegs(128))
    thumbs = imgs.map_batches(
        jpeg_recompress, batch_format="pyarrow", batch_size=32
    )
    return thumbs.map_batches(
        ImageDecoder,
        fn_constructor_kwargs={"codec": "jpeg"},
        batch_format="pyarrow",
        batch_size=32,
        concurrency=2,
    )


def q_warc_pagerank_top10(sf_dir: str):
    """WARC end-to-end: synthetic pages → .warc.gz (one gzip member
    per record + CDX offset index, the Common Crawl layout) →
    block-parallel range reads → html extract → graph → PageRank →
    top 10. Rows-only (the flagship parsed-pages rationale); WARC
    byte-identity is pytest-verified."""
    import glob
    import os
    import tempfile

    import pyarrow.parquet as pq_

    from ..config import EngineConfig
    from ..pipelines.graph_build import graph_from_pages
    from ..pipelines.pagerank import pagerank, top_k_ranks
    from ..sources.pages import write_pages
    from ..sources.warc import read_warc_gz, write_warc_gz

    work = tempfile.mkdtemp(prefix="ega_warc_", dir="/tmp")
    pdir = write_pages(os.path.join(work, "pages"), n_pages=1500)
    tbl = pa.concat_tables(
        [pq_.read_table(f) for f in sorted(glob.glob(os.path.join(pdir, "*.parquet")))]
    )
    path = write_warc_gz(tbl, os.path.join(work, "crawl.warc.gz"))
    pages_ds = read_warc_gz(path, override_num_blocks=8)
    g = graph_from_pages(pages_ds, EngineConfig(num_partitions=8), directed=True)
    ranks, _ = pagerank(g, os.path.join(work, "pr"), tol=1e-6, max_iters=50)

    def _shape(b: pa.Table) -> pa.Table:
        import pyarrow.compute as pc_

        return pa.table(
            {
                "vid": b.column("vid"),  # uint64 page hash (beyond int64)
                "rank_r9": pc_.round(b.column("rank"), ndigits=9),
            }
        )

    return top_k_ranks(ranks, 10).map_batches(_shape, batch_format="pyarrow")


def q_audio_compressed_features(sf_dir: str):
    """REAL compressed-audio pipeline: deterministic tones encoded
    under G.711 μ-law (2:1) and IMA ADPCM (4:1) — both decoded by the
    in-repo pure-numpy codecs (functions/multimodal.py) through the
    same actor-pool AudioFeatures stage as PCM16 (container-magic
    dispatch). Rows-only; codec exactness pytest-verified (roundtrip
    SNR, 256-code μ-law idempotence, spectral-peak preservation)."""
    from ..functions.multimodal import AudioFeatures, encode_audio

    sr = 16000
    t = np.arange(sr // 2) / sr
    rows_id, rows_blob = [], []
    for i in range(96):
        rng = np.random.Generator(np.random.Philox(key=[13, 5000 + i]))
        freq = 100.0 + 40.0 * (i % 32)
        wave = 0.5 * np.sin(2 * np.pi * freq * t) + 0.03 * rng.standard_normal(len(t))
        x = (np.clip(wave, -1, 1) * 32767).astype(np.int16)
        codec = ("mulaw", "adpcm")[i % 2]
        rows_id.append(i)
        rows_blob.append(encode_audio(x, sr, codec))
    tbl = pa.table(
        {
            "clip_id": pa.array(rows_id, type=pa.int64()),
            "audio": pa.array(rows_blob, type=pa.binary()),
        }
    )
    return rd.from_arrow(tbl).map_batches(
        AudioFeatures, batch_format="pyarrow", batch_size=24, concurrency=2
    )


def q_png_features(sf_dir: str):
    """REAL lossless-image pipeline: deterministic PNG payloads
    (in-repo stdlib-zlib codec, functions/png.py) → actor-pool PNG
    decode/feature stage. PNG roundtrips are bit-exact, so decoded
    features equal pre-encode features exactly (pytest-verified);
    rows-only at the driver (DEFLATE is not SQL-expressible)."""
    from ..functions.multimodal import ImageDecoder
    from ..functions.png import encode_png

    rng_imgs = []
    for i in range(128):
        rng = np.random.Generator(np.random.Philox(key=[11, 4000 + i]))
        rng_imgs.append(rng.integers(0, 256, size=(20, 20, 3), dtype=np.uint8))
    tbl = pa.table(
        {
            "img_id": pa.array(np.arange(128, dtype=np.int64), type=pa.int64()),
            "image": pa.array([encode_png(a) for a in rng_imgs], type=pa.binary()),
        }
    )
    return rd.from_arrow(tbl).map_batches(
        ImageDecoder,
        fn_constructor_kwargs={"codec": "png"},
        batch_format="pyarrow",
        batch_size=32,
        concurrency=2,
    )


def q_mjpeg_frame_features(sf_dir: str):
    """REAL compressed-video pipeline: MJPEG containers (per-frame
    baseline-JPEG streams + a byte-range index) → frame sampling that
    slices ONLY the chosen frames' byte ranges (true seek, skipped
    frames never decode) → actor-pool JPEG decode/feature stage.
    Rows-only (entropy decoding is not SQL-expressible); codec
    exactness pytest-verified."""
    from ..functions.multimodal import (
        ImageDecoder,
        frame_sample_mjpeg,
        synthetic_mjpeg_videos,
    )

    vids = rd.from_arrow(synthetic_mjpeg_videos(48))
    frames = vids.map_batches(frame_sample_mjpeg, batch_format="pyarrow", batch_size=16)

    def _as_img(b: pa.Table) -> pa.Table:
        return pa.table(
            {
                # composite id: (vid, frame) → one feature row per frame
                "img_id": pa.array(
                    np.asarray(b.column("vid_id")) * 1000 + np.asarray(b.column("frame")),
                    type=pa.int64(),
                ),
                "image": b.column("image"),
            }
        )

    return frames.map_batches(_as_img, batch_format="pyarrow").map_batches(
        ImageDecoder,
        fn_constructor_kwargs={"codec": "jpeg"},
        batch_format="pyarrow",
        batch_size=32,
        concurrency=2,
    )


def q_doc_len_stats_by_lang(sf_dir: str):
    """Per-language length stats via distributed Welford partial+merge
    (eval_kernel_statistics parity) — SQL-oracled vs AVG/STDDEV_POP."""
    from ..functions.stats import welford_by_key

    stats = welford_by_key(_docs(sf_dir, ["lang", "n_chars"]), "lang", "n_chars")

    def _shape(batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        return pa.table(
            {
                "lang": batch.column("lang"),
                "n": batch.column("n").cast(pa.int64()),
                "mean_r6": pc.round(batch.column("mean"), ndigits=6),
                "std_r6": pc.round(batch.column("std_pop"), ndigits=6),
            }
        )

    return stats.map_batches(_shape, batch_format="pyarrow")


def q_quality_zscores(sf_dir: str):
    """Quality scores standardized by global Welford stats (zscore
    parity, graph_kernels.py:23-38) — SQL-oracled vs AVG/STDDEV_POP.
    The one-tail normal probability (``stats.onetail``) stays a library
    function + pytest check: DuckDB 1.0 has no erf/erfc, so it cannot
    appear in a hash-compared column."""
    import ray

    total = int(ray.cluster_resources().get("CPU", 4))
    from ..functions.stats import zscore_column

    scored = (
        _docs(sf_dir, ["doc_id", "text"])
        .map_batches(
            T.QualityScorer,
            batch_format="pyarrow",
            batch_size=1024,
            concurrency=max(2, total - 2),
        )
        .select_columns(["doc_id", "quality"])
    )
    z = zscore_column(scored.materialize(), "quality")

    def _shape(batch: pa.Table) -> pa.Table:
        zs = batch.column("quality_z").to_numpy(zero_copy_only=False)
        return pa.table(
            {
                "doc_id": batch.column("doc_id"),
                "quality_z_r6": pa.array(np.round(zs, 6)),
            }
        )

    return z.map_batches(_shape, batch_format="pyarrow")


def q_ngram_jaccard_pairs(sf_dir: str):
    """Exact w-shingle Jaccard for MinHash candidate pairs (the
    verify step of the near-dup pipeline): (doc_a, doc_b, jaccard_r6).
    Partition-local: shingle sets ride the LSH band rows; no driver
    text scan (see dedup.minhash_exact_jaccard_pairs)."""
    return D.minhash_exact_jaccard_pairs(
        _docs(sf_dir, ["doc_id", "text"]), threshold=0.3
    )


def q_top_pages_with_urls(sf_dir: str):
    """Flagship PageRank top-20 joined back to urls via the broadcast
    vid→url dictionary (GIDMapper reverse-map parity) — rows-only."""
    import tempfile

    import ray
    import ray.data as rd2

    from ..config import EngineConfig
    from ..pipelines.graph_build import edges_from_parsed, build_graph, vertex_urls
    from ..pipelines.pagerank import pagerank, top_k_ranks
    from ..sources.pages import write_pages
    from ..stages.extract import parse_pages

    pages = rd2.read_parquet(
        write_pages("/tmp/ega_pages_q", n_pages=2000), columns=["url", "html"]
    )
    parsed = parse_pages(pages, batch_size=256).materialize()
    g = build_graph(edges_from_parsed(parsed), EngineConfig(num_partitions=8), directed=True)
    ranks, _ = pagerank(g, tempfile.mkdtemp(prefix="ega_tpu_", dir="/tmp"), tol=1e-6)
    top = top_k_ranks(ranks, 20).to_pandas()  # 20 rows on the driver
    # reverse-map the 20 winners only: DISTRIBUTED filter of the url
    # table by the tiny vid set (round 1 collected the whole vid→url
    # dictionary through the driver — O(corpus) broadcast)
    import pyarrow.compute as pc

    vset = pa.array(top["vid"].to_numpy().astype(np.uint64), type=pa.uint64())

    def _flt(b: pa.Table) -> pa.Table:
        return b.filter(pc.is_in(b.column("vid"), value_set=vset))

    hits = (
        vertex_urls(parsed)
        .map_batches(_flt, batch_format="pyarrow")
        .to_pandas()
        .set_index("vid")["url"]
    )
    urls = [hits.get(v, "<external>") for v in top["vid"]]  # 20 lookups
    return pa.table(
        {
            "url": pa.array(urls, type=pa.string()),
            "rank_r9": pa.array(np.round(top["rank"].to_numpy(), 9)),
        }
    )


CORPUS_PREP_QMIN_PPM = 550_000  # quality floor (drops ~quartile of docs)
CORPUS_PREP_THRESHOLD = 0.5  # MinHash est-Jaccard near-dup threshold


def q_corpus_prep_docs(sf_dir: str):
    """END-TO-END training-corpus prep — the composition a reference
    user runs before tokenization, every stage the engine's own
    operator, one SQL oracle over the whole chain:

    1. quality filter (quality_ppm ≥ QMIN) — map-side, text never
       shuffles, survivors keep (doc_id, text, n_tokens);
    2. exact dedup — keep min doc_id per identical text (8-byte
       content-hash groupby);
    3. MinHash+LSH near-dup clustering over the exact-dedup
       representatives (band rows restricted via the marker-row
       co-shuffle — no broadcast membership set), CC clusters, keep
       the min-doc_id representative of each near-dup cluster;
    4. output (doc_id, n_tokens) of the surviving docs.
    """
    import pyarrow.compute as pc
    import ray

    from ..functions.dedup import (
        content_hash_batch,
        minhash_batch,
        _band_rows,
        neardup_clusters,
        pairs_from_band_rows,
        restrict_bands_to,
    )
    from ray.data.aggregate import Min

    total = int(ray.cluster_resources().get("CPU", 4))

    class _QualityFilter(T.QualityScorer):
        """QualityScorer + in-batch filter, keeping text for dedup."""

        def __call__(self, batch: pa.Table) -> pa.Table:
            scored = super().__call__(batch)
            keep = pc.greater_equal(
                scored.column("quality_ppm"), CORPUS_PREP_QMIN_PPM
            )
            return pa.table(
                {
                    "doc_id": batch.column("doc_id").filter(keep),
                    "text": batch.column("text").filter(keep),
                    "n_tokens": scored.column("n_tokens").filter(keep),
                }
            )

    qd = _docs(sf_dir, ["doc_id", "text"]).map_batches(
        _QualityFilter,
        batch_format="pyarrow",
        batch_size=1024,
        concurrency=max(2, total - 2),
    ).materialize()
    # ^ qd feeds THREE branches (rep hash, band rows, token join);
    # materializing pins the quality-FILTERED subset in the object
    # store (spillable to disk, never driver heap) so the corpus isn't
    # re-read + re-scored once per branch. At extreme scale swap for a
    # written intermediate (write_parquet + read) — same single pass.

    # exact-dedup representatives: min doc_id per content hash
    reps = (
        qd.map_batches(content_hash_batch, batch_format="pyarrow")
        .select_columns(["content_hash", "doc_id"])
        .groupby("content_hash")
        .aggregate(Min("doc_id", alias_name="doc_id"))
        .select_columns(["doc_id"])
    )

    # near-dup pairs among representatives only: bucket membership and
    # skew caps are computed over the DEDUPED doc set (mirrored in SQL)
    bands = qd.map_batches(minhash_batch, batch_format="pyarrow").map_batches(
        _band_rows, batch_format="pyarrow"
    )
    pairs = pairs_from_band_rows(
        restrict_bands_to(bands, reps), CORPUS_PREP_THRESHOLD
    )
    clusters = neardup_clusters(reps, pairs)

    def _survivors(b: pa.Table) -> pa.Table:
        keep = pc.equal(b.column("doc_id"), b.column("cluster"))
        return pa.table({"doc_id": b.column("doc_id").filter(keep)})

    surv = clusters.map_batches(_survivors, batch_format="pyarrow")

    # join survivors back to n_tokens via a marker-row co-shuffle
    P = 32

    def _tag_tokens(b: pa.Table) -> pa.Table:
        ids = b.column("doc_id").to_numpy(zero_copy_only=False)
        return pa.table(
            {
                "part": pa.array((ids % P).astype(np.int64)),
                "doc_id": b.column("doc_id").cast(pa.int64()),
                "n_tokens": b.column("n_tokens").cast(pa.int64()),
            }
        )

    def _tag_surv(b: pa.Table) -> pa.Table:
        ids = b.column("doc_id").to_numpy(zero_copy_only=False)
        return pa.table(
            {
                "part": pa.array((ids % P).astype(np.int64)),
                "doc_id": b.column("doc_id").cast(pa.int64()),
                "n_tokens": pa.array(np.full(len(ids), -1, dtype=np.int64)),
            }
        )

    both = qd.select_columns(["doc_id", "n_tokens"]).map_batches(
        _tag_tokens, batch_format="pyarrow"
    ).union(surv.map_batches(_tag_surv, batch_format="pyarrow"))

    def _join(g: pa.Table) -> pa.Table:
        ids = g.column("doc_id").to_numpy(zero_copy_only=False)
        toks = g.column("n_tokens").to_numpy(zero_copy_only=False)
        kept = np.unique(ids[toks < 0])
        keep = (toks >= 0) & np.isin(ids, kept)
        return pa.table(
            {
                "doc_id": pa.array(ids[keep], type=pa.int64()),
                "n_tokens": pa.array(toks[keep], type=pa.int64()),
            }
        )

    return both.groupby("part").map_groups(_join, batch_format="pyarrow")


def q_corpus_splits(sf_dir: str):
    """Deterministic train/val/test assignment per document (90/5/5 by
    splitmix64(doc_id ⊕ seed) against exact integer thresholds) — the
    zero-shuffle corpus-splitting op; SQL-oracled bit-for-bit.
    Returns (doc_id, split)."""
    from ..functions.splits import assign_splits

    return assign_splits(_docs(sf_dir, ["doc_id"]), "doc_id")


def q_token_shards(sf_dir: str):
    """Contiguous char-budget shard id per document (sequence-packing
    sharding): bin = ⌊exclusive-prefix-sum(n_chars) / 50000⌋ in doc_id
    order, via the 2-pass distributed ordered scan — SQL-oracled
    against a window-function prefix sum. Returns (doc_id, bin)."""
    from ..functions.packing import token_budget_bins

    return token_budget_bins(_docs(sf_dir, ["doc_id", "n_chars"]), "doc_id", "n_chars", 50000)


def q_tfidf_topk(sf_dir: str):
    """Top-5 TF-IDF terms per document (salted hot-vocab df join; see
    functions/terms.py) — SQL-oracled: score = tf·ln(n/df) is the same
    IEEE expression both sides, ROUND r6, ties (score desc, tok)."""
    from ..functions.terms import tfidf_topk

    return tfidf_topk(_docs(sf_dir, ["doc_id", "text"]), k=5)


def q_bigram_pmi(sf_dir: str):
    """Top-50 adjacent-token collocations by bigram PMI (min count 3)
    — SQL-oracled; selection/order on the rounded pmi_r6."""
    from ..functions.terms import bigram_pmi

    return bigram_pmi(_docs(sf_dir, ["doc_id", "text"]), min_count=3, top_n=50)


def q_repetition_scores(sf_dir: str):
    """Token-level repetition/boilerplate signals per doc (Gopher-style;
    see functions/text.py:repetition_batch). Pure map — no shuffle."""
    import os as _os

    import ray.data as rd

    from ..functions.text import repetition_batch

    ds = rd.read_parquet(
        _os.path.join(sf_dir, "documents.parquet"), columns=["doc_id", "text"]
    )
    return ds.map_batches(repetition_batch, batch_format="pyarrow")


def q_stratified_sample(sf_dir: str):
    """Per-language deterministic Bernoulli sample audit (see
    functions/splits.py:stratified_sample_summary)."""
    import os as _os

    import ray.data as rd

    from ..functions.splits import stratified_sample_summary

    ds = rd.read_parquet(
        _os.path.join(sf_dir, "documents.parquet"), columns=["doc_id", "lang"]
    )
    return stratified_sample_summary(ds)


def q_cms_token_probe(sf_dir: str):
    """Count-Min sketch over the corpus token stream, probed at the
    exact top-10 tokens (functions/sketches.py:count_min_token_probe).
    Mergeable-monoid partials → one bounded groupby; all-integer
    output, exact SQL parity including the collision overestimates."""
    from ..functions.sketches import count_min_token_probe

    return count_min_token_probe(_docs(sf_dir, ["text"]))


def q_dsir_select(sf_dir: str):
    """DSIR data selection (Xie et al. 2023): top-256 docs by hashed-
    unigram importance log-ratio of the 'en' target slice vs the raw
    corpus (functions/dsir.py). Bucket log-ratios are int64 micro-nat
    quantized → exact integer sums → SQL hash parity."""
    from ..functions.dsir import dsir_importance_topk

    return dsir_importance_topk(_docs(sf_dir, ["doc_id", "text", "lang"]))


def q_bigram_ce_docs(sf_dir: str):
    """Per-doc cross-entropy under the corpus's leave-in bigram LM —
    the CCNet/Gopher-style LM-perplexity quality filter
    (functions/terms.py:bigram_cross_entropy). Logs are quantized to
    int64 micro-nats once per distinct count, so all sums are exact
    integers and the SQL replay hash-matches."""
    from ..functions.terms import bigram_cross_entropy

    return bigram_cross_entropy(_docs(sf_dir, ["doc_id", "text"]))


def q_unigram_familiarity(sf_dir: str):
    """Mean corpus frequency of each document's tokens (the log-free
    unigram-LM quality signal; functions/terms.py:unigram_familiarity).
    Integer sums + one IEEE division → exact SQL parity."""
    from ..functions.terms import unigram_familiarity

    return unigram_familiarity(_docs(sf_dir, ["doc_id", "text"]))


def q_contamination(sf_dir: str):
    """Benchmark decontamination: per-doc count of 8-token shingles
    shared with the eval slice (doc_id % 20 == 0); co-shuffled by
    shingle hash (functions/dedup.py:contamination_counts)."""
    from ..functions.dedup import contamination_counts

    return contamination_counts(_docs(sf_dir, ["doc_id", "text"]))


def q_doclen_percentiles_by_lang(sf_dir: str):
    """Per-language exact p25/p50/p90 of document length (grouped
    histogram percentiles, functions/stats.py:exact_percentiles_by)."""
    from ..functions.stats import exact_percentiles_by

    return exact_percentiles_by(
        _docs(sf_dir, ["lang", "n_chars"]), "lang", "n_chars", [0.25, 0.5, 0.9]
    )


def q_kmeans_embeddings(sf_dir: str):
    """Exact-integer distributed Lloyd k-means over the embeddings
    table (8 clusters, 2 rounds, hash-anchor init) — every step
    integer-exact and replayed by the SQL oracle. Returns
    (vec_id, cluster, d2)."""
    return S.kmeans_quantized(_emb(sf_dir), n_clusters=8, iters=2)


def q_stopword_normalized_dedup(sf_dir: str):
    """Exact dedup AFTER stopword-stripping normalization — the
    canonicalize-then-dedup pattern every crawl pipeline runs (case
    folding / whitespace collapse / boilerplate strip all reduce to
    "dedup a derived canonical form"). Normalization is vectorized
    per block, the groupby key is the 8-byte hash of the canonical
    text (text itself never shuffles — functions/dedup.py:75
    convention), and the representative is the min doc_id, matching
    the SQL GROUP-BY-canonical-text oracle. Docs whose canonical form
    is empty (all stopwords) still group together. Returns
    (rep_doc_id, n_copies)."""
    import polars as pl
    from ray.data.aggregate import Count, Min

    from ..functions.dedup import HASH_SEED

    def _canon_hash(batch: pa.Table) -> pa.Table:
        s = pl.Series(pl.from_arrow(batch.column("text")))
        canon = (
            s.str.split(" ")
            .list.eval(pl.element().filter(~pl.element().is_in(["the", "a"])))
            .list.join(" ")
        )
        h = canon.hash(seed=HASH_SEED)
        return pa.table(
            {
                "doc_id": batch.column("doc_id"),
                "canon_hash": pa.array(
                    h.to_numpy().view(np.int64), type=pa.int64()
                ),
            }
        )

    return (
        _docs(sf_dir, ["doc_id", "text"])
        .map_batches(_canon_hash, batch_format="pyarrow")
        .groupby("canon_hash")
        .aggregate(Min("doc_id", alias_name="rep_doc_id"), Count(alias_name="n_copies"))
        .select_columns(["rep_doc_id", "n_copies"])
    )


def q_doc_entropy(sf_dir: str):
    """Per-document unigram (token) Shannon entropy in nats — the
    repetitiveness signal LLM corpus filters threshold on (low entropy
    = boilerplate / stutter). Each doc is scored inside its own block
    (token counts via one np.unique), H = ln N − (Σ c·ln c)/N, ROUND 9
    because the Σ c·ln c accumulation order differs from SQL's by
    ~1e-15. Returns (doc_id, n_tokens, entropy_r9)."""

    def _score(batch: pa.Table) -> pa.Table:
        ids = batch.column("doc_id").to_numpy(zero_copy_only=False)
        ent = np.empty(len(ids), dtype=np.float64)
        ntok = np.empty(len(ids), dtype=np.int64)
        for i, txt in enumerate(batch.column("text").to_pylist()):
            toks = txt.split(" ")
            _, cnt = np.unique(toks, return_counts=True)
            n = cnt.sum()
            ntok[i] = n
            ent[i] = np.log(float(n)) - float((cnt * np.log(cnt)).sum()) / float(n)
        return pa.table(
            {
                "doc_id": pa.array(ids, type=pa.int64()),
                "n_tokens": pa.array(ntok),
                "entropy_r9": pa.array(np.round(ent, 9)),
            }
        )

    return _docs(sf_dir, ["doc_id", "text"]).map_batches(_score, batch_format="pyarrow")


def q_doclen_rank_in_lang(sf_dir: str):
    """SQL ``RANK() OVER (PARTITION BY lang ORDER BY n_chars)`` without
    a window: a global sort + per-row window at 10^12 rows is an
    all-to-all shuffle, but RANK (ties share a rank) depends only on
    the per-(lang, length) HISTOGRAM — tiny next to the table. One
    ``groupby(lang, n_chars).count()``, a driver-side cumulative over
    the sorted histogram, then the (lang, len) → rank map broadcasts
    back through a stateless ``map_batches`` lookup (two searchsorted
    calls per block, no second shuffle). Returns
    (doc_id, lang, rk, n_lang)."""
    from ray.data.aggregate import Count

    hist = (
        _docs(sf_dir, ["lang", "n_chars"])
        .groupby(["lang", "n_chars"])
        .aggregate(Count(alias_name="c"))
        .to_pandas()  # ≤ |langs| × |distinct lengths| rows
        .sort_values(["lang", "n_chars"])
        .reset_index(drop=True)
    )
    rank_map: dict = {}
    n_lang: dict = {}
    for lang, grp in hist.groupby("lang", sort=False):
        c = grp["c"].to_numpy()
        cum = np.concatenate(([0], np.cumsum(c)[:-1]))
        for ln, base in zip(grp["n_chars"].to_numpy(), cum):
            rank_map[(lang, int(ln))] = int(base) + 1
        n_lang[lang] = int(c.sum())

    def _attach(b: pa.Table) -> pa.Table:
        langs = b.column("lang").to_pylist()
        lens = b.column("n_chars").to_numpy(zero_copy_only=False)
        rk = np.fromiter(
            (rank_map[(lg, int(ln))] for lg, ln in zip(langs, lens)),
            dtype=np.int64,
            count=len(langs),
        )
        nl = np.fromiter(
            (n_lang[lg] for lg in langs), dtype=np.int64, count=len(langs)
        )
        return pa.table(
            {
                "doc_id": b.column("doc_id"),
                "lang": b.column("lang"),
                "rk": pa.array(rk),
                "n_lang": pa.array(nl),
            }
        )

    return _docs(sf_dir, ["doc_id", "lang", "n_chars"]).map_batches(
        _attach, batch_format="pyarrow"
    )


def q_split_leakage(sf_dir: str):
    """Train/val/test LEAKAGE detection — the eval-hygiene check every
    corpus release runs: count MinHash near-dup pairs (threshold 0.5,
    the engine's standard candidate set) whose endpoints land in
    DIFFERENT splits. Splits are a pure hash of the doc id
    (functions/splits.py), so no join is needed — each pair row labels
    both endpoints in one vectorized map and a tiny groupby counts per
    (split_a, split_b, crosses) cell. Returns
    (split_a, split_b, crosses, n_pairs)."""
    from ray.data.aggregate import Count

    from ..functions.splits import split_labels

    pairs = _minhash_pairs_cached(sf_dir)

    def _label(b: pa.Table) -> pa.Table:
        a = b.column("doc_a").to_numpy(zero_copy_only=False)
        d = b.column("doc_b").to_numpy(zero_copy_only=False)
        sa, sb = split_labels(a), split_labels(d)
        return pa.table(
            {
                "split_a": pa.array(sa.tolist(), type=pa.string()),
                "split_b": pa.array(sb.tolist(), type=pa.string()),
                "crosses": pa.array(sa != sb),
            }
        )

    return (
        pairs.map_batches(_label, batch_format="pyarrow")
        .groupby(["split_a", "split_b", "crosses"])
        .aggregate(Count(alias_name="n_pairs"))
    )


def q_dedup_survivor_mass(sf_dir: str):
    """Dedup attrition accounting — the number every corpus report
    leads with: how many documents AND how many characters survive
    exact dedup. Texts group by 8-byte content hash (never shuffling
    the text); n_chars is constant within a group (it is a function of
    the text), so the survivor mass is the Min over each group — four
    exact integers in one pass + one tiny aggregate. Returns one row
    (n_docs, n_distinct, chars_total, chars_distinct)."""
    from ray.data.aggregate import Count, Min, Sum

    from ..functions.dedup import content_hash_batch

    hashed = _docs(sf_dir, ["doc_id", "text", "n_chars"]).map_batches(
        content_hash_batch, batch_format="pyarrow"
    )
    groups = hashed.groupby("content_hash").aggregate(
        Count(alias_name="n"), Min("n_chars", alias_name="chars")
    )

    def _partial(b: pa.Table) -> pa.Table:
        n = b.column("n").to_numpy(zero_copy_only=False)
        ch = b.column("chars").to_numpy(zero_copy_only=False)
        return pa.table(
            {
                "n_docs": pa.array([int(n.sum())]),
                "n_distinct": pa.array([len(n)]),
                "chars_total": pa.array([int((n * ch).sum())]),
                "chars_distinct": pa.array([int(ch.sum())]),
            }
        )

    tot = groups.map_batches(_partial, batch_format="pyarrow").aggregate(
        Sum("n_docs", alias_name="n_docs"),
        Sum("n_distinct", alias_name="n_distinct"),
        Sum("chars_total", alias_name="chars_total"),
        Sum("chars_distinct", alias_name="chars_distinct"),
    )
    return pa.table(
        {
            "n_docs": pa.array([int(tot["n_docs"])], type=pa.int64()),
            "n_distinct": pa.array([int(tot["n_distinct"])], type=pa.int64()),
            "chars_total": pa.array([int(tot["chars_total"])], type=pa.int64()),
            "chars_distinct": pa.array([int(tot["chars_distinct"])], type=pa.int64()),
        }
    )


def q_ams_f2_tokens(sf_dir: str, m: int = 16):
    """AMS second-moment (F2) sketch of the token-frequency vector
    (Alon-Matias-Szegedy, STOC 1996) — completes the sketch family
    (HLL distinct / CMS point / Bloom membership / AMS moment): m=16
    estimators S_k = Σ_t s_k(t)·f_t with DETERMINISTIC ±1 signs
    s_k(t) = 1 − 2·(splitmix64(fnv(t) ⊕ k) & 1), so every partial is
    an exact int64 mergeable in any order and the SQL replay is
    bit-for-bit. E[S_k²] = F2; the exact F2 = Σ f_t² rides along for
    the error check. Returns one row (sum_sk2, exact_f2, est_f2)."""
    from ray.data.aggregate import Sum

    from ..functions.text import _TOKEN_RE, hash_token
    from ..sources.edges_synth import _splitmix64

    def _tok_counts(b: pa.Table) -> pa.Table:
        hs = []
        for txt in b.column("text").to_pylist():
            hs.extend(hash_token(t) for t in _TOKEN_RE.findall(txt))
        h, c = np.unique(np.array(hs, dtype=np.uint64), return_counts=True)
        return pa.table(
            {
                "h": pa.array(h.view(np.int64)),
                "c": pa.array(c.astype(np.int64)),
            }
        )

    counts = (
        _docs(sf_dir, ["text"])
        .map_batches(_tok_counts, batch_format="pyarrow")
        .groupby("h")
        .aggregate(Sum("c", alias_name="c"))
    )

    def _partials(b: pa.Table) -> pa.Table:
        h = b.column("h").to_numpy(zero_copy_only=False).view(np.uint64)
        c = b.column("c").to_numpy(zero_copy_only=False)
        ks = np.arange(m, dtype=np.uint64)
        sign = 1 - 2 * (_splitmix64(h[:, None] ^ ks[None, :]) & np.uint64(1)).astype(
            np.int64
        )
        return pa.table(
            {
                "k": pa.array(np.tile(np.arange(m, dtype=np.int64), 1)),
                "s": pa.array((sign * c[:, None]).sum(axis=0)),
                "f2": pa.array(
                    np.concatenate(([int((c * c).sum())], np.zeros(m - 1, dtype=np.int64)))
                ),
            }
        )

    agg = (
        counts.map_batches(_partials, batch_format="pyarrow")
        .groupby("k")
        .aggregate(Sum("s", alias_name="s"), Sum("f2", alias_name="f2"))
        .to_pandas()  # m rows
    )
    sks = agg["s"].to_numpy().astype(object)
    sum_sk2 = int(sum(int(x) * int(x) for x in sks))
    exact_f2 = int(agg["f2"].sum())
    return pa.table(
        {
            "sum_sk2": pa.array([sum_sk2], type=pa.int64()),
            "exact_f2": pa.array([exact_f2], type=pa.int64()),
            "est_f2": pa.array([float(sum_sk2) / float(m)], type=pa.float64()),
        }
    )


def q_bm25_topk(sf_dir: str):
    """Top-10 documents by BM25 for the fixed query (hash, merge, dup)
    — SQL-oracled: exact int64 sufficient statistics, single IEEE
    divisions/ln, term-by-term score parity, ROUND r6; selection and
    order on the rounded score (see functions/terms.py:bm25_topk)."""
    from ..functions.terms import bm25_topk

    return bm25_topk(_docs(sf_dir, ["doc_id", "text"]), k=10)


def q_lang_js_divergence(sf_dir: str):
    """Pairwise Jensen-Shannon divergence (nats) between per-language
    unigram token distributions — the domain-shift / corpus-mixture
    measurement a training-data pipeline thresholds when deciding
    whether two slices can share a sampling weight.

    Scale plan: one map pass reduces each block to (lang, tok, cnt)
    partials (per-block Counter — the token never leaves as raw text);
    a combiner-backed groupby(lang, tok) sums them. The reduced table
    is O(|langs| · |vocab|) — tiny — so the pairwise JS assembly runs
    on the driver over sorted (lang, tok) order. SQL-oracled: exact
    int64 counts; both sides evaluate the identical per-token term
    p·ln(2p/(p+q)) on IEEE doubles and ROUND 9 absorbs the summation-
    order ~1e-15 drift (the doc_entropy precedent). Returns
    (lang_a, lang_b, n_a, n_b, js_r9), lang_a < lang_b."""
    from collections import Counter as _Counter

    def _partial(batch: pa.Table) -> pa.Table:
        langs = batch.column("lang").to_pylist()
        texts = batch.column("text").to_pylist()
        acc: dict = {}
        for lg, txt in zip(langs, texts):
            c = acc.setdefault(lg, _Counter())
            c.update((txt or "").split(" "))
        rows_l, rows_t, rows_c = [], [], []
        for lg, c in acc.items():
            for t, n in c.items():
                rows_l.append(lg)
                rows_t.append(t)
                rows_c.append(n)
        return pa.table(
            {
                "lang": pa.array(rows_l, type=pa.string()),
                "tok": pa.array(rows_t, type=pa.string()),
                "cnt": pa.array(rows_c, type=pa.int64()),
            }
        )

    from ray.data.aggregate import Sum as _Sum

    counts = (
        _docs(sf_dir, ["lang", "text"])
        .map_batches(_partial, batch_format="pyarrow")
        .groupby(["lang", "tok"])
        .aggregate(_Sum("cnt", alias_name="c"))
        .to_pandas()
    )
    langs = sorted(counts["lang"].unique())
    vocab = sorted(counts["tok"].unique())
    vidx = {t: i for i, t in enumerate(vocab)}
    mats = {}
    tots = {}
    for lg in langs:
        v = np.zeros(len(vocab), dtype=np.int64)
        sub = counts[counts["lang"] == lg]
        v[[vidx[t] for t in sub["tok"]]] = sub["c"].to_numpy()
        mats[lg] = v
        tots[lg] = int(v.sum())
    rows = []
    for i, la in enumerate(langs):
        for lb in langs[i + 1 :]:
            a, b = mats[la].astype(np.float64), mats[lb].astype(np.float64)
            na, nb = float(tots[la]), float(tots[lb])
            p, q = a / na, b / nb
            m = p + q
            with np.errstate(divide="ignore", invalid="ignore"):
                ta = np.where(a > 0, p * np.log(2.0 * p / m), 0.0)
                tb = np.where(b > 0, q * np.log(2.0 * q / m), 0.0)
            js = 0.5 * float(ta.sum()) + 0.5 * float(tb.sum())
            rows.append((la, lb, tots[la], tots[lb], round(js, 9)))
    return pa.table(
        {
            "lang_a": pa.array([r[0] for r in rows], type=pa.string()),
            "lang_b": pa.array([r[1] for r in rows], type=pa.string()),
            "n_a": pa.array([r[2] for r in rows], type=pa.int64()),
            "n_b": pa.array([r[3] for r in rows], type=pa.int64()),
            "js_r9": pa.array([r[4] for r in rows], type=pa.float64()),
        }
    )


def q_posting_samples(sf_dir: str):
    """Inverted-index posting samples (tok, df, rk, doc_id ≤ 8 lowest)
    — SQL-oracled; block-local bottom-k partials keep stopword merge
    groups bounded (see functions/terms.py:posting_samples)."""
    from ..functions.terms import posting_samples

    return posting_samples(_docs(sf_dir, ["doc_id", "text"]), k=8)



def q_cross_source_neardups(sf_dir: str):
    """Near-duplicate pair counts within and across sources — the
    dedup-provenance matrix a corpus audit reads to decide whether
    near-dedup must run globally or can stay per-source. Reuses the
    cached MinHash candidate pairs (threshold 0.5); each doc's source
    is attached from a broadcast (doc_id → source) array (8 B + a
    dictionary code per doc — ``ray.put`` once, searchsorted per
    batch), the matrix groupby is over ≤ |sources|² keys, and every
    observed source pair gets a deterministic zero fill. SQL-oracled
    by composing the identical minhash CTE chain."""
    import ray as _ray

    pairs = _minhash_pairs_cached(sf_dir)
    src_df = (
        _docs(sf_dir, ["doc_id", "source"])
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    ids = src_df["doc_id"].to_numpy().astype(np.int64)
    srcs_arr = src_df["source"].to_numpy()
    uniq_srcs = sorted(set(srcs_arr.tolist()))
    code = {s: i for i, s in enumerate(uniq_srcs)}
    codes = np.array([code[s] for s in srcs_arr], dtype=np.int64)
    ref = _ray.put((ids, codes))

    def _classify(b: pa.Table) -> pa.Table:
        ids_, codes_ = _ray.get(ref)
        da = b.column("doc_a").to_numpy(zero_copy_only=False).astype(np.int64)
        db = b.column("doc_b").to_numpy(zero_copy_only=False).astype(np.int64)
        ca = codes_[np.searchsorted(ids_, da)]
        cb = codes_[np.searchsorted(ids_, db)]
        lo, hi = np.minimum(ca, cb), np.maximum(ca, cb)
        return pa.table(
            {
                "src_a": pa.array(lo, type=pa.int64()),
                "src_b": pa.array(hi, type=pa.int64()),
                "n": pa.array(np.ones(len(lo), dtype=np.int64), type=pa.int64()),
            }
        )

    from ray.data.aggregate import Sum as _Sum

    mat = (
        pairs.map_batches(_classify, batch_format="pyarrow")
        .groupby(["src_a", "src_b"])
        .aggregate(_Sum("n", alias_name="n"))
        .to_pandas()
    )
    got = {
        (int(a), int(b)): int(n)
        for a, b, n in zip(mat["src_a"], mat["src_b"], mat["n"])
    }
    rows = []
    for i, a in enumerate(uniq_srcs):
        for j in range(i, len(uniq_srcs)):
            rows.append((a, uniq_srcs[j], got.get((i, j), 0)))
    return pa.table(
        {
            "src_a": pa.array([r[0] for r in rows], type=pa.string()),
            "src_b": pa.array([r[1] for r in rows], type=pa.string()),
            "neardup_pairs": pa.array([r[2] for r in rows], type=pa.int64()),
        }
    )


def q_mmr_vec0(sf_dir: str):
    """MMR diverse top-5 retrieval for query vector 0 over the top-20
    cosine candidates (functions/similarity.py:mmr_topk) — SQL-oracled
    against an unrolled 5-step greedy."""
    from ..functions.similarity import mmr_topk

    return mmr_topk(_emb(sf_dir), query_id=0, m=20, k=5, lam=0.75)


def q_source_mixing_weights(sf_dir: str, alpha: float = 0.5):
    """Temperature-scaled source sampling weights — the corpus-mixture
    knob every multi-source training run sets: w_s ∝ (tokens_s)^α
    (α = 0.5, the classic sqrt-temperature rebalancing). One map pass
    reduces blocks to (source, n_tokens) partials; the combiner-backed
    groupby leaves |sources| rows; weights come from the identical
    sqrt/Σ expression on both sides (ROUND 9 absorbs the ~1e-16
    summation-order drift over ≤ |sources| terms). Returns
    (source, n_tokens, weight_r9)."""
    from ray.data.aggregate import Sum as _Sum

    def _partial(b: pa.Table) -> pa.Table:
        srcs = b.column("source").to_pylist()
        texts = b.column("text").to_pylist()
        acc: dict = {}
        for s, t in zip(srcs, texts):
            acc[s] = acc.get(s, 0) + len((t or "").split(" "))
        return pa.table(
            {
                "source": pa.array(list(acc.keys()), type=pa.string()),
                "n_tokens": pa.array(list(acc.values()), type=pa.int64()),
            }
        )

    agg = (
        _docs(sf_dir, ["source", "text"])
        .map_batches(_partial, batch_format="pyarrow")
        .groupby("source")
        .aggregate(_Sum("n_tokens", alias_name="n_tokens"))
        .to_pandas()
        .sort_values("source")
        .reset_index(drop=True)
    )
    toks = agg["n_tokens"].to_numpy().astype(np.float64)
    pw = np.sqrt(toks) if alpha == 0.5 else toks**alpha
    tot = float(pw.sum())
    w = np.round(pw / tot, 9)
    return pa.table(
        {
            "source": pa.array(agg["source"].tolist(), type=pa.string()),
            "n_tokens": pa.array(agg["n_tokens"].to_numpy().astype(np.int64)),
            "weight_r9": pa.array(w, type=pa.float64()),
        }
    )


def q_quality_ce_calibration(sf_dir: str):
    """Calibration of the cheap heuristic quality score against the
    bigram-LM cross-entropy — the "does my fast filter predict LM
    loss" check run before spending a training epoch on filtered data.
    Quality bands are FIXED integer deciles of the [0,1] score
    (quality_ppm // 100000 — no rank computation, so no tie
    sensitivity); per band the pooled CE is one IEEE division of
    exact integer sums (Σ ce_num micro-nats / 1e6·Σ n_bigrams).
    Join plan: the two per-doc tables union-tag co-shuffle on doc_id
    (no broadcast — both sides are corpus-sized), then a tiny
    groupby(band). Returns (band, n_docs, ce_num_sum, n_bigrams_sum,
    pooled_ce)."""
    from ray.data.aggregate import Count as _Count, Sum as _Sum

    from ..functions import text as T
    from ..functions.terms import bigram_cross_entropy

    import ray as _ray

    total = int(_ray.cluster_resources().get("CPU", 4))
    scored = _docs(sf_dir, ["doc_id", "text"]).map_batches(
        T.QualityScorer,
        batch_format="pyarrow",
        batch_size=1024,
        concurrency=max(2, total - 2),
    )

    def _qband(b: pa.Table) -> pa.Table:
        q = b.column("quality_ppm").to_numpy(zero_copy_only=False).astype(np.int64)
        n = b.num_rows
        return pa.table(
            {
                "doc_id": b.column("doc_id").cast(pa.int64()),
                "band": pa.array(q // 100000, type=pa.int64()),
                "ce_num": pa.array(np.zeros(n, dtype=np.int64)),
                "n_bigrams": pa.array(np.zeros(n, dtype=np.int64)),
            }
        )

    def _cetag(b: pa.Table) -> pa.Table:
        return pa.table(
            {
                "doc_id": b.column("doc_id").cast(pa.int64()),
                "band": pa.array(np.full(b.num_rows, -1, dtype=np.int64)),
                "ce_num": b.column("ce_num").cast(pa.int64()),
                "n_bigrams": b.column("n_bigrams").cast(pa.int64()),
            }
        )

    ce = bigram_cross_entropy(_docs(sf_dir, ["doc_id", "text"]))
    merged = (
        scored.map_batches(_qband, batch_format="pyarrow")
        .union(ce.map_batches(_cetag, batch_format="pyarrow"))
        .groupby("doc_id")
        .aggregate(
            _Sum("band", alias_name="band"),  # band + (-1) from the ce row
            _Sum("ce_num", alias_name="ce_num"),
            _Sum("n_bigrams", alias_name="n_bigrams"),
        )
    )

    def _fix(b: pa.Table) -> pa.Table:
        band = b.column("band").to_numpy(zero_copy_only=False).astype(np.int64) + 1
        nb = b.column("n_bigrams").to_numpy(zero_copy_only=False).astype(np.int64)
        keep = nb > 0  # docs with no bigram row never join in SQL either
        return pa.table(
            {
                "band": pa.array(band[keep], type=pa.int64()),
                "ce_num": b.column("ce_num").filter(pa.array(keep)).cast(pa.int64()),
                "n_bigrams": pa.array(nb[keep], type=pa.int64()),
                "one": pa.array(np.ones(int(keep.sum()), dtype=np.int64)),
            }
        )

    agg = (
        merged.map_batches(_fix, batch_format="pyarrow")
        .groupby("band")
        .aggregate(
            _Sum("one", alias_name="n_docs"),
            _Sum("ce_num", alias_name="ce_num_sum"),
            _Sum("n_bigrams", alias_name="n_bigrams_sum"),
        )
        .to_pandas()
    )
    pooled = agg["ce_num_sum"].to_numpy().astype(np.float64) / (
        1000000.0 * agg["n_bigrams_sum"].to_numpy().astype(np.float64)
    )
    return pa.table(
        {
            "band": pa.array(agg["band"].to_numpy().astype(np.int64)),
            "n_docs": pa.array(agg["n_docs"].to_numpy().astype(np.int64)),
            "ce_num_sum": pa.array(agg["ce_num_sum"].to_numpy().astype(np.int64)),
            "n_bigrams_sum": pa.array(agg["n_bigrams_sum"].to_numpy().astype(np.int64)),
            "pooled_ce": pa.array(pooled, type=pa.float64()),
        }
    )


def q_hashed_classifier(sf_dir: str):
    """fastText-style hashed linear quality classifier over documents
    (functions/text.py:hashed_classifier_batch): mean hashed token
    weight + sign label per doc. Pure map-side — zero shuffle."""
    from ..functions.text import hashed_classifier_batch

    return _docs(sf_dir, ["doc_id", "text"]).map_batches(
        hashed_classifier_batch, batch_format="pyarrow"
    )


def q_ce_buckets_by_lang(sf_dir: str, P: int = 32):
    """CCNet-style perplexity buckets: per language, split documents
    into head/middle/tail (0/1/2) by their bigram-LM cross-entropy —
    the exact CCNet recipe for quality-stratifying a crawl corpus.
    Distributed shape: the CE table (one exact integer per doc,
    functions/terms.py:bigram_cross_entropy) and the thin
    (doc_id, lang) projection are co-located by ONE
    ``groupby(doc_id % P)`` tagged co-shuffle; per-language exact
    tercile thresholds come from the bounded-domain histogram
    percentile machinery (quantile_disc semantics) and are broadcast
    back over the joined rows — no per-doc rank shuffle. ceq is the
    exact integer micro-nats-per-bigram quotient. Returns
    (doc_id, lang, ceq, bucket)."""
    import ray

    from ..functions.stats import exact_percentiles_by
    from ..functions.terms import bigram_cross_entropy

    ce = bigram_cross_entropy(_docs(sf_dir, ["doc_id", "text"]))

    def _tag_ce(b: pa.Table) -> pa.Table:
        did = b.column("doc_id").to_numpy(zero_copy_only=False).astype(np.int64)
        ceq = (
            b.column("ce_num").to_numpy(zero_copy_only=False)
            // b.column("n_bigrams").to_numpy(zero_copy_only=False)
        ).astype(np.int64)
        return pa.table(
            {
                "part": pa.array(did % P, type=pa.int64()),
                "doc_id": pa.array(did, type=pa.int64()),
                "ceq": pa.array(ceq, type=pa.int64()),
                "lang": pa.nulls(len(did), type=pa.string()),
            }
        )

    def _tag_docs(b: pa.Table) -> pa.Table:
        did = b.column("doc_id").to_numpy(zero_copy_only=False).astype(np.int64)
        return pa.table(
            {
                "part": pa.array(did % P, type=pa.int64()),
                "doc_id": pa.array(did, type=pa.int64()),
                "ceq": pa.nulls(len(did), type=pa.int64()),
                "lang": b.column("lang"),
            }
        )

    def _join(g: pa.Table) -> pa.Table:
        has_lang = g.column("lang").is_valid().to_numpy(zero_copy_only=False)
        did = g.column("doc_id").to_numpy(zero_copy_only=False)
        dd = did[has_lang]
        dl = np.asarray(g.column("lang").to_pylist(), dtype=object)[has_lang]
        order = np.argsort(dd)
        dd, dl = dd[order], dl[order]
        cd = did[~has_lang]
        cq = g.column("ceq").to_numpy(zero_copy_only=False)[~has_lang]
        if len(cd) == 0:
            return pa.table(
                {
                    "doc_id": pa.array([], type=pa.int64()),
                    "lang": pa.array([], type=pa.string()),
                    "ceq": pa.array([], type=pa.int64()),
                }
            )
        pos = np.searchsorted(dd, cd)  # every CE row has its doc
        return pa.table(
            {
                "doc_id": pa.array(cd, type=pa.int64()),
                "lang": pa.array(dl[pos].tolist(), type=pa.string()),
                "ceq": pa.array(cq, type=pa.int64()),
            }
        )

    joined = (
        ce.map_batches(_tag_ce, batch_format="pyarrow")
        .union(
            _docs(sf_dir, ["doc_id", "lang"]).map_batches(
                _tag_docs, batch_format="pyarrow"
            )
        )
        .groupby("part")
        .map_groups(_join, batch_format="pyarrow")
        .materialize()
    )
    thr = exact_percentiles_by(joined, "lang", "ceq", [0.33, 0.66]).to_pandas()
    tmap: dict = {}
    for lang, q, v in zip(thr["lang"], thr["q"], thr["value"]):
        tmap.setdefault(lang, {})[round(float(q), 2)] = int(v)
    ref = ray.put(tmap)

    def _bucket(b: pa.Table) -> pa.Table:
        tm = ray.get(ref)
        langs = b.column("lang").to_pylist()
        ceq = b.column("ceq").to_numpy(zero_copy_only=False)
        t33 = np.array([tm[la][0.33] for la in langs], dtype=np.int64)
        t66 = np.array([tm[la][0.66] for la in langs], dtype=np.int64)
        bucket = np.where(ceq <= t33, 0, np.where(ceq <= t66, 1, 2)).astype(np.int64)
        return pa.table(
            {
                "doc_id": b.column("doc_id"),
                "lang": b.column("lang"),
                "ceq": b.column("ceq"),
                "bucket": pa.array(bucket, type=pa.int64()),
            }
        )

    return joined.map_batches(_bucket, batch_format="pyarrow")


def q_knn_label_accuracy(sf_dir: str):
    """Leave-one-out 1-NN label accuracy over the embeddings table
    (functions/similarity.py:knn_label_accuracy)."""
    from ..functions.similarity import knn_label_accuracy

    return knn_label_accuracy(_emb(sf_dir))


def q_neardup_threshold_sweep(sf_dir: str, thresholds=(0.3, 0.5, 0.7)):
    """Dedup-threshold operating curve: for each MinHash similarity
    threshold, the candidate-pair count and the near-dup cluster
    structure (clusters of size ≥ 2, largest cluster, docs covered) —
    the sweep a pipeline owner runs before picking the production
    dedup threshold. ONE banded-LSH pass at the loosest threshold is
    reused for every point (est_jaccard is a pure function of the
    pair, an exact binary fraction, so filtering ≥ t replays the
    per-threshold run bit-exactly); each point reuses the engine's CC
    superstep kernel over its pair edges. Returns
    (threshold_pct, n_pairs, n_clusters, largest_cluster, n_dup_docs)."""
    from ray.data.aggregate import Count, Max, Sum

    docs = _docs(sf_dir, ["doc_id", "text"])
    base = D.minhash_candidate_pairs(docs, threshold=min(thresholds)).materialize()

    out = {k: [] for k in ("threshold_pct", "n_pairs", "n_clusters", "largest_cluster", "n_dup_docs")}
    for t in thresholds:

        def _flt(b: pa.Table, t=t) -> pa.Table:
            keep = b.column("est_jaccard").to_numpy(zero_copy_only=False) >= t
            return b.filter(pa.array(keep))

        pairs_t = base.map_batches(_flt, batch_format="pyarrow").materialize()
        clusters = D.neardup_clusters(docs, pairs_t)
        sizes = clusters.groupby("cluster").aggregate(Count(alias_name="n"))

        def _nontrivial(b: pa.Table) -> pa.Table:
            keep = b.column("n").to_numpy(zero_copy_only=False) >= 2
            return b.filter(pa.array(keep))

        nz = sizes.map_batches(_nontrivial, batch_format="pyarrow").aggregate(
            Count(alias_name="n_clusters"),
            Max("n", alias_name="largest_cluster"),
            Sum("n", alias_name="n_dup_docs"),
        )
        out["threshold_pct"].append(int(round(t * 100)))
        out["n_pairs"].append(int(pairs_t.count()))
        out["n_clusters"].append(int(nz["n_clusters"] or 0))
        out["largest_cluster"].append(int(nz["largest_cluster"] or 0))
        out["n_dup_docs"].append(int(nz["n_dup_docs"] or 0))
    return pa.table({k: pa.array(v, type=pa.int64()) for k, v in out.items()})


def q_contamination_13gram(sf_dir: str):
    """Exact 13-gram benchmark decontamination (GPT-3 appendix C /
    PaLM style): docs outside the 'src0' benchmark source that share
    any 13-token shingle with it, with exact distinct-gram and hit
    counts. Broadcast small-side membership — see
    functions/dedup.benchmark_contamination."""
    docs = _docs(sf_dir, ["doc_id", "text", "source"])
    return D.benchmark_contamination(docs, bench_source="src0", w=13)


def q_dup_span_census(sf_dir: str):
    """Corpus-level duplicated-span census: the 64 most frequent
    8-token windows (FNV fingerprints) with occurrence and document
    counts — the global boilerplate detector
    (functions/terms.dup_span_census). Exact SQL parity."""
    from ..functions.terms import dup_span_census

    return dup_span_census(_docs(sf_dir, ["doc_id", "text"]), w=8, top=64)


def q_cross_dup_window_profile(sf_dir: str):
    """Suffix-based benchmark decontamination: per NON-benchmark doc,
    the longest power-of-two window shared verbatim with the 'src0'
    benchmark corpus, plus how many positions start a shared window of
    >= 8 tokens (functions/suffix.cross_dup_window_profile). Exact SQL
    parity. Returns (doc_id, max_shared, n_shared_thresh, n_pos)."""
    from ..functions.suffix import cross_dup_window_profile

    return cross_dup_window_profile(
        _docs(sf_dir, ["doc_id", "text", "source"]), bench_source="src0"
    )


def q_ngram_novelty_docs(sf_dir: str):
    """Per-doc 8-gram novelty: fraction of the doc's distinct 8-token
    shingles first seen (min doc_id) in this doc — the training-order
    memorization proxy. One hash-bucketed co-shuffle; see
    functions/dedup.ngram_novelty."""
    docs = _docs(sf_dir, ["doc_id", "text"])
    return D.ngram_novelty(docs, w=8)


def q_label_centroid_drift(sf_dir: str):
    """Per-label embedding-centroid drift vs the global centroid
    (quantized-exact distributed sums, final cosine ROUND 6). See
    functions/similarity.label_centroid_drift."""
    import ray.data as rd_

    out = S.label_centroid_drift(_emb(sf_dir))
    return rd_.from_arrow(out)


def q_ann_recall_at_k(sf_dir: str):
    """Recall@5 of anchor-codebook IVF at nprobe=2 vs exact brute-force
    cosine top-5 for three probe queries — the ANN quality eval. See
    functions/similarity.ann_recall_at_k."""
    import ray.data as rd_

    return rd_.from_arrow(
        S.ann_recall_at_k(_emb(sf_dir), query_ids=[0, 7, 42], k=5, nprobe=2)
    )


def q_pii_scrub(sf_dir: str):
    """PII redaction census: the synthetic corpus carries no PII, so the
    query first derives a deterministic PII-bearing variant of each doc
    from its doc_id (always one email; a second email when doc_id%5==0;
    a phone when doc_id%3==0; a private IPv4 when doc_id%4==0), then
    runs functions/text.pii_scrub_batch over it. The SQL oracle replays
    the identical derivation + staged regexp scrub, and the per-doc
    char-level FNV fingerprint pins byte-exact redaction."""

    def _aug(batch: pa.Table) -> pa.Table:
        ids = batch.column("doc_id").to_numpy(zero_copy_only=False)
        texts = batch.column("text").to_pandas().fillna("")
        out = []
        for d, t in zip(ids, texts):
            d = int(d)
            s = f"{t} contact user{d}@example{d % 7}.org"
            if d % 5 == 0:
                s += f" or admin{d}@mail{d % 11}.net"
            if d % 3 == 0:
                s += f" call 555-{d % 10000:04d}"
            if d % 4 == 0:
                s += f" ip 10.{d % 256}.{(7 * d) % 256}.{(13 * d) % 256}"
            out.append(s)
        return pa.table(
            {
                "doc_id": pa.array(ids, type=pa.int64()),
                "text": pa.array(out, type=pa.string()),
            }
        )

    return (
        _docs(sf_dir, ["doc_id", "text"])
        .map_batches(_aug, batch_format="pyarrow")
        .map_batches(T.pii_scrub_batch, batch_format="pyarrow")
    )


def q_grid_conv_wass(sf_dir: str):
    """Grid convolutional-Wasserstein barycenter (SURVEY §2 #48 —
    Solomon et al. 2015 separable-blur Sinkhorn) of the embedding rows
    reshaped to 8×8 grid distributions
    (pipelines/diffusion.grid_conv_wasserstein_barycenter). Returns
    the 64-cell barycenter, round_even 6 → SQL parity."""
    from .diffusion import grid_conv_wasserstein_barycenter

    return grid_conv_wasserstein_barycenter(
        _emb(sf_dir).select_columns(["vec_id", "embedding"])
    )


def q_train_logreg(sf_dir: str):
    """Distributed hashed-feature logistic-regression TRAINING
    (functions/text.train_hashed_logreg — the training half of the
    fastText-style quality/language filter): 4 full-batch GD rounds,
    integer-quantized gradient reduce. Returns (j, w_r6) — SQL parity
    via the fully unrolled replay."""
    from ..functions.text import train_hashed_logreg

    return train_hashed_logreg(_docs(sf_dir, ["doc_id", "text", "lang"]))
