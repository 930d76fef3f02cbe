"""Text analysis operators over a documents table (doc_id, text, lang, ...).

All stages are vectorized ``map_batches`` transforms (pandas string
kernels / numpy); the per-document loops that do exist (fingerprint,
language-ID scoring) run over compiled-regex token streams — no
Python-level per-character work. Reference analogue for scalar
per-record functions: the ``GaussianKernel``-style elementwise ops
(/root/reference/src/ega/util/gaussian_kernel.py:5-17) and the
z-score significance post-maps (graph_kernels.py:23-48).

Cross-checked against DuckDB SQL where expressible (see
oracles/sql.py TEXT_* queries): counts are defined so both systems
compute the identical integer.
"""

from __future__ import annotations

import re

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

# re.ASCII pins \S to the RE2 dialect ([^ \t\n\r\f\v]) that every
# DuckDB oracle of the token-stream family uses: Python's default
# Unicode \s would treat U+00A0 etc. as whitespace where RE2 does not,
# silently diverging tokenization on non-ASCII corpora (ADVICE r4).
_TOKEN_RE = re.compile(r"\S+", re.ASCII)
_WORD_RE = re.compile(r"[A-Za-z0-9]+(?:'[A-Za-z]+)?|[^\w\s]", re.U)  # BPE-ish pre-tokenizer
_ALPHA_RE = re.compile(r"[A-Za-z]")

# tiny public-knowledge function-word profiles for the n-gram/word heuristic
_LANG_MARKERS = {
    "en": {"the", "and", "of", "to", "a", "in", "is", "that", "for", "it", "with", "as"},
    "de": {"der", "die", "und", "das", "ist", "nicht", "ein", "mit", "den", "von", "zu", "für"},
    "fr": {"le", "la", "et", "les", "des", "est", "un", "une", "du", "que", "pour", "dans"},
}

_STOPWORDS = _LANG_MARKERS["en"] | _LANG_MARKERS["de"] | _LANG_MARKERS["fr"]

_FP_BASE = np.uint64(1099511628211)  # FNV prime — rolling polynomial base
_FP_OFFSET = np.uint64(14695981039346656037)


def doc_stats_batch(batch: pa.Table) -> pa.Table:
    """(doc_id, n_chars_text, n_tokens, n_alpha) — SQL-reproducible counts.

    Pure pyarrow/RE2 kernels (no pandas detour): `\\S+` / `[A-Za-z]`
    match identically in RE2 and Python re (verified incl. non-ASCII),
    and DuckDB's regexp functions ARE RE2 — so this is also the
    oracle-aligned dialect. NULL text → 0 counts (fill_null), matching
    the previous fillna semantics."""
    import pyarrow.compute as pc

    texts = batch.column("text")
    z = pa.scalar(0, type=pa.int64())

    def _cnt(pat):
        return pc.fill_null(pc.cast(pc.count_substring_regex(texts, pat), pa.int64()), z)

    return pa.table(
        {
            "doc_id": batch.column("doc_id"),
            "n_chars_text": pc.fill_null(pc.cast(pc.utf8_length(texts), pa.int64()), z),
            "n_tokens": _cnt(r"\S+"),
            "n_alpha": _cnt("[A-Za-z]"),
        }
    )


class QualityScorer:
    """Actor-pool stage: heuristic quality signals per document.

    Signals (all vectorized): char length, token count, mean token
    length, alpha ratio, digit ratio, punctuation ratio, stopword
    ratio, uppercase ratio — the standard cheap pre-filters of a
    web-scale training-data pipeline.
    """

    def __init__(self) -> None:
        self.token_re = _TOKEN_RE
        self.stop = _STOPWORDS
        self._stop_arr = pa.array(sorted(self.stop), type=pa.string())

    def __call__(self, batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        # pure pyarrow/RE2 kernels, no pandas detour (the doc_stats
        # pattern; VERDICT r4 task #5). NULL text → "" via fill_null.
        # Stopword-token counting is the ORACLE's own formulation —
        # split to \S+ tokens, lower, IN stoplist — instead of the old
        # Python lookaround regex (RE2 has no lookarounds); identical
        # whole-token semantics. `[^\w\s]` is RE2/ASCII \w here exactly
        # as in the DuckDB oracle (the documented ASCII-corpus contract).
        texts = pc.fill_null(batch.column("text"), "")

        def _cnt(pat: str) -> np.ndarray:
            return (
                pc.count_substring_regex(texts, pat)
                .to_numpy(zero_copy_only=False)
                .astype(np.float64)
            )

        n_chars = (
            pc.utf8_length(texts).to_numpy(zero_copy_only=False).astype(np.float64)
        )
        n_tokens = _cnt(r"\S+")
        # Σ token lengths ≡ count of non-whitespace chars (tokens are \S+)
        tok_chars = _cnt(r"\S")
        mean_tok_len = np.where(n_tokens > 0, tok_chars, 0) / np.maximum(n_tokens, 1)
        toks = pc.split_pattern_regex(texts, r"\s+")
        par = pc.list_parent_indices(toks).to_numpy(zero_copy_only=False)
        hit = pc.is_in(
            pc.utf8_lower(pc.list_flatten(toks)), value_set=self._stop_arr
        ).to_numpy(zero_copy_only=False)
        stop_cnt = np.bincount(par[hit], minlength=len(batch)).astype(np.float64)
        stop_ratio = stop_cnt / np.maximum(n_tokens, 1)
        alpha_ratio = _cnt(r"[A-Za-z]") / np.maximum(n_chars, 1)
        digit_ratio = _cnt(r"[0-9]") / np.maximum(n_chars, 1)
        punct_ratio = _cnt(r"[^\w\s]") / np.maximum(n_chars, 1)
        upper_ratio = _cnt(r"[A-Z]") / np.maximum(n_chars, 1)
        # composite score in [0,1]: length sweet-spot × alpha × stopword presence
        length_score = np.clip(n_chars / 500.0, 0, 1)
        score = (
            0.35 * length_score
            + 0.25 * alpha_ratio
            + 0.25 * np.clip(stop_ratio * 4, 0, 1)
            + 0.15 * (1 - np.clip(punct_ratio * 4, 0, 1))
        )

        # FLOOR-ppm integers for every ratio: floor of the same IEEE
        # double expression is bit-identical in numpy and DuckDB (the
        # proven cc_ppm pattern) — half-even vs half-away ROUND is not,
        # and these ratios are exact rationals that can land on .5.
        def ppm(x):
            return pa.array(np.floor(x * 1000000.0).astype(np.int64), type=pa.int64())

        return pa.table(
            {
                "doc_id": batch.column("doc_id"),
                "n_tokens": pa.array(n_tokens.astype(np.int64), type=pa.int64()),
                "mean_tok_len_ppm": ppm(mean_tok_len),
                "alpha_ppm": ppm(alpha_ratio),
                "digit_ppm": ppm(digit_ratio),
                "punct_ppm": ppm(punct_ratio),
                "upper_ppm": ppm(upper_ratio),
                "stop_ppm": ppm(stop_ratio),
                "quality_ppm": ppm(score),
                # unrounded double for downstream standardization (zscores)
                "quality": pa.array(score, type=pa.float64()),
            }
        )


class LangId:
    """Actor-pool stage: marker-word language ID over {en, de, fr}.

    Deterministic tie-break: highest hit count wins; ties resolve in
    fixed ('en','de','fr') order; zero hits → 'und'.
    """

    _WORD_CLS = "a-zäöüßéèêàçûî"

    def __init__(self) -> None:
        # the oracle's own formulation (oracles/sql.LANGID): words are
        # maximal [_WORD_CLS]+ runs of the lowercased text, counted per
        # language by set membership — pure pyarrow/RE2 (split on the
        # complement class + vectorized is_in), no pandas detour and no
        # lookaround regexes (RE2 has none).
        self.langs = ("en", "de", "fr")
        self._marker_arrs = [
            pa.array(sorted(_LANG_MARKERS[lang]), type=pa.string())
            for lang in self.langs
        ]
        self._split_pat = f"[^{self._WORD_CLS}]+"

    def __call__(self, batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        texts = pc.utf8_lower(pc.fill_null(batch.column("text"), ""))
        words = pc.split_pattern_regex(texts, self._split_pat)
        flat = pc.list_flatten(words)
        par = pc.list_parent_indices(words).to_numpy(zero_copy_only=False)
        counts = np.stack(
            [
                np.bincount(
                    par[
                        pc.is_in(flat, value_set=arr).to_numpy(zero_copy_only=False)
                    ],
                    minlength=len(batch),
                )
                for arr in self._marker_arrs
            ],
            axis=1,
        )
        best = counts.argmax(axis=1)  # ties resolve in ('en','de','fr') order
        langs = np.array(self.langs)
        preds = np.where(counts.max(axis=1) > 0, langs[best], "und")
        return pa.table(
            {
                "doc_id": batch.column("doc_id"),
                "pred_lang": pa.array(preds, type=pa.string()),
            }
        )


def fingerprint_batch(batch: pa.Table) -> pa.Table:
    """64-bit rolling polynomial fingerprint of the token stream
    (whitespace-normalized content hash — order-sensitive)."""
    texts = pc.fill_null(batch.column("text"), "").to_pylist()
    fps = np.empty(len(texts), dtype=np.uint64)
    with np.errstate(over="ignore"):
        for i, t in enumerate(texts):
            h = _FP_OFFSET
            for tok in _TOKEN_RE.findall(t):
                th = np.uint64(hash_token(tok))
                h = h * _FP_BASE + th
            fps[i] = h
    return pa.table(
        {
            "doc_id": batch.column("doc_id"),
            # signed int64 reinterpretation: BIGINT-comparable at the
            # driver (full-range uint64 can't round-trip DuckDB BIGINT)
            "fingerprint": pa.array(fps.view(np.int64), type=pa.int64()),
        }
    )


def hash_token(tok: str) -> int:
    """Stable per-token 64-bit FNV-1a (process-independent)."""
    h = 14695981039346656037
    for b in tok.encode("utf-8"):
        h = ((h ^ b) * 1099511628211) & 0xFFFFFFFFFFFFFFFF
    return h


def simhash64_batch(batch: pa.Table) -> pa.Table:
    """64-bit SimHash over token FNV hashes (near-dup sketch)."""
    texts = pc.fill_null(batch.column("text"), "").to_pylist()
    out = np.zeros(len(texts), dtype=np.uint64)
    bit_cols = (np.uint64(1) << np.arange(64, dtype=np.uint64))
    for i, t in enumerate(texts):
        toks = _TOKEN_RE.findall(t)
        if not toks:
            continue
        hs = np.array([hash_token(tok) for tok in toks], dtype=np.uint64)
        bits = ((hs[:, None] & bit_cols[None, :]) != 0).astype(np.int32)
        votes = bits.sum(axis=0) * 2 - len(hs)
        out[i] = np.uint64(np.sum(bit_cols[votes > 0], dtype=np.uint64))
    return pa.table(
        {
            "doc_id": batch.column("doc_id"),
            "simhash": pa.array(out, type=pa.uint64()),
        }
    )


def tokenize_words(text: str) -> list[str]:
    """BPE-ish pre-tokenization (words + punctuation marks)."""
    return _WORD_RE.findall(text)


def repetition_batch(batch: pa.Table) -> pa.Table:
    """Gopher-style repetition signals per document (the synthetic
    corpus has no newlines, so the line-level rules become their
    token-level analogues):

      dup_token_frac  = 1 − distinct/total tokens
      top_token_frac  = count(most frequent token) / total tokens
      top_bigram_frac = count(most frequent adjacent bigram) / total bigrams

    Ratios are emitted RAW (single IEEE division — bit-identical to the
    SQL oracle's expression); empty docs yield 0.0."""
    from collections import Counter

    texts = batch.column("text").to_pylist()
    n_tok = np.zeros(len(texts), dtype=np.int64)
    dup = np.zeros(len(texts), dtype=np.float64)
    top_tok = np.zeros(len(texts), dtype=np.float64)
    top_bg = np.zeros(len(texts), dtype=np.float64)
    for i, t in enumerate(texts):
        toks = (t or "").split()
        n = len(toks)
        n_tok[i] = n
        if n == 0:
            continue
        tc = Counter(toks)
        dup[i] = 1.0 - len(tc) / n
        top_tok[i] = max(tc.values()) / n
        if n >= 2:
            bc = Counter(zip(toks, toks[1:]))
            top_bg[i] = max(bc.values()) / (n - 1)
    return pa.table(
        {
            "doc_id": batch.column("doc_id"),
            "n_tokens": pa.array(n_tok, type=pa.int64()),
            "dup_token_frac": pa.array(dup, type=pa.float64()),
            "top_token_frac": pa.array(top_tok, type=pa.float64()),
            "top_bigram_frac": pa.array(top_bg, type=pa.float64()),
        }
    )


def hashed_classifier_batch(batch: pa.Table, *, seed: int = 0x5EED_FA57) -> pa.Table:
    """fastText-style hashed linear quality classifier (the
    DCLM/fastText-filter shape with deterministic hashed weights):
    each token's weight is splitmix64(fnv1a(tok) XOR seed) mapped to
    the centered integer band [-1000, 1000]; a document's score is the
    mean token weight (one IEEE division over exact int64 sums) and
    its label the sign. The real fastText classifier would load a
    trained weight table in an actor's ``__init__``; the hash-derived
    table keeps the whole path deterministic and SQL-replayable while
    exercising the identical batch plumbing. Token-less documents are
    dropped (they have no rows in the SQL unnest either). Returns
    (doc_id, n_tokens, score_num, score, label)."""
    from ..sources.edges_synth import _splitmix64

    ids = batch.column("doc_id").to_pylist()
    texts = batch.column("text").to_pylist()
    out_id: list[int] = []
    n_tok = []
    nums = []
    sd = np.uint64(seed)
    for doc_id, text in zip(ids, texts):
        toks = _TOKEN_RE.findall(text or "")
        if not toks:
            continue
        hs = np.array([hash_token(t) for t in toks], dtype=np.uint64)
        w = (_splitmix64(hs ^ sd) % np.uint64(2001)).astype(np.int64) - 1000
        out_id.append(doc_id)
        n_tok.append(len(toks))
        nums.append(int(w.sum()))
    n = np.asarray(n_tok, dtype=np.int64)
    num = np.asarray(nums, dtype=np.int64)
    return pa.table(
        {
            "doc_id": pa.array(out_id, type=pa.int64()),
            "n_tokens": pa.array(n, type=pa.int64()),
            "score_num": pa.array(num, type=pa.int64()),
            "score": pa.array(
                num.astype(np.float64) / np.maximum(n, 1).astype(np.float64),
                type=pa.float64(),
            ),
            "label": pa.array((num > 0).astype(np.int64), type=pa.int64()),
        }
    )


# --- PII scrubbing -------------------------------------------------------
# Patterns kept to the RE2 ∩ Python-re common dialect so the DuckDB
# oracle replays them verbatim (oracles/sql.py PII_SCRUB).
_PII_EMAIL_RE = re.compile(r"[a-z0-9]+@[a-z0-9]+\.[a-z]+")
_PII_PHONE_RE = re.compile(r"\b555-[0-9]{4}\b")
_PII_IPV4_RE = re.compile(r"\b10\.[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\b")


def pii_scrub_batch(batch: pa.Table) -> pa.Table:
    """PII redaction, the standard pre-training scrub stage (the C4 /
    CCNet / Dolma pipelines all carry one): count and replace email
    addresses, phone numbers and private IPv4 addresses with typed
    placeholder tokens. Reference analogue: none (the reference is a
    graph library); this is part of the engine's LLM-data surface.

    Per doc: (doc_id, n_emails, n_phones, n_ips, scrub_fp) where
    scrub_fp is the char-level FNV-1a fingerprint (int64 reinterpret)
    of the scrubbed text — the byte-exact evidence that both sides
    redacted identically. Replacement order: emails, phones, IPs.
    """
    ids = batch.column("doc_id").to_numpy(zero_copy_only=False)
    texts = pc.fill_null(batch.column("text"), "").to_pylist()
    n_em = np.zeros(len(ids), dtype=np.int64)
    n_ph = np.zeros(len(ids), dtype=np.int64)
    n_ip = np.zeros(len(ids), dtype=np.int64)
    fps = np.zeros(len(ids), dtype=np.uint64)
    for i, t in enumerate(texts):
        n_em[i] = len(_PII_EMAIL_RE.findall(t))
        s = _PII_EMAIL_RE.sub("<EMAIL>", t)
        n_ph[i] = len(_PII_PHONE_RE.findall(s))
        s = _PII_PHONE_RE.sub("<PHONE>", s)
        n_ip[i] = len(_PII_IPV4_RE.findall(s))
        s = _PII_IPV4_RE.sub("<IP>", s)
        fps[i] = np.uint64(hash_token(s))
    return pa.table(
        {
            "doc_id": pa.array(ids, type=pa.int64()),
            "n_emails": pa.array(n_em, type=pa.int64()),
            "n_phones": pa.array(n_ph, type=pa.int64()),
            "n_ips": pa.array(n_ip, type=pa.int64()),
            "scrub_fp": pa.array(fps.view(np.int64), type=pa.int64()),
        }
    )


def train_hashed_logreg(
    docs_ds,
    *,
    dim: int = 64,
    iters: int = 4,
    lr: float = 0.5,
    seed: int = 0x5EED_FA57,
    pos_lang: str = "en",
):
    """Distributed training of a hashed-feature logistic-regression
    quality/language classifier — the TRAINING half of the
    fastText-style filter (``hashed_classifier_batch`` is the
    inference half): full-batch gradient descent over
    bag-of-hashed-tokens features x_j = count(bucket j)/n_tokens,
    bucket = splitmix64(fnv1a(tok) ⊕ seed) mod dim, label
    y = [lang == pos_lang].

    Distributed shape: ONE feature pass materializes the thin
    (doc_id, y, x[dim]) table (text never touches the loop); each GD
    round is a map_batches with the weight vector broadcast, emitting
    per-block integer partial gradients — the driver reduces dim int64
    cells per block and updates w. No shuffle anywhere.

    Determinism/SQL parity (oracles/sql.train_logreg_sql): the three
    float nonlinearities are pinned by integer quantization so BLAS
    reassociation and libm ulp differences cannot drift across
    systems — z_q = ⌊z·2²⁴⌋ (dot-product order), p_q = ⌊2²⁰·σ(z_q/2²⁴)⌋
    (exp ulp), g_q = ⌊(p_q/2²⁰ − y)·x·2³⁰⌋ summed as int64 (order-free).

    Returns a pyarrow Table (j, w_r6): the trained weights,
    round_even 6.
    """
    import ray

    from ..sources.edges_synth import _splitmix64
    from ..util import list_array, list_rows

    Q = float(1 << 30)
    ZQ = float(1 << 24)
    PQ = float(1 << 20)
    sd = np.uint64(seed)

    def _feat(batch: pa.Table) -> pa.Table:
        ids = batch.column("doc_id").to_pylist()
        texts = batch.column("text").to_pylist()
        langs = batch.column("lang").to_pylist()
        out_id, out_y, out_x = [], [], []
        for doc_id, text, lang in zip(ids, texts, langs):
            toks = _TOKEN_RE.findall(text or "")
            if not toks:
                continue
            hs = np.array([hash_token(t) for t in toks], dtype=np.uint64)
            j = (_splitmix64(hs ^ sd) % np.uint64(dim)).astype(np.int64)
            cnt = np.bincount(j, minlength=dim).astype(np.float64)
            out_id.append(doc_id)
            out_y.append(1 if lang == pos_lang else 0)
            out_x.append(cnt / len(toks))
        return pa.table(
            {
                "doc_id": pa.array(out_id, type=pa.int64()),
                "y": pa.array(out_y, type=pa.int64()),
                "x": list_array(out_x, np.float64, pa.float64()),
            }
        )

    feats = docs_ds.map_batches(_feat, batch_format="pyarrow").materialize()
    n = feats.count()
    w = np.zeros(dim, dtype=np.float64)
    for _ in range(iters):
        wref = ray.put(w)

        def _grad(b: pa.Table, _w=wref) -> pa.Table:
            ww = ray.get(_w)
            X = np.asarray(list_rows(b, "x"), dtype=np.float64)
            y = b.column("y").to_numpy(zero_copy_only=False).astype(np.float64)
            zq = np.floor((X @ ww) * ZQ)
            pq = np.floor(PQ / (1.0 + np.exp(-zq / ZQ)))
            g = ((pq / PQ - y)[:, None] * X) * Q
            gq = np.floor(g).astype(np.int64).sum(axis=0)
            return pa.table(
                {
                    "j": pa.array(np.arange(dim, dtype=np.int64)),
                    "g": pa.array(gq, type=pa.int64()),
                }
            )

        G = np.zeros(dim, dtype=np.int64)
        for tb in feats.map_batches(_grad, batch_format="pyarrow").iter_batches(
            batch_size=None, batch_format="pyarrow"
        ):
            G += np.bincount(
                tb.column("j").to_numpy(zero_copy_only=False),
                weights=tb.column("g").to_numpy(zero_copy_only=False),
                minlength=dim,
            ).astype(np.int64)
        w = w - lr * (G.astype(np.float64) / Q) / n

    return pa.table(
        {
            "j": pa.array(np.arange(dim, dtype=np.int64)),
            "w_r6": pa.array(np.round(w, 6), type=pa.float64()),
        }
    )
