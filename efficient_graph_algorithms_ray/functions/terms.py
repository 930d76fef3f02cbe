"""Corpus term statistics: TF-IDF and bigram-PMI collocations.

Classic webtext / training-data-pipeline operators over the documents
table, built on the repo's established shuffle patterns:

- per-document term counting is map-side (one ``map_batches`` pass,
  per-doc ``Counter`` over the shared ``\\S+`` tokenizer — same
  tokenizer the fingerprint/simhash stages and the SQL oracles use);
- document frequencies come from a combiner-backed ``groupby.Count``
  (map-side pre-aggregation → skew-safe even for stopwords);
- the df→(doc,tok) attachment is the union-tag co-shuffle join used
  throughout ``functions/dedup.py``, with a **salted hot-vocabulary**
  twist: the top ``hot_vocab`` tokens by df (a tiny table) are
  broadcast, their rows get df attached map-side and a salt spreads
  them over ``n_salts`` groups, so no reduce task ever sees more than
  ``max(df_tail, df_hot / n_salts)`` rows. At 100 TB the "the"-group
  would otherwise hold one row per document.

Reference analogue: these are per-record scalar functions + grouped
aggregations in the style of ``eval_kernel_statistics`` partial/final
merges (/root/reference/src/ega/algorithms/graph_kernels.py:291-367);
the reference has no corpus operators — this family is part of the
engine's training-data surface.
"""

from __future__ import annotations

from collections import Counter

import numpy as np
import pandas as pd
import pyarrow as pa
import ray
import ray.data as rd
from ray.data.aggregate import Count, Sum

from .text import _TOKEN_RE

__all__ = [
    "term_frequencies",
    "tfidf_topk",
    "bigram_pmi",
    "attach_token_stat",
    "unigram_familiarity",
    "bigram_cross_entropy",
    "vocab_growth",
]

_EMPTY_TF = pa.table(
    {
        "doc_id": pa.array([], type=pa.int64()),
        "tok": pa.array([], type=pa.string()),
        "tf": pa.array([], type=pa.int64()),
    }
)


def term_frequencies(docs_ds) -> "rd.Dataset":
    """(doc_id, tok, tf) — one row per distinct token per document.

    Map-side only (no shuffle): rows are emitted pre-aggregated per
    document, so downstream groupbys see |doc|-bounded row counts, not
    token-occurrence counts.
    """

    def _tf(batch: pa.Table) -> pa.Table:
        ids = batch.column("doc_id").to_pylist()
        texts = batch.column("text").to_pylist()
        out_id: list[int] = []
        out_tok: list[str] = []
        out_tf: list[int] = []
        for doc_id, text in zip(ids, texts):
            counts = Counter(_TOKEN_RE.findall(text or ""))
            out_id.extend([doc_id] * len(counts))
            out_tok.extend(counts.keys())
            out_tf.extend(counts.values())
        return pa.table(
            {
                "doc_id": pa.array(out_id, type=pa.int64()),
                "tok": pa.array(out_tok, type=pa.string()),
                "tf": pa.array(out_tf, type=pa.int64()),
            }
        )

    return docs_ds.map_batches(_tf, batch_format="pyarrow")


def vocab_growth(docs_ds, step: int = 64) -> "rd.Dataset":
    """Heaps'-law vocabulary growth curve: per doc-id bucket
    (bucket = doc_id // step), total token occurrences and the number
    of NEW vocabulary types (tokens whose corpus-wide first document
    falls in the bucket). Cumulating new_types over ascending buckets
    gives V(n) vs corpus size — the standard tokenizer-sizing /
    dedup-health curve for a training corpus.

    Two combiner-backed groupbys (token → min doc_id; bucket sums) and
    one tiny per-bucket merge — token text shuffles once, pre-
    aggregated per document. Returns (bucket, n_tokens, new_types).
    """
    from ray.data.aggregate import Min

    tf = term_frequencies(docs_ds)

    def _tok_bucket(b: pa.Table) -> pa.Table:
        ids = b.column("doc_id").to_numpy(zero_copy_only=False)
        tfs = b.column("tf").to_numpy(zero_copy_only=False)
        return pa.table(
            {
                "bucket": pa.array(ids // step, type=pa.int64()),
                "n_tokens": pa.array(tfs, type=pa.int64()),
                "new_types": pa.array(np.zeros(len(ids), dtype=np.int64)),
            }
        )

    def _first_bucket(b: pa.Table) -> pa.Table:
        fd = b.column("min(doc_id)").to_numpy(zero_copy_only=False)
        return pa.table(
            {
                "bucket": pa.array(fd // step, type=pa.int64()),
                "n_tokens": pa.array(np.zeros(len(fd), dtype=np.int64)),
                "new_types": pa.array(np.ones(len(fd), dtype=np.int64)),
            }
        )

    tot = tf.map_batches(_tok_bucket, batch_format="pyarrow")
    first = tf.groupby("tok").aggregate(Min("doc_id")).map_batches(
        _first_bucket, batch_format="pyarrow"
    )

    def _shape(b: pa.Table) -> pa.Table:
        return pa.table(
            {
                "bucket": b.column("bucket"),
                "n_tokens": b.column("sum(n_tokens)").cast(pa.int64()),
                "new_types": b.column("sum(new_types)").cast(pa.int64()),
            }
        )

    return (
        tot.union(first)
        .groupby("bucket")
        .aggregate(Sum("n_tokens"), Sum("new_types"))
        .map_batches(_shape, batch_format="pyarrow")
    )


def _mg_truncate(counts: dict, k: int) -> dict:
    """Misra-Gries truncation: keep ≤ k counters by decrementing all
    counters by the (k+1)-th largest value. The classic guarantee
    survives: any token with true frequency > N/(k+1) keeps a positive
    counter."""
    if len(counts) <= k:
        return counts
    vals = sorted(counts.values(), reverse=True)
    t = vals[k]
    return {tok: c - t for tok, c in counts.items() if c > t}


def heavy_hitter_tokens(docs_ds, *, k_sketch: int = 256, top: int = 10):
    """Two-pass distributed heavy hitters (Misra-Gries 1982 summaries
    + exact recount — the standard exact-top-k-at-scale recipe):

    Pass 1 builds a bounded candidate set: each block reduces its
    token stream to an MG(k_sketch) summary (≤ k counters), summaries
    tree-merge (8-way repartition) and the driver folds ≤ 8·k rows —
    never the vocabulary. Any token with frequency > N/(k_sketch+1) is
    guaranteed a candidate, so with top ≪ k_sketch the true top-``top``
    is contained and the OUTPUT is deterministic even though the
    intermediate summary depends on merge order.

    Pass 2 broadcasts the candidate array once (``ray.put``) and
    exact-counts ONLY candidates (per-block ≤ k partial rows →
    combiner-backed ``groupby(tok).sum``), then sort+limit. Returns
    Dataset (tok, n) — the exact global top-``top`` by (n DESC, tok),
    SQL-oracled against the plain unnest/count/limit query."""
    import ray
    from collections import Counter

    from ray.data.aggregate import Sum

    def _block_summary(b: pa.Table) -> pa.Table:
        c: Counter = Counter()
        for t in b.column("text").to_pylist():
            c.update(_TOKEN_RE.findall(t or ""))
        mg = _mg_truncate(dict(c), k_sketch)
        return pa.table(
            {
                "tok": pa.array(list(mg.keys()), type=pa.string()),
                "c": pa.array(list(mg.values()), type=pa.int64()),
            }
        )

    def _merge_summaries(b: pa.Table) -> pa.Table:
        c: Counter = Counter()
        for tok, n in zip(b.column("tok").to_pylist(), b.column("c").to_pylist()):
            c[tok] += n
        mg = _mg_truncate(dict(c), k_sketch)
        return pa.table(
            {
                "tok": pa.array(list(mg.keys()), type=pa.string()),
                "c": pa.array(list(mg.values()), type=pa.int64()),
            }
        )

    reduced = (
        docs_ds.map_batches(_block_summary, batch_format="pyarrow")
        .repartition(8)
        .map_batches(_merge_summaries, batch_format="pyarrow", batch_size=None)
    )
    folded: Counter = Counter()
    for b in reduced.iter_batches(batch_size=None, batch_format="pyarrow"):
        for tok, n in zip(b.column("tok").to_pylist(), b.column("c").to_pylist()):
            folded[tok] += n
    cand = sorted(_mg_truncate(dict(folded), k_sketch).keys())
    cand_ref = ray.put(np.array(cand, dtype=object))

    def _count_cands(b: pa.Table) -> pa.Table:
        cs = set(ray.get(cand_ref).tolist())
        c: Counter = Counter()
        for t in b.column("text").to_pylist():
            for tok in _TOKEN_RE.findall(t or ""):
                if tok in cs:
                    c[tok] += 1
        return pa.table(
            {
                "tok": pa.array(list(c.keys()), type=pa.string()),
                "n": pa.array(list(c.values()), type=pa.int64()),
            }
        )

    counts = (
        docs_ds.map_batches(_count_cands, batch_format="pyarrow")
        .groupby("tok")
        .aggregate(Sum("n", alias_name="n"))
    )
    return counts.sort(["n", "tok"], descending=[True, False]).limit(top)


def zipf_fit(docs_ds, top_k: int = 256) -> pa.Table:
    """Zipf's-law OLS fit over corpus token frequencies: slope and
    intercept of ln(cf) ~ ln(rank) for the ``top_k`` most frequent
    tokens (rank by cf DESC, token ASC — deterministic).

    Distribution: corpus frequencies come from the pre-aggregated
    ``term_frequencies`` rows + one combiner-backed ``groupby(tok)``
    sum; the top-k selection is a distributed sort+limit (vocab-sized
    input, never token occurrences); only the bounded k-row head
    reaches the driver, where the 5-sum OLS closed form runs. Returns
    one row (n_tokens, slope_r6, intercept_r6, cf_top1)."""
    from ray.data.aggregate import Sum

    cf = term_frequencies(docs_ds).groupby("tok").aggregate(Sum("tf", alias_name="cf"))
    top = cf.sort(["cf", "tok"], descending=[True, False]).limit(top_k).take_all()
    cfs = np.array([r["cf"] for r in top], dtype=np.float64)
    x = np.log(np.arange(1, len(cfs) + 1, dtype=np.float64))
    y = np.log(cfs)
    n = float(len(x))
    sx, sy, sxy, sxx = x.sum(), y.sum(), (x * y).sum(), (x * x).sum()
    slope = (n * sxy - sx * sy) / (n * sxx - sx * sx)
    intercept = (sy - slope * sx) / n
    return pa.table(
        {
            "n_tokens": pa.array([len(cfs)], type=pa.int64()),
            "slope_r6": pa.array([round(float(slope), 6)], type=pa.float64()),
            "intercept_r6": pa.array([round(float(intercept), 6)], type=pa.float64()),
            "cf_top1": pa.array([int(cfs[0])], type=pa.int64()),
        }
    )


def attach_token_stat(
    tf, stat, stat_col: str, *, hot_vocab: int = 2048, n_salts: int = 16
):
    """(doc_id, tok, tf) ⨝ (tok, ``stat_col``) → the tf rows with the
    per-token statistic attached.

    The top ``hot_vocab`` tokens by the statistic form a tiny broadcast
    map: their rows get the value attached map-side and a per-doc salt
    spreads them over ``n_salts`` reduce groups; tail tokens use the
    union-tag marker co-shuffle. No reduce task ever holds more than
    max(tail-token df, hot-token df / n_salts) rows — the stopword
    group never concentrates.
    """
    hot_batches = (
        list(
            stat.sort([stat_col, "tok"], descending=[True, False])
            .limit(hot_vocab)
            .iter_batches(batch_size=None, batch_format="pyarrow")
        )
        if hot_vocab > 0
        else []
    )
    hot_map: dict = {}
    for hb in hot_batches:
        hot_map.update(
            zip(hb.column("tok").to_pylist(), hb.column(stat_col).to_pylist())
        )
    hot_ref = ray.put(hot_map)

    def _tag_data(batch: pa.Table) -> pa.Table:
        """Data rows: hot toks get the stat + doc-hash salt; tail −1."""
        hot = ray.get(hot_ref)
        toks = batch.column("tok").to_pylist()
        ids = batch.column("doc_id").to_numpy(zero_copy_only=False)
        vals = np.fromiter(
            (hot.get(t, -1) for t in toks), dtype=np.int64, count=len(toks)
        )
        salt = np.where(vals >= 0, ids % n_salts, 0).astype(np.int64)
        return pa.table(
            {
                "doc_id": batch.column("doc_id"),
                "tok": batch.column("tok"),
                "tf": batch.column("tf"),
                stat_col: pa.array(vals, type=pa.int64()),
                "salt": pa.array(salt, type=pa.int64()),
            }
        )

    def _tag_stat(batch: pa.Table) -> pa.Table:
        """Tail marker rows (doc_id = -1): only tokens outside the hot
        vocabulary need a marker in the co-shuffle. Membership is by
        dict lookup (stat ties at the hot cutoff are NOT all hot)."""
        hot = ray.get(hot_ref)
        toks = batch.column("tok").to_pylist()
        keep = batch.filter(pa.array([t not in hot for t in toks]))
        n = keep.num_rows
        return pa.table(
            {
                "doc_id": pa.array(np.full(n, -1, dtype=np.int64)),
                "tok": keep.column("tok"),
                "tf": pa.array(np.zeros(n, dtype=np.int64)),
                stat_col: keep.column(stat_col).cast(pa.int64()),
                "salt": pa.array(np.zeros(n, dtype=np.int64)),
            }
        )

    both = tf.map_batches(_tag_data, batch_format="pyarrow").union(
        stat.map_batches(_tag_stat, batch_format="pyarrow")
    )

    def _attach(g: pa.Table) -> pa.Table:
        ids = g.column("doc_id").to_numpy(zero_copy_only=False)
        vals = g.column(stat_col).to_numpy(zero_copy_only=False)
        if (vals >= 0).all():  # salted hot group — stat already attached
            return g.drop_columns(["salt"]).filter(pa.array(ids >= 0))
        marker = vals[ids < 0]
        val = int(marker[0]) if len(marker) else 0
        out = g.drop_columns(["salt"]).filter(pa.array(ids >= 0))
        return out.set_column(
            out.schema.get_field_index(stat_col),
            stat_col,
            pa.array(np.full(out.num_rows, val, dtype=np.int64)),
        )

    return both.groupby(["tok", "salt"]).map_groups(_attach, batch_format="pyarrow")


def unigram_familiarity(docs_ds, *, hot_vocab: int = 2048, n_salts: int = 16):
    """Per-document unigram familiarity: the mean corpus frequency of
    the document's tokens — Σ_tok tf·cf / Σ_tok tf, where cf is the
    corpus-wide occurrence count. Rare-token documents (typos, exotic
    boilerplate, non-language noise) score LOW; the log-free cousin of
    unigram-LM perplexity filters in training-data pipelines.

    Everything up to the final quotient is INTEGER arithmetic (sums of
    int64 products commute exactly), then one IEEE division per doc —
    bit-identical to the SQL oracle with no rounding step. Returns
    (doc_id, n_tokens, fam_num, familiarity).

    Two corpus passes + two bounded shuffles: tf (map-side) →
    cf = groupby(tok).sum (combiner-backed) → salted hot-vocab attach
    → per-doc groupby-sum.
    """
    tf = term_frequencies(docs_ds).materialize()
    cf = tf.groupby("tok").aggregate(Sum("tf", alias_name="cf")).materialize()
    attached = attach_token_stat(tf, cf, "cf", hot_vocab=hot_vocab, n_salts=n_salts)

    def _prod(batch: pa.Table) -> pa.Table:
        tfv = batch.column("tf").to_numpy(zero_copy_only=False).astype(np.int64)
        cfv = batch.column("cf").to_numpy(zero_copy_only=False).astype(np.int64)
        return pa.table(
            {
                "doc_id": batch.column("doc_id"),
                "tf": pa.array(tfv, type=pa.int64()),
                "tfcf": pa.array(tfv * cfv, type=pa.int64()),
            }
        )

    sums = (
        attached.map_batches(_prod, batch_format="pyarrow")
        .groupby("doc_id")
        .aggregate(Sum("tf", alias_name="n_tokens"), Sum("tfcf", alias_name="fam_num"))
    )

    def _score(batch: pa.Table) -> pa.Table:
        n = batch.column("n_tokens").to_numpy(zero_copy_only=False).astype(np.float64)
        num = batch.column("fam_num").to_numpy(zero_copy_only=False).astype(np.float64)
        return pa.table(
            {
                "doc_id": batch.column("doc_id").cast(pa.int64()),
                "n_tokens": batch.column("n_tokens").cast(pa.int64()),
                "fam_num": batch.column("fam_num").cast(pa.int64()),
                "familiarity": pa.array(num / n, type=pa.float64()),
            }
        )

    return sums.map_batches(_score, batch_format="pyarrow")


def tfidf_topk(
    docs_ds,
    k: int = 5,
    hot_vocab: int = 2048,
    n_salts: int = 16,
) -> "rd.Dataset":
    """Top-k TF-IDF terms per document.

    Returns (doc_id, tok, tf, df, tfidf_r6) with
    ``tfidf = tf · ln(n_docs / df)`` rounded to 6 decimals; per-doc
    ranking orders by (score desc, tok asc) — deterministic because
    equal (tf, df) pairs produce bit-equal doubles.

    One map pass + three shuffles (df-count, df-attach, per-doc top-k),
    each with bounded group sizes; see module docstring for the salted
    hot-vocab join that keeps stopword groups bounded.
    """
    n_docs = float(docs_ds.count())
    # tf feeds both the df-count and the join; df feeds both the
    # hot-vocab fetch and the marker union — materialize each once
    # instead of re-tokenizing the corpus per consumer
    tf = term_frequencies(docs_ds).materialize()
    df = tf.groupby("tok").aggregate(Count(alias_name="df")).materialize()
    attached = attach_token_stat(tf, df, "df", hot_vocab=hot_vocab, n_salts=n_salts)

    def _score(batch: pa.Table) -> pa.Table:
        tfv = batch.column("tf").to_numpy(zero_copy_only=False).astype(np.float64)
        dfv = batch.column("df").to_numpy(zero_copy_only=False).astype(np.float64)
        score = tfv * np.log(n_docs / np.maximum(dfv, 1.0))
        return batch.append_column("score", pa.array(score, type=pa.float64()))

    scored = attached.map_batches(_score, batch_format="pyarrow")

    def _topk(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["score", "tok"], ascending=[False, True]).head(k)
        out = g[["doc_id", "tok", "tf", "df"]].copy()
        out["tfidf_r6"] = np.round(g["score"].to_numpy(), 6)
        return out

    return scored.groupby("doc_id").map_groups(_topk, batch_format="pandas")


def bigram_pmi(docs_ds, min_count: int = 3, top_n: int = 50) -> "rd.Dataset":
    """Top-N collocations by bigram PMI.

    ``pmi = ln(c_ab · B / (c_a· · c_·b))`` over adjacent-token bigrams,
    where B is the total bigram count, ``c_a·``/``c_·b`` the first-/
    second-position marginals. Returns (a, b, c_ab, pmi_r6), ordered by
    (pmi desc, a, b), bigrams with ``c_ab < min_count`` dropped.

    Shuffle plan: map-side per-batch bigram pre-count → groupby-sum
    (combiner-backed) → two union-tag co-shuffles to attach the
    marginals (groups bounded by the per-token partner vocabulary,
    not the corpus) → global sort+limit.
    """

    def _bigrams(batch: pa.Table) -> pa.Table:
        texts = batch.column("text").to_pylist()
        counts: Counter = Counter()
        for text in texts:
            toks = _TOKEN_RE.findall(text or "")
            counts.update(zip(toks, toks[1:]))
        if not counts:
            return pa.table(
                {
                    "a": pa.array([], type=pa.string()),
                    "b": pa.array([], type=pa.string()),
                    "c": pa.array([], type=pa.int64()),
                }
            )
        a, b = zip(*counts.keys())
        return pa.table(
            {
                "a": pa.array(list(a), type=pa.string()),
                "b": pa.array(list(b), type=pa.string()),
                "c": pa.array(list(counts.values()), type=pa.int64()),
            }
        )

    pairs = (
        docs_ds.map_batches(_bigrams, batch_format="pyarrow")
        .groupby(["a", "b"])
        .aggregate(Sum("c", alias_name="c_ab"))
        .materialize()  # consumed 4× (total, both marginals, the join)
    )
    total = pairs.aggregate(Sum("c_ab", alias_name="b_total"))
    b_total = float(total["b_total"])

    ca = pairs.groupby("a").aggregate(Sum("c_ab", alias_name="c_a"))
    cb = pairs.groupby("b").aggregate(Sum("c_ab", alias_name="c_b"))

    def _attach(key: str, val_col: str):
        def _merge(g: pd.DataFrame) -> pd.DataFrame:
            marker = g[g["doc_tag"] < 0]
            val = int(marker[val_col].iloc[0]) if len(marker) else 0
            out = g[g["doc_tag"] >= 0].copy()
            out[val_col] = val
            return out

        return _merge

    def _tag(tag: int, cols: dict):
        def _fn(batch: pa.Table) -> pa.Table:
            n = batch.num_rows
            data = {c: batch.column(c) for c in batch.column_names}
            data["doc_tag"] = pa.array(np.full(n, tag, dtype=np.int64))
            for c, typ in cols.items():
                if c not in data:
                    default = "" if typ == "str" else 0
                    data[c] = pa.array([default] * n, type=pa.string() if typ == "str" else pa.int64())
            return pa.table(data)

        return _fn

    cols_a = {"a": "str", "b": "str", "c_ab": "int", "c_a": "int"}
    with_ca = (
        pairs.map_batches(_tag(1, cols_a), batch_format="pyarrow")
        .union(ca.map_batches(_tag(-1, cols_a), batch_format="pyarrow"))
        .groupby("a")
        .map_groups(_attach("a", "c_a"), batch_format="pandas")
    )
    cols_b = {"a": "str", "b": "str", "c_ab": "int", "c_a": "int", "c_b": "int"}
    with_cb = (
        with_ca.drop_columns(["doc_tag"])
        .map_batches(_tag(1, cols_b), batch_format="pyarrow")
        .union(cb.map_batches(_tag(-1, cols_b), batch_format="pyarrow"))
        .groupby("b")
        .map_groups(_attach("b", "c_b"), batch_format="pandas")
    )

    def _score(batch: pa.Table) -> pa.Table:
        keep = batch.filter(
            pa.array(batch.column("c_ab").to_numpy(zero_copy_only=False) >= min_count)
        )
        cab = keep.column("c_ab").to_numpy(zero_copy_only=False).astype(np.float64)
        c_a = keep.column("c_a").to_numpy(zero_copy_only=False).astype(np.float64)
        c_b = keep.column("c_b").to_numpy(zero_copy_only=False).astype(np.float64)
        pmi = np.log(cab * b_total / (c_a * c_b)) if len(cab) else np.empty(0)
        return pa.table(
            {
                "a": keep.column("a"),
                "b": keep.column("b"),
                "c_ab": keep.column("c_ab").cast(pa.int64()),
                "pmi_r6": pa.array(np.round(pmi, 6), type=pa.float64()),
            }
        )

    scored = with_cb.drop_columns(["doc_tag"]).map_batches(_score, batch_format="pyarrow")
    return scored.sort(["pmi_r6", "a", "b"], descending=[True, False, False]).limit(top_n)


def bigram_cross_entropy(docs_ds, *, hot_vocab: int = 2048, n_salts: int = 16):
    """Per-document cross-entropy under the corpus's own (leave-in)
    bigram language model — the CCNet/Gopher-style LM-perplexity
    quality filter for training corpora. For each document,

        ce = -(1/n) Σ_i ln p(w_i | w_{i-1}),
        p(w | v) = (c2(v,w) + 1) / (c1(v·) + V)

    with c2 the corpus bigram count, c1 the first-position marginal
    and V the bigram-tail vocabulary size (add-one smoothing — without
    it, leave-in ML estimation gives every SINGLETON transition
    p = 1/1 and rewards unique gibberish with ce = 0, the classic
    unsmoothed-LM pathology). Low ce = stereotypical fluent text;
    high ce = rare transitions (noise, boilerplate soup, wrong
    language).

    Exact-parity construction: each log is quantized ONCE per distinct
    count — q2 = floor(ln(c2+1)·1e6), q1 = floor(ln(c1+V)·1e6) as
    int64 — so every downstream aggregation is integer arithmetic that
    commutes in any partition order, and ce_num = Σ tf·q1 − Σ tf·q2
    hash-matches the SQL replay exactly; the reported ``ce`` is one
    IEEE division from the integers. Returns
    (doc_id, n_bigrams, ce_num, ce); ce > 0 always.

    Shuffle plan (skew-safe at corpus scale): ONE tokenization pass
    emits per-doc pre-aggregated bigram and head rows (kind-tagged);
    corpus counts are combiner-backed ``groupby(tok).sum``; both
    attachments reuse the salted hot-vocabulary co-shuffle
    (``attach_token_stat``) so stopword-headed groups never
    concentrate; the per-doc readout is two integer groupby-sums
    merged by a final ``groupby(doc_id)``.
    """

    def _rows(batch: pa.Table) -> pa.Table:
        ids = batch.column("doc_id").to_pylist()
        texts = batch.column("text").to_pylist()
        out_id: list[int] = []
        out_tok: list[str] = []
        out_tf: list[int] = []
        out_kind: list[int] = []
        for doc_id, text in zip(ids, texts):
            toks = _TOKEN_RE.findall(text or "")
            if len(toks) < 2:
                continue
            bg = Counter(
                a + " " + b for a, b in zip(toks, toks[1:])
            )  # tokens are \S+ — the space separator is unambiguous
            hd = Counter(toks[:-1])
            for counts, kind in ((bg, 0), (hd, 1)):
                out_id.extend([doc_id] * len(counts))
                out_tok.extend(counts.keys())
                out_tf.extend(counts.values())
                out_kind.extend([kind] * len(counts))
        return pa.table(
            {
                "doc_id": pa.array(out_id, type=pa.int64()),
                "tok": pa.array(out_tok, type=pa.string()),
                "tf": pa.array(out_tf, type=pa.int64()),
                "kind": pa.array(out_kind, type=pa.int64()),
            }
        )

    rows = docs_ds.map_batches(_rows, batch_format="pyarrow").materialize()
    bf = rows.filter(expr="kind == 0").drop_columns(["kind"])
    hf = rows.filter(expr="kind == 1").drop_columns(["kind"])

    cf2 = bf.groupby("tok").aggregate(Sum("tf", alias_name="c")).materialize()

    # V = bigram-tail vocabulary size (distributed distinct count over
    # the bounded cf2 key table — the driver sees only the scalar)
    def _tails(stat: pa.Table) -> pa.Table:
        return pa.table(
            {
                "tail": pa.array(
                    [k.split(" ", 1)[1] for k in stat.column("tok").to_pylist()],
                    type=pa.string(),
                )
            }
        )

    V = cf2.map_batches(_tails, batch_format="pyarrow").groupby("tail").count().count()

    def _doc_sums(tf_rows, counts, offset: int, *, with_n: bool):
        def _qlog(stat: pa.Table) -> pa.Table:
            c = stat.column("c").to_numpy(zero_copy_only=False).astype(np.float64)
            q = np.floor(np.log(c + float(offset)) * 1_000_000.0).astype(np.int64)
            return stat.append_column("q", pa.array(q, type=pa.int64()))

        qstat = (
            counts.map_batches(_qlog, batch_format="pyarrow")
            .drop_columns(["c"])
            .materialize()
        )
        attached = attach_token_stat(
            tf_rows, qstat, "q", hot_vocab=hot_vocab, n_salts=n_salts
        )

        def _prod(batch: pa.Table) -> pa.Table:
            tfv = batch.column("tf").to_numpy(zero_copy_only=False).astype(np.int64)
            qv = batch.column("q").to_numpy(zero_copy_only=False).astype(np.int64)
            cols = {
                "doc_id": batch.column("doc_id"),
                "s": pa.array(tfv * qv, type=pa.int64()),
            }
            if with_n:
                cols["n"] = pa.array(tfv, type=pa.int64())
            return pa.table(cols)

        aggs = [Sum("s", alias_name="s")]
        if with_n:
            aggs.append(Sum("n", alias_name="n"))
        return (
            attached.map_batches(_prod, batch_format="pyarrow")
            .groupby("doc_id")
            .aggregate(*aggs)
        )

    cf1 = hf.groupby("tok").aggregate(Sum("tf", alias_name="c")).materialize()

    # attach_token_stat picks its hot vocabulary by the attached stat,
    # here q = floor(ln(count+offset)·1e6) — monotone in the count, so
    # the highest-count (hottest) keys are exactly the ones salted.
    s2 = _doc_sums(bf, cf2, 1, with_n=True)   # Σ tf·q2 + n_bigrams
    s1 = _doc_sums(hf, cf1, V, with_n=False)  # Σ tf·q1

    def _tag(src, cols):
        def _fn(batch: pa.Table) -> pa.Table:
            n = batch.num_rows
            data = {"doc_id": batch.column("doc_id")}
            for c in cols:
                data[c] = (
                    batch.column(c)
                    if c in batch.column_names
                    else pa.array(np.zeros(n, dtype=np.int64))
                )
            return pa.table(data)

        return src.map_batches(_fn, batch_format="pyarrow")

    merged = (
        _tag(s2.map_batches(
            lambda b: b.rename_columns(["doc_id", "s2", "n"]), batch_format="pyarrow"
        ), ["n", "s1", "s2"])
        .union(_tag(s1.map_batches(
            lambda b: b.rename_columns(["doc_id", "s1"]), batch_format="pyarrow"
        ), ["n", "s1", "s2"]))
        .groupby("doc_id")
        .aggregate(
            Sum("n", alias_name="n_bigrams"),
            Sum("s1", alias_name="s1"),
            Sum("s2", alias_name="s2"),
        )
    )

    def _score(batch: pa.Table) -> pa.Table:
        n = batch.column("n_bigrams").to_numpy(zero_copy_only=False).astype(np.int64)
        s1v = batch.column("s1").to_numpy(zero_copy_only=False).astype(np.int64)
        s2v = batch.column("s2").to_numpy(zero_copy_only=False).astype(np.int64)
        ce_num = s1v - s2v
        return pa.table(
            {
                "doc_id": batch.column("doc_id").cast(pa.int64()),
                "n_bigrams": pa.array(n, type=pa.int64()),
                "ce_num": pa.array(ce_num, type=pa.int64()),
                "ce": pa.array(
                    ce_num.astype(np.float64) / (1_000_000.0 * n.astype(np.float64)),
                    type=pa.float64(),
                ),
            }
        )

    return merged.map_batches(_score, batch_format="pyarrow")


def bm25_topk(
    docs_ds,
    query_terms: tuple[str, ...] = ("hash", "merge", "dup"),
    k: int = 10,
    k1: float = 1.2,
    b: float = 0.75,
) -> "rd.Dataset":
    """Top-k documents by BM25 score for a fixed term query.

    ``score(d) = Σ_t idf_t · tf_td·(k1+1) / (tf_td + k1·(1−b+b·|d|/avgdl))``
    with ``idf_t = ln((N − df_t + 0.5)/(df_t + 0.5) + 1)`` (the
    Robertson/Sparck-Jones "plus-one" idf). Returns
    (doc_id, dl, bm25_r6) ordered by (bm25_r6 desc, doc_id asc),
    LIMIT k; selection/order on the ROUNDED score so the engine's
    sort+limit matches the SQL oracle bit-for-bit.

    Scale plan: two map-only passes over documents — pass 1 reduces
    each doc to (dl, tf per query term, presence indicators); one
    combiner-backed global aggregate yields N, Σdl and df_t (a handful
    of int64s on the driver — exact); pass 2 scores from broadcast
    Python-float idf/avgdl constants. No shuffle touches text; the
    only exchange is the final distributed sort+limit over
    (doc_id, dl, score) rows. Exactness: all sufficient statistics
    are exact int64; avgdl/idf come from single IEEE divisions/ln on
    those ints; the per-doc score mirrors the oracle's expression
    tree term-by-term (left-associated adds), so doubles are
    bit-equal before ROUND r6.

    Reference analogue: seeded scoring + ranking readout in the style
    of ``get_projection``/``get_ranking`` (/root/reference/src/ega/
    algorithms/graph_kernels.py:454-585), applied to the engine's
    corpus surface (the reference has no IR operators).
    """
    import math

    terms = tuple(query_terms)
    T = len(terms)

    def _stats(batch: pa.Table) -> pa.Table:
        texts = batch.column("text").to_pylist()
        n = len(texts)
        dl = np.zeros(n, dtype=np.int64)
        tfs = np.zeros((T, n), dtype=np.int64)
        for i, text in enumerate(texts):
            toks = _TOKEN_RE.findall(text or "")
            dl[i] = len(toks)
            if toks:
                c = Counter(toks)
                for j, t in enumerate(terms):
                    tfs[j, i] = c.get(t, 0)
        cols = {
            "doc_id": batch.column("doc_id").cast(pa.int64()),
            "dl": pa.array(dl, type=pa.int64()),
        }
        for j in range(T):
            cols[f"tf{j}"] = pa.array(tfs[j], type=pa.int64())
            cols[f"m{j}"] = pa.array((tfs[j] > 0).astype(np.int64), type=pa.int64())
        return pa.table(cols)

    stats = docs_ds.map_batches(_stats, batch_format="pyarrow").materialize()

    aggs = [Count(alias_name="n_docs"), Sum("dl", alias_name="sum_dl")]
    for j in range(T):
        aggs.append(Sum(f"m{j}", alias_name=f"df{j}"))
    tot = stats.aggregate(*aggs)
    n_docs = int(tot["n_docs"])
    avgdl = float(tot["sum_dl"]) / float(n_docs)
    idf = [
        math.log((n_docs - int(tot[f"df{j}"]) + 0.5) / (int(tot[f"df{j}"]) + 0.5) + 1.0)
        for j in range(T)
    ]

    one_minus_b, k1p1 = 1.0 - b, k1 + 1.0

    def _score(batch: pa.Table) -> pa.Table:
        dl = batch.column("dl").to_numpy(zero_copy_only=False).astype(np.float64)
        norm = one_minus_b + b * (dl / avgdl)
        score = np.zeros(len(dl), dtype=np.float64)
        for j in range(T):
            tf = batch.column(f"tf{j}").to_numpy(zero_copy_only=False).astype(np.float64)
            score = score + idf[j] * (tf * k1p1 / (tf + k1 * norm))
        return pa.table(
            {
                "doc_id": batch.column("doc_id").cast(pa.int64()),
                "dl": batch.column("dl").cast(pa.int64()),
                "bm25_r6": pa.array(np.round(score, 6), type=pa.float64()),
            }
        )

    scored = stats.map_batches(_score, batch_format="pyarrow")
    return scored.sort(["bm25_r6", "doc_id"], descending=[True, False]).limit(k)


def posting_samples(docs_ds, k: int = 8) -> "rd.Dataset":
    """Inverted-index posting samples: for every token, its document
    frequency and the first ``k`` postings (lowest doc_ids).

    The canonical web-index build step, shaped so no task ever holds a
    stopword's full posting list: each block emits AT MOST ``k``
    (tok, doc_id) rows (block-local bottom-k) plus one (tok, df_partial)
    row, so the per-token merge group is ≤ (k+1)·n_blocks rows no
    matter how common the token — bottom-k and count are both monoids.
    Returns (tok, df, rk, doc_id) with rk = 1..k in ascending doc_id
    order; exact ints end-to-end (SQL-oracled against a window-function
    row_number build)."""

    def _partial(batch: pa.Table) -> pa.Table:
        ids = batch.column("doc_id").to_numpy(zero_copy_only=False).astype(np.int64)
        texts = batch.column("text").to_pylist()
        seen: dict[str, list] = {}
        for i, text in enumerate(texts):
            for t in set(_TOKEN_RE.findall(text or "")):
                seen.setdefault(t, []).append(ids[i])
        toks, docs, dfp = [], [], []
        for t, lst in seen.items():
            lst.sort()
            for d in lst[:k]:
                toks.append(t)
                docs.append(d)
            dfp.append((t, len(lst)))
        post = pa.table(
            {
                "tok": pa.array(toks, type=pa.string()),
                "doc_id": pa.array(docs, type=pa.int64()),
                "dfp": pa.array(np.full(len(toks), -1, dtype=np.int64), type=pa.int64()),
            }
        )
        dft = pa.table(
            {
                "tok": pa.array([t for t, _ in dfp], type=pa.string()),
                "doc_id": pa.array(np.full(len(dfp), -1, dtype=np.int64), type=pa.int64()),
                "dfp": pa.array([n for _, n in dfp], type=pa.int64()),
            }
        )
        return pa.concat_tables([post, dft])

    def _merge(group: pd.DataFrame) -> pd.DataFrame:
        tok = group["tok"].iloc[0]
        df = int(group.loc[group["dfp"] >= 0, "dfp"].sum())
        docs = np.sort(group.loc[group["dfp"] < 0, "doc_id"].to_numpy())[:k]
        return pd.DataFrame(
            {
                "tok": [tok] * len(docs),
                "df": np.full(len(docs), df, dtype=np.int64),
                "rk": np.arange(1, len(docs) + 1, dtype=np.int64),
                "doc_id": docs.astype(np.int64),
            }
        )

    return (
        docs_ds.map_batches(_partial, batch_format="pyarrow")
        .groupby("tok")
        .map_groups(_merge, batch_format="pandas")
    )


def dup_span_census(docs_ds, *, w: int = 8, top: int = 64):
    """Corpus-level duplicated-span census — the C4/boilerplate
    detector: the ``top`` most frequent w-token windows across the
    whole corpus, by occurrence count (FNV-1a fingerprint of the
    space-joined window; ties broken by fingerprint).

    Complements the per-doc duplicate statistics (dup_ngram_stats,
    dup_window_profile): this is the GLOBAL census that names the
    boilerplate itself. Scale shape: one map pass emits per-(doc,
    window) partial counts (map-side combine via np.unique inside the
    batch — a doc's windows never straddle batches, so per-doc counts
    are exact pre-aggregates), one groupby(fp) merge, then a top-k
    sort of the tiny aggregate. Returns (w_fp, n_occurrences, n_docs)
    — all-integer, exact SQL parity.
    """
    import pyarrow as pa
    from ray.data.aggregate import Count, Sum

    from .text import _TOKEN_RE, hash_token

    def _windows(batch: pa.Table) -> pa.Table:
        ids = batch.column("doc_id").to_pylist()
        texts = batch.column("text").to_pylist()
        o_id, o_fp, o_n = [], [], []
        for doc_id, text in zip(ids, texts):
            toks = _TOKEN_RE.findall(text or "")
            if len(toks) < w:
                continue
            fps = np.fromiter(
                (
                    hash_token(" ".join(toks[i : i + w]))
                    for i in range(len(toks) - w + 1)
                ),
                dtype=np.uint64,
            )
            uniq, cnt = np.unique(fps, return_counts=True)
            o_id.extend([doc_id] * len(uniq))
            o_fp.extend(uniq.view(np.int64).tolist())
            o_n.extend(cnt.tolist())
        return pa.table(
            {
                "doc_id": pa.array(o_id, type=pa.int64()),
                "w_fp": pa.array(o_fp, type=pa.int64()),
                "n": pa.array(o_n, type=pa.int64()),
            }
        )

    per_doc = docs_ds.map_batches(_windows, batch_format="pyarrow")
    agg = per_doc.groupby("w_fp").aggregate(
        Sum("n", alias_name="n_occurrences"),
        Count(alias_name="n_docs"),
    )
    return agg.sort(["n_occurrences", "w_fp"], descending=[True, False]).limit(top)
