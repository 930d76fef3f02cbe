"""Bigram-LM cross-entropy + DSIR importance selection vs sequential
brute-force replicas on tiny fixtures."""

from __future__ import annotations

import math
from collections import Counter

import numpy as np
import pyarrow as pa
import ray.data as rd

from efficient_graph_algorithms_ray.functions.dsir import dsir_importance_topk
from efficient_graph_algorithms_ray.functions.terms import bigram_cross_entropy
from efficient_graph_algorithms_ray.functions.text import _TOKEN_RE, hash_token

DOCS = [
    "the cat sat on the mat",
    "the cat sat on the log",
    "the dog sat on the mat",
    "zxq qvw jjk pft wma nnb",  # rare transitions → high CE
    "the cat sat on the mat the cat sat on the mat",
    "solo",  # < 2 tokens → no bigrams, excluded
]


def _ds(langs=None):
    n = len(DOCS)
    cols = {
        "doc_id": pa.array(list(range(n)), type=pa.int64()),
        "text": pa.array(DOCS, type=pa.string()),
    }
    if langs is not None:
        cols["lang"] = pa.array(langs, type=pa.string())
    return rd.from_arrow(pa.table(cols))


def _q(c: int, offset: int) -> int:
    return math.floor(math.log(c + offset) * 1_000_000)


def test_bigram_ce_matches_sequential_replica():
    out = bigram_cross_entropy(_ds(), hot_vocab=2, n_salts=2).to_pandas()
    out = out.sort_values("doc_id").reset_index(drop=True)

    # sequential replica with the same micro-nat quantization
    cf2: Counter = Counter()
    cf1: Counter = Counter()
    per_doc = {}
    for i, text in enumerate(DOCS):
        toks = _TOKEN_RE.findall(text)
        if len(toks) < 2:
            continue
        bgs = list(zip(toks, toks[1:]))
        per_doc[i] = bgs
        cf2.update(bgs)
        cf1.update(t for t, _ in bgs)
    V = len({b for _, b in cf2})  # bigram-tail vocabulary (add-one denom)
    expect = {}
    for i, bgs in per_doc.items():
        s2 = sum(_q(cf2[b], 1) for b in bgs)
        s1 = sum(_q(cf1[b[0]], V) for b in bgs)
        expect[i] = (len(bgs), s1 - s2)

    assert list(out["doc_id"]) == sorted(per_doc)
    for _, row in out.iterrows():
        n, ce_num = expect[row["doc_id"]]
        assert row["n_bigrams"] == n
        assert row["ce_num"] == ce_num
        assert row["ce"] == ce_num / (1_000_000.0 * n)

    by_id = {int(r["doc_id"]): float(r["ce"]) for _, r in out.iterrows()}
    # smoothing restores the intended ordering: the rare-transition doc
    # scores strictly worse than the formulaic ones, and ce > 0 always
    assert by_id[3] > max(by_id[0], by_id[1], by_id[2], by_id[4])
    assert all(v > 0 for v in by_id.values())


def test_dsir_prefers_target_like_docs():
    langs = ["en", "en", "en", "xx", "en", "xx"]
    out = dsir_importance_topk(
        _ds(langs), target_lang="en", n_buckets=64, top_k=6
    ).to_pandas()

    # sequential replica
    B = 64
    t_cnt = np.zeros(B, np.int64)
    r_cnt = np.zeros(B, np.int64)
    for text, lang in zip(DOCS, langs):
        for tok in _TOKEN_RE.findall(text):
            b = hash_token(tok) % B
            r_cnt[b] += 1
            if lang == "en":
                t_cnt[b] += 1
    T, R = int(t_cnt.sum()), int(r_cnt.sum())
    lam = np.floor(
        (np.log((t_cnt + 1.0) / float(T + B)) - np.log((r_cnt + 1.0) / float(R + B)))
        * 1e6
    ).astype(np.int64)
    rows = []
    for i, text in enumerate(DOCS):
        toks = _TOKEN_RE.findall(text)
        if not toks:
            continue
        w = int(sum(lam[hash_token(t) % B] for t in toks))
        rows.append((i, len(toks), w, w / (1e6 * len(toks))))
    rows.sort(key=lambda r: (-r[3], r[0]))

    got = [tuple(r) for r in out[["doc_id", "n_tokens", "w_num"]].to_numpy()]
    assert got == [r[:3] for r in rows]
    # every non-target ('xx') doc ranks below every target-like doc
    order = list(out["doc_id"])
    assert set(order[-2:]) == {3, 5}


def test_count_min_probe_guarantee_and_exactness_at_large_width():
    import ray.data as rd
    from efficient_graph_algorithms_ray.functions.sketches import (
        count_min_token_probe,
    )

    ds = rd.from_arrow(pa.table({"text": pa.array(DOCS, type=pa.string())}))
    out = count_min_token_probe(ds, width=1024, depth=4, top=5).to_pandas()
    assert len(out) == 5
    # CMS never underestimates
    assert (out["cms_n"] >= out["exact_n"]).all()
    assert (out["overestimate"] == out["cms_n"] - out["exact_n"]).all()
    # at a width far beyond the vocabulary, collisions vanish → exact
    wide = count_min_token_probe(ds, width=1 << 16, depth=4, top=5).to_pandas()
    assert (wide["cms_n"] == wide["exact_n"]).all()
    # exact top-5 matches a sequential count
    cnt = Counter(t for d in DOCS for t in _TOKEN_RE.findall(d))
    top = sorted(cnt.items(), key=lambda kv: (-kv[1], kv[0]))[:5]
    assert list(out["tok"]) == [t for t, _ in top]
    assert list(out["exact_n"]) == [n for _, n in top]


def test_weighted_sample_tracks_weights():
    """A-ES inclusion probability tracks weight: across many disjoint
    seed-shifted universes, a doc with 50x the weight of its peers is
    selected far more often (statistical, deterministic given seeds)."""
    import pyarrow.parquet as pq
    import os
    from efficient_graph_algorithms_ray.pipelines.corpus import (
        q_weighted_sample_docs,
    )

    tmp = "/tmp/ega_wsample_test"
    os.makedirs(tmp, exist_ok=True)
    n = 400
    heavy = set(range(0, n, 40))  # 10 heavy docs, weight 5000 vs 100
    pq.write_table(
        pa.table(
            {
                "doc_id": pa.array(list(range(n)), type=pa.int64()),
                "n_chars": pa.array(
                    [5000 if i in heavy else 100 for i in range(n)], type=pa.int64()
                ),
            }
        ),
        f"{tmp}/documents.parquet",
    )
    out = q_weighted_sample_docs(tmp, k=40).to_pandas()
    assert len(out) == 40
    assert list(out["key_q"]) == sorted(out["key_q"])
    got_heavy = sum(1 for d in out["doc_id"] if int(d) in heavy)
    # heavy docs are 2.5% of rows but ~56% of total weight; with k=40
    # expect ~8-10 of the 10 heavy docs selected — require at least 6
    assert got_heavy >= 6


def test_bloom_probe_no_false_negatives_and_dup_detection():
    import ray.data as rd
    from efficient_graph_algorithms_ray.functions.sketches import (
        bloom_membership_probe,
    )

    # eval docs are doc_id % 5 == 0; doc 0 duplicates doc 1's text,
    # doc 5 is unique, doc 10 duplicates doc 3
    texts = {
        0: "alpha beta gamma", 1: "alpha beta gamma",
        2: "delta epsilon", 3: "zeta eta theta",
        4: "iota kappa", 5: "unique eval only text",
        6: "lambda mu", 7: "nu xi", 8: "omicron pi",
        9: "rho sigma", 10: "zeta eta theta",
    }
    ds = rd.from_arrow(
        pa.table(
            {
                "doc_id": pa.array(sorted(texts), type=pa.int64()),
                "text": pa.array([texts[k] for k in sorted(texts)], type=pa.string()),
            }
        )
    )
    out = (
        bloom_membership_probe(ds, m_bits=4096, k_hashes=3, eval_mod=5)
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    assert list(out["doc_id"]) == [0, 5, 10]
    # no false negatives: bloom_hit >= exact_hit everywhere
    assert (out["bloom_hit"] >= out["exact_hit"]).all()
    by = out.set_index("doc_id")
    assert by.loc[0, "exact_hit"] == 1 and by.loc[0, "bloom_hit"] == 1
    assert by.loc[10, "exact_hit"] == 1 and by.loc[10, "bloom_hit"] == 1
    assert by.loc[5, "exact_hit"] == 0
