"""TF-IDF / bigram-PMI / Adamic-Adar / assortativity vs brute-force
oracles on tiny fixtures."""

from __future__ import annotations

import math
from collections import Counter

import numpy as np
import pyarrow as pa
import ray.data as rd

from efficient_graph_algorithms_ray.config import EngineConfig
from efficient_graph_algorithms_ray.functions.terms import bigram_pmi, tfidf_topk
from efficient_graph_algorithms_ray.pipelines.graph_build import build_graph
from efficient_graph_algorithms_ray.pipelines.linkpred import adamic_adar_topk

DOCS = [
    "the cat sat on the mat",
    "the dog sat on the log",
    "cats and dogs and cats",
    "a quick brown fox jumps over the lazy dog",
    "the quick brown cat",
    "lorem ipsum dolor sit amet",
]


def _docs_ds():
    return rd.from_arrow(
        pa.table(
            {
                "doc_id": pa.array(range(len(DOCS)), type=pa.int64()),
                "text": pa.array(DOCS, type=pa.string()),
            }
        )
    )


def test_tfidf_matches_bruteforce():
    out = tfidf_topk(_docs_ds(), k=3, hot_vocab=4, n_salts=2).to_pandas()
    # brute force
    n = float(len(DOCS))
    tfs = [Counter(d.split()) for d in DOCS]
    df: Counter = Counter()
    for c in tfs:
        df.update(c.keys())
    for doc_id, c in enumerate(tfs):
        scored = sorted(
            ((tf * math.log(n / df[t]), t, tf) for t, tf in c.items()),
            key=lambda x: (-x[0], x[1]),
        )[:3]
        got = out[out.doc_id == doc_id].sort_values(
            ["tfidf_r6", "tok"], ascending=[False, True]
        )
        assert len(got) == len(scored)
        for (s, t, tf), (_, row) in zip(scored, got.iterrows()):
            assert row["tok"] == t and row["tf"] == tf and row["df"] == df[t]
            assert abs(row["tfidf_r6"] - round(s, 6)) < 1e-9


def test_tfidf_hot_vocab_invariance():
    """Result must not depend on the hot-vocab / salt split."""
    a = (
        tfidf_topk(_docs_ds(), k=3, hot_vocab=0, n_salts=1)
        .to_pandas()
        .sort_values(["doc_id", "tok"])
        .reset_index(drop=True)
    )
    b = (
        tfidf_topk(_docs_ds(), k=3, hot_vocab=1000, n_salts=8)
        .to_pandas()
        .sort_values(["doc_id", "tok"])
        .reset_index(drop=True)
    )
    assert a.equals(b)


def test_bigram_pmi_bruteforce():
    out = bigram_pmi(_docs_ds(), min_count=2, top_n=10).to_pandas()
    big: Counter = Counter()
    for d in DOCS:
        toks = d.split()
        big.update(zip(toks, toks[1:]))
    B = sum(big.values())
    ca: Counter = Counter()
    cb: Counter = Counter()
    for (a, b), c in big.items():
        ca[a] += c
        cb[b] += c
    exp = sorted(
        (
            (round(math.log(c * B / (ca[a] * cb[b])), 6), a, b, c)
            for (a, b), c in big.items()
            if c >= 2
        ),
        key=lambda x: (-x[0], x[1], x[2]),
    )[:10]
    assert len(out) == len(exp)
    for (pmi, a, b, c), (_, row) in zip(exp, out.iterrows()):
        assert (row["a"], row["b"], row["c_ab"]) == (a, b, c)
        assert abs(row["pmi_r6"] - pmi) < 1e-9


def _graph(pairs, P=4):
    src = np.array([u for u, v in pairs] + [v for u, v in pairs], dtype=np.uint64)
    dst = np.array([v for u, v in pairs] + [u for u, v in pairs], dtype=np.uint64)
    ds = rd.from_arrow(
        pa.table({"src": pa.array(src, type=pa.uint64()), "dst": pa.array(dst, type=pa.uint64())})
    )
    return build_graph(ds, EngineConfig(num_partitions=P), directed=False), pairs


def test_adamic_adar_bruteforce():
    # two squares sharing a corner + a pendant
    pairs = [(1, 2), (2, 3), (3, 4), (4, 1), (4, 5), (5, 6), (6, 7), (7, 4), (7, 8)]
    g, _ = _graph(pairs)
    out = adamic_adar_topk(g, k=100).to_pandas()
    # brute force
    adj: dict[int, set[int]] = {}
    for u, v in pairs:
        adj.setdefault(u, set()).add(v)
        adj.setdefault(v, set()).add(u)
    edge_set = {(min(u, v), max(u, v)) for u, v in pairs}
    exp = {}
    verts = sorted(adj)
    for i, u in enumerate(verts):
        for w in verts[i + 1 :]:
            if (u, w) in edge_set:
                continue
            common = adj[u] & adj[w]
            if common:
                exp[(u, w)] = (
                    len(common),
                    round(sum(1.0 / math.log(len(adj[a])) for a in common), 6),
                )
    assert len(out) == len(exp)
    for _, row in out.iterrows():
        cn, aa = exp[(row["u"], row["v"])]
        assert row["cn"] == cn
        assert abs(row["aa_r6"] - aa) < 1e-9
    # ordering: aa desc then (u, v)
    key = list(zip(-out["aa_r6"], out["u"], out["v"]))
    assert key == sorted(key)


def test_assortativity_star_is_negative():
    """A star graph is maximally disassortative (r = -1)."""
    import os
    import sys

    sys.path.insert(0, "/root/repo")
    pairs = [(0, i) for i in range(1, 8)]
    g, _ = _graph(pairs)
    # reuse the query's math on a custom graph via the same superstep path
    from efficient_graph_algorithms_ray.pipelines import relational as R

    R._GRAPH_CACHE[("coocc", "/tmp/_star_test")] = g
    try:
        out = R.q_assortativity_coocc("/tmp/_star_test").to_pandas()
    finally:
        del R._GRAPH_CACHE[("coocc", "/tmp/_star_test")]
    assert out["m_slots"].iloc[0] == 14  # 7 undirected edges
    assert abs(out["assortativity_r6"].iloc[0] + 1.0) < 1e-9


def test_unigram_familiarity_bruteforce():
    from efficient_graph_algorithms_ray.functions.terms import unigram_familiarity

    out = (
        unigram_familiarity(_docs_ds(), hot_vocab=2, n_salts=2)
        .to_pandas()
        .set_index("doc_id")
        .sort_index()
    )
    # brute force on the same fixture
    docs = _docs_ds().to_pandas()
    cf: Counter = Counter()
    toks = {}
    for _, r in docs.iterrows():
        toks[r["doc_id"]] = r["text"].split()
        cf.update(toks[r["doc_id"]])
    for doc_id, tk in toks.items():
        num = sum(cf[t] for t in tk)
        assert out.loc[doc_id, "n_tokens"] == len(tk)
        assert out.loc[doc_id, "fam_num"] == num
        assert out.loc[doc_id, "familiarity"] == num / len(tk)


def test_unigram_familiarity_hot_vocab_invariance():
    from efficient_graph_algorithms_ray.functions.terms import unigram_familiarity

    a = (
        unigram_familiarity(_docs_ds(), hot_vocab=0, n_salts=1)
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    b = (
        unigram_familiarity(_docs_ds(), hot_vocab=1000, n_salts=8)
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    assert a.equals(b)


def test_vocab_growth_matches_counter_oracle():
    import ray.data as rd
    from collections import Counter
    from efficient_graph_algorithms_ray.functions.terms import vocab_growth
    from efficient_graph_algorithms_ray.functions.text import _TOKEN_RE

    docs = [
        (0, "a b b c"),
        (1, "a d"),
        (65, "d e e"),
        (66, ""),
        (130, "a f"),
    ]
    tbl = pa.table(
        {
            "doc_id": pa.array([d for d, _ in docs], type=pa.int64()),
            "text": pa.array([t for _, t in docs], type=pa.string()),
        }
    )
    out = (
        vocab_growth(rd.from_arrow(tbl), step=64)
        .to_pandas()
        .sort_values("bucket")
        .reset_index(drop=True)
    )
    # oracle
    first: dict[str, int] = {}
    tot: Counter = Counter()
    new: Counter = Counter()
    for d, t in docs:
        toks = _TOKEN_RE.findall(t)
        tot[d // 64] += len(toks)
        for tk in toks:
            if tk not in first or d < first[tk]:
                first[tk] = d
    for tk, d in first.items():
        new[d // 64] += 1
    got = {int(r.bucket): (int(r.n_tokens), int(r.new_types)) for r in out.itertuples()}
    assert got == {b: (tot[b], new[b]) for b in tot if tot[b] > 0}


def test_zipf_fit_recovers_planted_slope():
    import ray.data as rd

    from efficient_graph_algorithms_ray.functions.terms import zipf_fit

    # plant cf(r) = round(1000 * r^-0.8): one doc carrying each token
    # cf times -> OLS on ln-ln must recover ~-0.8
    toks = []
    for r in range(1, 65):
        cf = max(1, round(1000 * r ** -0.8))
        toks.extend([f"tok{r:03d}"] * cf)
    text = " ".join(toks)
    tbl = pa.table(
        {"doc_id": pa.array([0], type=pa.int64()), "text": pa.array([text])}
    )
    out = zipf_fit(rd.from_arrow(tbl), top_k=64).to_pylist()[0]
    assert out["n_tokens"] == 64
    assert abs(out["slope_r6"] + 0.8) < 0.02
    assert out["cf_top1"] == 1000

    # brute-force the closed form
    import numpy as np

    cfs = sorted(
        (max(1, round(1000 * r ** -0.8)) for r in range(1, 65)), reverse=True
    )
    x = np.log(np.arange(1, 65, dtype=float))
    y = np.log(np.array(cfs, dtype=float))
    slope, intercept = np.polyfit(x, y, 1)
    assert abs(out["slope_r6"] - slope) < 1e-6
    assert abs(out["intercept_r6"] - intercept) < 1e-6


def test_mg_truncate_guarantee():
    """MG(k) keeps every token with freq > N/(k+1), on an adversarial
    stream, and never keeps more than k counters."""
    from efficient_graph_algorithms_ray.functions.terms import _mg_truncate

    rng = np.random.default_rng(2)
    toks = ["hh1"] * 400 + ["hh2"] * 300 + [f"t{i}" for i in rng.integers(0, 500, 800)]
    N = len(toks)
    exact = Counter(toks)
    k = 8
    mg = _mg_truncate(dict(exact), k)
    assert len(mg) <= k
    for tok, c in exact.items():
        if c > N / (k + 1):
            assert tok in mg
    # under-estimation bounded: exact - mg <= N/(k+1)
    for tok, c in mg.items():
        assert 0 < c <= exact[tok]
        assert exact[tok] - c <= N / (k + 1)


def test_heavy_hitters_end_to_end_small():
    import ray.data as rd

    from efficient_graph_algorithms_ray.functions.terms import heavy_hitter_tokens

    rng = np.random.default_rng(4)
    docs = []
    for i in range(50):
        toks = ["alpha"] * 10 + ["beta"] * 5 + [f"noise{rng.integers(0, 2000)}" for _ in range(20)]
        rng.shuffle(toks)
        docs.append(" ".join(toks))
    tbl = pa.table(
        {
            "doc_id": pa.array(range(50), type=pa.int64()),
            "text": pa.array(docs, type=pa.string()),
        }
    )
    out = heavy_hitter_tokens(rd.from_arrow(tbl), k_sketch=64, top=2).to_pandas()
    assert list(out["tok"]) == ["alpha", "beta"]
    assert list(out["n"]) == [500, 250]


def test_event_transitions_bruteforce():
    """Markov transition counting vs a sequential brute force on a
    small multi-user event log (ties broken by event_id)."""
    import pandas as pd
    import ray.data as rd

    from efficient_graph_algorithms_ray.pipelines.relational import (
        q_event_transitions,
    )

    rng = np.random.default_rng(6)
    n = 400
    users = rng.integers(0, 12, n)
    ts = pd.to_datetime(rng.integers(0, 10_000, n), unit="s")
    types = np.array(["a", "b", "c", "d"])[rng.integers(0, 4, n)]
    df = pd.DataFrame(
        {
            "event_id": np.arange(n, dtype=np.int64),
            "ts": ts,
            "user_id": users.astype(np.int64),
            "event_type": types,
        }
    )
    import os
    import tempfile

    d = tempfile.mkdtemp(prefix="evt_", dir="/tmp")
    df.to_parquet(os.path.join(d, "events.parquet"))
    got = (
        q_event_transitions(d)
        .to_pandas()
        .sort_values(["src_type", "dst_type"])
        .reset_index(drop=True)
    )
    # brute force
    from collections import Counter

    c: Counter = Counter()
    for _, g in df.sort_values(["user_id", "ts", "event_id"]).groupby("user_id"):
        et = list(g["event_type"])
        for a, b in zip(et, et[1:]):
            c[(a, b)] += 1
    tot: Counter = Counter()
    for (a, _), v in c.items():
        tot[a] += v
    want = pd.DataFrame(
        [
            {"src_type": a, "dst_type": b, "n": v, "prob": v / tot[a]}
            for (a, b), v in c.items()
        ]
    ).sort_values(["src_type", "dst_type"]).reset_index(drop=True)
    pd.testing.assert_frame_equal(
        got[["src_type", "dst_type", "n", "prob"]],
        want,
        check_dtype=False,
    )
