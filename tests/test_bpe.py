"""BPE merge training vs a sequential Sennrich replica."""

from __future__ import annotations

from collections import Counter

import pyarrow as pa
import ray.data as rd

from efficient_graph_algorithms_ray.functions.bpe import (
    _EOW,
    bpe_segment,
    bpe_train_merges,
)
from efficient_graph_algorithms_ray.functions.text import _TOKEN_RE

DOCS = [
    "low lower lowest low low",
    "new newer newest new newer",
    "wide wider widest new low",
    "the newest lowest the the",
]


def _sequential_bpe(docs, n_merges):
    wc = Counter(t for d in docs for t in _TOKEN_RE.findall(d))
    merges = []
    out = []
    for _ in range(n_merges):
        pc: Counter = Counter()
        for w, n in wc.items():
            syms = bpe_segment(w, merges)
            for pair in zip(syms, syms[1:]):
                pc[pair] += n
        if not pc:
            break
        best = min(pc.items(), key=lambda kv: (-kv[1], kv[0]))
        merges.append(best[0])
        out.append((best[0][0], best[0][1], best[1]))
    return out


def test_bpe_merges_match_sequential_replica():
    ds = rd.from_arrow(pa.table({"text": pa.array(DOCS, type=pa.string())}))
    got = bpe_train_merges(ds, n_merges=12).to_pandas()
    want = _sequential_bpe(DOCS, 12)
    assert len(got) == len(want)
    for row, (l, r, c) in zip(got.itertuples(index=False), want):
        assert (row.left, row.right, row.count) == (l, r, c)
    # ranks are 0..k-1 and counts never increase by more than ties allow
    assert list(got["rank"]) == list(range(len(got)))


def test_bpe_segment_applies_learned_merges():
    ds = rd.from_arrow(pa.table({"text": pa.array(DOCS, type=pa.string())}))
    tbl = bpe_train_merges(ds, n_merges=20).to_pandas()
    merges = list(zip(tbl["left"], tbl["right"]))
    # frequent whole words collapse to few symbols; rare words stay long
    seg_low = bpe_segment("low", merges)
    seg_rare = bpe_segment("zyxwvu", merges)
    assert len(seg_low) <= 2  # 'low</w>' or ['low', '</w>']
    assert len(seg_rare) == len("zyxwvu") + 1
    assert seg_rare[-1] == _EOW
    # segmentation always reconstructs the word
    assert "".join(seg_low).replace(_EOW, "") == "low"


def test_bpe_pack_sequences_matches_sequential_stream():
    from efficient_graph_algorithms_ray.functions.bpe import (
        bpe_pack_sequences,
        bpe_vocab,
    )
    from efficient_graph_algorithms_ray.functions.bpe import word_counts

    docs = pa.table(
        {
            "doc_id": pa.array(list(range(len(DOCS))), type=pa.int64()),
            "text": pa.array(DOCS, type=pa.string()),
        }
    )
    ds = rd.from_arrow(docs)
    L = 16
    seqs, merges_tbl, vocab = bpe_pack_sequences(ds, n_merges=10, seq_len=L)
    out = seqs.to_pandas().sort_values("seq_id").reset_index(drop=True)

    # sequential replay of the whole packed stream
    merges = list(zip(merges_tbl["left"].to_pylist(), merges_tbl["right"].to_pylist()))
    stream = []
    for text in DOCS:  # doc_id order
        for w in _TOKEN_RE.findall(text):
            stream.extend(vocab[s] for s in bpe_segment(w, merges))
        stream.append(0)
    want = [stream[i : i + L] for i in range(0, len(stream), L)]

    assert list(out["seq_id"]) == list(range(len(want)))
    for row, w in zip(out["ids"], want):
        assert [int(x) for x in row] == w
    # every sequence except possibly the last is exactly L long
    lens = [len(r) for r in out["ids"]]
    assert all(l == L for l in lens[:-1]) and 0 < lens[-1] <= L
    # vocab ids are dense, 0 reserved for EOD
    assert min(vocab.values()) == 1
    assert max(vocab.values()) == len(vocab)


def test_bpe_merges_256_match_sequential_replica():
    """The incremental trainer's acceptance bar: a deep merge run
    (256 rounds) over a larger zipfian corpus stays bit-identical to
    the from-scratch sequential replica."""
    import numpy as np

    rng = np.random.default_rng(7)
    vocab = [
        "".join(rng.choice(list("abcdefgh"), size=rng.integers(2, 9)))
        for _ in range(400)
    ]
    docs = [
        " ".join(vocab[int(k)] for k in rng.zipf(1.3, size=30) % len(vocab))
        for _ in range(200)
    ]
    ds = rd.from_arrow(pa.table({"text": pa.array(docs, type=pa.string())}))
    got = bpe_train_merges(ds, n_merges=256).to_pandas()
    want = _sequential_bpe(docs, 256)
    assert len(got) == len(want)
    for row, (l, r, c) in zip(got.itertuples(index=False), want):
        assert (row.left, row.right, row.count) == (l, r, c)
