"""Distributed suffix array (prefix doubling) vs brute-force ordering."""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray.data as rd

from efficient_graph_algorithms_ray.functions.suffix import suffix_array_docs


def _brute_ranks(docs: dict[int, str]) -> dict[tuple[int, int], int]:
    """Dense rank of every suffix (token tuples, whole corpus)."""
    sufs = []
    for doc_id, text in docs.items():
        toks = text.split()
        for pos in range(len(toks)):
            sufs.append(((doc_id, pos), tuple(toks[pos:])))
    uniq = sorted({s for _, s in sufs})
    rank = {s: i + 1 for i, s in enumerate(uniq)}
    return {key: rank[s] for key, s in sufs}


def _run(docs: dict[int, str], **kw):
    ds = rd.from_arrow(
        pa.table(
            {
                "doc_id": pa.array(list(docs), type=pa.int64()),
                "text": pa.array(list(docs.values()), type=pa.string()),
            }
        )
    )
    out = suffix_array_docs(ds, **kw).to_pandas()
    return {
        (int(r.doc_id), int(r.pos)): int(r.srank) for r in out.itertuples()
    }


def test_matches_bruteforce_with_duplicate_suffixes():
    docs = {
        1: "b a n a n a",
        2: "a n a n a b",  # shares the "a n a" / "n a" suffix family
        3: "b a n a n a",  # exact duplicate doc: every suffix rank shared
        4: "c",
        5: "a",
    }
    got = _run(docs)
    want = _brute_ranks(docs)
    assert got == want
    # byte-identical suffixes share a rank across documents
    assert got[(1, 0)] == got[(3, 0)]
    assert got[(1, 5)] == got[(5, 0)]


def test_many_docs_tiny_blocks_tie_straddle():
    # one shared token everywhere → massive rank ties that straddle
    # sort-block boundaries; plus distinct tails to force refinement
    docs = {i: "x " * 3 + f"t{i % 7}" for i in range(64)}
    got = _run(docs, n_buckets=8)
    want = _brute_ranks(docs)
    assert got == want


def test_early_exit_equals_full_rounds():
    docs = {i: f"w{i} w{(i * 3) % 11} end" for i in range(20)}
    full = _run(docs, max_prefix=128)
    # max_prefix=4 already resolves 3-token docs; early exit must agree
    short = _run(docs, max_prefix=4)
    assert full == short == _brute_ranks(docs)


def test_empty_and_single_token_docs():
    docs = {1: "", 2: "solo", 3: "solo twice"}
    got = _run(docs)
    want = _brute_ranks(docs)
    assert got == want
    assert (1, 0) not in got


def _profile(docs: dict[int, str], **kw):
    from efficient_graph_algorithms_ray.functions.suffix import dup_window_profile

    ds = rd.from_arrow(
        pa.table(
            {
                "doc_id": pa.array(list(docs), type=pa.int64()),
                "text": pa.array(list(docs.values()), type=pa.string()),
            }
        )
    )
    out = dup_window_profile(ds, **kw).to_pandas().set_index("doc_id")
    return out.sort_index()


def test_dup_window_planted_span():
    # an 8-token span planted in two docs; everything else unique
    span = " ".join(f"s{i}" for i in range(8))
    docs = {
        1: f"u1 u2 {span} u3",
        2: f"v1 {span} v2 v3",
        3: "w1 w2 w3 w4",  # fully unique tokens → max_dup 0
    }
    out = _profile(docs, dup_thresh=8)
    # the span start positions share an 8-token window → level 8
    assert out.loc[1, "max_dup"] == 8
    assert out.loc[2, "max_dup"] == 8
    assert out.loc[3, "max_dup"] == 0
    # exactly one position per doc starts a full >=8 duplicated window
    assert out.loc[1, "n_dup_thresh"] == 1
    assert out.loc[2, "n_dup_thresh"] == 1
    assert out.loc[3, "n_dup_thresh"] == 0
    assert out.loc[1, "n_pos"] == 11 and out.loc[3, "n_pos"] == 4


def test_dup_window_exact_duplicate_docs():
    txt = " ".join(f"t{i}" for i in range(20))
    docs = {1: txt, 2: txt, 3: "only once here"}
    out = _profile(docs)
    # identical docs: every full window recurs, but the full-window
    # gate caps each position at pow2floor(remaining) — the doc max
    # is pow2floor(20) = 16, NOT a sentinel-truncated 128
    assert out.loc[1, "max_dup"] == 16
    assert out.loc[2, "max_dup"] == 16
    assert out.loc[3, "max_dup"] == 0
    # positions with >= 8 tokens remaining: pos 0..12
    assert out.loc[1, "n_dup_thresh"] == 13
    assert out.loc[1, "n_pos"] == 20


def test_dup_window_shared_tail_not_inflated():
    # two docs sharing only their last 3 tokens: the sentinel makes
    # their tail suffixes rank-equal at EVERY level; the full-window
    # gate must cap the dup at pow2floor(3) = 2
    docs = {
        1: "a1 a2 a3 end1 end2 end3",
        2: "b1 b2 end1 end2 end3",
        3: "c1 c2 c3",
    }
    out = _profile(docs, dup_thresh=2)
    assert out.loc[1, "max_dup"] == 2
    assert out.loc[2, "max_dup"] == 2
    assert out.loc[3, "max_dup"] == 0
    # exactly the positions starting a full 2-token shared window:
    # (end1 end2) and (end2 end3) in each of docs 1 and 2
    assert out.loc[1, "n_dup_thresh"] == 2
    assert out.loc[2, "n_dup_thresh"] == 2


def test_exactsubstr_prune_planted_span():
    from efficient_graph_algorithms_ray.functions.suffix import exactsubstr_prune
    from efficient_graph_algorithms_ray.functions.text import hash_token
    import numpy as np

    span = " ".join(f"s{i}" for i in range(8))
    docs = {
        1: f"u1 u2 {span} u3",
        2: f"v1 {span} v2 v3",
        3: "w1 w2 w3 w4",
    }
    ds = rd.from_arrow(
        pa.table(
            {
                "doc_id": pa.array(list(docs), type=pa.int64()),
                "text": pa.array(list(docs.values()), type=pa.string()),
            }
        )
    )
    out = (
        exactsubstr_prune(ds, dup_thresh=8)
        .to_pandas()
        .set_index("doc_id")
        .sort_index()
    )
    # doc 1: positions 2..9 covered (the 8-token span), u1 u2 u3 kept
    assert out.loc[1, "n_pos"] == 11 and out.loc[1, "n_removed"] == 8
    assert out.loc[1, "kept_fp"] == np.uint64(
        hash_token("u1 u2 u3")
    ).astype(np.int64)
    assert out.loc[2, "n_pos"] == 11 and out.loc[2, "n_removed"] == 8
    assert out.loc[2, "kept_fp"] == np.uint64(
        hash_token("v1 v2 v3")
    ).astype(np.int64)
    # doc 3 untouched
    assert out.loc[3, "n_removed"] == 0
    assert out.loc[3, "kept_fp"] == np.uint64(
        hash_token("w1 w2 w3 w4")
    ).astype(np.int64)


def test_exactsubstr_prune_whole_doc_removed():
    from efficient_graph_algorithms_ray.functions.suffix import exactsubstr_prune

    txt = " ".join(f"t{i}" for i in range(16))
    docs = {1: txt, 2: txt}
    ds = rd.from_arrow(
        pa.table(
            {
                "doc_id": pa.array(list(docs), type=pa.int64()),
                "text": pa.array(list(docs.values()), type=pa.string()),
            }
        )
    )
    out = (
        exactsubstr_prune(ds, dup_thresh=8)
        .to_pandas()
        .set_index("doc_id")
        .sort_index()
    )
    # identical 16-token docs: the 16-window at pos 0 covers all, and
    # trailing positions are covered by the pow2 windows that still
    # fit (e.g. the 8-window at pos 8)
    assert out.loc[1, "n_pos"] == 16
    assert out.loc[1, "n_removed"] == 16
    assert out.loc[1, "kept_fp"] == 0
    assert out.loc[2, "n_removed"] == 16


def _xprofile(rows, **kw):
    from efficient_graph_algorithms_ray.functions.suffix import (
        cross_dup_window_profile,
    )

    ds = rd.from_arrow(
        pa.table(
            {
                "doc_id": pa.array([r[0] for r in rows], type=pa.int64()),
                "text": pa.array([r[1] for r in rows], type=pa.string()),
                "source": pa.array([r[2] for r in rows], type=pa.string()),
            }
        )
    )
    out = (
        cross_dup_window_profile(ds, bench_source="bench", **kw)
        .to_pandas()
        .set_index("doc_id")
        .sort_index()
    )
    return out


def test_cross_dup_window_bench_span():
    span = " ".join(f"s{i}" for i in range(8))
    rows = [
        (1, f"q1 {span} q2", "bench"),  # the benchmark doc
        (2, f"u1 u2 {span} u3", "web"),  # contaminated: shares the span
        (3, "v1 v2 v3 v4 v5 v6 v7 v8 v9", "web"),  # clean
        # shares a span with doc 2 but NOT with the benchmark — must
        # not count (corpus-corpus duplication is dup_window_profile)
        (4, "u1 u2 w1 w2 w3 w4", "web"),
    ]
    out = _xprofile(rows)
    assert 1 not in out.index  # benchmark docs excluded from output
    assert out.loc[2, "max_shared"] == 8
    assert out.loc[2, "n_shared_thresh"] == 1
    assert out.loc[3, "max_shared"] == 0
    # (u1 u2) is corpus-corpus only → xmax counts nothing
    assert out.loc[4, "max_shared"] == 0


def test_cross_dup_window_full_containment_gated():
    txt = " ".join(f"t{i}" for i in range(20))
    rows = [
        (1, txt, "bench"),
        (2, txt, "web"),  # exact copy of a benchmark doc
        (3, "z1 z2 z3", "web"),
    ]
    out = _xprofile(rows)
    # full-window gate: pow2floor(20) = 16, not a truncated 128
    assert out.loc[2, "max_shared"] == 16
    assert out.loc[2, "n_shared_thresh"] == 13  # pos 0..12 (remaining >= 8)
    assert out.loc[3, "max_shared"] == 0


def test_cross_dup_flag_carries_across_many_blocks():
    # one giant level-1 rank group ("x" everywhere) that straddles
    # many sort blocks; exactly ONE bench doc contributes the flag —
    # the driver's forward/backward OR carries must reach every block
    rows = [(i, "x", "web") for i in range(64)]
    rows.append((100, "x", "bench"))
    out = _xprofile(rows, n_buckets=8)
    assert len(out) == 64
    # every web doc's single token is shared with the benchmark
    assert (out["max_shared"] == 1).all()

    # control: no bench member in the group → no flag anywhere
    rows = [(i, "x", "web") for i in range(64)]
    rows.append((100, "y", "bench"))
    out = _xprofile(rows, n_buckets=8)
    assert (out["max_shared"] == 0).all()
