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
