"""Dedup operators vs brute-force oracles on a crafted corpus."""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray.data as rd

from efficient_graph_algorithms_ray.functions.dedup import (
    exact_dedup,
    exact_jaccard,
    minhash_candidate_pairs,
    minhash_signature,
    neardup_clusters,
    shingle_hashes,
    simhash_candidate_pairs,
)

BASE = (
    "the quick brown fox jumps over the lazy dog while the data engine "
    "streams arrow batches through the object store with backpressure "
    "and spills blocks to disk when memory runs low in the cluster"
)


def _corpus():
    """Docs 0/1 exact dups; 2 near-dup of 0; 3/4 unrelated; 5 near-dup of 3."""
    texts = [
        BASE,
        BASE,
        BASE.replace("lazy dog", "sleepy dog"),
        "completely different content about graph algorithms and pagerank "
        "supersteps with damping and dangling mass redistribution in bulk",
        "yet another unrelated document mentioning minhash signatures bands "
        "and buckets for locality sensitive hashing at web scale today",
        "completely different content about graph algorithms and pagerank "
        "supersteps with damping and dangling mass redistribution in batch",
    ]
    return pa.table(
        {
            "doc_id": pa.array(np.arange(len(texts), dtype=np.int64), type=pa.int64()),
            "text": pa.array(texts, type=pa.string()),
        }
    )


def test_exact_dedup_groups_identical_texts():
    df = exact_dedup(rd.from_arrow(_corpus())).to_pandas()
    assert len(df) == 5  # 6 docs, one exact pair
    row = df[df["rep_doc_id"] == 0]
    assert len(row) == 1 and int(row["n_copies"].iloc[0]) == 2


def test_minhash_estimates_track_exact_jaccard():
    tbl = _corpus()
    texts = tbl.column("text").to_pylist()
    for a, b in [(0, 1), (0, 2), (0, 3), (3, 5)]:
        exact = exact_jaccard(texts[a], texts[b])
        sa = minhash_signature(shingle_hashes(texts[a]))
        sb = minhash_signature(shingle_hashes(texts[b]))
        est = float((sa == sb).mean())
        assert abs(est - exact) < 0.18, (a, b, est, exact)


def test_minhash_lsh_finds_neardup_pairs():
    pairs = minhash_candidate_pairs(rd.from_arrow(_corpus()), threshold=0.5).to_pandas()
    found = {tuple(sorted((a, b))) for a, b in zip(pairs["doc_a"], pairs["doc_b"])}
    assert (0, 1) in found  # exact dup
    assert (0, 2) in found  # near dup
    assert (3, 5) in found  # near dup
    assert (0, 3) not in found and (3, 4) not in found  # unrelated


def test_simhash_low_hamming_for_neardups():
    pairs = simhash_candidate_pairs(rd.from_arrow(_corpus()), max_hamming=10).to_pandas()
    found = {tuple(sorted((a, b))): h for a, b, h in zip(pairs["doc_a"], pairs["doc_b"], pairs["hamming"])}
    assert found.get((0, 1)) == 0  # identical text → identical simhash
    assert (0, 2) in found
    assert (0, 3) not in found


def test_neardup_clusters_via_cc_engine():
    docs = rd.from_arrow(_corpus())
    pairs = minhash_candidate_pairs(docs, threshold=0.5)
    cl = neardup_clusters(docs, pairs, num_partitions=4).to_pandas()
    cl = cl.set_index("doc_id")["cluster"]
    assert cl[0] == cl[1] == cl[2] == 0  # cluster label = min doc_id
    assert cl[3] == cl[5] == 3
    assert cl[4] == 4  # singleton keeps own id


def test_neardup_keep_canonical_retention():
    from efficient_graph_algorithms_ray.functions.dedup import neardup_keep_canonical

    tbl = _corpus()
    n_chars = pa.array(
        [len(t) for t in tbl.column("text").to_pylist()], type=pa.int64()
    )
    docs = rd.from_arrow(tbl.append_column("n_chars", n_chars))
    pairs = minhash_candidate_pairs(docs, threshold=0.5)
    kept = neardup_keep_canonical(docs, pairs, num_partitions=4).to_pandas()
    kept = kept.set_index("cluster")
    # cluster {0,1,2}: doc 2 is longest ("sleepy" > "lazy"); cluster
    # {3,5}: doc 5 is longer ("batch" > "bulk"); singleton 4 survives
    assert set(kept.index) == {0, 3, 4}
    assert int(kept.loc[0, "doc_id"]) == 2
    assert int(kept.loc[3, "doc_id"]) == 5
    assert int(kept.loc[4, "doc_id"]) == 4


def test_contamination_counts_bruteforce():
    import ray.data as rd

    from efficient_graph_algorithms_ray.functions.dedup import (
        contamination_counts,
        shingle_hashes,
    )

    base = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    docs = {
        0: base + " extra words here",          # eval doc (0 % 4 == 0)
        1: base + " totally different tail",    # shares the base 8-grams
        2: "no overlap with anything at all whatsoever in this one text",
        3: base,                                # shares them too
        4: "another eval doc with its own words only",  # eval
        5: "short doc",                          # < w tokens → no shingles
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
        contamination_counts(ds, eval_mod=4, w=8, num_partitions=4)
        .to_pandas()
        .set_index("doc_id")["n_hits"]
        .to_dict()
    )
    ev = set()
    for i, t in docs.items():
        if i % 4 == 0:
            ev.update(shingle_hashes(t, w=8).tolist())
    want = {}
    for i, t in docs.items():
        if i % 4 == 0:
            continue
        n = len(set(shingle_hashes(t, w=8).tolist()) & ev)
        if n:
            want[i] = n
    assert out == want
    assert 1 in out and 3 in out and 2 not in out and 5 not in out


def test_winnow_fingerprints_guarantee_and_density():
    from efficient_graph_algorithms_ray.functions.dedup import winnow_fingerprints

    w, window = 3, 4
    base = "alpha beta gamma delta epsilon zeta".split()
    shared = " ".join(base)  # 6 tokens = window + w - 1 -> guarantee run
    a = "x1 x2 " + shared + " y1 y2"
    b = "z9 " + shared + " q5 q6 q7"
    fa = set(winnow_fingerprints(a, w, window).tolist())
    fb = set(winnow_fingerprints(b, w, window).tolist())
    assert fa & fb  # the winnowing guarantee
    # density: far fewer fingerprints than shingles
    long = " ".join(f"t{i}" for i in range(200))
    fps = winnow_fingerprints(long, w, window)
    assert 0 < len(fps) < 200 - w + 1


def test_winnow_fingerprints_short_docs():
    from efficient_graph_algorithms_ray.functions.dedup import winnow_fingerprints

    assert len(winnow_fingerprints("a b", 3, 4)) == 0  # < w tokens
    one = winnow_fingerprints("a b c d", 3, 4)  # 2 shingles < window
    assert len(one) == 1
    # and it is the global min shingle hash
    from efficient_graph_algorithms_ray.functions.text import hash_token

    hs = [hash_token("a b c"), hash_token("b c d")]
    assert one[0] == min(hs)


def test_winnow_batch_rows():
    import ray.data as rd
    from efficient_graph_algorithms_ray.functions.dedup import (
        winnow_batch,
        winnow_fingerprints,
    )

    tbl = pa.table(
        {
            "doc_id": pa.array([1, 2, 3], type=pa.int64()),
            "text": pa.array(
                [" ".join(f"w{i}" for i in range(30)), "a b", "c d e f g"],
                type=pa.string(),
            ),
        }
    )
    out = rd.from_arrow(tbl).map_batches(winnow_batch, batch_format="pyarrow").to_pandas()
    got = out.groupby("doc_id")["fp"].apply(lambda s: sorted(s))
    exp1 = sorted(winnow_fingerprints(" ".join(f"w{i}" for i in range(30))).view("int64"))
    assert list(got.get(1, [])) == [int(x) for x in exp1]
    assert 2 not in got.index  # <w tokens -> no rows
    assert len(got[3]) >= 1


def test_positional_shingle_hashes():
    from efficient_graph_algorithms_ray.functions.dedup import (
        positional_shingle_hashes,
        shingle_hashes,
    )

    t = "a b c a b c a b"  # 8 tokens, w=3 -> 6 positional, 3 distinct
    pos = positional_shingle_hashes(t, w=3)
    assert len(pos) == 6
    assert set(pos.tolist()) == set(shingle_hashes(t, w=3).tolist())
    assert len(positional_shingle_hashes("a b", w=3)) == 0


def test_dup_ngram_stats_bruteforce():
    import ray.data as rd
    from collections import Counter

    from efficient_graph_algorithms_ray.functions.dedup import (
        dup_ngram_stats,
        positional_shingle_hashes,
    )

    shared = "alpha beta gamma delta epsilon"
    texts = {
        1: "x1 x2 " + shared + " y1",
        2: shared + " z1 z2 z3",
        3: "u1 u2 u3 u4 u5 u6",  # unique 5-grams only
        4: "a b",  # < w tokens -> no row
    }
    tbl = pa.table(
        {
            "doc_id": pa.array(sorted(texts), type=pa.int64()),
            "text": pa.array([texts[k] for k in sorted(texts)], type=pa.string()),
        }
    )
    out = (
        dup_ngram_stats(rd.from_arrow(tbl), w=5, num_partitions=8)
        .to_pandas()
        .set_index("doc_id")
        .sort_index()
    )
    # brute force
    owner: Counter = Counter()
    per_doc = {}
    for d, t in texts.items():
        hs = positional_shingle_hashes(t, w=5)
        per_doc[d] = hs
        for h in set(hs.tolist()):
            owner[h] += 1
    for d, hs in per_doc.items():
        if len(hs) == 0:
            assert d not in out.index
            continue
        n_dup = sum(1 for h in hs.tolist() if owner[h] >= 2)
        assert out.loc[d, "n_shingles"] == len(hs)
        assert out.loc[d, "n_dup"] == n_dup
        assert out.loc[d, "dup_frac"] == n_dup / len(hs)
    assert out.loc[1, "n_dup"] >= 1 and out.loc[3, "n_dup"] == 0
