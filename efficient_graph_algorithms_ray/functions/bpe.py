"""BPE tokenizer training — distributed byte-pair-encoding merges.

Learns the merge table of a subword tokenizer from the corpus (the
training half of BPE; Sennrich et al. ACL 2016 — the algorithm behind
GPT-2/RoBERTa vocabularies). Each round merges the globally most
frequent adjacent symbol pair; after k rounds the ranked merge list
IS the tokenizer.

Ray-Data-native shape — the key scale observation is that BPE counts
live on the WORD VOCABULARY, not the token stream:

- one corpus pass reduces the stream to (word, count) — map-side
  per-batch ``Counter`` partials + one combiner-backed groupby; the
  10^12-token corpus becomes a ≤ |vocab| table, materialized once;
- each merge round maps over the vocab table only: segment each word
  under the current merge list (broadcast — it is ≤ k pairs), emit
  per-block pre-aggregated pair counts, one bounded
  ``groupby(left, right).sum``, and the driver takes the arg-max
  (count DESC, then lexicographic pair — fully deterministic);
- rounds are driver-side iteration over this tiny reduction, the same
  fixed-point control flow as the engine's PageRank loop.

The segmentation re-derives from scratch each round (O(k·|word|) per
vocab row) — at k ≤ a few thousand merges this is far cheaper than
the alternative (stateful pair-index maintenance) ever is in a
distributed setting.

Non-SQL-expressible (each round's segmentation depends on the
previous round's arg-max), so the driver query is rows-only; the
sequential Sennrich replica in tests/test_bpe.py is the oracle.

Reference tie-in: iterative arg-max + re-map control flow mirrors the
reference's greedy assignment loops (``node_pair_assignment``,
/root/reference/src/ega/algorithms/gromov_wasserstein_graphs.py:753-802);
the reference has no text operators — this is engine surface for the
training-data pipeline.
"""

from __future__ import annotations

from collections import Counter

import pyarrow as pa

from .text import _TOKEN_RE

__all__ = ["bpe_train_merges", "bpe_segment"]

_EOW = "</w>"


def bpe_segment(word: str, merges: list[tuple[str, str]]) -> list[str]:
    """Apply a ranked merge list to one word (standard BPE apply:
    repeatedly contract the best-ranked adjacent pair present)."""
    syms = list(word) + [_EOW]
    if len(syms) == 1 or not merges:
        return syms
    rank = {m: i for i, m in enumerate(merges)}
    while len(syms) > 1:
        best_i, best_r = -1, len(rank)
        for i in range(len(syms) - 1):
            r = rank.get((syms[i], syms[i + 1]))
            if r is not None and r < best_r:
                best_i, best_r = i, r
        if best_i < 0:
            break
        syms[best_i : best_i + 2] = [syms[best_i] + syms[best_i + 1]]
    return syms


def word_counts(docs_ds):
    """Corpus (word, count) table — the only pass over raw text."""
    from ray.data.aggregate import Sum

    def _wc(batch: pa.Table) -> pa.Table:
        c: Counter = Counter()
        for t in batch.column("text").to_pylist():
            c.update(_TOKEN_RE.findall(t or ""))
        return pa.table(
            {
                "word": pa.array(list(c.keys()), type=pa.string()),
                "n": pa.array(list(c.values()), type=pa.int64()),
            }
        )

    return (
        docs_ds.map_batches(_wc, batch_format="pyarrow")
        .groupby("word")
        .aggregate(Sum("n", alias_name="n"))
        .materialize()
    )


def bpe_train_merges(docs_ds, *, n_merges: int = 32):
    """Train ``n_merges`` BPE merges on the corpus.

    Returns a pyarrow Table (rank, left, right, count): merge #rank
    contracted symbol pair (left, right) which occurred ``count``
    weighted times at selection. Deterministic: ties break
    lexicographically on (left, right).
    """
    import ray
    from ray.data.aggregate import Sum

    vocab = word_counts(docs_ds)

    merges: list[tuple[str, str]] = []
    out_rank: list[int] = []
    out_l: list[str] = []
    out_r: list[str] = []
    out_c: list[int] = []
    for rank in range(n_merges):
        merges_ref = ray.put(list(merges))

        def _pairs(batch: pa.Table, _ref=merges_ref) -> pa.Table:
            ms = ray.get(_ref)
            c: Counter = Counter()
            words = batch.column("word").to_pylist()
            ns = batch.column("n").to_pylist()
            for w, n in zip(words, ns):
                syms = bpe_segment(w, ms)
                for a, b in zip(syms, syms[1:]):
                    c[(a, b)] += n
            ls, rs = zip(*c.keys()) if c else ((), ())
            return pa.table(
                {
                    "left": pa.array(list(ls), type=pa.string()),
                    "right": pa.array(list(rs), type=pa.string()),
                    "c": pa.array(list(c.values()), type=pa.int64()),
                }
            )

        counts = (
            vocab.map_batches(_pairs, batch_format="pyarrow")
            .groupby(["left", "right"])
            .aggregate(Sum("c", alias_name="c"))
            .sort(["c", "left", "right"], descending=[True, False, False])
            .limit(1)
            .take_all()
        )
        if not counts:
            break
        top = counts[0]
        merges.append((top["left"], top["right"]))
        out_rank.append(rank)
        out_l.append(top["left"])
        out_r.append(top["right"])
        out_c.append(int(top["c"]))

    return pa.table(
        {
            "rank": pa.array(out_rank, type=pa.int64()),
            "left": pa.array(out_l, type=pa.string()),
            "right": pa.array(out_r, type=pa.string()),
            "count": pa.array(out_c, type=pa.int64()),
        }
    )
