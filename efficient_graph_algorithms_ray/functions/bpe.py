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

import numpy as np
import pyarrow as pa

from .text import _TOKEN_RE

__all__ = ["bpe_train_merges", "bpe_segment", "bpe_vocab", "bpe_pack_sequences"]

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


def bpe_vocab(vocab_ds, merges: list[tuple[str, str]]) -> dict[str, int]:
    """Deterministic symbol→id map for a merge list: id 0 is the EOD
    separator; ids 1.. are the sorted distinct symbols the corpus word
    vocabulary produces under ``merges``. Derived from the bounded
    (word, count) table, never the token stream."""
    import ray

    merges_ref = ray.put(list(merges))

    def _syms(batch: pa.Table) -> pa.Table:
        ms = ray.get(merges_ref)
        out: set[str] = set()
        for w in batch.column("word").to_pylist():
            out.update(bpe_segment(w, ms))
        return pa.table({"sym": pa.array(sorted(out), type=pa.string())})

    syms: set[str] = set()
    for b in (
        vocab_ds.map_batches(_syms, batch_format="pyarrow")
        .groupby("sym")
        .count()
        .iter_batches(batch_size=None, batch_format="pyarrow")
    ):
        syms.update(b.column("sym").to_pylist())
    return {s: i + 1 for i, s in enumerate(sorted(syms))}  # 0 = EOD


def bpe_pack_sequences(docs_ds, *, n_merges: int = 32, seq_len: int = 128):
    """Tokenize-and-pack — the terminal stage of a training-data
    pipeline: train BPE merges, encode every document to subword ids,
    and pack the corpus into fixed-length training sequences.

    The packed stream is DETERMINISTIC at any parallelism: document
    id-streams concatenate in ``doc_id`` order with an EOD separator
    (id 0) after each document, and sequence s holds stream positions
    [s·L, (s+1)·L). Document offsets come from the distributed ordered
    prefix scan (``functions/packing.ordered_prefix_sum``) — no driver
    pass over text; a document straddling a boundary emits one piece
    per overlapped sequence. Shuffle plan: one BUCKETED co-shuffle
    (``doc_id % P``) joins offsets to text and one (``seq_id % P``)
    assembles pieces — P bounded reduce groups, each resolving all its
    docs/sequences vectorized (never a task per doc), skew-free
    because both keys are uniform.

    Returns (seqs_ds, merges_table, vocab): Dataset (seq_id,
    ids list<int32>) — the last sequence may be short — plus the
    learned merge table and the symbol→id map.
    """
    import ray
    import ray.data as rd
    from ray.data.aggregate import Sum

    from .packing import ordered_prefix_sum

    docs_ds = docs_ds.materialize()
    merges_tbl = bpe_train_merges(docs_ds, n_merges=n_merges)
    merges = list(zip(merges_tbl.column("left").to_pylist(),
                      merges_tbl.column("right").to_pylist()))
    vocab = bpe_vocab(word_counts(docs_ds), merges)
    enc_ref = ray.put((list(merges), vocab))

    def _encode(text: str, ms, vb) -> list[int]:
        ids: list[int] = []
        for w in _TOKEN_RE.findall(text or ""):
            ids.extend(vb[s] for s in bpe_segment(w, ms))
        ids.append(0)  # EOD
        return ids

    # pass 1: per-doc encoded lengths → global offsets (ordered scan)
    def _lens(batch: pa.Table, _ref=enc_ref) -> pa.Table:
        ms, vb = ray.get(_ref)
        ids = batch.column("doc_id").to_pylist()
        texts = batch.column("text").to_pylist()
        n = [len(_encode(t, ms, vb)) for t in texts]
        return pa.table(
            {
                "doc_id": pa.array(ids, type=pa.int64()),
                "n_ids": pa.array(n, type=pa.int64()),
            }
        )

    offsets = ordered_prefix_sum(
        docs_ds.map_batches(_lens, batch_format="pyarrow"), "doc_id", "n_ids"
    )

    # bucketed co-shuffle: offsets onto text rows (doc_id % P buckets —
    # each reduce group pairs ALL its docs in one vectorized task)
    P = 32

    def _tag_text(batch: pa.Table) -> pa.Table:
        ids = batch.column("doc_id").to_numpy(zero_copy_only=False).astype(np.int64)
        return pa.table(
            {
                "part": pa.array(ids % P, type=pa.int64()),
                "doc_id": pa.array(ids, type=pa.int64()),
                "text": batch.column("text"),
                "prefix_excl": pa.array(np.full(len(ids), -1, dtype=np.int64)),
            }
        )

    def _tag_off(batch: pa.Table) -> pa.Table:
        ids = batch.column("doc_id").to_numpy(zero_copy_only=False).astype(np.int64)
        return pa.table(
            {
                "part": pa.array(ids % P, type=pa.int64()),
                "doc_id": pa.array(ids, type=pa.int64()),
                "text": pa.array([None] * len(ids), type=pa.string()),
                "prefix_excl": batch.column("prefix_excl"),
            }
        )

    joined = docs_ds.map_batches(_tag_text, batch_format="pyarrow").union(
        offsets.map_batches(_tag_off, batch_format="pyarrow")
    )

    L = seq_len

    def _pieces(g: pa.Table, _ref=enc_ref) -> pa.Table:
        from ..util import list_array

        ms, vb = ray.get(_ref)
        ids_col = g.column("doc_id").to_numpy(zero_copy_only=False)
        texts = g.column("text").to_pylist()
        offs = g.column("prefix_excl").to_numpy(zero_copy_only=False)
        # pair each doc's text row with its offset row
        text_by_doc: dict[int, str] = {}
        off_by_doc: dict[int, int] = {}
        for d, t, o in zip(ids_col, texts, offs):
            if o < 0:
                text_by_doc[int(d)] = t if t is not None else ""
            else:
                off_by_doc[int(d)] = int(o)
        out_seq, out_pos, out_ids = [], [], []
        for d, text in text_by_doc.items():
            off = off_by_doc[d]
            ids = _encode(text, ms, vb)
            i = 0
            while i < len(ids):
                pos = off + i
                seq = pos // L
                take = min(len(ids) - i, (seq + 1) * L - pos)
                out_seq.append(seq)
                out_pos.append(pos - seq * L)
                out_ids.append(np.asarray(ids[i : i + take], dtype=np.int32))
                i += take
        seq_arr = np.asarray(out_seq, dtype=np.int64)
        return pa.table(
            {
                "spart": pa.array(seq_arr % P, type=pa.int64()),
                "seq_id": pa.array(seq_arr, type=pa.int64()),
                "pos": pa.array(out_pos, type=pa.int64()),
                "piece": list_array(out_ids, np.int32, pa.int32()),
            }
        )

    pieces = joined.groupby("part").map_groups(_pieces, batch_format="pyarrow")

    def _assemble(g: pa.Table) -> pa.Table:
        from ..util import list_array, list_rows

        seq = g.column("seq_id").to_numpy(zero_copy_only=False)
        pos = g.column("pos").to_numpy(zero_copy_only=False)
        chunks = list_rows(g, "piece")
        order = np.lexsort((pos, seq))
        out_seq, out_ids = [], []
        i = 0
        while i < len(order):
            j = i
            while j < len(order) and seq[order[j]] == seq[order[i]]:
                j += 1
            out_seq.append(int(seq[order[i]]))
            out_ids.append(
                np.concatenate([chunks[k] for k in order[i:j]]).astype(np.int32)
            )
            i = j
        return pa.table(
            {
                "seq_id": pa.array(out_seq, type=pa.int64()),
                "ids": list_array(out_ids, np.int32, pa.int32()),
            }
        )

    seqs = pieces.groupby("spart").map_groups(_assemble, batch_format="pyarrow")
    return seqs, merges_tbl, vocab
