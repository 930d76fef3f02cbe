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
- the vocab table is sharded ONCE across a stateful actor pool; each
  actor holds its words' current symbol sequences, a pair → words
  inverted index, and contributes its initial pair counts;
- each merge round is INCREMENTAL: the driver arg-maxes its global
  pair-count table (a lazy-deletion heap keyed (−count, left, right) —
  count DESC then lexicographic pair, fully deterministic), broadcasts
  the one chosen pair, and every actor re-contracts ONLY the words its
  index says contain that pair, returning a sparse count delta. No
  round rescans the vocabulary.

Exactness of the incremental step: a word's stored symbols are the
fixpoint of the greedy merge loop under the current ranked list, and
the new pair has the worst rank — so re-deriving from raw characters
under merges+[p] replays the identical contraction sequence to that
same fixpoint before p can fire. Continuing the loop from the stored
symbols with the extended rank map (which lets EARLIER merges fire
again if p's contraction exposes them — the "abc" re-derivation case)
is therefore bit-equal to a from-scratch rescan, and a word whose
current segmentation lacks the adjacent pair is untouched. Driver
state is the bounded pair-count table (≤ distinct adjacent symbol
pairs of the word VOCABULARY — the same boundedness contract as the
vocab itself, shrinking as merges proceed).

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


def _bpe_shard_cls():
    """Late-bound actor class (keeps module import free of ray)."""
    import ray

    @ray.remote(num_cpus=1)
    class _Shard:
        """One vocabulary shard of the incremental BPE trainer: holds
        its words' current symbol sequences, a pair → word inverted
        index, and answers each round with a sparse pair-count delta
        for the words that actually contained the merged pair."""

        def __init__(self, block_refs):
            import ray as _ray
            from collections import defaultdict

            words: list[str] = []
            ns: list[int] = []
            for t in _ray.get(list(block_refs)):
                # a groupby at high parallelism can emit zero-row blocks
                # whose schema is EMPTY (no columns at all) — skip them,
                # or .column('word') raises KeyError and kills the actor
                if t.num_rows == 0 or "word" not in t.schema.names:
                    continue
                words.extend(t.column("word").to_pylist())
                ns.extend(t.column("n").to_pylist())
            self.ns = [int(n) for n in ns]
            self.syms: list[list[str]] = [list(w) + [_EOW] for w in words]
            self.rank: dict[tuple[str, str], int] = {}
            self.index: dict[tuple[str, str], set[int]] = defaultdict(set)
            self._counts: Counter = Counter()
            for i, (s, n) in enumerate(zip(self.syms, self.ns)):
                for p in zip(s, s[1:]):
                    self._counts[p] += n
                    self.index[p].add(i)

        def init_counts(self) -> dict:
            c, self._counts = self._counts, Counter()
            return dict(c)

        def _contract(self, syms: list[str]) -> list[str]:
            # bpe_segment's loop continued from the stored fixpoint with
            # the extended rank map (exactness: module docstring)
            rank = self.rank
            syms = list(syms)
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

        def apply_merge(self, left: str, right: str) -> dict:
            p = (left, right)
            self.rank[p] = len(self.rank)
            delta: Counter = Counter()
            for i in list(self.index.get(p, ())):
                old = self.syms[i]
                n = self.ns[i]
                new = self._contract(old)
                for q in zip(old, old[1:]):
                    delta[q] -= n
                for q in zip(new, new[1:]):
                    delta[q] += n
                old_pairs = set(zip(old, old[1:]))
                new_pairs = set(zip(new, new[1:]))
                for q in old_pairs - new_pairs:
                    self.index[q].discard(i)
                for q in new_pairs - old_pairs:
                    self.index[q].add(i)
                self.syms[i] = new
            self.index.pop(p, None)
            return {k: v for k, v in delta.items() if v}

    return _Shard


class _LazyBPEShard:
    """Module-level handle resolving the ray actor class on first use."""

    _cls = None

    def remote(self, *args):
        if _LazyBPEShard._cls is None:
            _LazyBPEShard._cls = _bpe_shard_cls()
        return _LazyBPEShard._cls.remote(*args)


_BPEShard = _LazyBPEShard()


def bpe_train_merges(docs_ds, *, n_merges: int = 32):
    """Train ``n_merges`` BPE merges on the corpus — incrementally.

    One vocab pass builds sharded actor state + the global pair-count
    table; every round touches only the words containing the chosen
    pair (module docstring has the exactness argument).

    Returns a pyarrow Table (rank, left, right, count): merge #rank
    contracted symbol pair (left, right) which occurred ``count``
    weighted times at selection. Deterministic: ties break
    lexicographically on (left, right).
    """
    import heapq

    import ray

    vocab = word_counts(docs_ds)
    block_refs = [
        block_ref
        for bundle in vocab.iter_internal_ref_bundles()
        for block_ref, _md in bundle.blocks
    ]
    cpus = int(ray.cluster_resources().get("CPU", 4))
    W = max(1, min(cpus, len(block_refs), 16))
    actors = [_BPEShard.remote(block_refs[w::W]) for w in range(W)]

    out_rank: list[int] = []
    out_l: list[str] = []
    out_r: list[str] = []
    out_c: list[int] = []
    try:
        counts: Counter = Counter()
        for d in ray.get([a.init_counts.remote() for a in actors]):
            for k, v in d.items():
                counts[k] += v
        heap = [(-c, left, right) for (left, right), c in counts.items()]
        heapq.heapify(heap)

        for rank in range(n_merges):
            # lazy-deletion pop: skip entries whose count went stale
            while heap:
                negc, left, right = heap[0]
                if -negc > 0 and counts.get((left, right), 0) == -negc:
                    break
                heapq.heappop(heap)
            if not heap:
                break
            negc, left, right = heapq.heappop(heap)
            out_rank.append(rank)
            out_l.append(left)
            out_r.append(right)
            out_c.append(-negc)
            deltas = ray.get([a.apply_merge.remote(left, right) for a in actors])
            touched: set[tuple[str, str]] = set()
            for d in deltas:
                for k, dv in d.items():
                    counts[k] += dv
                    touched.add(k)
            for k in touched:
                nc = counts[k]
                if nc > 0:
                    heapq.heappush(heap, (-nc, k[0], k[1]))
                else:
                    del counts[k]
    finally:
        for a in actors:
            ray.kill(a)

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
