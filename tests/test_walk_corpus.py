"""Random-walk corpus: every hop is a real edge, deterministic, correct
lengths, dangling truncation."""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray.data as rd

from efficient_graph_algorithms_ray.config import EngineConfig
from efficient_graph_algorithms_ray.pipelines.graph_build import build_graph
from efficient_graph_algorithms_ray.pipelines.walk_corpus import random_walk_corpus
from efficient_graph_algorithms_ray.stages.hashing import hash_to_vid


def _graph(n=50, p=0.12, seed=2, with_dangling=True):
    rng = np.random.Generator(np.random.Philox(key=[seed, 0]))
    vids = hash_to_vid([f"c{i}" for i in range(n)])
    mask = rng.random((n, n)) < p
    np.fill_diagonal(mask, False)
    if with_dangling:
        mask[n - 1, :] = False  # vertex with no out-edges
    si, di = np.nonzero(mask)
    ds = rd.from_arrow(
        pa.table(
            {
                "src": pa.array(vids[si], type=pa.uint64()),
                "dst": pa.array(vids[di], type=pa.uint64()),
            }
        )
    )
    g = build_graph(ds, EngineConfig(num_partitions=4), directed=True)
    edges = set(zip(vids[si].tolist(), vids[di].tolist()))
    return g, vids, edges


def test_walks_follow_real_edges_with_correct_length(tmp_path):
    g, vids, edges = _graph()
    out = random_walk_corpus(g, walk_len=6, walks_per_vertex=2).to_pandas()
    n_vertices = g.n_vertices
    assert len(out) == 2 * n_vertices
    dangling_seen = 0
    for seq in out["seq"]:
        seq = [int(x) for x in seq]
        assert 1 <= len(seq) <= 6
        if len(seq) < 6:
            dangling_seen += 1
        for a, b in zip(seq, seq[1:]):
            assert (a, b) in edges  # every hop is a real directed edge
    assert dangling_seen >= 2  # walks reaching the dangling vertex truncate


def test_walks_deterministic_across_runs(tmp_path):
    g, _, _ = _graph(seed=9)
    a = random_walk_corpus(g, walk_len=5, seed=13).to_pandas()
    b = random_walk_corpus(g, walk_len=5, seed=13).to_pandas()
    a = a.sort_values("walk_id").reset_index(drop=True)
    b = b.sort_values("walk_id").reset_index(drop=True)
    assert list(a["walk_id"]) == list(b["walk_id"])
    for x, y in zip(a["seq"], b["seq"]):
        assert [int(i) for i in x] == [int(i) for i in y]
    # a different seed changes at least one walk
    c = (
        random_walk_corpus(g, walk_len=5, seed=14)
        .to_pandas()
        .sort_values("walk_id")
        .reset_index(drop=True)
    )
    assert any(
        [int(i) for i in x] != [int(i) for i in y] for x, y in zip(a["seq"], c["seq"])
    )


def _khop_replica(src, dst, seeds, fanouts, seed):
    """Pure-python replay of khop_neighbor_sample on an undirected
    edge list (src/dst both directions present in adjacency)."""
    from efficient_graph_algorithms_ray.sources.edges_synth import _splitmix64

    adj: dict[int, set[int]] = {}
    for s, d in zip(src, dst):
        adj.setdefault(int(s), set()).add(int(d))
        adj.setdefault(int(d), set()).add(int(s))
    frontier = {(int(s), int(s)) for s in seeds}
    rows = set()
    for hop, fan in enumerate(fanouts, start=1):
        nxt = set()
        for root, v in sorted(frontier):
            nbrs = np.array(sorted(adj.get(v, ())), dtype=np.uint64)
            if not len(nbrs):
                continue
            k = np.uint64((seed + hop) & 0xFFFFFFFFFFFFFFFF)
            h = _splitmix64(
                np.uint64(root) ^ _splitmix64(np.uint64(v) ^ _splitmix64(nbrs ^ k))
            )
            sel = np.lexsort((nbrs, h))[:fan]
            for d in nbrs[sel]:
                rows.add((root, hop, v, int(d)))
                nxt.add((root, int(d)))
        frontier = nxt
    return rows


def test_khop_sample_matches_replica(tmp_path):
    import pyarrow as pa
    import ray.data as rd

    from efficient_graph_algorithms_ray.config import EngineConfig
    from efficient_graph_algorithms_ray.pipelines.graph_build import build_graph
    from efficient_graph_algorithms_ray.pipelines.walk_corpus import (
        khop_neighbor_sample,
    )

    rng = np.random.default_rng(5)
    m = 80
    src = rng.integers(1, 25, size=m).astype(np.uint64)
    dst = rng.integers(1, 25, size=m).astype(np.uint64)
    keep = src != dst
    src, dst = src[keep], dst[keep]
    edges = rd.from_arrow(
        pa.table(
            {
                "src": pa.array(src, type=pa.uint64()),
                "dst": pa.array(dst, type=pa.uint64()),
            }
        )
    )
    g = build_graph(edges, EngineConfig(num_partitions=4), directed=False)
    out = khop_neighbor_sample(g, [1, 2, 3], fanouts=(3, 2), seed=7).to_pandas()
    got = {
        (int(r.root), int(r.hop), int(r.src), int(r.dst))
        for r in out.itertuples()
    }
    assert got == _khop_replica(src, dst, [1, 2, 3], (3, 2), 7)
    # fanout bound: at most 3 hop-1 edges per (root, src)
    h1 = out[out["hop"] == 1].groupby(["root", "src"]).size()
    assert (h1 <= 3).all()
    assert len(got) > 0


def test_node2vec_equal_weights_degenerates_to_deepwalk():
    """With back:common:far = 1:1:1 the cumulative-weight selection is
    r mod deg over the CSR-ordered row — exactly the uniform DeepWalk
    hop — so the two corpora must be identical sequences."""
    from efficient_graph_algorithms_ray.pipelines.walk_corpus import (
        node2vec_walk_corpus,
    )
    from efficient_graph_algorithms_ray.util import list_rows

    g, _, _ = _graph(n=40, p=0.15, seed=3, with_dangling=False)
    L = 6

    def _seqs(ds):
        out = {}
        for b in ds.iter_batches(batch_size=None, batch_format="pyarrow"):
            for wid, s in zip(
                b.column("walk_id").to_pylist(), list_rows(b, "seq")
            ):
                out[int(wid)] = [int(x) for x in s]
        return out

    uni = _seqs(random_walk_corpus(g, walk_len=L, walks_per_vertex=1, seed=7))
    n2v = _seqs(node2vec_walk_corpus(g, walk_len=L, seed=7, w_back=1, w_common=1, w_far=1))
    assert uni == n2v


def test_node2vec_bias_changes_walks():
    from efficient_graph_algorithms_ray.pipelines.walk_corpus import (
        node2vec_walk_corpus,
    )
    from efficient_graph_algorithms_ray.util import list_rows

    g, _, _ = _graph(n=40, p=0.15, seed=3, with_dangling=False)

    def _flat(ds):
        rows = []
        for b in ds.iter_batches(batch_size=None, batch_format="pyarrow"):
            rows.extend(tuple(int(x) for x in s) for s in list_rows(b, "seq"))
        return sorted(rows)

    a = _flat(node2vec_walk_corpus(g, walk_len=6, seed=7, w_back=1, w_common=1, w_far=1))
    b = _flat(node2vec_walk_corpus(g, walk_len=6, seed=7, w_back=16, w_common=1, w_far=1))
    assert a != b  # strong return bias must reroute at least one hop


def test_frontier_shuffle_plan_bit_identical():
    """The flag-gated co-shuffle plan (walks shuffled to their frontier
    owner each step — the multi-node path) must emit exactly the same
    walk set as the default zero-shuffle plan."""
    from efficient_graph_algorithms_ray.pipelines.walk_corpus import (
        random_walk_corpus,
    )
    from efficient_graph_algorithms_ray.util import list_rows

    g, _, _ = _graph(n=50, p=0.12, seed=5, with_dangling=True)

    def _flat(ds):
        rows = []
        for b in ds.iter_batches(batch_size=None, batch_format="pyarrow"):
            wids = b.column("walk_id").to_pylist()
            for w, s in zip(wids, list_rows(b, "seq")):
                rows.append((int(w), tuple(int(x) for x in s)))
        return sorted(rows)

    a = _flat(random_walk_corpus(g, walk_len=7, seed=11, frontier_shuffle=False))
    b = _flat(random_walk_corpus(g, walk_len=7, seed=11, frontier_shuffle=True))
    assert a == b


def test_choose_walk_plan_heuristic():
    """Auto plan selection (VERDICT r4 task #6): single-node always
    zero-shuffle; multi-node picks shuffle exactly when replicated
    shard fetches outweigh walk-state traffic."""
    from efficient_graph_algorithms_ray.pipelines.walk_corpus import choose_walk_plan

    common = dict(n_walks=1_000_000, walk_len=8, num_partitions=64)
    # single node: plasma reads are zero-copy — never shuffle
    assert choose_walk_plan(**common, graph_bytes=10**12, n_nodes=1) is False
    # 4 nodes, 1 TB graph vs ~88 MB walk state: shuffle wins
    assert choose_walk_plan(**common, graph_bytes=10**12, n_nodes=4) is True
    # 4 nodes, graph smaller than the walk state: fetches are cheaper
    assert choose_walk_plan(**common, graph_bytes=10**6, n_nodes=4) is False
    # crossover: B=P=64 blocks each fetch all 64 shards remote-frac 3/4
    # → fetch = graph_bytes·64·(3/4); state = 1e6·11·8 = 88 MB
    # → crossover at graph_bytes ≈ 1.833 MB
    assert choose_walk_plan(**common, graph_bytes=1_800_000, n_nodes=4) is False
    assert choose_walk_plan(**common, graph_bytes=1_900_000, n_nodes=4) is True


def test_random_walk_corpus_auto_plan_single_node():
    """End-to-end: frontier_shuffle=None on the (single-node) test
    cluster resolves to the zero-shuffle plan and matches both explicit
    plans bit-for-bit."""
    g, _, _ = _graph(n=40, p=0.12, seed=9)
    auto = random_walk_corpus(g, walk_len=5, seed=3).to_pandas()
    explicit = random_walk_corpus(
        g, walk_len=5, seed=3, frontier_shuffle=False
    ).to_pandas()
    ka = auto.sort_values("walk_id").reset_index(drop=True)
    ke = explicit.sort_values("walk_id").reset_index(drop=True)
    assert ka["walk_id"].tolist() == ke["walk_id"].tolist()
    assert [list(x) for x in ka["seq"]] == [list(x) for x in ke["seq"]]


def test_weighted_walk_matches_per_row_replica():
    """The vectorized int64-cumsum threshold selection (concatenated
    segments) must equal an explicit per-row cumsum replica — guards
    the block-size-independence of the weighted step (ADVICE r4)."""
    from efficient_graph_algorithms_ray.pipelines.walk_corpus import (
        weighted_walk_corpus,
    )
    from efficient_graph_algorithms_ray.sources.edges_synth import _splitmix64
    from efficient_graph_algorithms_ray.util import list_rows

    rng = np.random.default_rng(23)
    n = 60
    vids = hash_to_vid([f"w{i}" for i in range(n)])
    iu, ju = np.triu_indices(n, 1)
    keep = rng.random(len(iu)) < 0.1
    src = np.concatenate([vids[iu[keep]], vids[ju[keep]]])
    dst = np.concatenate([vids[ju[keep]], vids[iu[keep]]])
    w = np.concatenate([rng.integers(1, 9, keep.sum())] * 2).astype(np.float64)
    ds = rd.from_arrow(
        pa.table(
            {
                "src": pa.array(src, type=pa.uint64()),
                "dst": pa.array(dst, type=pa.uint64()),
                "w": pa.array(w, type=pa.float64()),
            }
        )
    )
    g = build_graph(ds, EngineConfig(num_partitions=4), directed=True)
    L, seed = 6, 19
    out = weighted_walk_corpus(g, walk_len=L, seed=seed)

    # per-row replica over the packed CSR shards (same arithmetic,
    # python-level cumsum per visited vertex)
    import ray

    csrs = {p: ray.get(r) for p, r in g.refs.items()}

    def nbrs(v):
        p = int(v % np.uint64(g.num_partitions))
        c = csrs[p]
        i = int(np.searchsorted(c["vids"], v))
        s, d = int(c["indptr"][i]), int(c["deg"][i])
        return c["indices"][s : s + d], c["weights"][s : s + d]

    def mix(x):
        return int(_splitmix64(np.array([x], dtype=np.uint64))[0])

    want = {}
    for v0 in [int(x) for x in np.concatenate([c["vids"] for c in csrs.values()])]:
        # walk_id = splitmix64(vid ^ splitmix64(rep)), rep = 0
        wid = _splitmix64(np.array([np.uint64(v0) ^ _splitmix64(np.zeros(1, dtype=np.uint64))[0]], dtype=np.uint64))[0]
        wid0 = int(wid)
        seq, cur = [v0], np.uint64(v0)
        for step in range(1, L):
            ns, ws = nbrs(cur)
            if len(ns) == 0:
                break
            r = np.uint64(mix(int(wid ^ np.uint64(mix(step)) ^ np.uint64(seed))))
            tot = int(np.sum(ws.astype(np.int64)))
            thr = int(r % np.uint64(tot))
            c, j = 0, 0
            for j, wv in enumerate(ws.astype(np.int64)):
                c += int(wv)
                if thr < c:
                    break
            cur = np.uint64(ns[j])
            seq.append(int(cur))
        want[wid0] = seq

    got = {}
    for b in out.iter_batches(batch_size=None, batch_format="pyarrow"):
        for widv, s in zip(b.column("walk_id").to_pylist(), list_rows(b, "seq")):
            got[int(widv)] = [int(x) for x in s]
    assert got == want
