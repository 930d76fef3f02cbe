"""Parallel Louvain local-move phase vs a brute-force replay of the
integer-score move rule, plus community recovery on planted cliques."""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray.data as rd

from efficient_graph_algorithms_ray.pipelines.louvain import louvain_moves


def _run(pairs, rounds):
    u = np.array([p[0] for p in pairs], dtype=np.uint64)
    v = np.array([p[1] for p in pairs], dtype=np.uint64)
    ds = rd.from_arrow(
        pa.table({"u": pa.array(u, type=pa.uint64()), "v": pa.array(v, type=pa.uint64())})
    )
    out = louvain_moves(ds, rounds=rounds, num_partitions=4).to_pandas()
    return dict(zip(out["vid"], out["community"]))


def _brute(pairs, rounds):
    """Sequential replay of the synchronous integer-score rule."""
    adj: dict[int, list[int]] = {}
    for a, b in pairs:
        adj.setdefault(a, []).append(b)
        adj.setdefault(b, []).append(a)
    deg = {x: len(ns) for x, ns in adj.items()}
    m2 = sum(deg.values())
    lab = {x: x for x in adj}
    for _ in range(rounds):
        tot: dict[int, int] = {}
        for x in adj:
            tot[lab[x]] = tot.get(lab[x], 0) + deg[x]
        new = {}
        for x in adj:
            k: dict[int, int] = {}
            for nb in adj[x]:
                k[lab[nb]] = k.get(lab[nb], 0) + 1
            s_stay = m2 * k.get(lab[x], 0) - deg[x] * (tot[lab[x]] - deg[x])
            best = None
            for c, kc in k.items():
                if c == lab[x]:
                    continue
                s = m2 * kc - deg[x] * tot[c]
                if best is None or s > best[0] or (s == best[0] and c < best[1]):
                    best = (s, c)
            new[x] = best[1] if best is not None and best[0] > s_stay else lab[x]
        lab = new
    return lab


def test_louvain_separates_planted_cliques():
    # two 6-cliques joined by one bridge edge
    pairs = []
    for base in (0, 10):
        for i in range(6):
            for j in range(i + 1, 6):
                pairs.append((base + i, base + j))
    pairs.append((0, 10))
    got = _run(pairs, rounds=2)
    a = {got[v] for v in range(6)}
    b = {got[v] for v in range(10, 16)}
    assert len(a) == 1 and len(b) == 1 and a != b


def test_louvain_matches_bruteforce_rule():
    rng = np.random.default_rng(7)
    n = 30
    pairs = {(i, (i + 1) % n) for i in range(n)}
    for _ in range(40):
        a, b = rng.integers(0, n, 2)
        if a != b:
            pairs.add((min(a, b), max(a, b)))
    pairs = sorted((int(a), int(b)) for a, b in pairs)
    for rounds in (1, 2, 3):
        got = _run(pairs, rounds)
        want = _brute(pairs, rounds)
        assert got == want
