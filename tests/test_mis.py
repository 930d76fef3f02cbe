"""Luby MIS vs an independent per-round Python-set replay + invariants."""

import numpy as np
import pyarrow as pa
import pytest
import ray.data as rd

from efficient_graph_algorithms_ray.pipelines.mis import (
    _pri,
    maximal_independent_set,
    round_constants,
)


def _edges_ds(pairs):
    u = np.array([p[0] for p in pairs], dtype=np.uint64)
    v = np.array([p[1] for p in pairs], dtype=np.uint64)
    return rd.from_arrow(pa.table({"src": pa.array(u), "dst": pa.array(v)}))


def _luby_reference(pairs, rounds, seed=7):
    """Straightforward dict/set replay of the fixed-round semantics."""
    adj: dict[int, set[int]] = {}
    for a, b in pairs:
        a, b = int(min(a, b)), int(max(a, b))
        if a == b:
            continue
        adj.setdefault(a, set()).add(b)
        adj.setdefault(b, set()).add(a)
    status = {v: 0 for v in adj}
    live = {(a, b) for a in adj for b in adj[a] if a < b}
    rcs = round_constants(seed, rounds)
    for rc in rcs:
        rc = np.uint64(rc)

        def pri(v):
            return int(_pri(np.array([v], dtype=np.uint64), rc)[0])

        nbrs: dict[int, set[int]] = {}
        for a, b in live:
            nbrs.setdefault(a, set()).add(b)
            nbrs.setdefault(b, set()).add(a)
        winners = {
            v
            for v in status
            if status[v] == 0
            and all(pri(v) < pri(u) for u in nbrs.get(v, ()))
        }
        excluded = {
            u
            for v in winners
            for u in nbrs.get(v, ())
            if status[u] == 0 and u not in winners
        }
        for v in winners:
            status[v] = 1
        for v in excluded:
            status[v] = 2
        live = {(a, b) for (a, b) in live if status[a] == 0 and status[b] == 0}
    return status


def _run(pairs, rounds=3):
    import ray

    out = maximal_independent_set(_edges_ds(pairs), rounds=rounds, num_partitions=4)
    tbl = pa.concat_tables(ray.get(out.to_arrow_refs()))
    got = dict(
        zip(
            tbl.column("vid").to_pylist(),
            tbl.column("status").to_pylist(),
        )
    )
    assert len(got) == tbl.num_rows  # one state row per vertex
    return got


def test_mis_matches_reference_on_random_graph():
    rng = np.random.default_rng(3)
    n = 120
    pairs = {(int(a), int(b)) for a, b in rng.integers(0, n, size=(400, 2)) if a != b}
    pairs = [(min(a, b), max(a, b)) for a, b in pairs]
    got = _run(pairs, rounds=3)
    want = _luby_reference(pairs, rounds=3)
    assert got == want


def test_mis_invariants_path_and_star():
    # path 0-1-2-3-4 plus star 10-{11..15}
    pairs = [(0, 1), (1, 2), (2, 3), (3, 4)] + [(10, k) for k in range(11, 16)]
    got = _run(pairs, rounds=4)
    es = set(pairs)
    # independence: no edge inside the MIS
    for a, b in es:
        assert not (got[a] == 1 and got[b] == 1)
    # after enough rounds everything is decided, and every excluded
    # vertex has an MIS neighbor (maximality)
    assert 0 not in got.values()
    for v, s in got.items():
        if s == 2:
            assert any(
                got[b] == 1
                for a, b in [(x, y) for x, y in es] + [(y, x) for x, y in es]
                if a == v
            )


def test_mis_isolated_live_vertex_joins():
    # triangle + pendant: whatever the priorities, 2 rounds decide the
    # triangle; the pendant chain ends decided too
    pairs = [(1, 2), (2, 3), (1, 3), (3, 4)]
    got = _run(pairs, rounds=3)
    want = _luby_reference(pairs, rounds=3)
    assert got == want


def test_mis_priorities_are_distinct():
    rc = np.uint64(round_constants(7, 1)[0])
    v = np.arange(100000, dtype=np.uint64)
    p = _pri(v, rc)
    assert len(np.unique(p)) == len(v)


if __name__ == "__main__":
    pytest.main([__file__, "-x", "-q"])


def _jp_oracle(src, dst, rounds, seed):
    """Sequential replay of Jones-Plassmann fixed rounds."""
    from efficient_graph_algorithms_ray.pipelines.mis import _pri, round_constants

    edges = set()
    for s, d in zip(src, dst):
        s, d = int(s), int(d)
        if s != d:
            edges.add((min(s, d), max(s, d)))
    verts = sorted({v for e in edges for v in e})
    color = {v: 0 for v in verts}
    rcs = [np.uint64(rc) for rc in round_constants(seed, rounds)]
    live = set(edges)
    for r in range(rounds):
        rc = rcs[r]
        nbr = {v: set() for v in verts}
        for u, v in live:
            nbr[u].add(v)
            nbr[v].add(u)
        wins = []
        for v in verts:
            if color[v]:
                continue
            pv = int(_pri(np.array([v], dtype=np.uint64), rc)[0])
            ns = [int(_pri(np.array([w], dtype=np.uint64), rc)[0]) for w in nbr[v]]
            if not ns or pv < min(ns):
                wins.append(v)
        for v in wins:
            color[v] = r + 1
        live = {(u, v) for u, v in live if color[u] == 0 and color[v] == 0}
    return {v: (c if c else -1) for v, c in color.items()}


def test_greedy_coloring_matches_oracle_and_is_proper():
    from efficient_graph_algorithms_ray.pipelines.mis import greedy_coloring

    rng = np.random.default_rng(23)
    m = 120
    src = rng.integers(1, 40, size=m)
    dst = rng.integers(1, 40, size=m)
    keep = src != dst
    src, dst = src[keep], dst[keep]
    edges = rd.from_arrow(
        pa.table(
            {
                "src": pa.array(src.astype(np.uint64), type=pa.uint64()),
                "dst": pa.array(dst.astype(np.uint64), type=pa.uint64()),
            }
        )
    )
    out = greedy_coloring(edges, rounds=4, num_partitions=4, seed=13).to_pandas()
    got = {int(r.vid): int(r.color) for r in out.itertuples()}
    assert got == _jp_oracle(src, dst, 4, 13)
    # proper: no colored edge endpoints share a color
    pairs = {(min(int(s), int(d)), max(int(s), int(d))) for s, d in zip(src, dst) if s != d}
    for u, v in pairs:
        cu, cv = got[u], got[v]
        if cu != -1 and cv != -1:
            assert cu != cv
    assert any(c > 0 for c in got.values())
