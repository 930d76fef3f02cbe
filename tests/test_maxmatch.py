"""Greedy maximal matching vs an independent Python replay + invariants."""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray.data as rd

from efficient_graph_algorithms_ray.pipelines.maxmatch import (
    edge_priority,
    maximal_matching,
    round_constants,
)


def _edges_ds(pairs):
    u = np.array([p[0] for p in pairs], dtype=np.uint64)
    v = np.array([p[1] for p in pairs], dtype=np.uint64)
    return rd.from_arrow(pa.table({"src": pa.array(u), "dst": pa.array(v)}))


def _replay(pairs, rounds, seed=11):
    live = {(int(min(a, b)), int(max(a, b))) for a, b in pairs if a != b}
    matched_v: set[int] = set()
    out = {}
    for r, rc in enumerate(round_constants(seed, rounds)):
        rc = np.uint64(rc)

        def pri(e):
            return int(
                edge_priority(
                    np.array([e[0]], np.uint64), np.array([e[1]], np.uint64), rc
                )[0]
            )

        inc: dict[int, list] = {}
        for e in live:
            inc.setdefault(e[0], []).append(e)
            inc.setdefault(e[1], []).append(e)

        def unique_min_at(x, e):
            ps = sorted(pri(f) for f in inc[x])
            return pri(e) == ps[0] and (len(ps) == 1 or ps[1] != ps[0])

        wins = {e for e in live if unique_min_at(e[0], e) and unique_min_at(e[1], e)}
        for e in wins:
            out[e] = r + 1
            matched_v.update(e)
        live = {e for e in live if e[0] not in matched_v and e[1] not in matched_v}
    return out


def _run(pairs, rounds=3):
    df = maximal_matching(_edges_ds(pairs), rounds=rounds, num_partitions=4).to_pandas()
    return {
        (int(r["u"]), int(r["v"])): int(r["round"]) for _, r in df.iterrows()
    }


def test_maxmatch_matches_replay_random():
    rng = np.random.default_rng(5)
    n = 80
    pairs = sorted(
        {
            (int(min(a, b)), int(max(a, b)))
            for a, b in rng.integers(0, n, size=(300, 2))
            if a != b
        }
    )
    got = _run(pairs, rounds=3)
    want = _replay(pairs, rounds=3)
    assert got == want
    # matching is vertex-disjoint
    seen: set[int] = set()
    for u, v in got:
        assert u not in seen and v not in seen
        seen.update((u, v))


def test_maxmatch_maximal_after_enough_rounds():
    rng = np.random.default_rng(9)
    pairs = sorted(
        {
            (int(min(a, b)), int(max(a, b)))
            for a, b in rng.integers(0, 40, size=(120, 2))
            if a != b
        }
    )
    got = _run(pairs, rounds=6)
    matched = {v for e in got for v in e}
    # maximality: every unmatched-unmatched edge would have been matchable
    for u, v in pairs:
        assert u in matched or v in matched


def test_maxmatch_single_edge_and_triangle():
    got = _run([(1, 2)], rounds=1)
    assert got == {(1, 2): 1}
    got = _run([(1, 2), (2, 3), (1, 3)], rounds=3)
    assert len(got) == 1  # a triangle admits exactly one matched edge
