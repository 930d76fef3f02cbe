"""Pivot FW-BW strongly connected components vs a dense numpy oracle."""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray.data as rd

from efficient_graph_algorithms_ray.config import EngineConfig
from efficient_graph_algorithms_ray.pipelines.graph_build import build_graph
from efficient_graph_algorithms_ray.pipelines.scc import pivot_scc, smallest_vids


def _edges_ds(src, dst):
    return rd.from_arrow(
        pa.table(
            {
                "src": pa.array(src, type=pa.uint64()),
                "dst": pa.array(dst, type=pa.uint64()),
            }
        )
    )


def _scc_oracle(src, dst, pivots, rounds):
    """Bounded-hop FW-BW: per pivot, BFS ≤ rounds hops forward and
    backward; vertex → smallest pivot in whose fwd ∩ bwd reach it lies."""
    src = np.asarray(src, dtype=np.uint64)
    dst = np.asarray(dst, dtype=np.uint64)
    vids = np.unique(np.concatenate([src, dst]))
    idx = {int(v): i for i, v in enumerate(vids)}
    n = len(vids)
    A = np.zeros((n, n), dtype=bool)
    for s, d in zip(src, dst):
        A[idx[int(s)], idx[int(d)]] = True

    def reach(mat, p):
        r = np.zeros(n, dtype=bool)
        r[idx[int(p)]] = True
        for _ in range(rounds):
            r = r | (mat.T @ r)
        return r

    out = {}
    for p in sorted(int(x) for x in pivots):
        both = reach(A, p) & reach(A.T, p)
        for i in np.flatnonzero(both):
            out.setdefault(int(vids[i]), p)
    return out


def _run(src, dst, pivots, tmp_path, rounds=8, P=8):
    fwd = build_graph(_edges_ds(src, dst), EngineConfig(num_partitions=P), directed=True)
    rev = build_graph(_edges_ds(dst, src), EngineConfig(num_partitions=P), directed=True)
    out, _, _ = pivot_scc(fwd, rev, str(tmp_path / "scc"), pivots, rounds=rounds)
    df = out.to_pandas().sort_values("vid").reset_index(drop=True)
    return {int(r.vid): int(r.scc) for r in df.itertuples()}


def test_two_cycles_and_dag_tail(tmp_path):
    # cycle {1,2,3}, cycle {10,11}, DAG tail 3->20->21 (21 unassigned)
    src = [1, 2, 3, 10, 11, 3, 20]
    dst = [2, 3, 1, 11, 10, 20, 21]
    got = _run(src, dst, [1, 10], tmp_path)
    assert got == {1: 1, 2: 1, 3: 1, 10: 10, 11: 10}


def test_pivots_in_same_scc_collapse(tmp_path):
    # pivots 1 and 2 share a cycle -> both report scc=1
    src = [1, 2, 3, 5, 6]
    dst = [2, 3, 1, 6, 5]
    got = _run(src, dst, [1, 2, 5], tmp_path)
    assert got == {1: 1, 2: 1, 3: 1, 5: 5, 6: 5}


def test_hop_radius_bounds_reach(tmp_path):
    # directed ring of 12 vertices: full SCC needs 11 hops; radius 4
    # assigns only vertices within 4 hops forward AND backward of pivot
    n = 12
    src = list(range(n))
    dst = [(i + 1) % n for i in range(n)]
    got = _run(src, dst, [0], tmp_path, rounds=4)
    oracle = _scc_oracle(src, dst, [0], rounds=4)
    assert got == oracle
    # sanity: ring vertex 6 is 6 hops away both ways -> unassigned
    assert 6 not in got


def test_random_graph_vs_oracle(tmp_path):
    rng = np.random.default_rng(7)
    n, m = 40, 160
    src = rng.integers(1, n + 1, size=m)
    dst = rng.integers(1, n + 1, size=m)
    keep = src != dst
    src, dst = src[keep], dst[keep]
    pivots = sorted(np.unique(np.concatenate([src, dst])))[:4]
    got = _run(src, dst, pivots, tmp_path, rounds=8, P=4)
    oracle = _scc_oracle(src, dst, pivots, rounds=8)
    assert got == oracle
    assert len(got) > 0  # random dense digraph has a nontrivial core


def test_bowtie_classes(tmp_path):
    from efficient_graph_algorithms_ray.pipelines.scc import bowtie_classes
    from efficient_graph_algorithms_ray.pipelines.graph_build import build_graph
    from efficient_graph_algorithms_ray.config import EngineConfig

    # in-tendril 50 -> core cycle {1,2,3} -> out-tendril 60; island 70-71
    src = [50, 1, 2, 3, 3, 70]
    dst = [1, 2, 3, 1, 60, 71]
    fwd = build_graph(_edges_ds(src, dst), EngineConfig(num_partitions=4), directed=True)
    rev = build_graph(_edges_ds(dst, src), EngineConfig(num_partitions=4), directed=True)
    out, _, _ = bowtie_classes(fwd, rev, str(tmp_path / "bt"), 1, rounds=8)
    got = {int(r.vid): int(r.cls) for r in out.to_pandas().itertuples()}
    assert got == {1: 0, 2: 0, 3: 0, 50: 1, 60: 2, 70: 3, 71: 3}


def _trim_oracle(src, dst, rounds):
    """Direct peeling replay: per round, alive vertices with no alive
    in-neighbor or no alive out-neighbor die."""
    src = [int(x) for x in src]
    dst = [int(x) for x in dst]
    verts = sorted(set(src) | set(dst))
    alive = set(verts)
    out = {v: 0 for v in verts}
    for r in range(1, rounds + 1):
        din = {v: 0 for v in alive}
        dout = {v: 0 for v in alive}
        for s, d in zip(src, dst):
            if s in alive and d in alive:
                din[d] += 1
                dout[s] += 1
        die = {v for v in alive if din[v] == 0 or dout[v] == 0}
        for v in die:
            out[v] = r
        alive -= die
    return out


def _run_trim(src, dst, tmp_path, rounds=6, P=4):
    from efficient_graph_algorithms_ray.pipelines.scc import (
        directed_trim_rounds,
        trim_message_edges,
    )

    g = build_graph(
        trim_message_edges(_edges_ds(src, dst)),
        EngineConfig(num_partitions=P),
        directed=True,
    )
    out, _ = directed_trim_rounds(g, str(tmp_path / "trim"), rounds=rounds)
    return {int(r.vid): int(r.trim_round) for r in out.to_pandas().itertuples()}


def test_trim_chain_and_cycle(tmp_path):
    # chain 1->2->3 peels outside-in; cycle {10,11,12} survives;
    # pendant 20->10 dies round 1
    src = [1, 2, 10, 11, 12, 20]
    dst = [2, 3, 11, 12, 10, 10]
    got = _run_trim(src, dst, tmp_path)
    assert got == {1: 1, 3: 1, 2: 2, 10: 0, 11: 0, 12: 0, 20: 1}


def test_trim_matches_oracle_random(tmp_path):
    rng = np.random.default_rng(3)
    n, m = 30, 70
    src = rng.integers(1, n + 1, size=m)
    dst = rng.integers(1, n + 1, size=m)
    keep = src != dst
    src, dst = src[keep], dst[keep]
    got = _run_trim(src, dst, tmp_path, rounds=6)
    assert got == _trim_oracle(src, dst, rounds=6)


def _decompose_oracle(src, dst, peels, trim_rounds, k, reach_rounds):
    """Pure-python replay of scc_decompose."""
    edges = {(int(s), int(d)) for s, d in zip(src, dst)}
    out = {}
    for peel in range(peels):
        verts = {s for s, _ in edges} | {d for _, d in edges}
        if not verts:
            break
        alive = set(verts)
        for _ in range(trim_rounds):
            din = {v: 0 for v in alive}
            dout = {v: 0 for v in alive}
            for s, d in edges:
                if s in alive and d in alive:
                    din[d] += 1
                    dout[s] += 1
            die = {v for v in alive if din[v] == 0 or dout[v] == 0}
            for v in die:
                out[v] = (v, 0)
            alive -= die
        edges = {(s, d) for s, d in edges if s in alive and d in alive}
        everts = {s for s, _ in edges} | {d for _, d in edges}
        piv = sorted(everts)[:k]

        def reach(es, p, rounds):
            r = {p}
            for _ in range(rounds):
                r = r | {d for s, d in es if s in r}
            return r

        assigned = {}
        for p in sorted(piv):
            fw = reach(edges, p, reach_rounds)
            bw = reach({(d, s) for s, d in edges}, p, reach_rounds)
            for v in fw & bw:
                assigned.setdefault(v, p)
        for v, p in assigned.items():
            out[v] = (p, 1)
        sv = {v for v in alive if v not in assigned}
        edges = {(s, d) for s, d in edges if s in sv and d in sv}
    return out


def test_scc_decompose_vs_oracle(tmp_path):
    from efficient_graph_algorithms_ray.pipelines.scc import scc_decompose

    rng = np.random.default_rng(11)
    n, m = 30, 60
    src = rng.integers(1, n + 1, size=m)
    dst = rng.integers(1, n + 1, size=m)
    keep = src != dst
    src, dst = src[keep], dst[keep]
    out = scc_decompose(
        _edges_ds(src, dst),
        EngineConfig(num_partitions=4),
        str(tmp_path / "dec"),
        peels=2,
        trim_rounds=2,
        pivots_k=4,
        reach_rounds=4,
    )
    got = {
        int(r.vid): (int(r.scc), int(r.kind)) for r in out.to_pandas().itertuples()
    }
    assert got == _decompose_oracle(src, dst, 2, 2, 4, 4)
    assert len(got) > 0


def test_scc_decompose_trims_dag_assigns_cycles(tmp_path):
    from efficient_graph_algorithms_ray.pipelines.scc import scc_decompose

    # DAG chain 1->2->3 (all trimmed as singletons) + cycle {10,11,12}
    src = [1, 2, 10, 11, 12]
    dst = [2, 3, 11, 12, 10]
    out = scc_decompose(
        _edges_ds(src, dst),
        EngineConfig(num_partitions=4),
        str(tmp_path / "dec2"),
        peels=2,
        trim_rounds=2,
        pivots_k=4,
        reach_rounds=4,
    )
    got = {
        int(r.vid): (int(r.scc), int(r.kind)) for r in out.to_pandas().itertuples()
    }
    assert got == {
        1: (1, 0),
        3: (3, 0),
        2: (2, 0),
        10: (10, 1),
        11: (10, 1),
        12: (10, 1),
    }


def test_smallest_vids(tmp_path):
    src = [9, 5, 7, 100]
    dst = [5, 9, 100, 7]
    piv = smallest_vids(_edges_ds(src, dst), k=3)
    assert piv.tolist() == [5, 7, 9]


def test_reciprocity_bruteforce_tiny():
    """Reciprocity logic on a hand-built directed edge stream with
    duplicates: distinct-direction counting, not row counting."""
    import pyarrow as pa
    import ray.data as rd
    from ray.data.aggregate import Max, Min

    # edges: 1->2 (dup x2), 2->1, 3->4, 5->6, 6->5  => pairs (1,2) recip,
    # (3,4) one-way, (5,6) recip => n_edges=5, n_recip=4
    s = np.array([1, 1, 2, 3, 5, 6], dtype=np.uint64)
    d = np.array([2, 2, 1, 4, 6, 5], dtype=np.uint64)
    tbl = pa.table(
        {
            "lo": pa.array(np.minimum(s, d), type=pa.uint64()),
            "hi": pa.array(np.maximum(s, d), type=pa.uint64()),
            "b": pa.array((s > d).astype(np.int64), type=pa.int64()),
        }
    )
    pairs = (
        rd.from_arrow(tbl)
        .groupby(["lo", "hi"])
        .aggregate(Min("b", alias_name="bmin"), Max("b", alias_name="bmax"))
        .to_pandas()
    )
    recip = (pairs["bmin"] < pairs["bmax"]).to_numpy()
    assert len(pairs) + recip.sum() == 5
    assert 2 * recip.sum() == 4
