"""Walk-family operators (weighted / personalized / multi-source /
k-step / interpolator) vs dense oracles."""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray.data as rd

from efficient_graph_algorithms_ray.config import EngineConfig
from efficient_graph_algorithms_ray.oracles.numpy_graph import (
    generalized_walk_oracle,
    interpolate_oracle,
)
from efficient_graph_algorithms_ray.pipelines.graph_build import build_graph
from efficient_graph_algorithms_ray.pipelines.pagerank import pagerank
from efficient_graph_algorithms_ray.pipelines.walks import (
    k_step_walk,
    masked_neighbor_interpolate,
    multi_source_pagerank,
    personalized_pagerank,
    vertex_lookup_init,
)
from efficient_graph_algorithms_ray.stages.hashing import hash_to_vid


def _fixture(weighted=False, n=60, p=0.15, seed=5):
    rng = np.random.Generator(np.random.Philox(key=[seed, 0]))
    mask = rng.random((n, n)) < p
    np.fill_diagonal(mask, False)
    si, di = np.nonzero(mask)
    vids = hash_to_vid([f"w{i}" for i in range(n)])
    src, dst = vids[si], vids[di]
    cols = {
        "src": pa.array(src, type=pa.uint64()),
        "dst": pa.array(dst, type=pa.uint64()),
    }
    w = None
    if weighted:
        w = np.round(rng.random(len(src)) * 4 + 0.5, 3)
        cols["w"] = pa.array(w, type=pa.float64())
    return rd.from_arrow(pa.table(cols)), src, dst, w, vids


def test_weighted_pagerank_matches_oracle(tmp_path):
    ds, src, dst, w, _ = _fixture(weighted=True)
    g = build_graph(ds, EngineConfig(num_partitions=6), directed=True)
    ranks, s = pagerank(g, str(tmp_path / "wpr"), tol=1e-9, max_iters=300)
    df = ranks.to_pandas().sort_values("vid").reset_index(drop=True)
    ovids, oranks = generalized_walk_oracle(src, dst, weights=w, tol=1e-9, max_iters=300)
    assert np.array_equal(df["vid"].to_numpy().astype(np.uint64), ovids)
    assert np.allclose(df["rank"].to_numpy(), oranks, atol=1e-8)


def test_personalized_pagerank_matches_oracle(tmp_path):
    ds, src, dst, _, vids = _fixture()
    g = build_graph(ds, EngineConfig(num_partitions=6), directed=True)
    seeds = [int(vids[3]), int(vids[17]), int(vids[40])]
    scores, s = personalized_pagerank(g, str(tmp_path / "ppr"), seeds, tol=1e-9, max_iters=300)
    df = scores.to_pandas().sort_values("vid").reset_index(drop=True)
    tele = {v: 1.0 for v in seeds}
    ovids, osc = generalized_walk_oracle(src, dst, teleport=tele, tol=1e-9, max_iters=300)
    assert np.allclose(df["score"].to_numpy(), osc, atol=1e-8)
    # seeds score above the median (restart mass concentrates there)
    sdf = df.set_index(df["vid"].astype(np.uint64))["score"]
    assert all(sdf[np.uint64(v)] > df["score"].median() for v in seeds)


def test_multi_source_matches_individual_runs(tmp_path):
    ds, src, dst, _, vids = _fixture()
    g = build_graph(ds, EngineConfig(num_partitions=4), directed=True)
    sets = [[int(vids[1]), int(vids[2])], [int(vids[30])]]
    multi, s = multi_source_pagerank(g, str(tmp_path / "msp"), sets, tol=1e-9, max_iters=300)
    mdf = multi.to_pandas().sort_values("vid").reset_index(drop=True)
    mat = np.vstack(mdf["scores"].to_numpy())
    for j, ss in enumerate(sets):
        single, _ = personalized_pagerank(
            g, str(tmp_path / f"s{j}"), ss, tol=1e-9, max_iters=300
        )
        sdf = single.to_pandas().sort_values("vid").reset_index(drop=True)
        assert np.allclose(mat[:, j], sdf["score"].to_numpy(), atol=1e-10)


def test_k_step_walk_matches_oracle(tmp_path):
    ds, src, dst, _, _ = _fixture()
    g = build_graph(ds, EngineConfig(num_partitions=4), directed=True)
    mass, s = k_step_walk(g, str(tmp_path / "walk"), k=3)
    df = mass.to_pandas().sort_values("vid").reset_index(drop=True)
    ovids, om = generalized_walk_oracle(
        src, dst, damping=1.0, teleport={}, tol=0.0, max_iters=3
    )
    assert np.allclose(df["mass"].to_numpy(), om, atol=1e-12)
    assert s["iterations"] == 3


def test_masked_interpolation_matches_oracle(tmp_path):
    ds, src, dst, _, vids = _fixture()
    g = build_graph(ds, EngineConfig(num_partitions=4), directed=True)
    rng = np.random.Generator(np.random.Philox(key=[11, 0]))
    known = {int(v): 1.0 for v in vids[:30]}
    values = {int(v): float(np.round(rng.random(), 4)) for v in vids[:30]}
    out = masked_neighbor_interpolate(
        g,
        str(tmp_path / "interp"),
        vertex_lookup_init(
            np.array(list(values), dtype=np.uint64),
            np.array([values[k] for k in values]),
        ),
        vertex_lookup_init(
            np.array(list(known), dtype=np.uint64),
            np.array([known[k] for k in known]),
        ),
    )
    df = out.to_pandas().sort_values("vid").reset_index(drop=True)
    ovids, ov = interpolate_oracle(src, dst, values, known)
    assert np.array_equal(df["vid"].to_numpy().astype(np.uint64), ovids)
    assert np.allclose(df["value"].to_numpy(), ov, atol=1e-12)


def test_dsd_pairs_matches_dense_oracle(tmp_path):
    """Bounded-set Diffusion State Distance ≡ the dense c = Σ P^i rows
    (reference diffusion_state_distance semantics, graph_kernels.py:82-95)."""
    import numpy as np
    import pyarrow as pa
    import ray.data as rd

    from efficient_graph_algorithms_ray.config import EngineConfig
    from efficient_graph_algorithms_ray.pipelines.graph_build import build_graph
    from efficient_graph_algorithms_ray.pipelines.walks import diffusion_state_distance_pairs

    rng = np.random.Generator(np.random.Philox(key=[21, 0]))
    src = rng.integers(0, 60, 500).astype(np.uint64)
    dst = rng.integers(0, 60, 500).astype(np.uint64)
    keep = src != dst
    src, dst = src[keep], dst[keep]
    edges = rd.from_arrow(
        pa.table({"src": pa.array(src, type=pa.uint64()), "dst": pa.array(dst, type=pa.uint64())})
    )
    g = build_graph(edges, EngineConfig(num_partitions=4), directed=False)
    queries = [0, 1, 2]
    n_rw = 3
    pairs, _ = diffusion_state_distance_pairs(g, str(tmp_path / "dsd"), queries, n_rw=n_rw)

    # dense oracle over the symmetrized, deduped adjacency
    und = set()
    for a, b in zip(src, dst):
        und.add((int(a), int(b)))
        und.add((int(b), int(a)))
    vids = sorted({v for e in und for v in e})
    idx = {v: i for i, v in enumerate(vids)}
    n = len(vids)
    A = np.zeros((n, n))
    for a, b in und:
        A[idx[a], idx[b]] = 1.0
    P = A / np.maximum(A.sum(axis=1, keepdims=True), 1e-300)
    c = {}
    for qv in queries:
        r = np.zeros(n)
        r[idx[qv]] = 1.0
        acc = r.copy()
        for _ in range(n_rw):
            r = r @ P
            acc += r
        c[qv] = acc
    want = {
        (qa, qb): float(np.abs(c[qa] - c[qb]).sum())
        for i, qa in enumerate(queries)
        for qb in queries[i + 1 :]
    }
    for qa, qb, d in pairs:
        np.testing.assert_allclose(d, want[(qa, qb)], rtol=1e-8, atol=1e-12)


def test_multi_source_single_set_keeps_list_schema(tmp_path):
    """d=1 vector fields must round-trip checkpoints as list<float64>[1]
    (the documented schema), not flatten to a scalar column."""
    import numpy as np
    import pyarrow as pa
    import ray.data as rd

    from efficient_graph_algorithms_ray.config import EngineConfig
    from efficient_graph_algorithms_ray.pipelines.graph_build import build_graph
    from efficient_graph_algorithms_ray.pipelines.walks import multi_source_pagerank

    rng = np.random.Generator(np.random.Philox(key=[41, 0]))
    src = rng.integers(0, 50, 300).astype(np.uint64)
    dst = rng.integers(0, 50, 300).astype(np.uint64)
    keep = src != dst
    edges = rd.from_arrow(
        pa.table(
            {
                "src": pa.array(src[keep], type=pa.uint64()),
                "dst": pa.array(dst[keep], type=pa.uint64()),
            }
        )
    )
    g = build_graph(edges, EngineConfig(num_partitions=4), directed=False)
    scores, _ = multi_source_pagerank(
        g, str(tmp_path / "m1"), [[int(src[0])]], damping=0.85, tol=0.0, max_iters=3
    )
    tbl = scores.to_pandas()
    first = tbl["scores"].iloc[0]
    assert hasattr(first, "__len__") and len(first) == 1  # list-typed, width 1


def test_eigencentrality_power_steps_match_dense():
    """4 raw A·x power steps from ones ≡ dense A^4·1 (integer-exact)."""
    import tempfile

    from efficient_graph_algorithms_ray.pipelines.diffusion import adjacency_matvec

    rng = np.random.default_rng(4)
    n = 40
    pairs = sorted(
        {
            (int(min(a, b)), int(max(a, b)))
            for a, b in rng.integers(1, n + 1, size=(120, 2))
            if a != b
        }
    )
    u = np.array([p[0] for p in pairs], dtype=np.uint64)
    v = np.array([p[1] for p in pairs], dtype=np.uint64)
    ds = rd.from_arrow(pa.table({"src": pa.array(u), "dst": pa.array(v)}))
    g = build_graph(ds, EngineConfig(num_partitions=4), directed=False)

    out, _ = adjacency_matvec(
        g, tempfile.mkdtemp(dir="/tmp"), lambda csr: np.ones(len(csr["vids"])), k=4
    )
    df = out.to_pandas().set_index("vid")["value"]
    # dense replica
    ids = sorted({x for e in pairs for x in e})
    pos = {x: i for i, x in enumerate(ids)}
    A = np.zeros((len(ids), len(ids)))
    for a, b in pairs:
        A[pos[a], pos[b]] = A[pos[b], pos[a]] = 1.0
    x = np.linalg.matrix_power(A, 4) @ np.ones(len(ids))
    for vid_, want in zip(ids, x):
        assert df[vid_] == want  # integer-exact


def test_sweepcut_conductance_bruteforce():
    """Difference-array cut computation vs brute-force prefix cuts on a
    random candidate ordering."""
    rng = np.random.default_rng(9)
    n = 40
    T = 8
    # random graph, distinct pairs u<v
    pairs = set()
    for _ in range(120):
        a, b = rng.integers(0, n, 2)
        if a != b:
            pairs.add((min(a, b), max(a, b)))
    pairs = sorted(pairs)
    cand = list(rng.permutation(n)[:T])  # positions 1..T
    pos = {v: i + 1 for i, v in enumerate(cand)}

    # difference-array method (the engine's _cut_partial logic)
    diff = np.zeros(T + 2, dtype=np.int64)
    for u, v in pairs:
        a = min(pos.get(u, 99), pos.get(v, 99))
        z = max(pos.get(u, 99), pos.get(v, 99))
        if a <= T and a < z:
            diff[a] += 1
            diff[min(z, T + 1)] -= 1
    cut = np.cumsum(diff)[1 : T + 1]

    # brute force per prefix
    for i in range(1, T + 1):
        S = set(cand[:i])
        expect = sum(1 for u, v in pairs if (u in S) != (v in S))
        assert cut[i - 1] == expect
