"""Tree-ensemble kernel: spanning-forest validity, exactness on trees,
domination of the graph-metric kernel, and the distortion band —
the reference's ``print_subopt_ratios`` analogue
(/root/reference/src/ega/util/graphs_networkx_utils.py:70-76)."""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray.data as rd

from efficient_graph_algorithms_ray.config import EngineConfig
from efficient_graph_algorithms_ray.pipelines.graph_build import build_graph
from efficient_graph_algorithms_ray.pipelines.tree_dp import make_vid_lookup
from efficient_graph_algorithms_ray.pipelines.tree_ensemble import (
    random_spanning_forest_edges,
    tree_ensemble_kernel,
)
from efficient_graph_algorithms_ray.stages.hashing import hash_to_vid


def _er_graph(n=60, p=0.12, seed=3):
    rng = np.random.Generator(np.random.Philox(key=[seed, 0]))
    mask = np.triu(rng.random((n, n)) < p, 1)
    si, di = np.nonzero(mask)
    vids = hash_to_vid([f"te{i}" for i in range(n)])
    ds = rd.from_arrow(
        pa.table(
            {
                "src": pa.array(vids[si], type=pa.uint64()),
                "dst": pa.array(vids[di], type=pa.uint64()),
            }
        )
    )
    g = build_graph(ds, EngineConfig(num_partitions=4), directed=False)
    return g, vids, vids[si], vids[di]


def _bfs_dists(vids, src, dst):
    """Dense all-pairs hop distances (−1 = unreachable)."""
    idx = {int(v): i for i, v in enumerate(vids)}
    n = len(vids)
    adj = [[] for _ in range(n)]
    for s, d in zip(src, dst):
        adj[idx[int(s)]].append(idx[int(d)])
        adj[idx[int(d)]].append(idx[int(s)])
    D = np.full((n, n), -1, dtype=np.int64)
    for s0 in range(n):
        D[s0, s0] = 0
        q = [s0]
        while q:
            nq = []
            for u in q:
                for w in adj[u]:
                    if D[s0, w] < 0:
                        D[s0, w] = D[s0, u] + 1
                        nq.append(w)
            q = nq
    return D


def _n_components(vids, src, dst):
    D = _bfs_dists(vids, src, dst)
    return len({tuple(np.flatnonzero(D[i] >= 0)) for i in range(len(vids))})


def test_random_spanning_forest_spans_and_varies_by_seed():
    g, vids, src, dst = _er_graph()
    n_cc = _n_components(vids, src, dst)
    und = set()
    for s, d in zip(src, dst):
        und.add((int(s), int(d)))
        und.add((int(d), int(s)))
    forests = []
    for seed in (11, 12):
        df = random_spanning_forest_edges(g, seed).to_pandas()
        a = df["a"].to_numpy().astype(np.uint64)
        b = df["b"].to_numpy().astype(np.uint64)
        # a spanning forest: V - #components edges, all graph edges
        assert len(df) == len(vids) - n_cc
        for x, y in zip(a, b):
            assert (int(x), int(y)) in und
        # acyclic + spanning: same component structure as the graph
        assert _n_components(vids, a, b) == n_cc
        forests.append(set(zip(a.tolist(), b.tolist())))
    assert forests[0] != forests[1]  # different seeds → different trees


def test_single_tree_graph_is_exact():
    """On a graph that IS a tree, the only spanning forest is the tree
    itself → the k=1 ensemble equals the dense exp-kernel matvec."""
    n = 50
    vids = hash_to_vid([f"tt{i}" for i in range(n)])
    rng = np.random.Generator(np.random.Philox(key=[41, 0]))
    parent = np.array([int(rng.integers(0, i)) for i in range(1, n)])
    src, dst = vids[1:], vids[parent]
    ds = rd.from_arrow(
        pa.table(
            {
                "src": pa.array(src, type=pa.uint64()),
                "dst": pa.array(dst, type=pa.uint64()),
            }
        )
    )
    g = build_graph(ds, EngineConfig(num_partitions=4), directed=False)
    xs = rng.uniform(0.5, 2.0, n)
    a = -0.6
    out, _ = tree_ensemble_kernel(
        g, make_vid_lookup(vids, xs), a, "/tmp/ega_te_exact", n_trees=1,
        num_partitions=4,
    )
    got = out.to_pandas().set_index("vid")["integral"]
    D = _bfs_dists(vids, src, dst)
    K = np.where(D >= 0, np.exp(a * np.maximum(D, 0)), 0.0)
    want = K @ xs
    got_arr = np.array([got[int(v)] for v in vids])
    np.testing.assert_allclose(got_arr, want, rtol=1e-8, atol=1e-10)


def test_ensemble_dominated_by_graph_kernel_and_distortion_band(tmp_path):
    """Per tree dist_T ≥ dist_G (tree edges ⊆ graph edges), so for
    a < 0, x > 0 the ensemble lower-bounds the dense graph-metric
    kernel matvec; and the tree-distance distortion stays in a modest
    band on a small ER fixture (subopt-ratio analogue)."""
    g, vids, src, dst = _er_graph(n=60, p=0.15, seed=9)
    D_G = _bfs_dists(vids, src, dst)
    rng = np.random.Generator(np.random.Philox(key=[5, 5]))
    xs = rng.uniform(0.5, 1.5, len(vids))
    a = -0.8
    out, _ = tree_ensemble_kernel(
        g, make_vid_lookup(vids, xs), a, str(tmp_path / "te"), n_trees=3,
        num_partitions=4,
    )
    got = out.to_pandas().set_index("vid")["integral"]
    K_G = np.where(D_G >= 0, np.exp(a * np.maximum(D_G, 0)), 0.0)
    dense = K_G @ xs
    got_arr = np.array([got[int(v)] for v in vids])
    assert (got_arr <= dense + 1e-9).all()
    assert (got_arr > 0).all()  # self-term survives in every tree

    # distortion band: mean over connected pairs of dist_T / dist_G
    ratios = []
    for seed_i in range(3):
        fdf = random_spanning_forest_edges(g, 42 + seed_i * 1000003).to_pandas()
        a_ = fdf["a"].to_numpy().astype(np.uint64)
        b_ = fdf["b"].to_numpy().astype(np.uint64)
        D_T = _bfs_dists(vids, a_, b_)
        same = (D_T > 0) & (D_G > 0)
        ratios.append(D_T[same] / D_G[same])
    r = np.concatenate(ratios)
    assert (r >= 1.0 - 1e-12).all()  # domination, pairwise
    assert r.mean() < 8.0  # loose O(log n)-flavored band for n=60
