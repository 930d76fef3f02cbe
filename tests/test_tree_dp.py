"""Two-pass tree DP (rooted BFS, subtree sums, top-down prefix) vs
recursive numpy oracles on random forests."""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray.data as rd

from efficient_graph_algorithms_ray.config import EngineConfig
from efficient_graph_algorithms_ray.pipelines.graph_build import build_graph
from efficient_graph_algorithms_ray.pipelines.tree_dp import (
    make_vid_lookup,
    rooted_bfs,
)
from tests.legacy_tree_dp import subtree_aggregate, topdown_prefix
from efficient_graph_algorithms_ray.stages.hashing import hash_to_vid


def _forest(n=90, n_trees=3, seed=17):
    """Random forest: each non-seed vertex attaches to a random earlier
    vertex of its tree — returns (graph, vids, undirected edge arrays)."""
    rng = np.random.Generator(np.random.Philox(key=[seed, 0]))
    vids = hash_to_vid([f"t{i}" for i in range(n)])
    tree_of = np.arange(n) % n_trees
    src, dst = [], []
    for i in range(n_trees, n):
        cands = np.flatnonzero(tree_of[:i] == tree_of[i])
        j = int(rng.choice(cands))
        src.append(vids[i])
        dst.append(vids[j])
    src, dst = np.array(src, dtype=np.uint64), np.array(dst, dtype=np.uint64)
    ds = rd.from_arrow(
        pa.table(
            {"src": pa.array(src, type=pa.uint64()), "dst": pa.array(dst, type=pa.uint64())}
        )
    )
    g = build_graph(ds, EngineConfig(num_partitions=4), directed=False)
    return g, vids, src, dst


def test_rooted_bfs_depths_and_parent_validity(tmp_path):
    g, vids, src, dst = _forest()
    out, summary = rooted_bfs(g, str(tmp_path / "bfs"))
    df = out.to_pandas()
    assert len(df) == len(vids)
    # trees: exactly n_trees roots, every non-root's parent is a real vertex
    roots = df[df["parent_id"] == df["own_id"]]
    assert len(roots) == 3
    assert (roots["depth"] == 0).all()
    id2row = df.set_index("own_id")
    nonroot = df[df["parent_id"] != df["own_id"]]
    pdepth = id2row.loc[nonroot["parent_id"], "depth"].to_numpy()
    assert (nonroot["depth"].to_numpy() == pdepth + 1).all()  # BFS property
    # parent is an actual neighbor
    und = set()
    for s, d in zip(src, dst):
        und.add((int(s), int(d)))
        und.add((int(d), int(s)))
    pvid = id2row.loc[nonroot["parent_id"], "vid"].to_numpy()
    for v, p in zip(nonroot["vid"], pvid):
        assert (int(v), int(p)) in und
    assert summary["converged"]


def test_two_pass_dp_matches_recursive_oracle(tmp_path):
    g, vids, src, dst = _forest(n=80, n_trees=2, seed=5)
    out, _ = rooted_bfs(g, str(tmp_path / "bfs"))
    pdf = out.to_pandas()

    rng = np.random.Generator(np.random.Philox(key=[77, 0]))
    x = rng.random(len(vids))
    x_lookup = make_vid_lookup(vids, x)

    sub, s1 = subtree_aggregate(g, pdf, x_lookup, str(tmp_path / "sub"))
    pre, s2 = topdown_prefix(g, pdf, x_lookup, str(tmp_path / "pre"))
    sub_df = sub.to_pandas().set_index("vid")
    pre_df = pre.to_pandas().set_index("vid")

    # recursive oracles over the BFS forest the engine itself produced
    # (parent correctness is covered by the structural test above);
    # arrays, not iterrows — pandas coerces uint64 vids to float there
    idx = {v: i for i, v in enumerate(vids)}
    vid_arr = pdf["vid"].to_numpy().astype(np.uint64)
    own_arr = pdf["own_id"].to_numpy()
    par_arr = pdf["parent_id"].to_numpy()
    dep_arr = pdf["depth"].to_numpy()
    id2vid = dict(zip(own_arr, vid_arr))
    par = np.arange(len(vids))
    for vv, pp in zip(vid_arr, par_arr):
        par[idx[vv]] = idx[id2vid[pp]]

    subtree = x.copy()
    for r in np.argsort(-dep_arr):
        vi = idx[vid_arr[r]]
        if par[vi] != vi:
            subtree[par[vi]] += subtree[vi]
    prefix = x.copy()
    for r in np.argsort(dep_arr):
        vi = idx[vid_arr[r]]
        if par[vi] != vi:
            prefix[vi] = prefix[par[vi]] + x[vi]

    for v in vids:
        assert np.isclose(sub_df.loc[v, "subtree_sum"], subtree[idx[v]], atol=1e-9)
        assert np.isclose(pre_df.loc[v, "prefix"], prefix[idx[v]], atol=1e-9)

    # root subtree sums = per-tree totals; leaves' prefixes end at x-sums
    roots = pdf[pdf["parent_id"] == pdf["own_id"]]["vid"]
    assert np.isclose(
        sum(sub_df.loc[r, "subtree_sum"] for r in roots), x.sum(), atol=1e-9
    )


def test_integrate_tree_field_matches_dense_exp_kernel(tmp_path):
    """y = exp(a·dist_T)·x via the two scaled DP passes ≡ the dense
    kernel matvec (reference TreeGFIntegrator semantics,
    /root/reference/src/ega/algorithms/trees.py:93-125)."""
    from tests.legacy_tree_dp import integrate_tree_field

    g, vids, src, dst = _forest(n=70, n_trees=2, seed=23)
    parents, _ = rooted_bfs(g, str(tmp_path / "bfs"))
    pdf = parents.to_pandas()

    rng = np.random.Generator(np.random.Philox(key=[99, 0]))
    xs = rng.uniform(0.5, 2.0, len(vids))
    x_lookup = make_vid_lookup(vids, xs)
    a = -0.7
    out, _ = integrate_tree_field(g, pdf, x_lookup, a, str(tmp_path / "tk"))
    got = out.to_pandas().set_index("vid")["integral"]

    # dense oracle: BFS tree distances per component, K = exp(a·dist)
    idx = {int(v): i for i, v in enumerate(vids)}
    n = len(vids)
    adj = [[] for _ in range(n)]
    for s, d in zip(src, dst):
        adj[idx[int(s)]].append(idx[int(d)])
        adj[idx[int(d)]].append(idx[int(s)])
    K = np.zeros((n, n))
    for s0 in range(n):
        dist = np.full(n, -1)
        dist[s0] = 0
        q = [s0]
        while q:
            u = q.pop()
            for w in adj[u]:
                if dist[w] < 0:
                    dist[w] = dist[u] + 1
                    q.append(w)
        reach = dist >= 0
        K[s0, reach] = np.exp(a * dist[reach])
    want = K @ xs
    got_arr = np.array([got[int(v)] for v in vids])
    np.testing.assert_allclose(got_arr, want, rtol=1e-8, atol=1e-10)


def test_dataset_native_tree_dp_matches_pandas_api(tmp_path):
    """subtree_aggregate_g / topdown_prefix_g / integrate_tree_field_g
    (aligned-sibling-shard path, no driver forest table) ≡ the
    pandas-API passes on the same oriented forest."""
    import pandas as pd
    import pyarrow as pa

    from efficient_graph_algorithms_ray.pipelines.tree_dp import (
        forest_graphs,
        integrate_tree_field_g,
        subtree_aggregate_g,
        topdown_prefix_g,
    )
    from tests.legacy_tree_dp import (
        integrate_tree_field,
        subtree_aggregate,
        topdown_prefix,
    )

    g, vids, src, dst = _forest(n=80, n_trees=3, seed=29)
    parents, _ = rooted_bfs(g, str(tmp_path / "bfs"))
    pdf = parents.to_pandas()

    # oriented forest edges (child → parent) + root self rows, straight
    # from the BFS orientation so both APIs run the SAME forest
    # numpy arrays, NOT iterrows — pandas iterrows coerces uint64 vids
    # to float64 and silently corrupts them
    vv = pdf["vid"].to_numpy().astype(np.uint64)
    own = pdf["own_id"].to_numpy().astype(np.int64)
    par = pdf["parent_id"].to_numpy().astype(np.int64)
    own2vid = dict(zip(own.tolist(), vv.tolist()))
    child, parent = [], []
    for v, o, pid in zip(vv.tolist(), own.tolist(), par.tolist()):
        child.append(v)
        parent.append(v if pid == o else own2vid[pid])
    edges = rd.from_arrow(
        pa.table(
            {
                "src": pa.array(np.array(child, dtype=np.uint64), type=pa.uint64()),
                "dst": pa.array(np.array(parent, dtype=np.uint64), type=pa.uint64()),
            }
        )
    )
    g_up, g_down = forest_graphs(edges, num_partitions=4)

    rng = np.random.Generator(np.random.Philox(key=[71, 0]))
    xs = rng.uniform(0.5, 2.0, len(vids))
    xl = make_vid_lookup(vids, xs)

    a1 = subtree_aggregate(g, pdf, xl, str(tmp_path / "p_up"))[0].to_pandas()
    a2 = subtree_aggregate_g(g_up, g_down, xl, str(tmp_path / "g_up"))[0].to_pandas()
    m = pd.merge(a1, a2, on="vid", suffixes=("_p", "_g"))
    assert len(m) == len(vids)
    np.testing.assert_allclose(m["subtree_sum_p"], m["subtree_sum_g"], rtol=1e-12)

    b1 = topdown_prefix(g, pdf, xl, str(tmp_path / "p_dn"))[0].to_pandas()
    b2 = topdown_prefix_g(g_up, g_down, xl, str(tmp_path / "g_dn"))[0].to_pandas()
    m = pd.merge(b1, b2, on="vid", suffixes=("_p", "_g"))
    np.testing.assert_allclose(m["prefix_p"], m["prefix_g"], rtol=1e-12)

    c1 = integrate_tree_field(g, pdf, xl, -0.6, str(tmp_path / "p_tk"))[0].to_pandas()
    c2 = integrate_tree_field_g(g_up, g_down, xl, -0.6, str(tmp_path / "g_tk"))[0].to_pandas()
    m = pd.merge(c1, c2, on="vid", suffixes=("_p", "_g"))
    np.testing.assert_allclose(m["integral_p"], m["integral_g"], rtol=1e-10)
