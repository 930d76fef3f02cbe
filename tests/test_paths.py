"""Weighted shortest-path forest vs a bit-identical dense Bellman–Ford
replica (same quantized integer arithmetic)."""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray.data as rd

from efficient_graph_algorithms_ray.config import EngineConfig, UNLABELED
from efficient_graph_algorithms_ray.pipelines.graph_build import build_graph
from efficient_graph_algorithms_ray.pipelines.paths import shortest_path_forest
from efficient_graph_algorithms_ray.stages.hashing import hash_to_vid


def _weighted_graph(n=70, p=0.08, seed=3, with_island=True):
    rng = np.random.Generator(np.random.Philox(key=[seed, 0]))
    vids = hash_to_vid([f"p{i}" for i in range(n)])
    iu, ju = np.triu_indices(n - (3 if with_island else 0), 1)
    keep = rng.random(len(iu)) < p
    si, di = iu[keep], ju[keep]
    w = np.round(rng.random(len(si)) * 3 + 0.25, 3)
    if with_island:  # a 3-vertex triangle with no source in it
        si = np.concatenate([si, [n - 3, n - 2, n - 1]])
        di = np.concatenate([di, [n - 2, n - 1, n - 3]])
        w = np.concatenate([w, [1.0, 1.0, 1.0]])
    ds = rd.from_arrow(
        pa.table(
            {
                "src": pa.array(vids[si], type=pa.uint64()),
                "dst": pa.array(vids[di], type=pa.uint64()),
                "w": pa.array(w, type=pa.float64()),
            }
        )
    )
    g = build_graph(ds, EngineConfig(num_partitions=4), directed=False)
    return g, vids, si, di, w


def _replica(df, vids, si, di, w, sources, scale):
    """Fixpoint of the engine's exact message arithmetic."""
    vid_arr = df["vid"].to_numpy().astype(np.uint64)
    vid_sorted = vid_arr[np.argsort(vid_arr)]
    pos = {v: i for i, v in enumerate(vid_sorted)}
    n = len(vid_sorted)
    own_sorted = df.sort_values("vid")["own_id"].to_numpy().astype(np.uint64)
    INF = np.uint64(1 << 30)
    dist = np.full(n, int(INF), dtype=np.uint64)
    for s in sources:
        dist[pos[s]] = 0
    enc = (dist << np.uint64(32)) | own_sorted
    q = np.maximum(np.rint(w * scale), 1).astype(np.uint64)
    edges = [(pos[vids[a]], pos[vids[b]], qq) for a, b, qq in zip(si, di, q)]
    while True:
        new = enc.copy()
        for a, b, qq in edges:
            for u, v in ((a, b), (b, a)):
                du = enc[u] >> np.uint64(32)
                if du < INF:
                    cand = ((du << np.uint64(32)) | own_sorted[u]) + (qq << np.uint64(32))
                    if cand < new[v]:
                        new[v] = cand
        if (new == enc).all():
            return enc
        enc = new


def test_sssp_matches_dense_replica(tmp_path):
    g, vids, si, di, w = _weighted_graph()
    sources = np.sort(vids[:3].astype(np.uint64))
    scale = 1 << 16
    out, summary = shortest_path_forest(
        g, sources, str(tmp_path / "sssp"), scale=scale
    )
    df = out.to_pandas()
    enc = _replica(df, vids, si, di, w, sources, scale)

    got = df.sort_values("vid").reset_index(drop=True)
    got_dq = got["dist_q"].to_numpy()
    got_par = got["parent_id"].to_numpy()
    exp_dq = (enc >> np.uint64(32)).astype(np.int64)
    exp_par = (enc & np.uint64(0xFFFFFFFF)).astype(np.int64)
    reached = exp_dq < (1 << 30)
    assert (got["reached"].to_numpy() == reached).all()
    assert (got_dq[reached] == exp_dq[reached]).all()
    assert (got_par[reached] == exp_par[reached]).all()
    # island: unreached, dist −1/inf, parent self
    assert (~reached).sum() == 3
    assert (got_dq[~reached] == -1).all()
    assert np.isinf(got.loc[~reached, "dist"]).all()
    assert (got.loc[~reached, "parent_id"].to_numpy() == got.loc[~reached, "own_id"].to_numpy()).all()
    # sources at distance 0, parent self
    for s in sources:
        row = got[got["vid"] == s].iloc[0]
        assert row["dist_q"] == 0 and row["parent_id"] == row["own_id"]
    assert summary["converged"]


def test_sssp_unweighted_equals_hop_bfs(tmp_path):
    g, vids, si, di, w = _weighted_graph(with_island=False)
    # rebuild WITHOUT weights → unit edge length
    ds = rd.from_arrow(
        pa.table(
            {
                "src": pa.array(vids[si], type=pa.uint64()),
                "dst": pa.array(vids[di], type=pa.uint64()),
            }
        )
    )
    g = build_graph(ds, EngineConfig(num_partitions=4), directed=False)
    src0 = np.array([min(vids[np.unique(np.concatenate([si, di]))])], dtype=np.uint64)
    scale = 1 << 16
    out, _ = shortest_path_forest(g, src0, str(tmp_path / "bfsd"), scale=scale)
    df = out.to_pandas()
    # numpy hop BFS
    uvids = np.unique(np.concatenate([vids[si], vids[di]]))
    pos = {v: i for i, v in enumerate(uvids)}
    adj = {i: set() for i in range(len(uvids))}
    for a, b in zip(vids[si], vids[di]):
        adj[pos[a]].add(pos[b])
        adj[pos[b]].add(pos[a])
    hops = np.full(len(uvids), -1)
    frontier = [pos[src0[0]]]
    hops[frontier[0]] = 0
    d = 0
    while frontier:
        nxt = [v for u in frontier for v in adj[u] if hops[v] == -1]
        nxt = sorted(set(nxt))
        d += 1
        for v in nxt:
            hops[v] = d
        frontier = nxt
    got = df.set_index("vid")
    for v in uvids:
        expect = hops[pos[v]] * scale if hops[pos[v]] >= 0 else -1
        assert got.loc[v, "dist_q"] == expect


def test_distance_buckets_consistent_with_forest(tmp_path):
    """Bucket histogram == integer recount of the SSSP forest output."""
    import numpy as np
    import pyarrow as pa
    import ray.data as rd

    from efficient_graph_algorithms_ray.config import EngineConfig
    from efficient_graph_algorithms_ray.pipelines.graph_build import build_graph
    from efficient_graph_algorithms_ray.pipelines.paths import (
        distance_bucket_aggregate,
        shortest_path_forest,
    )

    rng = np.random.Generator(np.random.Philox(key=[31, 0]))
    src = rng.integers(0, 80, 400).astype(np.uint64)
    dst = rng.integers(0, 80, 400).astype(np.uint64)
    w = rng.uniform(0.1, 2.0, 400)
    keep = src != dst
    edges = rd.from_arrow(
        pa.table(
            {
                "src": pa.array(src[keep], type=pa.uint64()),
                "dst": pa.array(dst[keep], type=pa.uint64()),
                "w": pa.array(w[keep], type=pa.float64()),
            }
        )
    )
    g = build_graph(edges, EngineConfig(num_partitions=4), directed=False)
    sources = np.array([0, 1], dtype=np.uint64)
    unit_q = 1 << 14
    agg, _ = distance_bucket_aggregate(
        g, sources, str(tmp_path / "b"), unit_q=unit_q
    )
    got = agg.to_pandas().set_index("bucket")["n"].to_dict()
    forest, _ = shortest_path_forest(g, sources, str(tmp_path / "f"))
    df = forest.to_pandas()
    import collections

    want = collections.Counter(
        int(dq) // unit_q if dq >= 0 else -1 for dq in df["dist_q"]
    )
    assert got == dict(want)
    assert sum(got.values()) == g.n_vertices


def test_diameter_double_sweep_path_graph():
    """Double sweep on a path graph finds the true diameter."""
    import pyarrow as pa  # noqa: F811

    from efficient_graph_algorithms_ray.pipelines import relational as R

    # path 1-2-3-4-5-6 (+ a branch 3-7): diameter = 5 (1..6)
    edges = [(1, 2), (2, 3), (3, 4), (4, 5), (5, 6), (3, 7)]
    u = np.array([e[0] for e in edges], dtype=np.uint64)
    v = np.array([e[1] for e in edges], dtype=np.uint64)
    ds = rd.from_arrow(pa.table({"src": pa.array(u), "dst": pa.array(v)}))
    g = build_graph(ds, EngineConfig(num_partitions=4), directed=False)
    import tempfile

    out1, _ = shortest_path_forest(
        g, np.array([3], dtype=np.uint64), tempfile.mkdtemp(dir="/tmp"), scale=1
    )
    ecc, far = R._bfs_argmax(out1)
    assert ecc == 3 and far == 6  # only vid 6 is at dist 3 from seed 3
    out2, _ = shortest_path_forest(
        g, np.array([far], dtype=np.uint64), tempfile.mkdtemp(dir="/tmp"), scale=1
    )
    diam, far2 = R._bfs_argmax(out2)
    assert diam == 5 and far2 == 1  # the sweep from 6 reaches 1 at dist 5


def test_widest_path_dense_replica():
    """Max-min semiring supersteps ≡ dense bottleneck Floyd-ish replica."""
    import tempfile

    from efficient_graph_algorithms_ray.pipelines.paths import widest_path_forest

    rng = np.random.Generator(np.random.Philox(key=[7, 0]))
    n = 50
    iu, ju = np.triu_indices(n, 1)
    keep = rng.random(len(iu)) < 0.08
    si, di = iu[keep] + 1, ju[keep] + 1
    w = rng.integers(1, 40, len(si)).astype(np.float64)
    ds = rd.from_arrow(
        pa.table(
            {
                "src": pa.array(si.astype(np.uint64)),
                "dst": pa.array(di.astype(np.uint64)),
                "w": pa.array(w),
            }
        )
    )
    g = build_graph(ds, EngineConfig(num_partitions=4), directed=False)
    sources = np.array([1], dtype=np.uint64)
    out, s = widest_path_forest(g, sources, tempfile.mkdtemp(dir="/tmp"), max_iters=60)
    got = out.to_pandas().set_index("vid")["width"]

    # dense replica: repeated max-min relaxation to fixpoint
    ids = sorted(set(si) | set(di))
    pos = {x: i for i, x in enumerate(ids)}
    C = np.zeros((len(ids), len(ids)))
    for a, b, ww in zip(si, di, w):
        C[pos[a], pos[b]] = C[pos[b], pos[a]] = max(C[pos[a], pos[b]], ww)
    cap = np.zeros(len(ids))
    cap[pos[1]] = 1e18
    for _ in range(len(ids)):
        nxt = np.maximum(cap, np.max(np.minimum(cap[:, None], C), axis=0))
        if (nxt == cap).all():
            break
        cap = nxt
    for x in ids:
        assert got[x] == cap[pos[x]], (x, got[x], cap[pos[x]])


def test_landmark_bounds_sandwich_true_distance(tmp_path):
    """Landmark triangle-inequality bounds: d_lb <= d(u,v) <= d_ub on a
    small random connected graph, exact at pairs adjacent to a
    landmark's shortest path."""
    rng = np.random.default_rng(11)
    n = 40
    vids = (np.arange(n, dtype=np.uint64) + 1) * np.uint64(7)
    # ring + random chords -> connected
    si = np.arange(n)
    di = (np.arange(n) + 1) % n
    extra = rng.integers(0, n, size=(30, 2))
    extra = extra[extra[:, 0] != extra[:, 1]]
    si = np.concatenate([si, extra[:, 0]])
    di = np.concatenate([di, extra[:, 1]])
    ds = rd.from_arrow(
        pa.table(
            {
                "src": pa.array(vids[si], type=pa.uint64()),
                "dst": pa.array(vids[di], type=pa.uint64()),
            }
        )
    )
    g = build_graph(ds, EngineConfig(num_partitions=4), directed=False)

    # exact all-hops BFS per vertex (numpy oracle)
    adj = {i: set() for i in range(n)}
    for a, b in zip(si, di):
        adj[a].add(b)
        adj[b].add(a)

    def bfs(s):
        hops = np.full(n, -1)
        hops[s] = 0
        frontier = [s]
        d = 0
        while frontier:
            nxt = sorted({v for u in frontier for v in adj[u] if hops[v] == -1})
            d += 1
            for v in nxt:
                hops[v] = d
            frontier = nxt
        return hops

    landmarks = [0, 5, 13]
    lmk_hops = {L: bfs(L) for L in landmarks}
    dist = {}
    for L in landmarks:
        out, _ = shortest_path_forest(
            g, np.array([vids[L]], dtype=np.uint64), str(tmp_path / f"l{L}"), scale=1
        )
        for r in out.to_pandas().itertuples():
            dist[(L, int(r.vid))] = int(r.dist_q)
        # engine BFS == oracle BFS
        for i in range(n):
            assert dist[(L, int(vids[i]))] == lmk_hops[L][i]

    pairs = [(2, 30), (7, 22), (11, 39), (1, 20)]
    for a, b in pairs:
        true_d = bfs(a)[b]
        ub = min(dist[(L, int(vids[a]))] + dist[(L, int(vids[b]))] for L in landmarks)
        lb = max(abs(dist[(L, int(vids[a]))] - dist[(L, int(vids[b]))]) for L in landmarks)
        assert lb <= true_d <= ub
