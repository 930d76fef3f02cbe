"""Graph build: CSR shards vs DuckDB/NumPy relational oracles."""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray
import ray.data as rd

from efficient_graph_algorithms_ray.config import EngineConfig
from efficient_graph_algorithms_ray.oracles.numpy_graph import dedup_edges
from efficient_graph_algorithms_ray.pipelines.graph_build import build_graph
from efficient_graph_algorithms_ray.stages.hashing import hash_to_vid


def _edges_ds(src, dst):
    return rd.from_arrow(
        pa.table(
            {
                "src": pa.array(src, type=pa.uint64()),
                "dst": pa.array(dst, type=pa.uint64()),
            }
        )
    )


def test_csr_dedup_and_degrees(tiny_edges):
    src, dst = tiny_edges
    cfg = EngineConfig(num_partitions=8)
    g = build_graph(_edges_ds(src, dst), cfg, directed=True)

    osrc, odst = dedup_edges(src, dst)
    vids_expected = np.unique(np.concatenate([osrc, odst]))
    assert g.n_vertices == len(vids_expected)
    assert g.n_edges == len(osrc)

    # per-vertex out-degree matches a numpy groupby
    deg_df = g.vertex_dataset().to_pandas().sort_values("vid").reset_index(drop=True)
    odeg = np.zeros(len(vids_expected), dtype=np.int64)
    np.add.at(odeg, np.searchsorted(vids_expected, osrc), 1)
    assert np.array_equal(deg_df["vid"].to_numpy().astype(np.uint64), vids_expected)
    assert np.array_equal(deg_df["deg"].to_numpy(), odeg)

    # every vertex homed in its own partition; vids sorted; indices in-bounds
    for p in g.parts:
        csr = ray.get(g.refs[p])
        assert np.all(csr["vids"] % np.uint64(cfg.num_partitions) == np.uint64(p))
        assert np.all(np.diff(csr["vids"].astype(np.uint64)) > 0)
        assert len(csr["indices"]) == csr["indptr"][-1]


def test_symmetrized_graph_has_both_directions():
    src = hash_to_vid(["a", "b", "c"])
    dst = hash_to_vid(["b", "c", "a"])
    cfg = EngineConfig(num_partitions=4)
    g = build_graph(_edges_ds(src, dst), cfg, directed=False)
    assert g.n_vertices == 3
    assert g.n_edges == 6  # each undirected edge stored in both endpoint rows


def test_graph_save_load(tmp_path, tiny_edges):
    src, dst = tiny_edges
    cfg = EngineConfig(num_partitions=4)
    g = build_graph(_edges_ds(src, dst), cfg, directed=True)
    g.save(str(tmp_path / "graph"))
    g2 = type(g).load(str(tmp_path / "graph"))
    assert g2.n_vertices == g.n_vertices and g2.n_edges == g.n_edges
    for p in g.parts:
        a, b = ray.get(g.refs[p]), ray.get(g2.refs[p])
        for k in ("vids", "indptr", "indices"):
            assert np.array_equal(a[k], b[k])


def test_vid_hash_process_deterministic():
    """vid hash must be stable across worker processes (polars seeded hash)."""
    import subprocess
    import sys

    code = (
        "from efficient_graph_algorithms_ray.stages.hashing import hash_to_vid;"
        "print(list(hash_to_vid(['https://site0.example/p/0','x'])))"
    )
    outs = {
        subprocess.run(
            [sys.executable, "-c", code], capture_output=True, text=True, cwd="/root/repo"
        ).stdout
        for _ in range(2)
    }
    assert len(outs) == 1 and "[" in outs.pop()


def test_backbone_topk_rank_logic():
    """Per-u top-k rank computation (lexsort + running start trick) vs
    pandas groupby rank on random weighted rows."""
    import numpy as np
    import pandas as pd

    rng = np.random.default_rng(3)
    n = 500
    u = rng.integers(0, 20, n).astype(np.uint64)
    v = rng.permutation(np.arange(n)).astype(np.uint64)  # unique -> no tie ambiguity
    w = rng.integers(1, 9, n).astype(np.int64)
    o = np.lexsort((v, -w, u))
    us, vs, ws = u[o], v[o], w[o]
    new = np.concatenate(([True], us[1:] != us[:-1]))
    idx = np.arange(len(us))
    start = np.maximum.accumulate(np.where(new, idx, 0))
    rk = idx - start + 1
    df = pd.DataFrame({"u": us, "v": vs, "w": ws, "rk": rk})
    for uu, grp in df.groupby("u"):
        expect = grp.sort_values(["w", "v"], ascending=[False, True])
        assert list(expect["rk"]) == list(range(1, len(grp) + 1))
        k5 = set(map(tuple, expect[expect["rk"] <= 5][["v", "w"]].to_numpy()))
        top5 = grp.sort_values(["w", "v"], ascending=[False, True]).head(5)
        assert k5 == set(map(tuple, top5[["v", "w"]].to_numpy()))
