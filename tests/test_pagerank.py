"""PageRank vs the dense random-walk-with-restart oracle (allclose 1e-6)."""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray.data as rd

from efficient_graph_algorithms_ray.config import EngineConfig
from efficient_graph_algorithms_ray.oracles.numpy_graph import pagerank_oracle
from efficient_graph_algorithms_ray.pipelines.graph_build import build_graph
from efficient_graph_algorithms_ray.pipelines.pagerank import pagerank, top_k_ranks
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


def _run_and_compare(src, dst, tmp_path, P=8, damping=0.85):
    g = build_graph(_edges_ds(src, dst), EngineConfig(num_partitions=P), directed=True)
    ranks, summary = pagerank(g, str(tmp_path / "pr"), damping=damping, tol=1e-6, max_iters=200)
    df = ranks.to_pandas().sort_values("vid").reset_index(drop=True)
    ovids, oranks = pagerank_oracle(src, dst, damping=damping, tol=1e-6, max_iters=200)
    assert np.array_equal(df["vid"].to_numpy().astype(np.uint64), ovids)
    assert np.allclose(df["rank"].to_numpy(), oranks, atol=1e-6)
    assert summary["converged"]
    assert abs(df["rank"].sum() - 1.0) < 1e-9  # probability mass conserved
    return df, summary


def test_pagerank_web_fixture(tmp_path, tiny_edges):
    src, dst = tiny_edges
    _run_and_compare(src, dst, tmp_path)


def test_pagerank_erdos_renyi(tmp_path):
    """Mirrors the reference kernel smoke fixture
    (/root/reference/test/test_graph_kernels.py:7: ER n=500 p=0.2 seed=42)
    at reduced size for test speed."""
    rng = np.random.Generator(np.random.Philox(key=[42, 0]))
    n = 120
    mask = rng.random((n, n)) < 0.2
    np.fill_diagonal(mask, False)
    si, di = np.nonzero(mask)
    names = [f"v{i}" for i in range(n)]
    vids = hash_to_vid(names)
    _run_and_compare(vids[si], vids[di], tmp_path, P=5)


def test_pagerank_star_hub_skew(tmp_path):
    """Star graph: 1 hub receives from 800 leaves — exercises the
    pre-aggregated (salt-equivalent) message path and dangling hub."""
    leaves = hash_to_vid([f"leaf{i}" for i in range(800)])
    hub = hash_to_vid(["hub"])[0]
    src = leaves
    dst = np.full(len(leaves), hub, dtype=np.uint64)
    df, summary = _run_and_compare(src, dst, tmp_path, P=8)
    hub_rank = df.loc[df["vid"].to_numpy().astype(np.uint64) == hub, "rank"].iloc[0]
    assert hub_rank > df["rank"].median() * 50  # hub dominates


def test_pagerank_fixed_iterations_matches_oracle(tmp_path, tiny_edges):
    """tol=0 + max_iters=k runs exactly k supersteps (SQL-oracle mode)."""
    src, dst = tiny_edges
    g = build_graph(_edges_ds(src, dst), EngineConfig(num_partitions=4), directed=True)
    ranks, summary = pagerank(g, str(tmp_path / "prk"), tol=0.0, max_iters=4)
    assert summary["iterations"] == 4
    df = ranks.to_pandas().sort_values("vid").reset_index(drop=True)
    ovids, oranks = pagerank_oracle(src, dst, tol=0.0, max_iters=4)
    assert np.allclose(df["rank"].to_numpy(), oranks, atol=1e-12)


def test_top_k(tmp_path, tiny_edges):
    src, dst = tiny_edges
    g = build_graph(_edges_ds(src, dst), EngineConfig(num_partitions=4), directed=True)
    ranks, _ = pagerank(g, str(tmp_path / "prt"), tol=1e-6)
    top = top_k_ranks(ranks, 10).to_pandas()
    assert len(top) == 10
    assert (np.diff(top["rank"].to_numpy()) <= 1e-18).all()


def test_multi_returns_exchange_identical(tmp_path):
    """Per-destination scatter objects (the multi-node exchange variant,
    GRAFT_MULTI_RETURNS) produce bit-identical ranks to the fused
    single-object exchange."""
    import numpy as np
    import pyarrow as pa
    import ray.data as rd

    from efficient_graph_algorithms_ray.config import EngineConfig
    from efficient_graph_algorithms_ray.pipelines.graph_build import build_graph
    from efficient_graph_algorithms_ray.state.superstep import run_supersteps, state_vertex_dataset

    rng = np.random.Generator(np.random.Philox(key=[3, 0]))
    src = rng.integers(0, 500, 4000).astype(np.uint64)
    dst = rng.integers(0, 500, 4000).astype(np.uint64)
    edges = rd.from_arrow(
        pa.table({"src": pa.array(src, type=pa.uint64()), "dst": pa.array(dst, type=pa.uint64())})
    )
    g = build_graph(edges, EngineConfig(num_partitions=8), directed=True)
    outs = []
    for flag, name in ((False, "fused"), (True, "multi")):
        s = run_supersteps(
            g, str(tmp_path / name), "sum",
            lambda csr: np.full(len(csr["vids"]), 1.0 / g.n_vertices),
            tol=1e-10, max_iters=30, multi_returns=flag,
        )
        df = (
            state_vertex_dataset(g, s["final_iter_dir"], "rank")
            .to_pandas()
            .sort_values("vid")
            .reset_index(drop=True)
        )
        outs.append(df)
    assert (outs[0]["vid"].to_numpy() == outs[1]["vid"].to_numpy()).all()
    assert (outs[0]["rank"].to_numpy() == outs[1]["rank"].to_numpy()).all()  # bit-identical


def test_warm_start_reaches_same_fixed_point_faster(tmp_path):
    from efficient_graph_algorithms_ray.pipelines.pagerank import (
        pagerank,
        pagerank_warm,
    )

    rng = np.random.default_rng(17)
    n = 120
    vids = (np.arange(n, dtype=np.uint64) + 1) * np.uint64(13)
    e1 = rng.integers(0, n, size=(500, 2))
    e1 = e1[e1[:, 0] != e1[:, 1]]
    e2 = rng.integers(0, n, size=(60, 2))
    e2 = e2[e2[:, 0] != e2[:, 1]]

    def _g(edges):
        ds = rd.from_arrow(
            pa.table(
                {
                    "src": pa.array(vids[edges[:, 0]], type=pa.uint64()),
                    "dst": pa.array(vids[edges[:, 1]], type=pa.uint64()),
                }
            )
        )
        return build_graph(ds, EngineConfig(num_partitions=4), directed=True)

    g_old = _g(e1)
    _, s_old = pagerank(g_old, str(tmp_path / "old"), tol=1e-10, max_iters=200)

    g_new = _g(np.vstack([e1, e2]))
    r_cold, s_cold = pagerank(g_new, str(tmp_path / "cold"), tol=1e-10, max_iters=200)
    r_warm, s_warm = pagerank_warm(
        g_new,
        str(tmp_path / "warm"),
        warm_graph=g_old,
        warm_final_dir=s_old["final_iter_dir"],
        tol=1e-10,
        max_iters=200,
    )
    dc = r_cold.to_pandas().set_index("vid")["rank"]
    dw = r_warm.to_pandas().set_index("vid")["rank"]
    assert np.allclose(dc.sort_index(), dw.sort_index(), atol=1e-8)
    # warm start must save supersteps on a small delta
    assert s_warm["iterations"] < s_cold["iterations"]
