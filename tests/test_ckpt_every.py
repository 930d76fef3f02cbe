"""ckpt_every (sparse checkpoint cadence) and max-plus edge_shift:
unit coverage for the round-3 superstep-engine additions."""

from __future__ import annotations

import os

import numpy as np
import pyarrow as pa
import ray.data as rd

from efficient_graph_algorithms_ray.config import EngineConfig
from efficient_graph_algorithms_ray.pipelines.graph_build import build_graph
from efficient_graph_algorithms_ray.pipelines.pagerank import pagerank
from efficient_graph_algorithms_ray.state.superstep import (
    find_last_complete,
    run_supersteps,
    state_vertex_dataset,
)


def _edges_ds(src, dst):
    return rd.from_arrow(
        pa.table(
            {
                "src": pa.array(src, type=pa.uint64()),
                "dst": pa.array(dst, type=pa.uint64()),
            }
        )
    )


def _chain_dag(n=40):
    """Path DAG 1→2→…→n plus a few shortcuts: longest path into vertex
    k is k-1, exactly known."""
    src = list(range(1, n)) + [1, 5]
    dst = list(range(2, n + 1)) + [3, 9]
    return np.array(src, dtype=np.uint64), np.array(dst, dtype=np.uint64)


def test_ckpt_every_identical_final_state(tmp_path, tiny_edges):
    src, dst = tiny_edges
    g = build_graph(_edges_ds(src, dst), EngineConfig(num_partitions=6), directed=True)
    dense, sd = pagerank(g, str(tmp_path / "d"), tol=1e-6, max_iters=100)
    sparse, ss = pagerank(
        g, str(tmp_path / "s"), tol=1e-6, max_iters=100, ckpt_every=7
    )
    a = dense.to_pandas().sort_values("vid")["rank"].to_numpy()
    b = sparse.to_pandas().sort_values("vid")["rank"].to_numpy()
    assert sd["iterations"] == ss["iterations"]
    assert np.array_equal(a, b)  # state evolution is write-independent
    # cadence: sparse run wrote only multiples of 7 plus the final iter
    n = ss["iterations"]
    written = sorted(
        int(p.split("_")[1].split(".")[0])
        for p in os.listdir(tmp_path / "s")
        if p.endswith(".json")
    )
    assert written[-1] == n  # final flush always lands
    assert all(k % 7 == 0 or k in (0, n) for k in written)
    assert find_last_complete(str(tmp_path / "s")) == n


def test_ckpt_every_resume_from_sparse_checkpoint(tmp_path, tiny_edges):
    src, dst = tiny_edges
    g = build_graph(_edges_ds(src, dst), EngineConfig(num_partitions=6), directed=True)
    ckpt = str(tmp_path / "r")
    ranks, s = pagerank(g, ckpt, tol=1e-6, max_iters=100, ckpt_every=7)
    final = ranks.to_pandas().sort_values("vid")["rank"].to_numpy()
    n = s["iterations"]
    # crash after the final flush is lost: drop the last checkpoint;
    # resume restarts from the last surviving multiple-of-7 and must
    # reconverge to the identical fixpoint
    os.remove(os.path.join(ckpt, f"iter_{n:05d}.json"))
    import shutil

    shutil.rmtree(os.path.join(ckpt, f"iter_{n:05d}"))
    assert find_last_complete(ckpt) < n
    ranks2, s2 = pagerank(g, ckpt, tol=1e-6, max_iters=100, resume=True, ckpt_every=7)
    final2 = ranks2.to_pandas().sort_values("vid")["rank"].to_numpy()
    assert s2["iterations"] == n
    assert np.array_equal(final, final2)


def test_max_plus_edge_shift_longest_path(tmp_path):
    src, dst = _chain_dag(40)
    g = build_graph(_edges_ds(src, dst), EngineConfig(num_partitions=4), directed=True)

    def init_fn(csr):
        return np.zeros(len(csr["vids"]), dtype=np.float64)

    def edge_shift_fn(w_perm, csr):
        return np.ones(len(csr["indices"]), dtype=np.uint64)

    s = run_supersteps(
        g,
        str(tmp_path / "lvl"),
        "max",
        init_fn,
        tol=0.0,
        max_iters=100,
        edge_shift_fn=edge_shift_fn,
        ckpt_every=16,
    )
    assert s["converged"]
    lev = (
        state_vertex_dataset(g, s["final_iter_dir"], "level")
        .to_pandas()
        .sort_values("vid")
        .reset_index(drop=True)
    )
    # path graph: longest path into vertex k is exactly k-1 (shortcuts
    # 1→3 and 5→9 are strictly shorter than the chain, so no change)
    assert np.array_equal(
        lev["level"].to_numpy().astype(np.int64),
        lev["vid"].to_numpy().astype(np.int64) - 1,
    )
