"""Checkpoint/resume: kill-and-restart reproduces identical output
(north-rule requirement — per-partition lineage + metrics)."""

from __future__ import annotations

import json
import os
import shutil

import numpy as np
import pyarrow as pa
import ray.data as rd

from efficient_graph_algorithms_ray.config import EngineConfig
from efficient_graph_algorithms_ray.pipelines.graph_build import build_graph
from efficient_graph_algorithms_ray.pipelines.pagerank import pagerank
from efficient_graph_algorithms_ray.state.superstep import find_last_complete


def _edges_ds(src, dst):
    return rd.from_arrow(
        pa.table(
            {
                "src": pa.array(src, type=pa.uint64()),
                "dst": pa.array(dst, type=pa.uint64()),
            }
        )
    )


def test_resume_reproduces_identical_ranks(tmp_path, tiny_edges):
    src, dst = tiny_edges
    g = build_graph(_edges_ds(src, dst), EngineConfig(num_partitions=6), directed=True)
    ckpt = str(tmp_path / "pr")
    ranks, s = pagerank(g, ckpt, tol=1e-6, max_iters=100)
    final = (
        ranks.to_pandas().sort_values("vid").reset_index(drop=True)["rank"].to_numpy()
    )
    n_iters = s["iterations"]
    assert find_last_complete(ckpt) == n_iters

    # simulate a crash: drop the last 3 completed iterations
    for k in range(n_iters, n_iters - 3, -1):
        shutil.rmtree(os.path.join(ckpt, f"iter_{k:05d}"))
        os.remove(os.path.join(ckpt, f"iter_{k:05d}.json"))
    assert find_last_complete(ckpt) == n_iters - 3

    ranks2, s2 = pagerank(g, ckpt, tol=1e-6, max_iters=100, resume=True)
    final2 = (
        ranks2.to_pandas().sort_values("vid").reset_index(drop=True)["rank"].to_numpy()
    )
    assert s2["iterations"] == n_iters
    assert np.array_equal(final, final2)  # bit-identical at same pool size


def test_manifest_carries_lineage_and_metrics(tmp_path, tiny_edges):
    src, dst = tiny_edges
    g = build_graph(_edges_ds(src, dst), EngineConfig(num_partitions=6), directed=True)
    ckpt = str(tmp_path / "pr2")
    _, s = pagerank(g, ckpt, tol=1e-6, max_iters=100)
    with open(os.path.join(ckpt, f"iter_{s['iterations']:05d}.json")) as f:
        m = json.load(f)
    assert sorted(m["parts"]) == g.parts  # per-partition lineage complete
    for key in ("seconds", "delta_inf", "edges_per_sec", "dangling"):
        assert key in m["metrics"]
    # every iteration directory holds one parquet per partition
    for k in range(s["iterations"] + 1):
        files = os.listdir(os.path.join(ckpt, f"iter_{k:05d}"))
        assert len([f for f in files if f.endswith(".parquet")]) == len(g.parts)
