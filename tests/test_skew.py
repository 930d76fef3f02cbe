"""Hub-skew handling: the exchange volume to a hub is bounded by the
worker count (built-in two-level aggregation), not by its in-degree."""

from __future__ import annotations

import json
import os

import numpy as np
import pyarrow as pa
import ray.data as rd

from efficient_graph_algorithms_ray.config import EngineConfig
from efficient_graph_algorithms_ray.oracles.numpy_graph import pagerank_oracle
from efficient_graph_algorithms_ray.pipelines.graph_build import build_graph
from efficient_graph_algorithms_ray.pipelines.pagerank import pagerank
from efficient_graph_algorithms_ray.stages.hashing import hash_to_vid


def _star(n_leaves):
    leaves = hash_to_vid([f"leaf{i}" for i in range(n_leaves)])
    hub = hash_to_vid(["hub"])[0]
    return leaves, np.full(n_leaves, hub, dtype=np.uint64), hub


def test_hub_message_volume_bounded_by_workers(tmp_path):
    """20k leaves → 1 hub. Pre-aggregation means each worker sends ONE
    partial to the hub per superstep: total exchange ≈ W·16 bytes, not
    in_degree·16 bytes. Verified via the manifests' msg_bytes."""
    src, dst, hub = _star(20_000)
    g = build_graph(
        rd.from_arrow(
            pa.table(
                {
                    "src": pa.array(src, type=pa.uint64()),
                    "dst": pa.array(dst, type=pa.uint64()),
                }
            )
        ),
        EngineConfig(num_partitions=8),
        directed=True,
    )
    ckpt = str(tmp_path / "star")
    ranks, s = pagerank(g, ckpt, tol=1e-6, max_iters=200)
    assert s["converged"]
    with open(os.path.join(ckpt, f"iter_{2:05d}.json")) as f:
        m = json.load(f)
    # naive volume would be ≥ 20k dst entries × 16B = 320 KB; the
    # pre-aggregated exchange is a few hundred bytes (≤ W partials +
    # the leaves' own zero-in-degree rows never messaged)
    assert m["metrics"]["msg_bytes"] < 4096, m["metrics"]["msg_bytes"]
    # and correctness still exact vs the dense oracle
    df = ranks.to_pandas().sort_values("vid").reset_index(drop=True)
    ovids, oranks = pagerank_oracle(src, dst, tol=1e-6, max_iters=200)
    assert np.allclose(df["rank"].to_numpy(), oranks, atol=1e-6)


def test_hub_component_and_rounds(tmp_path):
    """CC over the star converges in O(1) rounds regardless of degree."""
    from efficient_graph_algorithms_ray.pipelines.components import (
        connected_components,
    )

    src, dst, hub = _star(5_000)
    g = build_graph(
        rd.from_arrow(
            pa.table(
                {
                    "src": pa.array(src, type=pa.uint64()),
                    "dst": pa.array(dst, type=pa.uint64()),
                }
            )
        ),
        EngineConfig(num_partitions=8),
        directed=False,
    )
    comp, s = connected_components(g, str(tmp_path / "cc"))
    assert s["iterations"] <= 3
    df = comp.to_pandas()
    assert df["component"].nunique() == 1
