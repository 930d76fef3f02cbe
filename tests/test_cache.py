"""Named graph cache: build-once semantics across session and disk."""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray.data as rd

from efficient_graph_algorithms_ray.config import EngineConfig
from efficient_graph_algorithms_ray.pipelines.graph_build import build_graph
from efficient_graph_algorithms_ray.state.cache import get_or_build_graph, invalidate
from efficient_graph_algorithms_ray.stages.hashing import hash_to_vid


def _build_counted(counter, n=30):
    vids = hash_to_vid([f"gc{i}" for i in range(n)])

    def _fn():
        counter.append(1)
        ds = rd.from_arrow(
            pa.table(
                {
                    "src": pa.array(vids[:-1], type=pa.uint64()),
                    "dst": pa.array(vids[1:], type=pa.uint64()),
                }
            )
        )
        return build_graph(ds, EngineConfig(num_partitions=4), directed=False)

    return _fn, vids


def test_get_or_build_graph_builds_once(tmp_path):
    calls = []
    fn, vids = _build_counted(calls)
    root = str(tmp_path / "cache")
    invalidate()
    g1 = get_or_build_graph("t1", fn, root)
    g2 = get_or_build_graph("t1", fn, root)  # session hit
    assert len(calls) == 1
    assert g2 is g1
    # new session simulation: drop refs, reload from the checkpoint
    invalidate("t1")
    g3 = get_or_build_graph("t1", fn, root)
    assert len(calls) == 1  # loaded from disk, not rebuilt
    assert g3.n_vertices == g1.n_vertices and g3.n_edges == g1.n_edges
    # refresh forces a rebuild
    g4 = get_or_build_graph("t1", fn, root, refresh=True)
    assert len(calls) == 2
    assert g4.n_vertices == g1.n_vertices
