"""Property-based tests (hypothesis): on arbitrary small random graphs
the engine must agree with the dense oracles."""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray.data as rd
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from efficient_graph_algorithms_ray.config import EngineConfig
from efficient_graph_algorithms_ray.oracles.numpy_graph import (
    components_oracle,
    pagerank_oracle,
    triangles_oracle,
)
from efficient_graph_algorithms_ray.pipelines.components import connected_components
from efficient_graph_algorithms_ray.pipelines.graph_build import build_graph
from efficient_graph_algorithms_ray.pipelines.pagerank import pagerank
from efficient_graph_algorithms_ray.pipelines.triangles import triangle_count
from efficient_graph_algorithms_ray.stages.hashing import hash_to_vid

_VIDS = hash_to_vid([f"pv{i}" for i in range(24)])

edge_lists = st.lists(
    st.tuples(st.integers(0, 23), st.integers(0, 23)),
    min_size=1,
    max_size=60,
)


def _ds(pairs):
    src = np.array([_VIDS[a] for a, b in pairs], dtype=np.uint64)
    dst = np.array([_VIDS[b] for a, b in pairs], dtype=np.uint64)
    return (
        rd.from_arrow(
            pa.table(
                {
                    "src": pa.array(src, type=pa.uint64()),
                    "dst": pa.array(dst, type=pa.uint64()),
                }
            )
        ),
        src,
        dst,
    )


@settings(max_examples=8, deadline=None, suppress_health_check=list(HealthCheck))
@given(pairs=edge_lists)
def test_pagerank_agrees_with_oracle_on_random_graphs(pairs, tmp_path_factory):
    ds, src, dst = _ds(pairs)  # self-loop-only graphs included on purpose
    g = build_graph(ds, EngineConfig(num_partitions=3), directed=True)
    ranks, _ = pagerank(
        g, str(tmp_path_factory.mktemp("prop_pr")), tol=1e-9, max_iters=300
    )
    df = ranks.to_pandas().sort_values("vid").reset_index(drop=True)
    ovids, oranks = pagerank_oracle(src, dst, tol=1e-9, max_iters=300)
    assert np.array_equal(df["vid"].to_numpy().astype(np.uint64), ovids)
    assert np.allclose(df["rank"].to_numpy(), oranks, atol=1e-8)


@settings(max_examples=8, deadline=None, suppress_health_check=list(HealthCheck))
@given(pairs=edge_lists)
def test_cc_and_triangles_agree_on_random_graphs(pairs, tmp_path_factory):
    ds, src, dst = _ds(pairs)
    g = build_graph(ds, EngineConfig(num_partitions=3), directed=False)
    comp, _ = connected_components(g, str(tmp_path_factory.mktemp("prop_cc")))
    cdf = comp.to_pandas().sort_values("vid").reset_index(drop=True)
    ovids, ocomp = components_oracle(src, dst)
    assert np.array_equal(cdf["component"].to_numpy().astype(np.uint64), ocomp)

    tdf = triangle_count(g).to_pandas().sort_values("vid").reset_index(drop=True)
    tvids, otri = triangles_oracle(src, dst)
    assert np.array_equal(tdf["vid"].to_numpy().astype(np.uint64), tvids)
    assert np.array_equal(tdf["triangles"].to_numpy().astype(np.int64), otri)
