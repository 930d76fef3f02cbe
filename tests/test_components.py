"""Connected components & label propagation — exact-match vs oracles."""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray.data as rd

from efficient_graph_algorithms_ray.config import EngineConfig, UNLABELED
from efficient_graph_algorithms_ray.oracles.numpy_graph import (
    components_oracle,
    label_prop_oracle,
)
from efficient_graph_algorithms_ray.pipelines.components import (
    connected_components,
    label_propagation,
)
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


def _cc(src, dst, tmp_path, P=8):
    g = build_graph(_edges_ds(src, dst), EngineConfig(num_partitions=P), directed=False)
    comp, summary = connected_components(g, str(tmp_path / "cc"))
    df = comp.to_pandas().sort_values("vid").reset_index(drop=True)
    ovids, ocomp = components_oracle(src, dst)
    assert np.array_equal(df["vid"].to_numpy().astype(np.uint64), ovids)
    assert np.array_equal(df["component"].to_numpy().astype(np.uint64), ocomp)
    return df, summary


def test_cc_web_fixture(tmp_path, tiny_edges):
    src, dst = tiny_edges
    _cc(src, dst, tmp_path)


def test_cc_two_cliques_and_chain(tmp_path):
    """Two disjoint cliques + a chain (FIXTURES.md F5 edge-case shape)."""
    a = hash_to_vid([f"a{i}" for i in range(8)])
    b = hash_to_vid([f"b{i}" for i in range(6)])
    c = hash_to_vid([f"c{i}" for i in range(10)])
    srcs, dsts = [], []
    for grp in (a, b):
        for i in range(len(grp)):
            for j in range(i + 1, len(grp)):
                srcs.append(grp[i])
                dsts.append(grp[j])
    for i in range(len(c) - 1):
        srcs.append(c[i])
        dsts.append(c[i + 1])
    src = np.array(srcs, dtype=np.uint64)
    dst = np.array(dsts, dtype=np.uint64)
    df, summary = _cc(src, dst, tmp_path, P=4)
    assert df.set_index(df["vid"].astype(np.uint64))["component"].nunique() == 3


def test_label_propagation_seeded(tmp_path, tiny_edges):
    src, dst = tiny_edges
    g = build_graph(_edges_ds(src, dst), EngineConfig(num_partitions=8), directed=False)
    # two seed labels on arbitrary distinct vertices
    vids_all = np.unique(np.concatenate([src, dst]))
    seeds = {int(vids_all[0]): 7, int(vids_all[len(vids_all) // 2]): 9}
    labels, summary = label_propagation(g, str(tmp_path / "lp"), seeds)
    df = labels.to_pandas().sort_values("vid").reset_index(drop=True)
    ovids, olabels = label_prop_oracle(src, dst, seeds)
    assert np.array_equal(df["vid"].to_numpy().astype(np.uint64), ovids)
    assert np.array_equal(df["label"].to_numpy().astype(np.uint64), olabels)
    # at least the seeded components got labeled
    assert (df["label"].to_numpy().astype(np.uint64) != UNLABELED).any()


def test_percolation_semantics_tiny(tmp_path):
    """Filtered-threshold CC: components split as weak edges drop."""
    from ray.data.aggregate import Count, Max, Sum

    from efficient_graph_algorithms_ray.pipelines.components import (
        connected_components,
    )

    # two triangles joined by a weight-1 bridge; intra edges weight 3
    vids = np.array([1, 2, 3, 10, 20, 30], dtype=np.uint64)
    heavy = [(1, 2), (2, 3), (1, 3), (10, 20), (20, 30), (10, 30)]
    for t, expect_nc in ((1, 1), (2, 2)):
        rows_u, rows_v = [], []
        for u, v in heavy:
            rows_u.append(u)
            rows_v.append(v)
        if t <= 1:
            rows_u.append(3)
            rows_v.append(10)
        ds = rd.from_arrow(
            pa.table(
                {
                    "src": pa.array(np.array(rows_u, dtype=np.uint64), type=pa.uint64()),
                    "dst": pa.array(np.array(rows_v, dtype=np.uint64), type=pa.uint64()),
                }
            )
        )
        g = build_graph(ds, EngineConfig(num_partitions=2), directed=False)
        comp, _ = connected_components(g, str(tmp_path / f"p{t}"), max_iters=16)
        sizes = comp.groupby("component").aggregate(Count(alias_name="n"))
        stats = sizes.aggregate(
            Count(alias_name="nc"), Max("n", alias_name="big"), Sum("n", alias_name="nv")
        )
        assert int(stats["nc"]) == expect_nc
        assert int(stats["big"]) == (6 if t == 1 else 3)


def test_warm_cc_matches_cold_after_edge_additions(tmp_path):
    """Warm-start CC on graph+bridge converges to the cold answer and
    needs no more rounds than cold."""
    import numpy as np
    import pyarrow as pa
    import ray.data as rd

    from efficient_graph_algorithms_ray.config import EngineConfig
    from efficient_graph_algorithms_ray.pipelines.components import (
        connected_components,
        connected_components_warm,
    )
    from efficient_graph_algorithms_ray.pipelines.graph_build import build_graph

    def _edges(pairs):
        s, d = zip(*pairs)
        return rd.from_arrow(
            pa.table(
                {
                    "src": pa.array(np.array(s, dtype=np.uint64), type=pa.uint64()),
                    "dst": pa.array(np.array(d, dtype=np.uint64), type=pa.uint64()),
                }
            )
        )

    # two paths (1-2-3-4) and (10-11-12-13); delta adds the bridge 4-10
    old_pairs = [(1, 2), (2, 3), (3, 4), (10, 11), (11, 12), (12, 13)]
    new_pairs = old_pairs + [(4, 10)]
    g_old = build_graph(_edges(old_pairs), EngineConfig(num_partitions=4), directed=False)
    _, s_old = connected_components(g_old, str(tmp_path / "old"))

    g_new = build_graph(_edges(new_pairs), EngineConfig(num_partitions=4), directed=False)
    comp_cold, s_cold = connected_components(g_new, str(tmp_path / "cold"))
    comp_warm, s_warm = connected_components_warm(
        g_new,
        str(tmp_path / "warm"),
        warm_graph=g_old,
        warm_final_dir=s_old["final_iter_dir"],
    )
    cold = comp_cold.to_pandas().sort_values("vid").reset_index(drop=True)
    warm = comp_warm.to_pandas().sort_values("vid").reset_index(drop=True)
    assert (cold["vid"] == warm["vid"]).all()
    assert (cold["component"] == warm["component"]).all()
    assert (warm["component"].astype(np.uint64) == 1).all()  # one merged comp, min vid 1
    assert s_warm["iterations"] <= s_cold["iterations"]
