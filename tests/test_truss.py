"""k-truss unit tests on hand-built graphs (dense semantics checks;
the SQL-oracle parity at fixture scale lives in test_oracle_parity)."""

import numpy as np
import pyarrow as pa
import pytest
import ray.data as rd

from efficient_graph_algorithms_ray.pipelines.truss import k_truss


def _edges_ds(pairs):
    u = np.array([p[0] for p in pairs], dtype=np.int64)
    v = np.array([p[1] for p in pairs], dtype=np.int64)
    return rd.from_arrow(pa.table({"src": u, "dst": v}))


def _result(ds):
    df = ds.to_pandas().sort_values(["u", "v"]).reset_index(drop=True)
    return {(int(r.u), int(r.v)): int(r.support) for r in df.itertuples()}


def test_clique_survives_with_full_support():
    # K5: every edge is in 3 triangles → survives 4-truss (support ≥ 2)
    pairs = [(a, b) for a in range(5) for b in range(a + 1, 5)]
    out = _result(k_truss(_edges_ds(pairs), k=4, rounds=2))
    assert set(out) == set(pairs)
    assert all(s == 3 for s in out.values())


def test_pendant_triangle_peels():
    # K4 on {0..3} plus a pendant triangle (3,4,5): the pendant
    # triangle's edges have support 1 < 2 → removed in round 1; K4
    # edges keep support 2 afterward.
    k4 = [(a, b) for a in range(4) for b in range(a + 1, 4)]
    pendant = [(3, 4), (3, 5), (4, 5)]
    out = _result(k_truss(_edges_ds(k4 + pendant), k=4, rounds=2))
    assert set(out) == set(k4)
    assert all(s == 2 for s in out.values())


def test_duplicate_and_reversed_edges_canonicalized():
    # same K4 arriving as duplicated / reversed rows → identical truss
    k4 = [(a, b) for a in range(4) for b in range(a + 1, 4)]
    noisy = k4 + [(b, a) for a, b in k4] + k4
    assert _result(k_truss(_edges_ds(noisy), k=4, rounds=2)) == _result(
        k_truss(_edges_ds(k4), k=4, rounds=2)
    )


def test_triangle_free_graph_empties():
    # a path has no triangles → every edge peels immediately
    path = [(i, i + 1) for i in range(6)]
    out = k_truss(_edges_ds(path), k=4, rounds=1).to_pandas()
    assert len(out) == 0


@pytest.mark.parametrize("parts", [2, 16])
def test_partition_count_invariance(parts):
    pairs = [(a, b) for a in range(5) for b in range(a + 1, 5)] + [
        (4, 5),
        (4, 6),
        (5, 6),
        (6, 7),
    ]
    out = _result(k_truss(_edges_ds(pairs), k=4, rounds=2, num_partitions=parts))
    ref = _result(k_truss(_edges_ds(pairs), k=4, rounds=2, num_partitions=4))
    assert out == ref
