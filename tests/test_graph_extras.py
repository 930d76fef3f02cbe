"""Invariant tests for the round-3 extras: effective resistance,
triangle enumeration / clique percolation, n-gram novelty, centroid
drift. (Exact-parity vs DuckDB is covered by test_oracle_parity.)"""

import numpy as np
import pyarrow as pa
import pytest

SF = "/root/testdata/sf0.001"


def _und_edges():
    import duckdb

    con = duckdb.connect()
    con.sql(
        f"CREATE VIEW lineitem AS SELECT * FROM read_parquet('{SF}/lineitem.parquet')"
    )
    return con.sql(
        """SELECT DISTINCT a.l_partkey u, b.l_partkey v
           FROM lineitem a JOIN lineitem b
           ON a.l_orderkey=b.l_orderkey AND a.l_partkey<b.l_partkey"""
    ).df()


def test_effective_resistance_matches_dense_jacobi(ray_session):
    from efficient_graph_algorithms_ray.pipelines.relational import (
        q_effective_resistance_coocc,
    )

    out = q_effective_resistance_coocc(SF, k=12).to_pandas()
    e = _und_edges()
    n = int(max(e.u.max(), e.v.max())) + 1
    A = np.zeros((n, n))
    A[e.u, e.v] = 1.0
    A[e.v, e.u] = 1.0
    d = A.sum(axis=1)
    b = np.zeros(n)
    b[2] = 1.0
    x = np.zeros(n)
    present = d > 0
    for _ in range(12):
        x = np.divide(b + A @ x, d, out=np.zeros(n), where=present)
        x[1] = 0.0
    got = out.set_index("vid")["pot_r9"]
    for vid in got.index:
        assert abs(got[vid] - round(x[vid], 9)) < 2e-9
    # potential landscape sanity: source carries the max potential
    assert got.idxmax() == 2 and got[1] == 0.0


def test_triangle_triples_consistent_with_counts(ray_session):
    from efficient_graph_algorithms_ray.pipelines.relational import _coocc_graph
    from efficient_graph_algorithms_ray.pipelines.triangles import (
        total_triangles,
        triangle_count,
        triangle_triples,
    )

    g = _coocc_graph(SF)
    tri = triangle_triples(g).to_pandas()
    # each exactly once, strictly sorted
    assert (tri.x < tri.y).all() and (tri.y < tri.z).all()
    assert not tri.duplicated().any()
    total = total_triangles(triangle_count(g))
    assert len(tri) == total
    # per-vertex incidence matches the counting pipeline
    cnt = triangle_count(g).to_pandas().set_index("vid")["triangles"]
    inc = (
        tri.melt(value_vars=["x", "y", "z"])["value"]
        .value_counts()
        .reindex(cnt.index, fill_value=0)
    )
    assert (inc.values == cnt.values).all()


def test_ngram_novelty_bounds(ray_session):
    from efficient_graph_algorithms_ray.pipelines.corpus import q_ngram_novelty_docs

    out = q_ngram_novelty_docs(SF).to_pandas()
    assert (out.n_first_seen <= out.n_shingles).all()
    assert ((out.novelty_r6 >= 0) & (out.novelty_r6 <= 1)).all()
    # the first doc's shingles are all first-seen by construction
    first = out.loc[out.doc_id == out.doc_id.min()].iloc[0]
    assert first.n_first_seen == first.n_shingles


def test_label_centroid_drift_self_consistency(ray_session):
    from efficient_graph_algorithms_ray.functions.similarity import (
        label_centroid_drift,
    )
    import ray.data as rd

    # two identical labels → identical centroids → cos == each other
    rng = np.random.default_rng(7)
    vecs = rng.normal(size=(40, 64)).astype(np.float32)
    tbl = pa.table(
        {
            "vec_id": pa.array(np.arange(80, dtype=np.int64)),
            "embedding": pa.array(
                list(np.vstack([vecs, vecs])), type=pa.list_(pa.float32())
            ),
            "label": pa.array(
                np.repeat([0, 1], 40).astype(np.int32), type=pa.int32()
            ),
        }
    )
    out = label_centroid_drift(rd.from_arrow(tbl)).to_pandas()
    assert len(out) == 2
    assert out.cos_r6.iloc[0] == out.cos_r6.iloc[1]
    assert (out.n_vecs == 40).all()


def test_onion_k_equals_coreness_at_removal(ray_session):
    from efficient_graph_algorithms_ray.pipelines.relational import (
        _coocc_graph,
        q_onion_layers_coocc,
    )
    from efficient_graph_algorithms_ray.pipelines.kcore import coreness

    onion = q_onion_layers_coocc(SF, rounds=200).to_pandas()  # run to exhaustion
    assert (onion.layer != -1).all()
    core, _ = coreness(_coocc_graph(SF), "/tmp/ega_test_onion_core", cap=256)
    cd = core.to_pandas().set_index("vid")["coreness"]
    od = onion.set_index("vid")["k"]
    assert (od.sort_index().values == cd.sort_index().values).all()
    # layers are contiguous from 1
    ls = np.sort(onion.layer.unique())
    assert ls[0] == 1 and (np.diff(ls) == 1).all()


def test_ann_recall_bounds_and_exhaustive_probe(ray_session):
    import ray.data as rd
    from efficient_graph_algorithms_ray.functions.similarity import ann_recall_at_k

    emb = rd.read_parquet(f"{SF}/embeddings.parquet")
    out = ann_recall_at_k(emb, query_ids=[0, 7, 42], k=5, nprobe=2).to_pandas()
    assert ((out.n_hits >= 0) & (out.n_hits <= 5)).all()
    # probing every cluster degrades to exact brute force -> recall 1
    full = ann_recall_at_k(emb, query_ids=[0, 7, 42], k=5, nprobe=16).to_pandas()
    assert (full.n_hits == 5).all() and (full.recall_r6 == 1.0).all()
