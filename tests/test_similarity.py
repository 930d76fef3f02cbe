"""Similarity search vs dense numpy oracles on the embeddings table."""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import ray.data as rd

from efficient_graph_algorithms_ray.functions.similarity import (
    ann_lsh_pairs,
    embedding_norms,
    knn_brute_force,
    knn_ivf,
)

SF_DIR = "/root/testdata/sf0.001"


def _load():
    tbl = pq.read_table(f"{SF_DIR}/embeddings.parquet")
    ids = tbl.column("vec_id").to_numpy()
    mat = np.vstack(tbl.column("embedding").to_pylist()).astype(np.float64)
    return tbl, ids, mat


def _cosine_matrix(mat):
    n = mat / np.maximum(np.linalg.norm(mat, axis=1, keepdims=True), 1e-30)
    return n @ n.T


def test_knn_matches_dense_oracle():
    tbl, ids, mat = _load()
    sims = _cosine_matrix(mat)
    for q in [0, 7, 42]:
        out = (
            knn_brute_force(rd.from_arrow(tbl), query_ids=[q], k=5)
            .to_pandas()
            .sort_values(["cosine", "vec_id"], ascending=[False, True])
        )
        qi = int(np.flatnonzero(ids == q)[0])
        col = sims[qi].copy()
        col[qi] = -np.inf
        # oracle top-5 with the same (cosine desc, vec_id asc) tie-break
        order = np.lexsort((ids, -col))[:5]
        assert list(out["vec_id"]) == list(ids[order])
        assert np.allclose(out["cosine"].to_numpy(), col[order], atol=1e-12)


def test_ann_lsh_pairs_are_truly_similar():
    tbl, ids, mat = _load()
    # inject true near-duplicates (random vectors alone have cosine ≈ 0)
    rng = np.random.Generator(np.random.Philox(key=[9, 0]))
    dups, dup_ids = [], []
    for j, src in enumerate([0, 7, 42]):
        si = int(np.flatnonzero(ids == src)[0])
        dups.append(mat[si] + rng.standard_normal(mat.shape[1]) * 0.02)
        dup_ids.append(9000 + j)
    aug = pa.table(
        {
            "vec_id": pa.array(
                np.concatenate([ids, np.array(dup_ids)]), type=tbl.schema.field("vec_id").type
            ),
            "embedding": pa.array(
                tbl.column("embedding").to_pylist()
                + [list(map(float, d)) for d in dups],
                type=tbl.schema.field("embedding").type,
            ),
        }
    )
    all_mat = np.vstack([mat, np.vstack(dups)])
    all_ids = np.concatenate([ids, np.array(dup_ids)])
    sims = _cosine_matrix(all_mat)
    pairs = ann_lsh_pairs(rd.from_arrow(aug), threshold=0.9, n_bits=8).to_pandas()
    found = {tuple(sorted((int(a), int(b)))) for a, b in zip(pairs["vec_a"], pairs["vec_b"])}
    assert {(0, 9000), (7, 9001), (42, 9002)} <= found  # recall on planted dups
    for a, b, c in zip(pairs["vec_a"], pairs["vec_b"], pairs["cosine"]):
        ia, ib = int(np.flatnonzero(all_ids == a)[0]), int(np.flatnonzero(all_ids == b)[0])
        assert sims[ia, ib] >= 0.9  # no false positives (exact verify inside bucket)


def test_ivf_full_probe_equals_brute_force():
    """nprobe == n_clusters partitions the corpus without pruning any
    candidate, so IVF must reproduce brute force exactly (ids + values)."""
    tbl, _, _ = _load()
    qs = [0, 7, 42]
    brute = (
        knn_brute_force(rd.from_arrow(tbl), query_ids=qs, k=5)
        .to_pandas()
        .sort_values(["query_id", "cosine", "vec_id"], ascending=[True, False, True])
        .reset_index(drop=True)
    )
    ivf = (
        knn_ivf(rd.from_arrow(tbl), query_ids=qs, k=5, n_clusters=8, nprobe=8)
        .to_pandas()
        .sort_values(["query_id", "cosine", "vec_id"], ascending=[True, False, True])
        .reset_index(drop=True)
    )
    assert list(ivf["query_id"]) == list(brute["query_id"])
    assert list(ivf["vec_id"]) == list(brute["vec_id"])
    assert np.allclose(ivf["cosine"], brute["cosine"], atol=1e-12)


def test_ivf_nprobe1_finds_planted_duplicate():
    """A near-identical planted duplicate lands in the query's own
    cluster, so even nprobe=1 must surface it as the top neighbor."""
    tbl, ids, mat = _load()
    rng = np.random.Generator(np.random.Philox(key=[11, 0]))
    si = int(np.flatnonzero(ids == 7)[0])
    dup = mat[si] + rng.standard_normal(mat.shape[1]) * 0.01
    aug = pa.table(
        {
            "vec_id": pa.array(
                np.concatenate([ids, [9100]]), type=tbl.schema.field("vec_id").type
            ),
            "embedding": pa.array(
                tbl.column("embedding").to_pylist() + [list(map(float, dup))],
                type=tbl.schema.field("embedding").type,
            ),
        }
    )
    out = (
        knn_ivf(rd.from_arrow(aug), query_ids=[7], k=5, n_clusters=8, nprobe=1)
        .to_pandas()
        .sort_values("cosine", ascending=False)
    )
    assert int(out.iloc[0]["vec_id"]) == 9100
    assert out.iloc[0]["cosine"] > 0.99


def test_embedding_norms_match_numpy():
    tbl, ids, mat = _load()
    out = embedding_norms(rd.from_arrow(tbl)).to_pandas().sort_values("vec_id")
    expect = np.round(np.linalg.norm(mat, axis=1), 5)
    order = np.argsort(ids)
    assert np.allclose(out["norm_r5"].to_numpy(), expect[order], atol=0)


def _pq_numpy_replica(mat, ids, m, n_codes, q_idx, k):
    """Pure-numpy replay of the iters=0 PQ path (anchor codebooks,
    argmin-L2 codes, ADC LUT scoring) for exact comparison."""
    from efficient_graph_algorithms_ray.config import HASH_SEED
    from efficient_graph_algorithms_ray.sources.edges_synth import _splitmix64

    mix = np.uint64(HASH_SEED * 0x9E3779B97F4A7C15 & 0xFFFFFFFFFFFFFFFF)
    h = _splitmix64(ids.astype(np.uint64) ^ mix)
    order = np.argsort(h, kind="stable")
    nrm = mat / np.maximum(np.linalg.norm(mat, axis=1, keepdims=True), 1e-30)
    x = nrm[order]
    sub = mat.shape[1] // m
    books = np.stack([x[:n_codes, j * sub : (j + 1) * sub] for j in range(m)])
    codes = np.empty((len(mat), m), dtype=np.int64)
    for j in range(m):
        d2 = ((nrm[:, None, j * sub : (j + 1) * sub] - books[j][None]) ** 2).sum(-1)
        codes[:, j] = np.argmin(d2, axis=1)
    q = nrm[q_idx]
    score = np.zeros(len(mat))
    for j in range(m):
        lut = q[j * sub : (j + 1) * sub] @ books[j].T
        score += lut[codes[:, j]]
    score[q_idx] = -np.inf
    top = np.lexsort((ids, -score))[:k]
    return ids[top], score[top]


def test_pq_adc_matches_numpy_replica():
    from efficient_graph_algorithms_ray.functions.similarity import (
        pq_adc_topk,
        pq_train_codebooks,
    )

    tbl, ids, mat = _load()
    books = pq_train_codebooks(rd.from_arrow(tbl), m=8, n_codes=16, iters=0)
    for q in [0, 7, 42]:
        out = (
            pq_adc_topk(rd.from_arrow(tbl), books, query_ids=[q], k=5)
            .to_pandas()
            .sort_values(["adc", "vec_id"], ascending=[False, True])
        )
        qi = int(np.flatnonzero(ids == q)[0])
        ref_ids, ref_scores = _pq_numpy_replica(mat, ids, 8, 16, qi, 5)
        assert list(out["vec_id"]) == list(ref_ids)
        assert np.allclose(out["adc"].to_numpy(), ref_scores, atol=1e-12)


def test_pq_anchor_rows_code_to_themselves():
    from efficient_graph_algorithms_ray.functions.similarity import (
        pq_encode,
        pq_train_codebooks,
    )
    from efficient_graph_algorithms_ray.sources.edges_synth import _splitmix64
    from efficient_graph_algorithms_ray.config import HASH_SEED

    tbl, ids, mat = _load()
    books = pq_train_codebooks(rd.from_arrow(tbl), m=8, n_codes=16, iters=0)
    codes = pq_encode(rd.from_arrow(tbl), books).to_pandas()
    mix = np.uint64(HASH_SEED * 0x9E3779B97F4A7C15 & 0xFFFFFFFFFFFFFFFF)
    h = _splitmix64(ids.astype(np.uint64) ^ mix)
    anchor_ids = ids[np.argsort(h, kind="stable")[:16]]
    by_id = {int(r.vec_id): list(r.codes) for r in codes.itertuples()}
    for c, aid in enumerate(anchor_ids):
        assert by_id[int(aid)] == [c] * 8  # own subvector is distance 0


def test_pq_lloyd_finds_planted_duplicate():
    from efficient_graph_algorithms_ray.functions.similarity import (
        pq_adc_topk,
        pq_train_codebooks,
    )

    tbl, ids, mat = _load()
    rng = np.random.Generator(np.random.Philox(key=[13, 0]))
    si = int(np.flatnonzero(ids == 7)[0])
    dup = mat[si] + rng.standard_normal(mat.shape[1]) * 0.01
    aug = pa.table(
        {
            "vec_id": pa.array(
                np.concatenate([ids, [9200]]), type=tbl.schema.field("vec_id").type
            ),
            "embedding": pa.array(
                tbl.column("embedding").to_pylist() + [list(map(float, dup))],
                type=tbl.schema.field("embedding").type,
            ),
        }
    )
    ds = rd.from_arrow(aug)
    books = pq_train_codebooks(ds, m=8, n_codes=16, iters=5)
    out = (
        pq_adc_topk(ds, books, query_ids=[7], k=5)
        .to_pandas()
        .sort_values("adc", ascending=False)
    )
    # the near-duplicate shares every code with the query -> top ADC
    assert int(out.iloc[0]["vec_id"]) == 9200


def test_semantic_dedup_marks_planted_near_dups():
    from efficient_graph_algorithms_ray.functions.similarity import (
        _normalize,
        anchor_centroids,
        semantic_dedup,
    )

    rng = np.random.default_rng(5)
    base = rng.normal(size=(40, 16))
    # plant: vec 100 is a tiny perturbation of vec 3; vec 101 of vec 7
    ids = list(range(40)) + [100, 101]
    vecs = np.vstack([base, base[3] + 1e-3, base[7] - 1e-3])
    tbl = pa.table(
        {
            "vec_id": pa.array(ids, type=pa.int64()),
            "embedding": pa.array([list(map(float, v)) for v in vecs]),
        }
    )
    ds = rd.from_arrow(tbl)
    out = (
        semantic_dedup(ds, n_clusters=4, threshold=0.95)
        .to_pandas()
        .set_index("vec_id")
        .sort_index()
    )
    assert len(out) == 42
    # planted dups share a cluster with their source (cosine ~1 -> same argmax)
    assert not out.loc[100, "keep"] and out.loc[100, "dup_of"] == 3
    assert not out.loc[101, "keep"] and out.loc[101, "dup_of"] == 7
    # brute-force check of the keep rule within each cluster
    x = _normalize(vecs)
    cent = anchor_centroids(ds, n_clusters=4)
    assign = np.argmax(x @ cent.T, axis=1)
    id_arr = np.array(ids)
    for i, vid in enumerate(ids):
        earlier = [
            j
            for j in range(len(ids))
            if id_arr[j] < vid and assign[j] == assign[i] and x[i] @ x[j] >= 0.95
        ]
        assert out.loc[vid, "keep"] == (len(earlier) == 0)
        if earlier:
            assert out.loc[vid, "dup_of"] == id_arr[earlier].min()


def test_pca_project_matches_numpy_oracle():
    from efficient_graph_algorithms_ray.functions.similarity import pca_project

    rng = np.random.default_rng(12)
    # anisotropic cloud: PCA must find the stretched axes
    n, d = 200, 8
    basis = rng.normal(size=(d, d))
    scales = np.array([10, 5, 1, 0.5, 0.2, 0.1, 0.05, 0.01])
    m = rng.normal(size=(n, d)) * scales @ basis
    tbl = pa.table(
        {
            "vec_id": pa.array(range(n), type=pa.int64()),
            "embedding": pa.array([list(map(float, r)) for r in m]),
        }
    )
    out = pca_project(rd.from_arrow(tbl), n_components=3).to_pandas()
    got = np.array([r for r in out.sort_values("vec_id")["pc"]])

    mu = m.mean(axis=0)
    cov = (m.T @ m) / n - np.outer(mu, mu)
    w, v = np.linalg.eigh(cov)
    comps = v[:, ::-1][:, :3]
    for j in range(3):
        i = np.argmax(np.abs(comps[:, j]))
        if comps[i, j] < 0:
            comps[:, j] = -comps[:, j]
    want = (m - mu) @ comps
    assert np.allclose(got, want, atol=1e-9)
    # variance ordering: pc1 variance >= pc2 >= pc3
    var = got.var(axis=0)
    assert var[0] >= var[1] >= var[2]


def test_int8_quantize_bruteforce():
    from efficient_graph_algorithms_ray.functions.similarity import (
        int8_quantize_report,
    )

    rng = np.random.default_rng(13)
    m = rng.normal(size=(50, 6))
    tbl = pa.table(
        {
            "vec_id": pa.array(range(50), type=pa.int64()),
            "embedding": pa.array([list(map(float, r)) for r in m]),
        }
    )
    out = (
        int8_quantize_report(rd.from_arrow(tbl))
        .to_pandas()
        .sort_values("vec_id")
        .reset_index(drop=True)
    )
    s = np.abs(m).max(axis=0)
    q = np.clip(np.round(m / s * 127.0), -127, 127)
    err = np.sqrt(((m - q * s / 127.0) ** 2).sum(axis=1))
    assert np.array_equal(out["q_norm1"].to_numpy(), np.abs(q).sum(axis=1).astype(np.int64))
    assert np.allclose(out["err_r6"].to_numpy(), np.round(err, 6))
    # max quantization error per dim bounded by scale/254 per coordinate
    assert (np.abs(m - q * s / 127.0) <= s / 254 + 1e-12).all()


def test_truncated_overlap_full_dims_is_k():
    """With dims = full dimension, truncated retrieval is identical ->
    overlap == k; with planted prefix-identical vectors the truncated
    pass ranks them top."""
    from efficient_graph_algorithms_ray.functions.similarity import (
        truncated_dim_overlap,
    )

    rng = np.random.default_rng(21)
    n, d = 60, 8
    m = rng.normal(size=(n, d))
    tbl = pa.table(
        {
            "vec_id": pa.array(range(n), type=pa.int64()),
            "embedding": pa.array([list(map(float, r)) for r in m]),
        }
    )
    ds = rd.from_arrow(tbl)
    out = truncated_dim_overlap(ds, query_ids=[0, 5], k=4, dims=d).to_pandas()
    assert (out["overlap_at_k"] == 4).all()
