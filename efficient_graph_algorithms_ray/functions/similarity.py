"""Similarity search over an embedding column (list<float>).

Two paths, per the task spec:

- ``knn_brute_force``: exact cosine top-k — query matrix broadcast
  once via ``ray.put``, each corpus batch does one float32 matmul and
  emits its local top-k per query (partial top-k = the combiner
  pre-aggregation pattern), then one small ``groupby(query_id)``
  merge. Scales as O(N·Q·d) compute with O(Q·k) shuffle volume.
- ``ann_lsh``: random-hyperplane LSH — b-bit signatures bucket the
  corpus; queries probe their own bucket (plus multi-probe neighbors
  at distance 1) and verify exact cosine inside. The scale path when
  Q·N matmuls are too expensive.
- ``knn_ivf``: inverted-file ANN — spherical k-means centroids trained
  on a bounded sample (driver), broadcast once; each corpus batch
  scores its vectors only against the queries probing that vector's
  cluster. ``nprobe == n_clusters`` degrades to exact brute force
  (the test oracle).

Reference analogue: batched multi-source projections
(``get_projections_batch``, /root/reference/src/ega/algorithms/
graph_kernels.py:521-557) and argsort ranking (``get_ranking``,
graph_kernels.py:559-585).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray

from ..config import HASH_SEED


def _embedding_matrix(batch: pa.Table) -> tuple[np.ndarray, np.ndarray]:
    """(vec_ids, float64 matrix) from (vec_id, embedding list<float>) batch."""
    from ..util import list_rows

    ids = batch.column("vec_id").to_numpy(zero_copy_only=False)
    rows = list_rows(batch, "embedding")
    mat = np.vstack(rows).astype(np.float64) if rows else np.empty((0, 0))
    return ids, mat


def _normalize(mat: np.ndarray) -> np.ndarray:
    norms = np.linalg.norm(mat, axis=1, keepdims=True)
    return mat / np.maximum(norms, 1e-30)


def _fetch_query_vectors(embeddings_ds, query_ids) -> tuple[np.ndarray, np.ndarray]:
    """(sorted query ids, their vectors) via a DISTRIBUTED filter —
    the scan runs in tasks; only the Q matching rows reach the driver."""
    import pyarrow.compute as pc

    qset = sorted(set(int(q) for q in query_ids))
    value_set = pa.array(qset, type=pa.int64())

    def _flt(b: pa.Table) -> pa.Table:
        return b.filter(pc.is_in(b.column("vec_id"), value_set=value_set))

    qtbl = pa.concat_tables(
        embeddings_ds.map_batches(_flt, batch_format="pyarrow").iter_batches(
            batch_size=None, batch_format="pyarrow"
        )
    )
    q_ids, q_mat = _embedding_matrix(qtbl)
    if len(q_ids) < len(qset):
        raise ValueError(
            f"query vec_ids not found in embeddings: {sorted(set(qset) - set(map(int, q_ids)))}"
        )
    order = np.argsort(q_ids)
    return q_ids[order], q_mat[order]


def knn_brute_force(embeddings_ds, query_ids: list[int], k: int = 5):
    """Exact cosine top-k neighbors for each query vector.

    Returns Dataset (query_id, vec_id, cosine) — k rows per query,
    self-matches excluded, ties broken by lower vec_id (deterministic).
    """
    q_ids, q_mat = _fetch_query_vectors(embeddings_ds, query_ids)
    q_mat = _normalize(q_mat)
    q_ref = ray.put((q_ids, q_mat))

    def _partial(batch: pa.Table) -> pa.Table:
        qids, qmat = ray.get(q_ref)
        ids, mat = _embedding_matrix(batch)
        if len(ids) == 0:
            return pa.table(
                {
                    "query_id": pa.array([], type=pa.int64()),
                    "vec_id": pa.array([], type=pa.int64()),
                    "cosine": pa.array([], type=pa.float64()),
                }
            )
        sims = _normalize(mat) @ qmat.T  # (batch, Q)
        out_q, out_v, out_c = [], [], []
        for j, qid in enumerate(qids):
            col = sims[:, j]
            mask = ids != qid  # exclude self
            cand_ids, cand = ids[mask], col[mask]
            top = min(len(cand), max(k, 64))  # local partial top ≥ k (ties margin)
            sel = np.argpartition(-cand, top - 1)[:top] if top else np.empty(0, np.int64)
            out_q.append(np.full(len(sel), qid, dtype=np.int64))
            out_v.append(cand_ids[sel].astype(np.int64))
            out_c.append(cand[sel])
        return pa.table(
            {
                "query_id": pa.array(np.concatenate(out_q), type=pa.int64()),
                "vec_id": pa.array(np.concatenate(out_v), type=pa.int64()),
                "cosine": pa.array(np.concatenate(out_c), type=pa.float64()),
            }
        )

    partials = embeddings_ds.map_batches(_partial, batch_format="pyarrow")

    def _final(group: pd.DataFrame) -> pd.DataFrame:
        g = group.sort_values(["cosine", "vec_id"], ascending=[False, True]).head(k)
        return g

    return partials.groupby("query_id").map_groups(_final, batch_format="pandas")


def lsh_signatures(embeddings_ds, n_bits: int = 16, seed: int = HASH_SEED):
    """(vec_id, bucket) via random-hyperplane signs (seeded, stateless)."""

    def _sig(batch: pa.Table) -> pa.Table:
        ids, mat = _embedding_matrix(batch)
        if len(ids) == 0:
            return pa.table(
                {"vec_id": pa.array([], type=pa.int64()), "bucket": pa.array([], type=pa.int64())}
            )
        d = mat.shape[1]
        rng = np.random.Generator(np.random.Philox(key=[seed, 1]))
        planes = rng.standard_normal((d, n_bits))
        bits = (mat @ planes) > 0
        bucket = (bits.astype(np.int64) << np.arange(n_bits, dtype=np.int64)).sum(axis=1)
        return pa.table(
            {
                "vec_id": pa.array(ids.astype(np.int64), type=pa.int64()),
                "bucket": pa.array(bucket, type=pa.int64()),
            }
        )

    return embeddings_ds.map_batches(_sig, batch_format="pyarrow")


def lsh_sign_planes(d: int, n_bits: int, seed: int = HASH_SEED) -> np.ndarray:
    """(d, n_bits) ±1 Rademacher hyperplanes from splitmix64 bit 0 —
    a valid sign-random-projection family that is REPRODUCIBLE IN SQL
    (plane[j, i] = ±1 from splitmix64((i << 32) | j XOR seed), so the
    DuckDB oracle can rebuild the exact same buckets; Gaussian Philox
    planes were not expressible)."""
    from ..sources.edges_synth import _splitmix64

    i = np.arange(n_bits, dtype=np.uint64)
    j = np.arange(d, dtype=np.uint64)
    keys = (i[None, :] << np.uint64(32)) | j[:, None]  # (d, n_bits)
    h = _splitmix64(keys.reshape(-1) ^ np.uint64(seed)).reshape(d, n_bits)
    return np.where((h & np.uint64(1)).astype(bool), 1.0, -1.0)


def ann_lsh_pairs(embeddings_ds, threshold: float = 0.25, n_bits: int = 6):
    """Near-duplicate embedding pairs: LSH bucket → exact cosine ≥ threshold.

    Returns Dataset (vec_a, vec_b, cosine). Bucket verification holds
    the bucket's vectors only (power-law bucket sizes bounded by the
    signature width — raise n_bits at scale; buckets over MAX_BUCKET
    are skipped as a degenerate-content skew guard).
    """

    def _sig_with_vec(batch: pa.Table) -> pa.Table:
        ids, mat = _embedding_matrix(batch)
        if len(ids) == 0:
            return pa.table(
                {
                    "bucket": pa.array([], type=pa.int64()),
                    "vec_id": pa.array([], type=pa.int64()),
                    "embedding": pa.array([], type=pa.list_(pa.float32())),
                }
            )
        planes = lsh_sign_planes(mat.shape[1], n_bits)
        bits = (mat @ planes) > 0
        bucket = (bits.astype(np.int64) << np.arange(n_bits, dtype=np.int64)).sum(axis=1)
        return pa.table(
            {
                "bucket": pa.array(bucket, type=pa.int64()),
                "vec_id": pa.array(ids.astype(np.int64), type=pa.int64()),
                "embedding": batch.column("embedding"),
            }
        )

    def _verify(group: pd.DataFrame) -> pd.DataFrame:
        from .dedup import MAX_BUCKET

        g = group.drop_duplicates("vec_id").sort_values("vec_id")
        ids = g["vec_id"].to_numpy()
        # MAX_BUCKET: degenerate-bucket (e.g. zero vectors) skew guard —
        # one hot bucket must not become O(n²) memory in one task
        if len(ids) < 2 or len(ids) > MAX_BUCKET:
            return pd.DataFrame(
                {
                    "vec_a": pd.Series([], dtype=np.int64),
                    "vec_b": pd.Series([], dtype=np.int64),
                    "cosine": pd.Series([], dtype=np.float64),
                }
            )
        mat = _normalize(np.vstack(g["embedding"].to_numpy()).astype(np.float64))
        sims = mat @ mat.T
        ia, ib = np.triu_indices(len(ids), 1)
        keep = sims[ia, ib] >= threshold
        return pd.DataFrame(
            {
                "vec_a": ids[ia][keep],
                "vec_b": ids[ib][keep],
                "cosine": np.round(sims[ia, ib][keep], 6),
            }
        )

    sigs = embeddings_ds.map_batches(_sig_with_vec, batch_format="pyarrow")
    # single-band signatures: every vector lives in EXACTLY one bucket,
    # so pairs cannot repeat — no distinct pass needed (round 1 paid an
    # extra sort-shuffle + per-group pandas here for nothing)
    return sigs.groupby("bucket").map_groups(_verify, batch_format="pandas")


def ivf_train_centroids(
    embeddings_ds,
    n_clusters: int = 16,
    sample_n: int = 4096,
    iters: int = 10,
    seed: int = HASH_SEED,
) -> np.ndarray:
    """Spherical k-means centroids from a bounded RANDOM sample (driver-side).

    The sample is O(sample_n · d) — at 100 TB you still train on ~100k
    sampled vectors, so Lloyd on the driver stays tiny; only the (C, d)
    centroid matrix is ever broadcast. Sampling is a distributed
    bottom-``sample_n`` by a per-row splitmix64 hash of vec_id: uniform
    regardless of how the corpus is sorted/partitioned (a plain
    ``limit(sample_n)`` takes the FIRST rows — biased centroids on
    sorted corpora, the round-1 bug), deterministic across runs and
    cluster sizes. Each task keeps only its local bottom-``sample_n``
    (the combiner), so the driver merge sees ≤ blocks × sample_n rows.
    Deterministic: seeded Philox init, fixed iteration count, empty
    clusters keep their centroid.
    """
    from ..sources.edges_synth import _splitmix64

    def _local_bottom(b: pa.Table) -> pa.Table:
        ids = b.column("vec_id").to_numpy(zero_copy_only=False).astype(np.uint64)
        if len(ids) == 0:
            return b
        h = _splitmix64(ids ^ np.uint64(seed * 0x9E3779B97F4A7C15 & 0xFFFFFFFFFFFFFFFF))
        keep = np.argsort(h, kind="stable")[:sample_n]
        return b.take(pa.array(np.sort(keep)))

    # tree-reduce the per-block bottom-k: coalesce the (already tiny)
    # candidate blocks into ≤8 partitions and re-run the combiner on
    # each, so the driver merge is O(sample_n) regardless of how many
    # input blocks the corpus had (10⁵ blocks at 100 TB would otherwise
    # funnel blocks × sample_n rows through one process).
    cand = pa.concat_tables(
        embeddings_ds.map_batches(_local_bottom, batch_format="pyarrow")
        .repartition(8)
        .map_batches(_local_bottom, batch_format="pyarrow", batch_size=None)
        .iter_batches(batch_size=None, batch_format="pyarrow")
    )
    ids_all = cand.column("vec_id").to_numpy(zero_copy_only=False).astype(np.uint64)
    if len(ids_all):
        h_all = _splitmix64(ids_all ^ np.uint64(seed * 0x9E3779B97F4A7C15 & 0xFFFFFFFFFFFFFFFF))
        sel = np.argsort(h_all, kind="stable")[:sample_n]
        cand = cand.take(pa.array(np.sort(sel)))
    _, mat = _embedding_matrix(cand)
    if mat.size == 0:
        raise ValueError("cannot train IVF centroids on an empty embeddings dataset")
    x = _normalize(mat)
    n_clusters = min(n_clusters, len(x))
    rng = np.random.Generator(np.random.Philox(key=[seed, 71]))
    cent = x[rng.choice(len(x), size=n_clusters, replace=False)]
    for _ in range(iters):
        assign = np.argmax(x @ cent.T, axis=1)
        for c in range(n_clusters):
            members = x[assign == c]
            if len(members):
                cent[c] = members.mean(axis=0)
    return _normalize(cent)


def ivf_assign(embeddings_ds, centroids: np.ndarray):
    """Add a ``cluster`` column: nearest (max-cosine) centroid per vector.

    Centroids are broadcast once via ``ray.put`` and read per batch —
    never re-shipped with each task closure.
    """
    cent_ref = ray.put(np.ascontiguousarray(centroids))

    def _fn(batch: pa.Table) -> pa.Table:
        cent = ray.get(cent_ref)
        ids, mat = _embedding_matrix(batch)
        if len(ids) == 0:
            return batch.append_column("cluster", pa.array([], type=pa.int64()))
        assign = np.argmax(_normalize(mat) @ cent.T, axis=1).astype(np.int64)
        return batch.append_column("cluster", pa.array(assign, type=pa.int64()))

    return embeddings_ds.map_batches(_fn, batch_format="pyarrow")


def knn_ivf(
    embeddings_ds,
    query_ids: list[int],
    k: int = 5,
    n_clusters: int = 16,
    nprobe: int = 4,
    sample_n: int = 4096,
    seed: int = HASH_SEED,
    centroids: np.ndarray | None = None,
):
    """IVF approximate cosine top-k: the scale path past brute force.

    One pass over the corpus with the (C, d) centroid matrix and the
    query matrix broadcast: each batch assigns its vectors to clusters,
    scores them only against the queries probing those clusters, and
    emits a local partial top-k; one small ``groupby(query_id)`` merge
    finishes. Compute drops from O(N·Q·d) to ~O(N·Q·d·nprobe/C) with
    no extra shuffle versus brute force. ``nprobe == n_clusters``
    degrades to exactly ``knn_brute_force`` (the pytest oracle).

    Returns Dataset (query_id, vec_id, cosine), k rows per query.

    ``centroids``: pass a pre-built (C, d) L2-normalized matrix (e.g.
    ``anchor_centroids`` for a SQL-replayable codebook) to skip the
    sampled k-means training.
    """
    if centroids is None:
        centroids = ivf_train_centroids(
            embeddings_ds, n_clusters=n_clusters, sample_n=sample_n, seed=seed
        )
    n_clusters = len(centroids)
    nprobe = min(nprobe, n_clusters)

    q_ids, q_mat = _fetch_query_vectors(embeddings_ds, query_ids)
    q_mat = _normalize(q_mat)
    # per-query probe set: top-nprobe centroids by cosine; stable sort
    # so ties break toward the lower cluster index, mirroring the SQL
    # oracle's ORDER BY (similarity DESC, cluster ASC) ROW_NUMBER.
    probe = np.argsort(-(q_mat @ centroids.T), axis=1, kind="stable")[:, :nprobe]
    cluster_to_q: dict[int, np.ndarray] = {
        c: np.flatnonzero((probe == c).any(axis=1)) for c in range(n_clusters)
    }
    state_ref = ray.put((q_ids, q_mat, centroids, cluster_to_q))

    def _partial(batch: pa.Table) -> pa.Table:
        qids, qmat, cent, c2q = ray.get(state_ref)
        ids, mat = _embedding_matrix(batch)
        empty = pa.table(
            {
                "query_id": pa.array([], type=pa.int64()),
                "vec_id": pa.array([], type=pa.int64()),
                "cosine": pa.array([], type=pa.float64()),
            }
        )
        if len(ids) == 0:
            return empty
        nmat = _normalize(mat)
        assign = np.argmax(nmat @ cent.T, axis=1)
        out_q, out_v, out_c = [], [], []
        for c in np.unique(assign):
            qidx = c2q.get(int(c))
            if qidx is None or len(qidx) == 0:
                continue
            rows = np.flatnonzero(assign == c)
            sims = nmat[rows] @ qmat[qidx].T  # (rows, probing queries)
            for j, qi in enumerate(qidx):
                qid = qids[qi]
                mask = ids[rows] != qid
                cand_ids, cand = ids[rows][mask], sims[:, j][mask]
                top = min(len(cand), max(k, 64))
                if top == 0:
                    continue
                sel = np.argpartition(-cand, top - 1)[:top]
                out_q.append(np.full(len(sel), qid, dtype=np.int64))
                out_v.append(cand_ids[sel].astype(np.int64))
                out_c.append(cand[sel])
        if not out_q:
            return empty
        return pa.table(
            {
                "query_id": pa.array(np.concatenate(out_q), type=pa.int64()),
                "vec_id": pa.array(np.concatenate(out_v), type=pa.int64()),
                "cosine": pa.array(np.concatenate(out_c), type=pa.float64()),
            }
        )

    partials = embeddings_ds.map_batches(_partial, batch_format="pyarrow")

    def _final(group: pd.DataFrame) -> pd.DataFrame:
        return group.sort_values(["cosine", "vec_id"], ascending=[False, True]).head(k)

    return partials.groupby("query_id").map_groups(_final, batch_format="pandas")


def anchor_centroids(
    embeddings_ds, n_clusters: int = 16, seed: int = HASH_SEED
) -> np.ndarray:
    """Deterministic SQL-replayable centroids: the ``n_clusters``
    corpus vectors with the smallest splitmix64(vec_id ⊕ mix), ordered
    by hash ascending (the order fixes cluster indices), L2-normalized
    — the PQ anchor rule applied to whole vectors. Distributed
    bottom-k with a tree-reduce; the driver only ever sees
    O(n_clusters) rows."""
    from ..sources.edges_synth import _splitmix64

    mix = np.uint64(seed * 0x9E3779B97F4A7C15 & 0xFFFFFFFFFFFFFFFF)

    def _local_bottom(b: pa.Table) -> pa.Table:
        ids = b.column("vec_id").to_numpy(zero_copy_only=False).astype(np.uint64)
        if len(ids) == 0:
            return b
        h = _splitmix64(ids ^ mix)
        keep = np.argsort(h, kind="stable")[:n_clusters]
        return b.take(pa.array(np.sort(keep)))

    cand = pa.concat_tables(
        embeddings_ds.map_batches(_local_bottom, batch_format="pyarrow")
        .repartition(8)
        .map_batches(_local_bottom, batch_format="pyarrow", batch_size=None)
        .iter_batches(batch_size=None, batch_format="pyarrow")
    )
    ids, mat = _embedding_matrix(cand)
    if mat.size == 0:
        raise ValueError("cannot pick anchors from an empty embeddings dataset")
    h = _splitmix64(ids.astype(np.uint64) ^ mix)
    order = np.argsort(h, kind="stable")[:n_clusters]
    return _normalize(mat[order])


def semantic_dedup(
    embeddings_ds,
    *,
    n_clusters: int = 16,
    threshold: float = 0.4,
    seed: int = HASH_SEED,
):
    """SemDeDup (Abbas et al. 2023, "SemDeDup: Data-efficient learning
    at web-scale through semantic deduplication"): cluster the
    embedding space, then mark within-cluster semantic duplicates by
    pairwise cosine — cross-cluster pairs are never compared, which is
    the whole point: the O(N²) cosine matrix becomes Σ_c O(s_c²) with
    s_c ≈ N/C, and C scales with the corpus so s_c stays bounded.

    Deterministic keep rule (SQL-replayable): a vector is a duplicate
    iff an EARLIER (smaller vec_id) member of its cluster has cosine ≥
    ``threshold``; ``dup_of`` = the smallest such id, −1 for kept
    vectors. Centroids are the hash-anchor rule (``anchor_centroids``)
    so the full pipeline — centroid choice, assignment, dup marking —
    replays exactly in the DuckDB oracle (the PQ iters=0 contract;
    Lloyd-refined centroids via ``ivf_train_centroids`` drop in for
    the quality path at the cost of oracle exactness).

    Plan: (C,d) centroid broadcast → one assignment pass → ONE
    ``groupby(cluster)`` shuffle → per-group normalized Gram matrix +
    first-earlier-hit scan. Returns (vec_id, cluster, keep, dup_of).
    """
    import pandas as pd

    cent = anchor_centroids(embeddings_ds, n_clusters=n_clusters, seed=seed)
    assigned = ivf_assign(embeddings_ds, cent)

    def _mark(group: pd.DataFrame) -> pd.DataFrame:
        ids = group["vec_id"].to_numpy()
        order = np.argsort(ids, kind="stable")
        ids = ids[order]
        mat = np.array([np.asarray(e, dtype=np.float64) for e in group["embedding"].to_numpy()[order]])
        x = _normalize(mat)
        g = x @ x.T
        n = len(ids)
        keep = np.ones(n, dtype=bool)
        dup_of = np.full(n, -1, dtype=np.int64)
        for i in range(1, n):
            hits = np.flatnonzero(g[i, :i] >= threshold)
            if len(hits):
                keep[i] = False
                dup_of[i] = ids[hits].min()
        return pd.DataFrame(
            {
                "vec_id": ids.astype(np.int64),
                "cluster": group["cluster"].to_numpy()[order].astype(np.int64),
                "keep": keep,
                "dup_of": dup_of,
            }
        )

    return assigned.groupby("cluster").map_groups(_mark, batch_format="pandas")


def truncated_dim_overlap(
    embeddings_ds, query_ids: list[int], k: int = 5, dims: int = 16
):
    """Matryoshka-style retrieval fidelity eval: per query, the overlap
    between the exact cosine top-k under the FULL embedding and under
    the first ``dims`` dimensions only — the standard check before
    shipping truncated embeddings to save index memory. Two
    brute-force top-k passes (the knn partial-top-k pattern), overlap
    on the bounded (|queries|·k) result. Returns (query_id,
    overlap_at_k)."""

    def _trunc(b: pa.Table) -> pa.Table:
        ids, mat = _embedding_matrix(b)
        m = mat[:, :dims]
        n = len(ids)
        offsets = (np.arange(n + 1, dtype=np.int32) * dims).astype(np.int32)
        emb = pa.ListArray.from_arrays(
            pa.array(offsets, type=pa.int32()),
            pa.array(m.ravel(), type=pa.float64()),
        )
        return pa.table(
            {"vec_id": pa.array(ids, type=pa.int64()), "embedding": emb}
        )

    full = knn_brute_force(embeddings_ds, query_ids, k=k).to_pandas()
    trunc_ds = embeddings_ds.map_batches(_trunc, batch_format="pyarrow")
    trunc = knn_brute_force(trunc_ds, query_ids, k=k).to_pandas()
    out_q, out_o = [], []
    for q in query_ids:
        a = set(full.loc[full["query_id"] == q, "vec_id"])
        b = set(trunc.loc[trunc["query_id"] == q, "vec_id"])
        out_q.append(q)
        out_o.append(len(a & b))
    return pa.table(
        {
            "query_id": pa.array(out_q, type=pa.int64()),
            "overlap_at_k": pa.array(out_o, type=pa.int64()),
        }
    )


def pca_project(embeddings_ds, n_components: int = 2):
    """Distributed PCA: the (d, d) covariance assembles from per-block
    partials (Σxᵀx, Σx, n — three tiny reductions; the corpus never
    leaves its blocks), the d×d eigendecomposition runs on the driver
    (d = embedding dim, constant), and the projection is a broadcast
    (d, k) matmul per batch. Deterministic sign: each component is
    flipped so its largest-|coefficient| entry is positive. Returns
    Dataset (vec_id, pc: list<float64>[k]) — standard embedding
    whitening/visualization front-end.
    """
    from ..util import list_array

    def _partial(b: pa.Table) -> pa.Table:
        ids, mat = _embedding_matrix(b)
        if len(ids) == 0:
            d = 0
            return pa.table(
                {
                    "n": pa.array([0], type=pa.int64()),
                    "sx": pa.array([[]], type=pa.list_(pa.float64())),
                    "sxx": pa.array([[]], type=pa.list_(pa.float64())),
                }
            )
        return pa.table(
            {
                "n": pa.array([len(ids)], type=pa.int64()),
                "sx": pa.array([mat.sum(axis=0).tolist()], type=pa.list_(pa.float64())),
                "sxx": pa.array(
                    [(mat.T @ mat).ravel().tolist()], type=pa.list_(pa.float64())
                ),
            }
        )

    n_tot = 0
    sx = None
    sxx = None
    for b in (
        embeddings_ds.map_batches(_partial, batch_format="pyarrow")
        .iter_batches(batch_size=None, batch_format="pyarrow")
    ):
        for i in range(b.num_rows):
            n_i = b.column("n")[i].as_py()
            if n_i == 0:
                continue
            sx_i = np.asarray(b.column("sx")[i].as_py())
            sxx_i = np.asarray(b.column("sxx")[i].as_py())
            n_tot += n_i
            sx = sx_i if sx is None else sx + sx_i
            sxx = sxx_i if sxx is None else sxx + sxx_i
    if n_tot == 0:
        raise ValueError("cannot run PCA on an empty embeddings dataset")
    d = len(sx)
    mean = sx / n_tot
    cov = sxx.reshape(d, d) / n_tot - np.outer(mean, mean)
    w, v = np.linalg.eigh(cov)
    comps = v[:, ::-1][:, :n_components]  # descending eigenvalue order
    for j in range(comps.shape[1]):
        i_max = np.argmax(np.abs(comps[:, j]))
        if comps[i_max, j] < 0:
            comps[:, j] = -comps[:, j]
    import ray

    state = ray.put((mean, np.ascontiguousarray(comps)))

    def _project(b: pa.Table) -> pa.Table:
        mu, c = ray.get(state)
        ids, mat = _embedding_matrix(b)
        proj = (mat - mu) @ c
        n, k = proj.shape
        offsets = (np.arange(n + 1, dtype=np.int32) * k).astype(np.int32)
        pc_arr = pa.ListArray.from_arrays(
            pa.array(offsets, type=pa.int32()),
            pa.array(proj.ravel(), type=pa.float64()),
        )
        return pa.table(
            {
                "vec_id": pa.array(ids, type=pa.int64()),
                "pc": pc_arr,
            }
        )

    return embeddings_ds.map_batches(_project, batch_format="pyarrow")


def int8_quantize_report(embeddings_ds):
    """Symmetric per-dimension int8 quantization (the standard
    embedding-compression baseline): scale_j = max|x_j| over the
    corpus (per-block partial maxima → one tiny fold → broadcast),
    q = clamp(round(x/scale·127), −127, 127). Reports per vector the
    L2 reconstruction error (ROUND 6) and the integer |q|₁ checksum —
    both SQL-replayable. Returns (vec_id, err_r6, q_norm1)."""
    import ray

    def _maxabs(b: pa.Table) -> pa.Table:
        ids, mat = _embedding_matrix(b)
        if len(ids) == 0:
            return pa.table({"m": pa.array([[]], type=pa.list_(pa.float64()))})
        return pa.table(
            {"m": pa.array([np.abs(mat).max(axis=0).tolist()], type=pa.list_(pa.float64()))}
        )

    scale = None
    for b in (
        embeddings_ds.map_batches(_maxabs, batch_format="pyarrow")
        .iter_batches(batch_size=None, batch_format="pyarrow")
    ):
        for i in range(b.num_rows):
            m = np.asarray(b.column("m")[i].as_py())
            if len(m) == 0:
                continue
            scale = m if scale is None else np.maximum(scale, m)
    if scale is None:
        raise ValueError("cannot quantize an empty embeddings dataset")
    scale_ref = ray.put(scale)

    def _quant(b: pa.Table) -> pa.Table:
        s = ray.get(scale_ref)
        ids, mat = _embedding_matrix(b)
        q = np.clip(np.round(mat / s * 127.0), -127, 127)
        recon = q * s / 127.0
        err = np.sqrt(((mat - recon) ** 2).sum(axis=1))
        return pa.table(
            {
                "vec_id": pa.array(ids, type=pa.int64()),
                "err_r6": pa.array(np.round(err, 6), type=pa.float64()),
                "q_norm1": pa.array(
                    np.abs(q).sum(axis=1).astype(np.int64), type=pa.int64()
                ),
            }
        )

    return embeddings_ds.map_batches(_quant, batch_format="pyarrow")


def pq_train_codebooks(
    embeddings_ds,
    m: int = 8,
    n_codes: int = 16,
    iters: int = 0,
    sample_n: int = 4096,
    seed: int = HASH_SEED,
) -> np.ndarray:
    """Product-quantization codebooks (Jégou et al., TPAMI 2011):
    split d dims into ``m`` equal subspaces, quantize each to
    ``n_codes`` centroids; a vector compresses to m code bytes.

    Anchor selection is the IVF sampler's deterministic bottom-k by
    splitmix64(vec_id): the ``n_codes`` smallest-hash corpus vectors,
    L2-normalized and ORDERED BY HASH ASCENDING (the order fixes the
    code indices — the SQL oracle replays it). ``iters = 0`` keeps the
    raw sampled anchors (fully SQL-replayable); ``iters > 0`` refines
    each subspace codebook with Lloyd k-means over a bounded
    ``sample_n`` sample (the quality path, pytest-verified — same
    contract split as IVF's nprobe trick).

    Returns (m, n_codes, d // m) float64.
    """
    from ..sources.edges_synth import _splitmix64

    mix = np.uint64(seed * 0x9E3779B97F4A7C15 & 0xFFFFFFFFFFFFFFFF)

    def _local_bottom(b: pa.Table) -> pa.Table:
        ids = b.column("vec_id").to_numpy(zero_copy_only=False).astype(np.uint64)
        if len(ids) == 0:
            return b
        h = _splitmix64(ids ^ mix)
        keep = np.argsort(h, kind="stable")[:sample_n]
        return b.take(pa.array(np.sort(keep)))

    cand = pa.concat_tables(
        embeddings_ds.map_batches(_local_bottom, batch_format="pyarrow")
        .repartition(8)
        .map_batches(_local_bottom, batch_format="pyarrow", batch_size=None)
        .iter_batches(batch_size=None, batch_format="pyarrow")
    )
    ids, mat = _embedding_matrix(cand)
    if mat.size == 0:
        raise ValueError("cannot train PQ codebooks on an empty embeddings dataset")
    d = mat.shape[1]
    if d % m:
        raise ValueError(f"dim {d} not divisible by m={m}")
    sub = d // m
    h = _splitmix64(ids.astype(np.uint64) ^ mix)
    order = np.argsort(h, kind="stable")
    x = _normalize(mat[order])
    n_codes = min(n_codes, len(x))
    books = np.stack(
        [x[:n_codes, j * sub : (j + 1) * sub].copy() for j in range(m)]
    )  # (m, n_codes, sub)
    if iters > 0:
        for j in range(m):
            xs = x[:, j * sub : (j + 1) * sub]
            cent = books[j]
            for _ in range(iters):
                d2 = ((xs[:, None, :] - cent[None, :, :]) ** 2).sum(axis=-1)
                assign = np.argmin(d2, axis=1)
                for c in range(n_codes):
                    members = xs[assign == c]
                    if len(members):
                        cent[c] = members.mean(axis=0)
            books[j] = cent
    return books


def _pq_codes(mat: np.ndarray, books: np.ndarray) -> np.ndarray:
    """(n, m) int64 codes: per-subspace argmin squared-L2 to the
    codebook (first minimum wins — ties go to the smaller code)."""
    n, d = mat.shape
    m, _, sub = books.shape
    x = _normalize(mat)
    codes = np.empty((n, m), dtype=np.int64)
    for j in range(m):
        xs = x[:, j * sub : (j + 1) * sub]
        d2 = ((xs[:, None, :] - books[j][None, :, :]) ** 2).sum(axis=-1)
        codes[:, j] = np.argmin(d2, axis=1)
    return codes


def pq_encode(embeddings_ds, books: np.ndarray):
    """(vec_id, codes list<int64>[m]) — the compressed corpus. The
    codebook tensor is broadcast once via ``ray.put``."""
    from ..util import list_array

    books_ref = ray.put(np.ascontiguousarray(books))

    def _fn(batch: pa.Table) -> pa.Table:
        bk = ray.get(books_ref)
        ids, mat = _embedding_matrix(batch)
        if len(ids) == 0:
            return pa.table(
                {
                    "vec_id": pa.array([], type=pa.int64()),
                    "codes": pa.array([], type=pa.list_(pa.int64())),
                }
            )
        codes = _pq_codes(mat, bk)
        return pa.table(
            {
                "vec_id": pa.array(ids.astype(np.int64), type=pa.int64()),
                "codes": list_array(list(codes), np.int64, pa.int64()),
            }
        )

    return embeddings_ds.map_batches(_fn, batch_format="pyarrow")


def pq_adc_topk(embeddings_ds, books: np.ndarray, query_ids: list[int], k: int = 5):
    """Asymmetric-distance top-k: queries stay exact, the corpus is
    scored through its PQ codes via per-query lookup tables
    LUT[j, c] = ⟨q_sub_j, codebook[j][c]⟩, score = Σ_j LUT[j, code_j].

    One corpus pass re-encodes each batch against the broadcast
    codebooks and sums LUT entries (at 100 TB the codes would be
    precomputed once by ``pq_encode`` and this pass would read the
    m-byte codes instead of the d-float vectors — the compression is
    the point; here the single fused pass keeps the query
    one-sweep). Partial top-k per batch + one small groupby merge,
    exactly the brute-force pattern. Returns (query_id, vec_id, adc),
    k rows per query, self excluded, ties → smaller vec_id.
    """
    q_ids, q_mat = _fetch_query_vectors(embeddings_ds, query_ids)
    q_mat = _normalize(q_mat)
    m, n_codes, sub = books.shape
    # (Q, m, n_codes) lookup tables
    luts = np.stack(
        [
            np.stack([q[j * sub : (j + 1) * sub] @ books[j].T for j in range(m)])
            for q in q_mat
        ]
    )
    state_ref = ray.put((q_ids, luts, np.ascontiguousarray(books)))

    def _partial(batch: pa.Table) -> pa.Table:
        qids, lut, bk = ray.get(state_ref)
        ids, mat = _embedding_matrix(batch)
        empty = pa.table(
            {
                "query_id": pa.array([], type=pa.int64()),
                "vec_id": pa.array([], type=pa.int64()),
                "adc": pa.array([], type=pa.float64()),
            }
        )
        if len(ids) == 0:
            return empty
        codes = _pq_codes(mat, bk)  # (n, m)
        out_q, out_v, out_c = [], [], []
        for qi, qid in enumerate(qids):
            score = np.zeros(len(ids))
            for j in range(bk.shape[0]):
                score += lut[qi, j][codes[:, j]]
            mask = ids != qid
            cand_ids, cand = ids[mask], score[mask]
            top = min(len(cand), max(k, 64))
            if top == 0:
                continue
            # quantized scores tie OFTEN (equal codes ⇒ equal ADC), so the
            # partial must keep the (score desc, vid asc) lexicographic
            # top — argpartition would drop arbitrary tie members
            sel = np.lexsort((cand_ids, -cand))[:top]
            out_q.append(np.full(len(sel), qid, dtype=np.int64))
            out_v.append(cand_ids[sel].astype(np.int64))
            out_c.append(cand[sel])
        if not out_q:
            return empty
        return pa.table(
            {
                "query_id": pa.array(np.concatenate(out_q), type=pa.int64()),
                "vec_id": pa.array(np.concatenate(out_v), type=pa.int64()),
                "adc": pa.array(np.concatenate(out_c), type=pa.float64()),
            }
        )

    partials = embeddings_ds.map_batches(_partial, batch_format="pyarrow")

    def _final(group: pd.DataFrame) -> pd.DataFrame:
        return group.sort_values(["adc", "vec_id"], ascending=[False, True]).head(k)

    return partials.groupby("query_id").map_groups(_final, batch_format="pandas")


def embedding_norms(embeddings_ds):
    """(vec_id, norm_r5) — L2 norms, SQL-oracled via list_inner_product."""

    def _fn(batch: pa.Table) -> pa.Table:
        ids, mat = _embedding_matrix(batch)
        norms = np.sqrt((mat * mat).sum(axis=1)) if len(ids) else np.empty(0)
        return pa.table(
            {
                "vec_id": pa.array(ids.astype(np.int64), type=pa.int64()),
                "norm_r5": pa.array(np.round(norms, 5), type=pa.float64()),
            }
        )

    return embeddings_ds.map_batches(_fn, batch_format="pyarrow")


# --------------------------------------------------------------------------
# exact-integer distributed k-means (Lloyd) over quantized embeddings
# --------------------------------------------------------------------------

KMEANS_QUANT = 1 << 20  # power-of-two scale: float32 → int64 is EXACT


def _quantize_embeddings(mat: np.ndarray) -> np.ndarray:
    """floor(x · 2^20) per coordinate. The scale is a power of two, so
    the multiply only shifts the float exponent — bit-exact on both the
    numpy and DuckDB sides; floor is then deterministic."""
    return np.floor(mat * KMEANS_QUANT).astype(np.int64)


def _floor_div_exact(s: np.ndarray, n: np.ndarray) -> np.ndarray:
    """Floor division written as (s − mod) / n with mod = ((s % n) + n)
    % n — the form the SQL oracle replays exactly (DuckDB % is C-style
    truncating, numpy % floors; the +n normalization makes them agree)."""
    mod = ((s % n) + n) % n
    return (s - mod) // n


def kmeans_quantized(
    embeddings_ds,
    *,
    n_clusters: int = 8,
    iters: int = 2,
    seed: int = HASH_SEED,
):
    """Distributed Lloyd k-means with EXACT integer arithmetic — every
    step is SQL-replayable bit-for-bit (`oracles/sql.kmeans_embeddings_sql`):

    - coordinates quantized to int64 by floor(x·2^20) (exact, see above);
    - init = the ``n_clusters`` quantized corpus vectors with the
      smallest splitmix64(vec_id ⊕ mix), hash-ordered (the PQ/IVF
      anchor rule — cluster index is deterministic);
    - assignment = integer argmin of Σ(q−c)² (tie → smallest cluster);
    - update = per-coordinate floor(Σq / n) (empty cluster keeps its
      previous centroid). Integer means lose <1 quantum of precision
      per round — irrelevant for cluster geometry, decisive for the
      driver's value-hash gate (no float summation order anywhere).

    Scale shape: centroids are a (C, d) int64 broadcast (``ray.put``
    once per round); each round is ONE corpus pass emitting C partial
    (sum, count) rows per block; the driver merges O(C·blocks) ints —
    never a shuffle, never a corpus materialization. Returns a Dataset
    (vec_id, cluster, d2) of the final assignment.
    """
    from ..sources.edges_synth import _splitmix64

    mix = np.uint64(seed * 0x9E3779B97F4A7C15 & 0xFFFFFFFFFFFFFFFF)
    C = n_clusters

    # ---- anchor init (quantized, hash-ordered) ----
    def _local_bottom(b: pa.Table) -> pa.Table:
        ids = b.column("vec_id").to_numpy(zero_copy_only=False).astype(np.uint64)
        if len(ids) == 0:
            return b
        h = _splitmix64(ids ^ mix)
        keep = np.lexsort((ids, h))[:C]
        return b.take(pa.array(np.sort(keep)))

    cand = pa.concat_tables(
        embeddings_ds.map_batches(_local_bottom, batch_format="pyarrow")
        .repartition(8)
        .map_batches(_local_bottom, batch_format="pyarrow", batch_size=None)
        .iter_batches(batch_size=None, batch_format="pyarrow")
    )
    ids, mat = _embedding_matrix(cand)
    if mat.size == 0:
        raise ValueError("cannot run k-means on an empty embeddings dataset")
    h = _splitmix64(ids.astype(np.uint64) ^ mix)
    order = np.lexsort((ids, h))[:C]
    cent = _quantize_embeddings(mat[order])  # (C, d) int64, hash-ordered

    # ---- Lloyd rounds: broadcast centroids, reduce integer partials ----
    def _make_partial(cent_ref):
        def _partial(b: pa.Table) -> pa.Table:
            cen = ray.get(cent_ref)
            _, m = _embedding_matrix(b)
            if m.size == 0:
                return pa.table(
                    {
                        "cluster": pa.array([], type=pa.int64()),
                        "s": pa.array([], type=pa.list_(pa.int64())),
                        "n": pa.array([], type=pa.int64()),
                    }
                )
            q = _quantize_embeddings(m)
            d2 = ((q[:, None, :] - cen[None, :, :]) ** 2).sum(axis=2)
            a = np.argmin(d2, axis=1)  # first occurrence = smallest cluster
            sums = np.zeros((len(cen), q.shape[1]), dtype=np.int64)
            np.add.at(sums, a, q)
            counts = np.bincount(a, minlength=len(cen)).astype(np.int64)
            nz = np.flatnonzero(counts)
            return pa.table(
                {
                    "cluster": pa.array(nz.astype(np.int64)),
                    "s": pa.array(list(sums[nz]), type=pa.list_(pa.int64())),
                    "n": pa.array(counts[nz]),
                }
            )

        return _partial

    for _ in range(iters):
        cent_ref = ray.put(np.ascontiguousarray(cent))
        sums = np.zeros_like(cent)
        counts = np.zeros(C, dtype=np.int64)
        for b in (
            embeddings_ds.map_batches(_make_partial(cent_ref), batch_format="pyarrow")
            .iter_batches(batch_size=None, batch_format="pyarrow")
        ):
            cl = b.column("cluster").to_numpy(zero_copy_only=False)
            from ..util import list_rows

            srows = list_rows(b, "s")
            if len(cl):
                np.add.at(sums, cl, np.vstack(srows).astype(np.int64))
                np.add.at(counts, cl, b.column("n").to_numpy(zero_copy_only=False))
        nz = counts > 0
        new = cent.copy()
        new[nz] = _floor_div_exact(sums[nz], counts[nz, None])
        cent = new

    # ---- final assignment pass ----
    cent_ref = ray.put(np.ascontiguousarray(cent))

    def _assign(b: pa.Table) -> pa.Table:
        cen = ray.get(cent_ref)
        vids, m = _embedding_matrix(b)
        if m.size == 0:
            return pa.table(
                {
                    "vec_id": pa.array([], type=pa.int64()),
                    "cluster": pa.array([], type=pa.int64()),
                    "d2": pa.array([], type=pa.int64()),
                }
            )
        q = _quantize_embeddings(m)
        d2 = ((q[:, None, :] - cen[None, :, :]) ** 2).sum(axis=2)
        a = np.argmin(d2, axis=1)
        return pa.table(
            {
                "vec_id": pa.array(vids.astype(np.int64)),
                "cluster": pa.array(a.astype(np.int64)),
                "d2": pa.array(d2[np.arange(len(a)), a].astype(np.int64)),
            }
        )

    return embeddings_ds.map_batches(_assign, batch_format="pyarrow")


def mmr_topk(
    embeddings_ds,
    query_id: int = 0,
    m: int = 20,
    k: int = 5,
    lam: float = 0.75,
):
    """Maximal-marginal-relevance diverse retrieval (Carbonell &
    Goldstein, SIGIR 1998): greedily pick k of the top-m candidates,
    each step maximizing  λ·sim(q,i) − (1−λ)·max_{j∈S} sim(i,j).

    Distribution: candidate generation is the brute-kNN pattern (one
    broadcast query vector, per-block cosine + partial top-m, tiny
    driver merge); candidate vectors come back through the distributed
    filter; the greedy itself runs on the driver over an m×m matrix —
    m is a constant, never data-sized. Exactness: every similarity is
    ROUND r5 of the same explicit inner/(√·√) expression both sides,
    every greedy score FLOOR(1e6·(λ-combination)) — floor of identical
    doubles is bit-identical where ROUND's decimal half-ties are not —
    and all selections order by (floored score desc, vec_id asc), so
    the SQL oracle's unrolled greedy picks identical ids. Returns
    (rank, vec_id, score_u6)."""
    _, q_mat = _fetch_query_vectors(embeddings_ds, [query_id])
    q = q_mat[0]
    sqrt_qq = np.sqrt(float(np.dot(q, q)))
    q_ref = ray.put(q)

    def _partial(batch: pa.Table) -> pa.Table:
        ids, mat = _embedding_matrix(batch)
        if not len(ids):
            return pa.table(
                {"vec_id": pa.array([], type=pa.int64()),
                 "cq": pa.array([], type=pa.float64())}
            )
        qv = ray.get(q_ref)
        dots = mat @ qv
        ee = np.sqrt((mat * mat).sum(axis=1))
        cos = np.round(dots / (ee * sqrt_qq), 5)
        keep = ids != query_id
        ids, cos = ids[keep], cos[keep]
        order = np.lexsort((ids, -cos))[:m]
        return pa.table(
            {
                "vec_id": pa.array(ids[order].astype(np.int64), type=pa.int64()),
                "cq": pa.array(cos[order], type=pa.float64()),
            }
        )

    parts = (
        embeddings_ds.map_batches(_partial, batch_format="pyarrow")
        .to_pandas()
        .sort_values(["cq", "vec_id"], ascending=[False, True])
        .head(m)
        .reset_index(drop=True)
    )
    cand_ids = parts["vec_id"].to_numpy().astype(np.int64)
    cq5 = parts["cq"].to_numpy()
    ids_sorted, vecs = _fetch_query_vectors(embeddings_ds, cand_ids.tolist())
    pos = {int(v): i for i, v in enumerate(ids_sorted)}
    mat = np.vstack([vecs[pos[int(v)]] for v in cand_ids])
    ee = np.sqrt((mat * mat).sum(axis=1))
    sim = np.round((mat @ mat.T) / np.outer(ee, ee), 5)

    selected: list[int] = []
    out_rank, out_id, out_score = [], [], []
    remaining = np.ones(len(cand_ids), dtype=bool)
    one_minus = 1.0 - lam
    for step in range(min(k, len(cand_ids))):
        if selected:
            pen = sim[:, selected].max(axis=1)
            score = np.floor(1000000.0 * (lam * cq5 - one_minus * pen))
        else:
            score = np.floor(1000000.0 * (lam * cq5))
        score_m = np.where(remaining, score, -np.inf)
        best = np.lexsort((cand_ids, -score_m))[0]
        out_rank.append(step + 1)
        out_id.append(int(cand_ids[best]))
        out_score.append(int(score[best]))
        selected.append(best)
        remaining[best] = False
    return pa.table(
        {
            "rank": pa.array(out_rank, type=pa.int64()),
            "vec_id": pa.array(out_id, type=pa.int64()),
            "score_u6": pa.array(out_score, type=pa.int64()),
        }
    )


def knn_label_accuracy(embeddings_ds):
    """Leave-one-out 1-NN label accuracy — the standard intrinsic
    eval for an embedding table (does nearest-neighbor structure
    respect labels?). Per label: row count and how many rows' nearest
    OTHER vector (cosine, min-vec_id tie-break) shares the label.

    Distributed shape — blocked all-pairs, NO driver materialization:
    the corpus is pinned as per-block (vids, labels, nmat) shards by
    REMOTE tasks (the ShardedGraph.from_shard_dataset pattern,
    state/graph.py:98 — bytes never cross the driver's NIC; the driver
    holds only ObjectRefs). Each batch task streams over the shard
    refs one at a time (zero-copy plasma get, released per iteration —
    peak memory is one shard + one batch, never N×d), computing a
    running exact 1-NN with the deterministic (max ⌊cos·2^24⌋, min
    vec_id) tie-break: within a shard argmax-first-index over
    vec_id-sorted rows, across shards an explicit (quantized sim,
    vec_id) comparison — quantization makes cross-shard equality exact
    even when separate GEMM shapes differ by an ulp, so winners are
    bit-stable at any blocking. Only
    (label, n, correct) partials leave each block. Returns
    (label, n, correct)."""
    import ray

    @ray.remote
    def _pin_shard(block):
        # zero-row blocks can carry an EMPTY schema (no columns) — treat
        # as an empty shard instead of KeyError-ing the task (the same
        # hazard fixed in bpe._Shard.__init__)
        if block.num_rows == 0 or "vec_id" not in block.schema.names:
            e = np.empty(0, dtype=np.int64)
            return (e, e.copy(), np.empty((0, 0)))
        ids, mat = _embedding_matrix(block)
        lab = block.column("label").to_numpy(zero_copy_only=False).astype(np.int64)
        o = np.argsort(ids, kind="stable")
        return (
            ids[o].astype(np.int64),
            lab[o],
            _normalize(mat[o].astype(np.float64)),
        )

    shard_refs = []
    for bundle in embeddings_ds.iter_internal_ref_bundles():
        for block_ref, _md in bundle.blocks:
            shard_refs.append(_pin_shard.remote(block_ref))

    def _partial(b: pa.Table) -> pa.Table:
        bv = b.column("vec_id").to_numpy(zero_copy_only=False).astype(np.int64)
        bl = b.column("label").to_numpy(zero_copy_only=False).astype(np.int64)
        bm = _normalize(
            np.stack(b.column("embedding").to_numpy(zero_copy_only=False)).astype(
                np.float64
            )
        )
        nb_rows = len(bv)
        # cross-shard comparisons run on FLOOR-quantized sims (the dot
        # 2^24 convention): separate (batch, shard) GEMMs can differ by
        # an ulp with matrix shape, so float equality in the tie-break
        # would be blocking-dependent (ADVICE r4); quantized equality is
        # exact, and the oracle orders by the same ⌊sim·2^24⌋.
        SENT = np.iinfo(np.int64).min
        best_sim = np.full(nb_rows, SENT, dtype=np.int64)
        best_vid = np.full(nb_rows, np.iinfo(np.int64).max, dtype=np.int64)
        best_lab = np.zeros(nb_rows, dtype=np.int64)
        for ref in shard_refs:
            v, lab, m = ray.get(ref)
            if len(v) == 0:
                continue
            sims = np.floor((bm @ m.T) * 16777216.0).astype(np.int64)
            pos = np.searchsorted(v, bv)
            pos_c = np.minimum(pos, len(v) - 1)
            has_self = (pos < len(v)) & (v[pos_c] == bv)
            sims[np.flatnonzero(has_self), pos_c[has_self]] = SENT
            j = np.argmax(sims, axis=1)  # first max = smallest vec_id in shard
            s = sims[np.arange(nb_rows), j]
            cv, cl = v[j], lab[j]
            upd = (s > SENT) & (
                (s > best_sim) | ((s == best_sim) & (cv < best_vid))
            )
            best_sim = np.where(upd, s, best_sim)
            best_vid = np.where(upd, cv, best_vid)
            best_lab = np.where(upd, cl, best_lab)
        correct = (best_lab == bl).astype(np.int64)
        t = pa.table(
            {
                "label": pa.array(bl, type=pa.int64()),
                "n": pa.array(np.ones(nb_rows, dtype=np.int64)),
                "correct": pa.array(correct, type=pa.int64()),
            }
        )
        out = t.group_by("label").aggregate([("n", "sum"), ("correct", "sum")])
        return out.rename_columns(["label", "n", "correct"])

    from ray.data.aggregate import Sum

    return (
        embeddings_ds.map_batches(_partial, batch_format="pyarrow")
        .groupby("label")
        .aggregate(Sum("n", alias_name="n"), Sum("correct", alias_name="correct"))
    )


def label_centroid_drift(emb_ds, *, d: int = 64, scale: float = 1048576.0):
    """Per-label embedding-centroid drift — the distribution-shift /
    cluster-coherence monitor a training pipeline runs per source or
    label slice: cosine similarity between each label's centroid and
    the global corpus centroid.

    Coordinates are quantized floor(x·2²⁰) (the kmeans_quantized
    convention: power-of-two scale → the multiply is exact, integer
    sums are order-independent), so the distributed per-(label, dim)
    sums are EXACT; only the final 64-term cosine is float, absorbed
    by ROUND 6. One map pass with per-block (label, dim, partial-sum)
    rows → a tiny (labels × dims) groupby — the driver sees only that
    aggregate. Returns (label, n_vecs, cos_r6)."""
    import pyarrow as pa
    from ray.data.aggregate import Sum

    def _partials(b: pa.Table) -> pa.Table:
        from ..util import list_rows

        lab = b.column("label").to_numpy(zero_copy_only=False).astype(np.int64)
        rows = list_rows(b, "embedding")
        q = np.floor(np.asarray(rows, dtype=np.float64) * scale).astype(np.int64)
        labs = np.unique(lab)
        out_l, out_d, out_s = [], [], []
        for L in labs:
            m = lab == L
            s = q[m].sum(axis=0)
            out_l.append(np.full(d, L, dtype=np.int64))
            out_d.append(np.arange(d, dtype=np.int64))
            out_s.append(s)
            # dim = -1 row carries the vector count
            out_l.append(np.array([L], dtype=np.int64))
            out_d.append(np.array([-1], dtype=np.int64))
            out_s.append(np.array([int(m.sum())], dtype=np.int64))
        return pa.table(
            {
                "label": pa.array(np.concatenate(out_l)),
                "dim": pa.array(np.concatenate(out_d)),
                "s": pa.array(np.concatenate(out_s)),
            }
        )

    agg = (
        emb_ds.map_batches(_partials, batch_format="pyarrow")
        .groupby(["label", "dim"])
        .aggregate(Sum("s", alias_name="s"))
    )
    tbl = agg.to_pandas()  # labels × (d+1) rows — tiny by construction
    labs = np.sort(tbl["label"].unique())
    sums = np.zeros((len(labs), d), dtype=np.int64)
    cnts = np.zeros(len(labs), dtype=np.int64)
    li = {int(L): i for i, L in enumerate(labs)}
    for L, dim, s in zip(tbl["label"], tbl["dim"], tbl["s"]):
        if dim < 0:
            cnts[li[int(L)]] = s
        else:
            sums[li[int(L)], dim] = s
    gc = sums.sum(axis=0).astype(np.float64) / float(cnts.sum())
    cc = sums.astype(np.float64) / cnts[:, None].astype(np.float64)
    dp = (cc * gc[None, :]).sum(axis=1)
    na = (cc * cc).sum(axis=1)
    nb = float((gc * gc).sum())
    cos = dp / (np.sqrt(na) * np.sqrt(nb))
    return pa.table(
        {
            "label": pa.array(labs.astype(np.int64)),
            "n_vecs": pa.array(cnts.astype(np.int64)),
            "cos_r6": pa.array(np.round(cos, 6), type=pa.float64()),
        }
    )


def ann_recall_at_k(
    embeddings_ds,
    query_ids: list[int],
    *,
    k: int = 5,
    n_clusters: int = 16,
    nprobe: int = 2,
    seed: int = HASH_SEED,
):
    """ANN quality EVAL — recall@k of the anchor-codebook IVF in its
    genuinely approximate regime (nprobe ≪ C) against exact brute
    force: the number every index deployment reports before trading
    recall for speed. Anchors (not Lloyd centroids) keep the whole
    approximate path SQL-replayable: assignment = argmax cosine vs the
    splitmix-bottom-k anchor vectors, probe set = each query's top
    ``nprobe`` anchors, candidates = vectors assigned to probed
    anchors. Both sides are k rows per query; the driver only ever
    sees the two Q·k top-k tables. Returns
    (query_id, n_hits, recall_r6)."""
    cent = anchor_centroids(embeddings_ds, n_clusters=n_clusters, seed=seed)
    ivf = knn_ivf(
        embeddings_ds, query_ids, k=k, n_clusters=len(cent), nprobe=nprobe,
        seed=seed, centroids=cent,
    ).to_pandas()
    brute = knn_brute_force(embeddings_ds, query_ids, k=k).to_pandas()
    rows_q, rows_h = [], []
    for qid in sorted(query_ids):
        iv = set(ivf.loc[ivf.query_id == qid, "vec_id"])
        br = set(brute.loc[brute.query_id == qid, "vec_id"])
        rows_q.append(qid)
        rows_h.append(len(iv & br))
    hits = np.array(rows_h, dtype=np.int64)
    return pa.table(
        {
            "query_id": pa.array(np.array(rows_q, dtype=np.int64)),
            "n_hits": pa.array(hits),
            "recall_r6": pa.array(np.round(hits.astype(np.float64) / float(k), 6)),
        }
    )
