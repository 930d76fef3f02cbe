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


def knn_brute_force(embeddings_ds, query_ids: list[int], k: int = 5):
    """Exact cosine top-k neighbors for each query vector.

    Returns Dataset (query_id, vec_id, cosine) — k rows per query,
    self-matches excluded, ties broken by lower vec_id (deterministic).
    """
    # fetch query vectors (tiny filter pass), broadcast once
    import pyarrow.compute as pc

    qset = set(int(q) for q in query_ids)
    qtbl = pa.concat_tables(
        [
            b.filter(pc.is_in(b.column("vec_id"), value_set=pa.array(list(qset))))
            for b in embeddings_ds.iter_batches(batch_size=None, batch_format="pyarrow")
        ]
    )
    q_ids, q_mat = _embedding_matrix(qtbl)
    order = np.argsort(q_ids)
    q_ids, q_mat = q_ids[order], _normalize(q_mat[order])
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
            top = min(len(cand), 64)  # local partial top (> final k for ties)
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


def ann_lsh_pairs(embeddings_ds, threshold: float = 0.9, n_bits: int = 12):
    """Near-duplicate embedding pairs: LSH bucket → exact cosine ≥ threshold.

    Returns Dataset (vec_a, vec_b, cosine). Bucket verification holds
    the bucket's vectors only (power-law bucket sizes bounded by the
    signature width — raise n_bits at scale).
    """
    from ..util import list_rows

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
        d = mat.shape[1]
        rng = np.random.Generator(np.random.Philox(key=[HASH_SEED, 1]))
        planes = rng.standard_normal((d, n_bits))
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
        g = group.drop_duplicates("vec_id").sort_values("vec_id")
        ids = g["vec_id"].to_numpy()
        if len(ids) < 2:
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
    pairs = sigs.groupby("bucket").map_groups(_verify, batch_format="pandas")
    return pairs.groupby(["vec_a", "vec_b"]).map_groups(
        lambda g: g.head(1), batch_format="pandas"
    )


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
