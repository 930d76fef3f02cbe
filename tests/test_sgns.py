"""SGNS embedding training: loss decreases, communities separate in
cosine space, output shape/determinism."""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray.data as rd

from efficient_graph_algorithms_ray.config import EngineConfig
from efficient_graph_algorithms_ray.pipelines.embedding_train import (
    sgns_train_embeddings,
)
from efficient_graph_algorithms_ray.pipelines.graph_build import build_graph
from efficient_graph_algorithms_ray.stages.hashing import hash_to_vid


def _two_cliques(k=8):
    """Two k-cliques joined by one bridge edge (undirected build)."""
    names = [f"a{i}" for i in range(k)] + [f"b{i}" for i in range(k)]
    vids = hash_to_vid(names)
    src, dst = [], []
    for base in (0, k):
        for i in range(k):
            for j in range(k):
                if i != j:
                    src.append(vids[base + i])
                    dst.append(vids[base + j])
    src.append(vids[0])
    dst.append(vids[k])
    ds = rd.from_arrow(
        pa.table(
            {
                "src": pa.array(np.array(src, dtype=np.uint64), type=pa.uint64()),
                "dst": pa.array(np.array(dst, dtype=np.uint64), type=pa.uint64()),
            }
        )
    )
    g = build_graph(ds, EngineConfig(num_partitions=4), directed=False)
    return g, vids, k


def test_sgns_loss_decreases_and_separates_cliques():
    g, vids, k = _two_cliques()
    emb_ds, stats = sgns_train_embeddings(
        g, dim=8, epochs=6, lr=2.0, walk_len=8, walks_per_vertex=4, n_neg=2, seed=3
    )
    losses = stats["loss"]
    assert len(losses) == 6
    assert losses[-1] < losses[0]  # GD on the fixed corpus makes progress
    assert all(np.isfinite(losses))

    df = emb_ds.to_pandas()
    assert len(df) == 2 * k
    emb = {int(v): np.array(e) for v, e in zip(df["vid"], df["emb"])}
    E = np.stack([emb[int(v)] for v in vids])
    En = E / np.linalg.norm(E, axis=1, keepdims=True)
    cos = En @ En.T
    intra, inter = [], []
    for i in range(2 * k):
        for j in range(i + 1, 2 * k):
            (intra if (i < k) == (j < k) else inter).append(cos[i, j])
    assert np.mean(intra) > np.mean(inter) + 0.1


def test_sgns_deterministic_corpus_and_shapes():
    g, vids, k = _two_cliques(k=5)
    _, s1 = sgns_train_embeddings(g, dim=4, epochs=2, walks_per_vertex=2, seed=11)
    _, s2 = sgns_train_embeddings(g, dim=4, epochs=2, walks_per_vertex=2, seed=11)
    # corpus + negatives are bit-deterministic; gradient sums differ only
    # at float round-off across runs
    assert s1["n_pairs"] == s2["n_pairs"]
    assert s1["total_weight"] == s2["total_weight"]
    assert np.allclose(s1["loss"], s2["loss"], rtol=1e-9)
    assert s1["n_vertices"] == 2 * 5
