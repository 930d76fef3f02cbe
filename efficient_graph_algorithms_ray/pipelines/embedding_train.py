"""Distributed SGNS (skip-gram negative sampling) embedding training.

The training step that the walk-corpus family feeds: DeepWalk/node2vec
(Perozzi et al. KDD 2014; Grover & Leskovec KDD 2016) = random walks →
skip-gram pairs → word2vec SGNS (Mikolov et al. NeurIPS 2013). The
engine already emits the corpus (``walk_corpus.random_walk_corpus``),
the pairs (``skipgram_pairs``) and the negative-sample tables; this
module closes the loop and trains the embeddings, so a corpus user
can run pages → graph → walks → TRAINED vertex embeddings → the ANN /
semantic-dedup operators end-to-end inside one engine.

Ray-Data-native training shape — synchronous full-batch gradient
descent on the aggregated pair table:

- the pair table ``(center, context, n)`` is the DATA (materialized
  once; ``n`` folds millions of walk occurrences into one weighted
  row, so an epoch is one pass over DISTINCT pairs — the aggregation
  IS the minibatching);
- parameters (two V×d float64 matrices) are broadcast per epoch via
  ``ray.put`` — workers read plasma zero-copy, nothing is re-shipped
  per batch;
- each batch computes its dense local gradient contribution
  vectorized (``np.add.at`` scatter) and emits one row per TOUCHED
  vertex (idx, kind, g0..g{d-1}) — map-side pre-aggregation, so the
  shuffle carries ≤ touched-vertices rows per batch, never per pair;
- a combiner-backed ``groupby(idx, kind).sum`` reduces gradients and
  the loss row; the driver applies ``W -= lr·∇/Σn`` and loops.

Determinism: negatives are ``splitmix64(center ⊕ mix(context) ⊕
mix(epoch·K+k) ⊕ seed) mod V`` — reproducible at any parallelism; the
gradient SUM order varies across runs only at float round-off
(~1e-15), so tests pin structure (loss decrease, cosine separation),
not bits.

Scale note: V·d parameter broadcast caps V at what one worker holds
(V=10⁸, d=32 → 25 GiB — too big). At that scale shard the parameter
matrix by vertex range and route gradient rows by owner (the repo's
owner-sharded exchange in ``pipelines/mst.py``) — documented, not
needed for the bounded-V graphs the kernel operators already assume.

Reference tie-in: same broadcast-state + iterate-to-tolerance control
flow as the integrator fixed-point loops
(/root/reference/src/ega/algorithms/convolutional_barycenter.py:47-80);
the reference trains nothing — this is engine surface for the
training-data pipeline.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from ..sources.edges_synth import _splitmix64
from ..state.graph import ShardedGraph
from .walk_corpus import random_walk_corpus, skipgram_pairs

__all__ = ["sgns_train_embeddings"]


def _sigmoid(x: np.ndarray) -> np.ndarray:
    return 1.0 / (1.0 + np.exp(-np.clip(x, -30.0, 30.0)))


def sgns_train_embeddings(
    graph: ShardedGraph,
    *,
    dim: int = 16,
    epochs: int = 8,
    lr: float = 2.0,
    window: int = 2,
    walk_len: int = 8,
    walks_per_vertex: int = 1,
    n_neg: int = 2,
    seed: int = 7,
):
    """Train SGNS vertex embeddings on the graph's walk corpus.

    Returns ``(emb_ds, stats)``: a Dataset ``(vid uint64,
    emb list<float64>[dim])`` of input-side embeddings, and
    ``stats = {"epochs": E, "loss": [per-epoch mean loss],
    "n_pairs": ..., "total_weight": ...}``. Loss is the standard SGNS
    objective −ln σ(u·v) − Σ_k ln σ(−u·v_k), averaged per pair weight.
    """
    import ray
    import ray.data as rd
    from ray.data.aggregate import Sum

    pairs = skipgram_pairs(
        random_walk_corpus(graph, walk_len, walks_per_vertex, seed), window
    ).materialize()

    # bounded dense vertex index (same V cap as the dense-state ops)
    vid_rows = [
        b.column("vid").to_numpy(zero_copy_only=False)
        for b in graph.vertex_dataset().iter_batches(
            batch_size=None, batch_format="pyarrow"
        )
    ]
    vids_sorted = np.sort(np.concatenate(vid_rows).astype(np.uint64))
    V = len(vids_sorted)

    tot_row = pairs.aggregate(Sum("n", alias_name="w"))
    total_w = float(tot_row["w"])
    n_pairs = pairs.count()

    rng = np.random.Generator(np.random.Philox(key=[seed, 1]))
    w_in = (rng.random((V, dim)) - 0.5) / dim
    w_out = np.zeros((V, dim), dtype=np.float64)

    gcols = [f"g{k}" for k in range(dim)]
    losses: list[float] = []
    for epoch in range(epochs):
        params_ref = ray.put((w_in, w_out, vids_sorted))
        ep = np.uint64(epoch)

        def _grad(batch: pa.Table, _ref=params_ref, _ep=ep) -> pa.Table:
            win, wout, vs = ray.get(_ref)
            c_u = batch.column("center").to_numpy(zero_copy_only=False).astype(np.uint64)
            x_u = batch.column("context").to_numpy(zero_copy_only=False).astype(np.uint64)
            nw = batch.column("n").to_numpy(zero_copy_only=False).astype(np.float64)
            ci = np.searchsorted(vs, c_u)
            xi = np.searchsorted(vs, x_u)
            gin = np.zeros((V, dim))
            gout = np.zeros((V, dim))
            u = win[ci]
            # positive term
            v = wout[xi]
            s = _sigmoid(np.einsum("ij,ij->i", u, v))
            coef = (s - 1.0) * nw
            np.add.at(gin, ci, coef[:, None] * v)
            np.add.at(gout, xi, coef[:, None] * u)
            loss = -np.dot(nw, np.log(np.maximum(s, 1e-12)))
            # negative terms (deterministic splitmix64 stream)
            for k in range(n_neg):
                mix = _splitmix64(
                    c_u
                    ^ _splitmix64(x_u ^ np.uint64(0x9E3779B97F4A7C15))
                    ^ _splitmix64(np.full(len(c_u), _ep * np.uint64(131) + np.uint64(k)))
                )
                ji = (mix % np.uint64(V)).astype(np.int64)
                vj = wout[ji]
                sj = _sigmoid(np.einsum("ij,ij->i", u, vj))
                coefj = sj * nw
                np.add.at(gin, ci, coefj[:, None] * vj)
                np.add.at(gout, ji, coefj[:, None] * u)
                loss += -np.dot(nw, np.log(np.maximum(1.0 - sj, 1e-12)))
            # emit touched rows only, plus one loss row (idx = -1)
            out_idx, out_kind, blocks = [], [], []
            for kind, gm in ((0, gin), (1, gout)):
                touched = np.flatnonzero(np.abs(gm).sum(axis=1))
                out_idx.append(touched)
                out_kind.append(np.full(len(touched), kind, dtype=np.int64))
                blocks.append(gm[touched])
            out_idx.append(np.array([-1], dtype=np.int64))
            out_kind.append(np.array([2], dtype=np.int64))
            lrow = np.zeros((1, dim))
            lrow[0, 0] = loss
            blocks.append(lrow)
            g = np.concatenate(blocks, axis=0)
            cols = {
                "idx": pa.array(np.concatenate(out_idx), type=pa.int64()),
                "kind": pa.array(np.concatenate(out_kind), type=pa.int64()),
            }
            for k in range(dim):
                cols[gcols[k]] = pa.array(g[:, k], type=pa.float64())
            return pa.table(cols)

        summed = (
            pairs.map_batches(_grad, batch_format="pyarrow")
            .groupby(["idx", "kind"])
            .aggregate(*[Sum(c, alias_name=c) for c in gcols])
        )
        grad_in = np.zeros((V, dim))
        grad_out = np.zeros((V, dim))
        ep_loss = 0.0
        for b in summed.iter_batches(batch_size=None, batch_format="pyarrow"):
            idx = b.column("idx").to_numpy(zero_copy_only=False)
            kind = b.column("kind").to_numpy(zero_copy_only=False)
            g = np.stack(
                [b.column(c).to_numpy(zero_copy_only=False) for c in gcols], axis=1
            )
            m0 = kind == 0
            grad_in[idx[m0]] = g[m0]
            m1 = kind == 1
            grad_out[idx[m1]] = g[m1]
            m2 = kind == 2
            if m2.any():
                ep_loss = float(g[m2, 0].sum())
        w_in -= (lr / total_w) * grad_in
        w_out -= (lr / total_w) * grad_out
        losses.append(ep_loss / total_w)

    from ..util import list_array

    emb_ds = rd.from_arrow(
        pa.table(
            {
                "vid": pa.array(vids_sorted, type=pa.uint64()),
                "emb": list_array(
                    [w_in[i] for i in range(V)], np.float64, pa.float64()
                ),
            }
        )
    )
    stats = {
        "epochs": epochs,
        "loss": losses,
        "n_pairs": int(n_pairs),
        "total_weight": total_w,
        "dim": dim,
        "n_vertices": V,
    }
    return emb_ds, stats
