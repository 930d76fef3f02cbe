"""Deterministic synthetic edge table at arbitrary scale.

For throughput/scaling benches the html-parse stage would dominate and
cap the graph size; this source materializes a power-law directed edge
table straight from row indices (splitmix64 arithmetic — identical
regardless of batching, no RNG objects), so superstep compute can be
sized to dominate scheduling overhead.

Degree model: src ~ near-uniform over V (most vertices emit edges),
dst ~ u^3-skewed (heavy in-degree hubs — the web-graph shape that
stresses the pre-aggregated message path).
"""

from __future__ import annotations

import json
import os

import numpy as np
import pyarrow as pa

_C1 = np.uint64(0x9E3779B97F4A7C15)
_C2 = np.uint64(0xBF58476D1CE4E5B9)
_C3 = np.uint64(0x94D049BB133111EB)


def _splitmix64(x: np.ndarray) -> np.ndarray:
    with np.errstate(over="ignore"):
        x = (x + _C1).astype(np.uint64)
        x ^= x >> np.uint64(30)
        x *= _C2
        x ^= x >> np.uint64(27)
        x *= _C3
        x ^= x >> np.uint64(31)
    return x


def edges_batch(indices: np.ndarray, n_vertices: int, seed: int = 42) -> pa.Table:
    i = indices.astype(np.uint64)
    with np.errstate(over="ignore"):
        u_src = _splitmix64(i + np.uint64(seed) * _C2) / np.float64(2**64)
        u_dst = _splitmix64(i + np.uint64(seed + 1) * _C3) / np.float64(2**64)
    src = np.floor(u_src * n_vertices).astype(np.uint64)
    dst = np.floor((u_dst**3) * n_vertices).astype(np.uint64)
    return pa.table(
        {
            "src": pa.array(src, type=pa.uint64()),
            "dst": pa.array(dst, type=pa.uint64()),
        }
    )


def synthetic_edges(n_edges: int, n_vertices: int | None = None, seed: int = 42):
    """Lazy Dataset of n_edges power-law edge rows."""
    import ray.data as rd

    V = n_vertices or max(16, n_edges // 10)

    def _gen(batch: pa.Table) -> pa.Table:
        return edges_batch(batch.column("id").to_numpy(), V, seed)

    return rd.range(n_edges).map_batches(_gen, batch_format="pyarrow", batch_size=1_000_000)


def write_synthetic_edges(out_dir: str, n_edges: int, seed: int = 42) -> str:
    """Cached parquet materialization (manifest-keyed, like pages)."""
    manifest = os.path.join(out_dir, "_MANIFEST.json")
    want = {"n_edges": n_edges, "seed": seed, "version": 1}
    if os.path.exists(manifest):
        with open(manifest) as f:
            if json.load(f) == want:
                return out_dir
    import shutil

    shutil.rmtree(out_dir, ignore_errors=True)
    os.makedirs(out_dir, exist_ok=True)
    synthetic_edges(n_edges, seed=seed).write_parquet(out_dir)
    with open(manifest, "w") as f:
        json.dump(want, f)
    return out_dir
