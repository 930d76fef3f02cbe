"""URL normalization and vertex-id hashing — vectorized via polars.

The reference keeps a node-id ↔ dense-index dictionary (``GIDMapper``,
/root/reference/src/ega/algorithms/graph_kernels.py:123-144). At web
scale a dictionary-encoding pass would itself be a shuffle, so the
engine instead uses a *stateless* stable 64-bit hash of the normalized
url as the vertex id (polars' seeded xxhash — verified deterministic
across processes for a pinned polars version). Collisions over 2^64
are negligible at 1e12 docs (birthday bound ~ 2.7e-5).
"""

from __future__ import annotations

import numpy as np
import polars as pl
import pyarrow as pa

from ..config import HASH_SEED


def normalize_urls(arr: pa.Array | pa.ChunkedArray) -> pa.ChunkedArray:
    """Vectorized url normalization: trim whitespace, drop the #fragment.

    Generated urls are already lowercase/absolute; href unescaping
    happens at extraction time (stages/extract.py).
    """
    s = pl.Series(pl.from_arrow(arr))
    s = s.str.strip_chars().str.split("#").list.first()
    out = s.to_arrow()
    if isinstance(out, pa.Array):
        out = pa.chunked_array([out])
    return out.cast(pa.string())


def hash_to_vid(arr: pa.Array | pa.ChunkedArray | list[str]) -> np.ndarray:
    """Stable uint64 vid for each url (already-normalized input)."""
    if isinstance(arr, list):
        arr = pa.array(arr, type=pa.string())
    s = pl.Series(pl.from_arrow(arr))
    return s.hash(seed=HASH_SEED).to_numpy().astype(np.uint64, copy=False)
