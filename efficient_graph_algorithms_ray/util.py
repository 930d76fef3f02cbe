"""Small vectorized helpers shared across stages.

All helpers operate on Arrow columns / NumPy arrays — no Python
per-row loops in any of them.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa


def parts_dataset(parts) -> "object":
    """Partition-id fan-out seed: one block PER partition row.

    ``rd.from_arrow(pa.table({"part": ...}))`` packs every partition id
    into a SINGLE block, and block = task in Ray Data — so a downstream
    ``map_batches(batch_size=1)`` per-shard emitter runs sequentially in
    one task (measured: 10.3 s vs 2.2 s end-to-end on the 2.4M-edge
    triangle bench at 32 cpus). ``from_items`` with
    ``override_num_blocks=len(parts)`` pins one row per block so the
    per-shard work fans out to len(parts) parallel tasks.
    """
    import ray.data as rd

    items = [{"part": int(p)} for p in parts]
    return rd.from_items(items, override_num_blocks=max(1, len(items)))


def list_rows(table: pa.Table, name: str) -> list[np.ndarray]:
    """Zero-copy-ish extraction of a list<T> column as one ndarray per row.

    Uses the ListArray offsets + flat values buffer instead of
    ``to_pylist`` so a multi-million-element list cell never becomes a
    Python list.
    """
    col = table.column(name)
    out: list[np.ndarray] = []
    for chunk in col.chunks if isinstance(col, pa.ChunkedArray) else [col]:
        # offsets are absolute indices into chunk.values (also for slices)
        offsets = chunk.offsets.to_numpy(zero_copy_only=False)
        values = chunk.values.to_numpy(zero_copy_only=False)
        for i in range(len(chunk)):
            out.append(values[offsets[i] : offsets[i + 1]])
    return out


def flatten_list_column(table: pa.Table, name: str) -> np.ndarray:
    """All list cells of a column concatenated into one flat ndarray."""
    rows = list_rows(table, name)
    if not rows:
        return np.empty(0)
    return np.concatenate(rows)


def list_array(row_arrays: list[np.ndarray], dtype, arrow_type) -> pa.ListArray:
    """Build a list<arrow_type> array from per-row ndarrays (one concat, no loops)."""
    lengths = np.fromiter((len(a) for a in row_arrays), dtype=np.int64, count=len(row_arrays))
    offsets = np.zeros(len(row_arrays) + 1, dtype=np.int32)
    np.cumsum(lengths, out=offsets[1:])
    flat = (
        np.concatenate(row_arrays).astype(dtype, copy=False)
        if row_arrays
        else np.empty(0, dtype=dtype)
    )
    return pa.ListArray.from_arrays(pa.array(offsets, type=pa.int32()), pa.array(flat, type=arrow_type))


def group_reduce(keys: np.ndarray, vals: np.ndarray, op: str) -> tuple[np.ndarray, np.ndarray]:
    """Vectorized grouped reduction: returns (unique_keys_sorted, reduced_vals).

    op: 'sum' | 'min'. Sort + reduceat — no ufunc.at (which is slow).
    """
    if len(keys) == 0:
        return keys, vals
    order = np.argsort(keys, kind="stable")
    ks, vs = keys[order], vals[order]
    boundaries = np.flatnonzero(np.concatenate(([True], ks[1:] != ks[:-1])))
    uk = ks[boundaries]
    if op == "sum":
        reduced = np.add.reduceat(vs, boundaries)
    elif op == "min":
        reduced = np.minimum.reduceat(vs, boundaries)
    else:  # pragma: no cover
        raise ValueError(op)
    return uk, reduced


def dedup_pairs(a: np.ndarray, b: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """Exact dedup of (a, b) pairs, returned sorted lexicographically by (a, b)."""
    if len(a) == 0:
        return a, b
    order = np.lexsort((b, a))
    a, b = a[order], b[order]
    keep = np.concatenate(([True], (a[1:] != a[:-1]) | (b[1:] != b[:-1])))
    return a[keep], b[keep]


def pair_struct(a: np.ndarray, b: np.ndarray) -> np.ndarray:
    """Pack two uint64 columns into a structured array for lexicographic
    searchsorted — exact pair membership tests without 128-bit ints."""
    out = np.empty(len(a), dtype=[("a", "<u8"), ("b", "<u8")])
    out["a"], out["b"] = a, b
    return out


def pairs_in_sorted(query_a, query_b, sorted_pairs: np.ndarray) -> np.ndarray:
    """Vectorized membership: which (query_a, query_b) pairs occur in
    sorted_pairs (a structured array sorted ascending)."""
    q = pair_struct(np.ascontiguousarray(query_a), np.ascontiguousarray(query_b))
    pos = np.searchsorted(sorted_pairs, q)
    hit = pos < len(sorted_pairs)
    hit[hit] = sorted_pairs[pos[hit]] == q[hit]
    return hit
