"""Checkpoint file I/O — import-light on purpose.

BSP worker processes import this module (numpy + pyarrow.parquet
only); keeping ``ray.data`` out of the worker import graph cuts
actor cold-start from seconds to milliseconds.
"""

from __future__ import annotations

import os

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

_F64 = pa.float64()
_U64 = pa.uint64()


def iter_dir(ckpt: str, k: int) -> str:
    return os.path.join(ckpt, f"iter_{k:05d}")


def manifest_path(ckpt: str, k: int) -> str:
    return os.path.join(ckpt, f"iter_{k:05d}.json")


def part_file(idir: str, p: int) -> str:
    return os.path.join(idir, f"part_{p:05d}.parquet")


def write_state_part(idir: str, p: int, value: np.ndarray, mode: str) -> None:
    """Atomic per-partition state file; vector fields ([n, d]) are
    stored flattened with their width for exact round-trip."""
    os.makedirs(idir, exist_ok=True)
    arrow_type = _U64 if mode == "min" else _F64  # sum/max: float fields
    # width 0 encodes a 1-D array; >0 a 2-D [n, width] field (so [n, 1]
    # round-trips as 2-D — the d=1 vector-field edge case)
    width = value.shape[1] if value.ndim == 2 else 0
    flat = np.ascontiguousarray(value).reshape(-1)
    offsets = pa.array(np.array([0, len(flat)], dtype=np.int32), type=pa.int32())
    values = pa.array(flat, type=arrow_type)
    tbl = pa.table(
        {
            "part": pa.array([p], type=pa.int64()),
            "width": pa.array([width], type=pa.int64()),
            "value": pa.ListArray.from_arrays(offsets, values),
        }
    )
    tmp = os.path.join(idir, f".part_{p:05d}.tmp.parquet")
    pq.write_table(tbl, tmp)
    os.replace(tmp, part_file(idir, p))


def read_state_part(idir: str, p: int) -> np.ndarray:
    tbl = pq.read_table(part_file(idir, p))
    chunk = tbl.column("value").chunk(0)
    offs = chunk.offsets.to_numpy(zero_copy_only=False)
    flat = chunk.values.to_numpy(zero_copy_only=False)[offs[0] : offs[1]]
    width = tbl.column("width")[0].as_py() if "width" in tbl.schema.names else 0
    return flat.reshape(-1, width) if width > 0 else flat


def find_last_complete(ckpt: str) -> int:
    """Highest iteration with a manifest, or -1."""
    last = -1
    if not os.path.isdir(ckpt):
        return last
    for name in os.listdir(ckpt):
        if name.startswith("iter_") and name.endswith(".json"):
            last = max(last, int(name[5:10]))
    return last
