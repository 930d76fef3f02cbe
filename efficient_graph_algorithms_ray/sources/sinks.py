"""Resumable partitioned parquet output — the task-spec sink contract.

At 100 TB a failed job must not restart from zero: output is one
directory per key partition (``part=NNNNN/``), each written atomically
(tmp + rename) and sealed with a ``_SUCCESS`` marker. A rerun skips
sealed partitions BEFORE the shuffle (the filter runs map-side), so
resume cost is proportional to the remaining work, and no output is
ever one giant file. Partitioning uses the engine's splitmix64 of the
key column — deterministic across runs and cluster sizes, so a resumed
run reproduces the same partition assignment.
"""

from __future__ import annotations

import os

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

from .edges_synth import _splitmix64


def _part_dir(out_dir: str, p: int) -> str:
    return os.path.join(out_dir, f"part={p:05d}")


def finished_partitions(out_dir: str) -> set[int]:
    """Partitions already sealed with _SUCCESS."""
    done = set()
    if not os.path.isdir(out_dir):
        return done
    for name in os.listdir(out_dir):
        if name.startswith("part=") and os.path.exists(
            os.path.join(out_dir, name, "_SUCCESS")
        ):
            done.add(int(name.split("=")[1]))
    return done


def write_partitioned_parquet(
    ds,
    out_dir: str,
    key_col: str,
    num_partitions: int = 16,
    *,
    resume: bool = True,
) -> dict:
    """Write ``ds`` as hash-partitioned parquet with per-partition
    resume. Returns {"written": [...], "skipped": [...]}.

    Pipeline shape: one vectorized map adds ``__part`` (splitmix64 of
    the key, mod P) and drops rows of sealed partitions map-side; one
    ``groupby(__part)`` co-locates each partition, whose group task
    writes ``part=NNNNN/data.parquet`` atomically and seals it.
    """
    os.makedirs(out_dir, exist_ok=True)
    done = finished_partitions(out_dir) if resume else set()

    def _assign(batch: pa.Table) -> pa.Table:
        keys = batch.column(key_col)
        knum = keys.to_numpy(zero_copy_only=False)
        if knum.dtype.kind in "iu":
            h = _splitmix64(knum.astype(np.uint64))
        else:
            # strings: in-repo FNV-1a over UTF-8 bytes — stable across
            # library versions (polars .hash() is not), so a resumed run
            # after an upgrade keeps the same partition assignment
            from ..functions.text import hash_token

            h = np.fromiter(
                (hash_token(str(k)) for k in knum), dtype=np.uint64, count=len(knum)
            )
        part = (h % np.uint64(num_partitions)).astype(np.int64)
        batch = batch.append_column("__part", pa.array(part, type=pa.int64()))
        if done:
            keep = ~np.isin(part, list(done))
            batch = batch.filter(pa.array(keep))
        return batch

    def _write_group(group: pa.Table) -> pa.Table:
        p = int(group.column("__part")[0].as_py())
        pdir = _part_dir(out_dir, p)
        os.makedirs(pdir, exist_ok=True)
        tmp = os.path.join(pdir, ".data.parquet.tmp")
        pq.write_table(group.drop_columns(["__part"]), tmp)
        os.replace(tmp, os.path.join(pdir, "data.parquet"))
        with open(os.path.join(pdir, "_SUCCESS"), "w") as f:
            f.write("")
        return pa.table({"part": pa.array([p], type=pa.int64())})

    written_ds = (
        ds.map_batches(_assign, batch_format="pyarrow")
        .groupby("__part")
        .map_groups(_write_group, batch_format="pyarrow")
    )
    written = sorted(
        int(v)
        for b in written_ds.iter_batches(batch_size=None, batch_format="pyarrow")
        for v in b.column("part").to_pylist()
    )
    return {"written": written, "skipped": sorted(done)}


def read_partitioned_parquet(out_dir: str):
    """Read back a partitioned sink directory (sealed partitions only)."""
    import ray.data as rd

    paths = [
        os.path.join(_part_dir(out_dir, p), "data.parquet")
        for p in sorted(finished_partitions(out_dir))
    ]
    if not paths:  # zero sealed partitions: empty dataset, not a read error
        return rd.from_arrow(pa.table({}))
    return rd.read_parquet(paths)
