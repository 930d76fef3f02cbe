"""Resumable partitioned parquet sink: atomic per-partition output,
rerun skips sealed partitions."""

from __future__ import annotations

import os

import numpy as np
import pyarrow as pa
import ray.data as rd

from efficient_graph_algorithms_ray.sources.sinks import (
    finished_partitions,
    read_partitioned_parquet,
    write_partitioned_parquet,
)


def _docs(n=200):
    return rd.from_arrow(
        pa.table(
            {
                "doc_id": pa.array(np.arange(n, dtype=np.int64), type=pa.int64()),
                "x": pa.array(np.arange(n, dtype=np.float64)),
            }
        )
    )


def test_write_read_roundtrip_and_resume_skip(tmp_path):
    out = str(tmp_path / "sink")
    res1 = write_partitioned_parquet(_docs(), out, "doc_id", num_partitions=8)
    assert res1["skipped"] == []
    assert sorted(res1["written"]) == sorted(finished_partitions(out))
    back = read_partitioned_parquet(out).to_pandas().sort_values("doc_id")
    assert list(back["doc_id"]) == list(range(200))

    # simulate a partial failure: unseal two partitions
    import shutil

    broken = sorted(finished_partitions(out))[:2]
    for p in broken:
        shutil.rmtree(os.path.join(out, f"part={p:05d}"))
    mtimes = {
        p: os.path.getmtime(os.path.join(out, f"part={p:05d}", "data.parquet"))
        for p in finished_partitions(out)
    }
    res2 = write_partitioned_parquet(_docs(), out, "doc_id", num_partitions=8)
    assert sorted(res2["written"]) == broken  # only the missing partitions
    assert sorted(res2["skipped"]) == sorted(mtimes)
    for p, m in mtimes.items():  # sealed partitions untouched
        assert os.path.getmtime(os.path.join(out, f"part={p:05d}", "data.parquet")) == m
    back2 = read_partitioned_parquet(out).to_pandas().sort_values("doc_id")
    assert list(back2["doc_id"]) == list(range(200))


def test_partition_assignment_deterministic(tmp_path):
    a = write_partitioned_parquet(_docs(64), str(tmp_path / "a"), "doc_id", 4)
    b = write_partitioned_parquet(_docs(64), str(tmp_path / "b"), "doc_id", 4)
    ra = read_partitioned_parquet(str(tmp_path / "a")).to_pandas()
    rb = read_partitioned_parquet(str(tmp_path / "b")).to_pandas()
    assert sorted(ra["doc_id"]) == sorted(rb["doc_id"])
    assert a["written"] == b["written"]
