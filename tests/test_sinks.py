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


def test_read_empty_sink_dir_returns_empty_dataset(tmp_path):
    """Zero sealed partitions → an empty dataset, not a read error."""
    from efficient_graph_algorithms_ray.sources.sinks import read_partitioned_parquet

    empty = str(tmp_path / "nothing")
    ds = read_partitioned_parquet(empty)
    assert ds.count() == 0


def test_string_key_partitioning_is_fnv_stable(tmp_path):
    """String keys partition by the in-repo FNV-1a (library-version
    independent), so a resume after an upgrade keeps assignments."""
    import pyarrow as pa
    import ray.data as rd

    from efficient_graph_algorithms_ray.functions.text import hash_token
    from efficient_graph_algorithms_ray.sources.sinks import (
        read_partitioned_parquet,
        write_partitioned_parquet,
    )

    keys = [f"url-{i}" for i in range(40)]
    ds = rd.from_arrow(pa.table({"k": keys, "v": list(range(40))}))
    out = str(tmp_path / "s")
    write_partitioned_parquet(ds, out, "k", 4)
    back = read_partitioned_parquet(out).to_pandas()
    assert sorted(back["v"]) == list(range(40))
    # every row landed in the partition its FNV hash names
    import os

    for p in range(4):
        f = os.path.join(out, f"part={p:05d}", "data.parquet")
        if not os.path.exists(f):
            continue
        import pyarrow.parquet as pq

        part_keys = pq.read_table(f).column("k").to_pylist()
        for k in part_keys:
            assert hash_token(k) % 4 == p
