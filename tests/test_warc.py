"""WARC source/sink: byte-identity roundtrip, member-gzip splittability,
graph-build compatibility."""

from __future__ import annotations

import gzip
import os

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import ray.data as rd

from efficient_graph_algorithms_ray.sources.warc import (
    parse_warc_record,
    read_warc_gz,
    write_warc_gz,
)


def _pages(n=40):
    from efficient_graph_algorithms_ray.sources.pages import write_pages

    d = write_pages("/tmp/warc_pages_src", n_pages=n)
    files = sorted(
        os.path.join(d, f) for f in os.listdir(d) if f.endswith(".parquet")
    )
    return pa.concat_tables([pq.read_table(f) for f in files])


def test_warc_roundtrip_byte_identity(tmp_path):
    tbl = _pages(40)
    path = str(tmp_path / "crawl.warc.gz")
    write_warc_gz(tbl, path)
    got = (
        read_warc_gz(path, override_num_blocks=5)
        .to_pandas()
        .sort_values("url")
        .reset_index(drop=True)
    )
    want = tbl.to_pandas()[["url", "warc_ts", "html"]].sort_values("url").reset_index(drop=True)
    assert list(got["url"]) == list(want["url"])
    assert list(got["warc_ts"]) == list(want["warc_ts"])
    # the html payloads are BYTE-identical through the archive
    assert all(a == b for a, b in zip(got["html"], want["html"]))


def test_warc_members_are_independently_decompressible(tmp_path):
    import json
    import zlib

    tbl = _pages(12)
    path = str(tmp_path / "c.warc.gz")
    write_warc_gz(tbl, path)
    with open(path + ".cdx.json") as f:
        idx = [json.loads(line) for line in f]
    blob = open(path, "rb").read()
    # whole-file gunzip ALSO works (concatenated members), and each
    # member decompresses alone from its offset — the split property
    assert gzip.decompress(blob)
    r = idx[7]
    raw = zlib.decompress(blob[r["offset"] : r["offset"] + r["length"]], wbits=31)
    url, ts, html = parse_warc_record(raw)
    assert url == r["url"]
    assert raw.startswith(b"WARC/1.0\r\n")


def test_warc_feeds_the_flagship_graph_build(tmp_path):
    from efficient_graph_algorithms_ray.config import EngineConfig
    from efficient_graph_algorithms_ray.pipelines.graph_build import graph_from_pages

    tbl = _pages(60)
    path = str(tmp_path / "g.warc.gz")
    write_warc_gz(tbl, path)
    pages_ds = read_warc_gz(path, override_num_blocks=4)
    g = graph_from_pages(pages_ds, EngineConfig(num_partitions=4), directed=True)
    assert g.n_vertices > 0 and g.n_edges > 0
