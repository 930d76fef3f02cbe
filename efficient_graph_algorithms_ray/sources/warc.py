"""WARC/1.0 source & sink — Common Crawl's native archive format.

Public spec: ISO 28500 (WARC); Common Crawl convention: one gzip
MEMBER per record, so a ``.warc.gz`` is a concatenation of
independently-decompressible gzip streams — the property every
distributed WARC reader exploits. This module mirrors it with stdlib
``gzip``/``zlib`` only:

- ``write_warc_gz``: pages table → ``.warc.gz`` (one gzip member per
  ``response`` record; minimal conformant headers) + a ``.cdx.json``
  offset index (the CDX sidecar role: per-record byte offset, length,
  url) — written while encoding, no second pass.
- ``read_warc_gz``: the index rows become the input Dataset
  (``from_items`` of (offset, length, url)); each ``map_batches``
  task seeks to ITS byte ranges and decompresses only its members —
  a block-parallel read with no shared scan state, the same shape a
  multi-node reader over object storage uses (range GETs).
- ``parse_warc_record``: bytes of one member → (url, warc_ts, html).

Pages that round-trip through WARC are byte-identical (tested),
so the extract stage downstream sees exactly the parquet-path bytes.
"""

from __future__ import annotations

import gzip
import json
import os
import zlib

import numpy as np
import pyarrow as pa

_CRLF = b"\r\n"


def _warc_record(url: str, ts_us: int, html: bytes) -> bytes:
    """One WARC/1.0 response record (uncompressed body)."""
    # fixed-format ISO timestamp from the microsecond epoch value
    ts = np.datetime64(ts_us, "us").astype("datetime64[s]")
    iso = str(ts) + "Z"
    headers = (
        b"WARC/1.0" + _CRLF
        + b"WARC-Type: response" + _CRLF
        + b"WARC-Target-URI: " + url.encode() + _CRLF
        + b"WARC-Date: " + iso.encode() + _CRLF
        + b"WARC-TS-Micros: " + str(ts_us).encode() + _CRLF
        + b"Content-Type: text/html" + _CRLF
        + b"Content-Length: " + str(len(html)).encode() + _CRLF
        + _CRLF
    )
    return headers + html + _CRLF + _CRLF


def parse_warc_record(raw: bytes) -> tuple[str, int, bytes]:
    """One decompressed record → (url, warc_ts_us, html bytes)."""
    head_end = raw.index(_CRLF + _CRLF)
    url = ""
    ts_us = 0
    clen = -1
    for line in raw[:head_end].split(_CRLF)[1:]:
        k, _, v = line.partition(b": ")
        if k == b"WARC-Target-URI":
            url = v.decode()
        elif k == b"WARC-TS-Micros":
            ts_us = int(v)
        elif k == b"Content-Length":
            clen = int(v)
    body = raw[head_end + 4 : head_end + 4 + clen]
    return url, ts_us, body


def write_warc_gz(pages_tbl: pa.Table, path: str) -> str:
    """pages Arrow table → ``path`` (.warc.gz, member-per-record) +
    ``path + '.cdx.json'`` offset index. Returns ``path``."""
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    idx = []
    with open(path, "wb") as f:
        off = 0
        for url, ts, html in zip(
            pages_tbl.column("url").to_pylist(),
            pages_tbl.column("warc_ts").cast(pa.int64()).to_pylist(),
            pages_tbl.column("html").to_pylist(),
        ):
            member = gzip.compress(_warc_record(url, int(ts), html), 6)
            f.write(member)
            idx.append({"url": url, "offset": off, "length": len(member)})
            off += len(member)
    with open(path + ".cdx.json", "w") as f:
        for row in idx:
            f.write(json.dumps(row) + "\n")
    return path


def read_warc_gz(path: str, *, override_num_blocks: int | None = None):
    """``.warc.gz`` + its CDX index → Dataset (url, warc_ts, html).

    The index is the only driver-side read (one small line-JSON file —
    on a real deployment it's the CDX listing next to each WARC
    object); record payloads are fetched inside ``map_batches`` tasks
    via per-range seeks, so the heavy bytes never pass through the
    driver and blocks decompress in parallel."""
    import ray.data as rd

    with open(path + ".cdx.json") as f:
        rows = [json.loads(line) for line in f]
    items = [
        {"offset": r["offset"], "length": r["length"]} for r in rows
    ]
    ds = rd.from_items(items, override_num_blocks=override_num_blocks)

    def _fetch(batch: pa.Table) -> pa.Table:
        offs = batch.column("offset").to_pylist()
        lens = batch.column("length").to_pylist()
        urls, tss, htmls = [], [], []
        with open(path, "rb") as f:
            for off, ln in zip(offs, lens):
                f.seek(off)
                raw = zlib.decompress(f.read(ln), wbits=31)
                url, ts_us, html = parse_warc_record(raw)
                urls.append(url)
                tss.append(ts_us)
                htmls.append(html)
        return pa.table(
            {
                "url": pa.array(urls, type=pa.string()),
                "warc_ts": pa.array(tss, type=pa.int64()).cast(pa.timestamp("us")),
                "html": pa.array(htmls, type=pa.binary()),
            }
        )

    return ds.map_batches(_fetch, batch_format="pyarrow")
