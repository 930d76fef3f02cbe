"""Extraction invariants: byte-identity vs the sequential oracle,
determinism across batching, href unescaping."""

from __future__ import annotations

import hashlib

import pyarrow as pa
import ray.data as rd

from efficient_graph_algorithms_ray.sources.pages import pages_table
from efficient_graph_algorithms_ray.stages.extract import (
    extract_page,
    parse_pages,
    sequential_extract,
)


def _text_digest_by_url(tbl: pa.Table) -> str:
    rows = sorted(
        zip(tbl.column("url").to_pylist(), tbl.column("text").to_pylist())
    )
    h = hashlib.sha256()
    for url, text in rows:
        h.update(url.encode())
        h.update(b"\x00")
        h.update(text.encode())
        h.update(b"\x01")
    return h.hexdigest()


def test_distributed_extraction_byte_identical_to_sequential(tiny_pages):
    seq = sequential_extract(tiny_pages)
    dist = parse_pages(rd.from_arrow(tiny_pages), batch_size=37)  # odd batch size on purpose
    dist_tbl = pa.concat_tables(list(dist.iter_batches(batch_format="pyarrow")))
    assert dist_tbl.num_rows == tiny_pages.num_rows
    assert _text_digest_by_url(dist_tbl) == _text_digest_by_url(seq)


def test_extracted_text_matches_generator_ground_truth(tiny_pages):
    """pages.text is the ground-truth extraction output (FIXTURES.md F1)."""
    for html, text in zip(
        tiny_pages.column("html").to_pylist(), tiny_pages.column("text").to_pylist()
    ):
        got, _ = extract_page(html)
        assert got == text  # byte-identical (str equality over exact codepoints)


def test_href_unescaping():
    html = b'<html><head><title>t</title></head><body><p>p</p><nav><a href="https://x.example/r?a=1&amp;b=2">w</a></nav></body></html>'
    text, hrefs = extract_page(html)
    assert hrefs == ["https://x.example/r?a=1&b=2"]
    assert text == "t\np"


def test_generator_deterministic_and_partition_independent():
    a = pages_table(120)
    b = pages_table(120)
    assert a.equals(b)
    # batched generation must match whole-table generation
    import numpy as np

    from efficient_graph_algorithms_ray.sources.pages import pages_batch

    c = pa.concat_tables(
        [pages_batch(np.arange(0, 50), 120), pages_batch(np.arange(50, 120), 120)]
    )
    assert c.equals(a)
