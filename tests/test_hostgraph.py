"""Host-graph collapse: extraction, edge aggregation, weighted ranks."""

from __future__ import annotations

import tempfile

import numpy as np
import pyarrow as pa
import ray.data as rd

from efficient_graph_algorithms_ray.pipelines.hostgraph import (
    host_edges,
    host_pagerank_topk,
    hosts_of,
)


def test_hosts_of():
    urls = pa.array(
        [
            "https://site1.example/p/273",
            "https://ext4.example/r?x=1&y=2",
            "http://a.b.c/d/e",
            "https://bare.example",
            "not a url",
            "ftp://files.example/x",
        ]
    )
    assert hosts_of(urls).to_pylist() == [
        "site1.example",
        "ext4.example",
        "a.b.c",
        "bare.example",
        "",
        "files.example",
    ]


def _parsed_ds():
    return rd.from_arrow(
        pa.table(
            {
                "url": pa.array(
                    [
                        "https://a.example/1",
                        "https://a.example/2",
                        "https://b.example/1",
                    ]
                ),
                "text": pa.array(["", "", ""]),
                "links": pa.array(
                    [
                        # a→b twice, a→a (intra-host, dropped), a→c once
                        ["https://b.example/x", "https://b.example/y", "https://a.example/2", "https://c.example/"],
                        ["https://b.example/x"],
                        ["https://a.example/1", "bad link"],
                    ],
                    type=pa.list_(pa.string()),
                ),
            }
        )
    )


def test_host_edges_aggregation():
    df = host_edges(_parsed_ds()).to_pandas()
    got = {
        (r["src_host"], r["dst_host"]): r["w"] for _, r in df.iterrows()
    }
    # per-batch pre-aggregation may split across batches; re-sum
    agg: dict = {}
    for k, w in got.items():
        agg[k] = agg.get(k, 0) + w
    assert agg == {
        ("a.example", "b.example"): 3.0,
        ("a.example", "c.example"): 1.0,
        ("b.example", "a.example"): 1.0,
    }


def test_host_pagerank_runs_and_sums():
    from efficient_graph_algorithms_ray.sources.pages import write_pages

    pages = rd.read_parquet(
        write_pages("/tmp/ega_hosttest", n_pages=400), columns=["url", "html"]
    )
    out, s = host_pagerank_topk(
        pages, tempfile.mkdtemp(prefix="hpr_", dir="/tmp"), k=5
    )
    df = out.to_pandas()
    assert len(df) == 5
    assert s["converged"]
    assert (df["rank"].to_numpy() > 0).all()
    assert df["rank"].is_monotonic_decreasing
    assert df["host"].str.endswith(".example").all()
