"""Host-level link graph — the canonical web-pipeline collapse step.

Every production link-graph run aggregates the url→url edge stream to
a host (or registrable-domain) graph before centrality: hosts are
~3 orders of magnitude fewer than pages, intra-host links are
navigation boilerplate, and host-level PageRank is the spam/authority
signal. This pipeline derives (src_host, dst_host, weight=#links)
edges from the parsed pages, drops intra-host links, and runs the
engine's weighted PageRank over the collapsed graph.

Scale shape: host extraction and per-batch (src,dst) count
pre-aggregation are map-side (the link stream never shuffles as
strings — only the pre-counted host pairs do); the host graph build
reuses the standard CSR pack (weighted), so parallel host pairs from
different batches sum their weights inside the one groupby(part) the
build already pays. Reverse mapping winners to host strings filters
the (vid, host) dictionary distributedly with the tiny winner set
(never collects the dictionary).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from ..stages.hashing import hash_to_vid

_HOST_RE = r"^[a-z][a-z0-9+.-]*://(?P<host>[^/?#]+)"


def hosts_of(urls: pa.Array | pa.ChunkedArray) -> pa.Array:
    """Vectorized scheme://host[/...] → host (empty string if no match)."""
    ex = pc.extract_regex(urls, _HOST_RE)
    return pc.fill_null(pc.struct_field(ex, "host"), "")


def host_edges(parsed_ds):
    """parsed (url, links) → pre-aggregated host edges
    (src: uint64, dst: uint64, w: float64, src_host, dst_host)."""

    def _explode(batch: pa.Table) -> pa.Table:
        links = batch.column("links")
        urls = batch.column("url")
        chunks = links.chunks if isinstance(links, pa.ChunkedArray) else [links]
        reps = (
            np.concatenate(
                [np.diff(c.offsets.to_numpy(zero_copy_only=False)) for c in chunks]
            )
            if chunks
            else np.empty(0, dtype=np.int64)
        )
        src_urls = urls.take(pa.array(np.repeat(np.arange(len(reps)), reps)))
        dst_urls = pa.chunked_array([c.flatten() for c in chunks])
        sh = hosts_of(src_urls).to_pandas().to_numpy(dtype=object)
        dh = hosts_of(dst_urls).to_pandas().to_numpy(dtype=object)
        keep = (sh != dh) & (sh != "") & (dh != "")
        sh, dh = sh[keep], dh[keep]
        # per-batch (src_host, dst_host) count pre-aggregation
        if len(sh):
            pairs = np.char.add(np.char.add(sh.astype(str), "\x01"), dh.astype(str))
            uniq, inv, cnt = np.unique(pairs, return_inverse=True, return_counts=True)
            first = np.zeros(len(uniq), dtype=np.int64)
            first[inv[::-1]] = np.arange(len(pairs) - 1, -1, -1)
            us = sh[first]
            ud = dh[first]
            w = cnt.astype(np.float64)
        else:
            us = np.empty(0, dtype=object)
            ud = np.empty(0, dtype=object)
            w = np.empty(0, dtype=np.float64)
        sarr = pa.array(list(us), type=pa.string())
        darr = pa.array(list(ud), type=pa.string())
        return pa.table(
            {
                "src": pa.array(hash_to_vid(sarr), type=pa.uint64()),
                "dst": pa.array(hash_to_vid(darr), type=pa.uint64()),
                "w": pa.array(w, type=pa.float64()),
                "src_host": sarr,
                "dst_host": darr,
            }
        )

    return parsed_ds.map_batches(_explode, batch_format="pyarrow")


def host_vertex_table(host_edges_ds):
    """(vid, host) dictionary rows (duplicates fine — consumers filter
    by a tiny vid set and dedup the handful of survivors)."""

    def _verts(batch: pa.Table) -> pa.Table:
        return pa.table(
            {
                "vid": pa.concat_arrays(
                    [
                        batch.column("src").combine_chunks(),
                        batch.column("dst").combine_chunks(),
                    ]
                ),
                "host": pa.concat_arrays(
                    [
                        batch.column("src_host").combine_chunks(),
                        batch.column("dst_host").combine_chunks(),
                    ]
                ),
            }
        )

    return host_edges_ds.map_batches(_verts, batch_format="pyarrow")


def host_pagerank_topk(pages_ds, ckpt_dir: str, *, k: int = 20, num_partitions: int = 8):
    """pages → host graph → weighted PageRank → top-k (host, rank)."""
    import pyarrow.compute as pc2

    from ..config import EngineConfig
    from ..stages.extract import parse_pages
    from .graph_build import build_graph
    from .pagerank import pagerank, top_k_ranks

    parsed = parse_pages(pages_ds).materialize()
    he = host_edges(parsed).materialize()
    g = build_graph(
        he.select_columns(["src", "dst", "w"]),
        EngineConfig(num_partitions=num_partitions),
        directed=True,
    )
    ranks, summary = pagerank(g, ckpt_dir, tol=1e-6, max_iters=100)
    top = top_k_ranks(ranks, k).to_pandas()
    vset = pa.array(top["vid"].to_numpy().astype(np.uint64), type=pa.uint64())

    def _flt(b: pa.Table) -> pa.Table:
        return b.filter(pc2.is_in(b.column("vid"), value_set=vset))

    hits = (
        host_vertex_table(he)
        .map_batches(_flt, batch_format="pyarrow")
        .to_pandas()
        .drop_duplicates("vid")
        .set_index("vid")["host"]
    )
    hosts = [hits.get(v, "<unknown>") for v in top["vid"]]
    return (
        pa.table(
            {
                "host": pa.array(hosts, type=pa.string()),
                "rank": pa.array(top["rank"].to_numpy(), type=pa.float64()),
            }
        ),
        summary,
    )
