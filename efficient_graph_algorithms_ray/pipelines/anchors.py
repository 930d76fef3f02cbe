"""Anchor-text index: top-k anchor terms per target URL.

The classic web-search signal (anchor text describes the TARGET page
better than the page itself — Brin & Page '98 §2.2): explode every
well-formed ``<a href>…</a>`` into (normalized target url, term)
counts and keep the k most frequent terms per target.

Reference analogue: the raw→edges extractor family
(/root/reference/src/ega/util/mesh_utils.py:41-73) extended with the
per-edge payload; there is no single-node equivalent in the reference
— this is one of the engine's training-data additions.

Shuffle plan: the actor-pool parse stage emits anchor-term counts
pre-aggregated PER BATCH (popular targets are the textbook hot key —
every page links to hubs; the map-side combine bounds the exchange to
one row per distinct (url, term) per batch), one combiner-backed
``groupby(url, term).sum`` exchange, then a per-block partial top-k
before the final per-url merge — top-k over final counts is a monoid,
so the partial pass is exact, and no stage holds more than a block.
Targets never crawled still get an index row (anchor text for
uncrawled pages is standard).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from ..stages.extract import AnchorParser


def _topk_per_url(tbl: pa.Table, k: int) -> pa.Table:
    """Keep the k best (n desc, term asc) rows per url — vectorized."""
    if tbl.num_rows == 0:
        return tbl
    idx = pc.sort_indices(
        tbl,
        sort_keys=[("url", "ascending"), ("n", "descending"), ("term", "ascending")],
    )
    tbl = tbl.take(idx)
    urls = np.asarray(tbl.column("url").to_pylist(), dtype=object)
    first = np.ones(len(urls), dtype=bool)
    first[1:] = urls[1:] != urls[:-1]
    run_start = np.maximum.accumulate(np.where(first, np.arange(len(urls)), 0))
    rk = np.arange(len(urls)) - run_start + 1
    keep = rk <= k
    out = tbl.filter(pa.array(keep))
    return out.append_column("rk", pa.array(rk[keep].astype(np.int64), type=pa.int64()))


def anchor_text_index(pages_ds, k: int = 3, batch_size: int = 256, concurrency=None):
    """pages (url, html) → Dataset (url, term, n, rk): the top-k anchor
    terms pointing at every normalized target url."""
    from ray.data.aggregate import Sum

    if concurrency is None:
        import ray

        total = int(ray.cluster_resources().get("CPU", 4))
        concurrency = (2, max(2, total - 2))
    partials = pages_ds.map_batches(
        AnchorParser,
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=concurrency,
        max_restarts=0,  # see stages/extract.parse_pages (ray#53727)
    )
    totals = partials.groupby(["url", "term"]).aggregate(Sum("n", alias_name="n"))

    def _partial(b: pa.Table) -> pa.Table:
        return _topk_per_url(b, k).drop_columns(["rk"])

    def _final(g: pa.Table) -> pa.Table:
        return _topk_per_url(g, k)

    return (
        totals.map_batches(_partial, batch_format="pyarrow")
        .groupby("url")
        .map_groups(_final, batch_format="pyarrow")
    )
