"""Anchor-text index vs a sequential dict replay on synthetic pages."""

from collections import Counter

import pyarrow.parquet as pq
import ray.data as rd

from efficient_graph_algorithms_ray.pipelines.anchors import anchor_text_index
from efficient_graph_algorithms_ray.sources.pages import write_pages
from efficient_graph_algorithms_ray.stages.extract import extract_anchors
from efficient_graph_algorithms_ray.stages.hashing import normalize_urls


def _reference_index(pages_tbl, k):
    import pyarrow as pa

    counts: Counter = Counter()
    for blob in pages_tbl.column("html").to_pylist():
        for href, text in extract_anchors(blob):
            href_n = normalize_urls(pa.array([href])).to_pylist()[0]
            for tok in text.split():
                counts[(href_n, tok)] += 1
    per_url: dict[str, list] = {}
    for (url, term), n in counts.items():
        per_url.setdefault(url, []).append((term, n))
    out = {}
    for url, rows in per_url.items():
        rows.sort(key=lambda r: (-r[1], r[0]))
        out[url] = [(t, n, i + 1) for i, (t, n) in enumerate(rows[:k])]
    return out


def test_anchor_index_matches_sequential_replay(tmp_path):
    path = write_pages(str(tmp_path / "pages"), n_pages=300, seed=9)
    tbl = pq.read_table(path)
    ref = _reference_index(tbl, k=3)

    got = anchor_text_index(
        rd.read_parquet(path, columns=["url", "html"]), k=3, concurrency=2
    ).to_pandas()
    got_map: dict[str, list] = {}
    for r in got.itertuples():
        got_map.setdefault(r.url, []).append((r.term, int(r.n), int(r.rk)))
    for url in got_map:
        got_map[url].sort(key=lambda x: x[2])

    assert got_map == ref


def test_anchor_index_counts_are_summed_across_batches(tmp_path):
    path = write_pages(str(tmp_path / "pages2"), n_pages=120, seed=4)
    # force tiny parse batches: the map-side combiner partials must
    # merge exactly in the (url, term) groupby
    full = anchor_text_index(
        rd.read_parquet(path, columns=["url", "html"]),
        k=5,
        batch_size=7,
        concurrency=2,
    ).to_pandas()
    ref = _reference_index(pq.read_table(path), k=5)
    assert len(full) == sum(len(v) for v in ref.values())
