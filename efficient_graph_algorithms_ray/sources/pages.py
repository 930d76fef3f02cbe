"""Deterministic synthetic Common-Crawl-style pages table.

Schema per ``BASELINE.json input_hint``:
``(url: string, warc_ts: timestamp[us], html: binary, text: string, lang: string)``

Mirrors the reference's raw-input→graph extraction stage
(``trimesh_to_adjacency_matrices``, /root/reference/src/ega/util/
mesh_utils.py:41-73): here the raw blob is html and the adjacency is
href links.

Determinism: every page's randomness comes from a counter-based
``np.random.Philox(key=[seed, page_index])`` generator, so the table
is identical regardless of how the index range is batched across Ray
tasks — and across runs. No wall-clock anywhere (``warc_ts`` is a
fixed epoch + row index).

Web-graph realism knobs (all deterministic):
- power-law site sizes (hub sites),
- per-page out-link counts ~ truncated Zipf,
- link targets skewed to low page numbers (hub pages) and low site
  ids → heavy in-degree skew, exercising the salted/pre-aggregated
  shuffle path,
- deliberate duplicate links and self-links (exercise edge dedup),
- a slice of external/never-crawled hrefs (exercise dangling mass),
- hrefs html-escaped in the markup (``&amp;``) so extraction must
  unescape.
"""

from __future__ import annotations

import html as _html
import json
import os

import numpy as np
import pyarrow as pa

PAGES_SCHEMA = pa.schema(
    [
        ("url", pa.string()),
        ("warc_ts", pa.timestamp("us")),
        ("html", pa.binary()),
        ("text", pa.string()),
        ("lang", pa.string()),
    ]
)

_EPOCH_US = np.datetime64("2024-01-01T00:00:00", "us").astype(np.int64)

_WORDS = (
    "the quick brown fox jumps over lazy dog data graph engine ray arrow stream "
    "shuffle vertex edge rank label triangle crawl web page link site index block "
    "batch actor pool kernel field integrate diffusion tree cluster partition hash "
    "über naïve café schön straße déjà vu réseau königsberg zürich "
    "alpha beta gamma delta epsilon zeta eta theta iota kappa lambda mu"
).split()

_LANGS = ("en", "de", "fr")


def site_layout(n_pages: int, seed: int = 42) -> tuple[np.ndarray, np.ndarray]:
    """Power-law site sizes summing exactly to n_pages → (sizes, offsets)."""
    n_sites = max(4, n_pages // 64)
    ranks = np.arange(1, n_sites + 1, dtype=np.float64)
    w = ranks ** -1.2
    w /= w.sum()
    sizes = np.maximum(1, np.floor(w * n_pages)).astype(np.int64)
    # adjust to exact total deterministically (trim/pad largest sites first)
    diff = int(n_pages - sizes.sum())
    i = 0
    while diff != 0:
        step = 1 if diff > 0 else -1
        if sizes[i % n_sites] + step >= 1:
            sizes[i % n_sites] += step
            diff -= step
        i += 1
    offsets = np.zeros(n_sites + 1, dtype=np.int64)
    np.cumsum(sizes, out=offsets[1:])
    return sizes, offsets


def page_url(site: int, k: int) -> str:
    return f"https://site{site}.example/p/{k}"


def _render_page(i: int, sizes: np.ndarray, offsets: np.ndarray, seed: int) -> tuple:
    rng = np.random.Generator(np.random.Philox(key=[seed, i]))
    n_sites = len(sizes)
    site = int(np.searchsorted(offsets, i, side="right") - 1)
    k = i - int(offsets[site])
    url = page_url(site, k)

    title_words = " ".join(_WORDS[j] for j in rng.integers(0, len(_WORDS), size=3))
    title = f"site{site} p{k} {title_words}"
    n_para = 1 + int(rng.integers(0, 3))
    paras = [
        " ".join(_WORDS[j] for j in rng.integers(0, len(_WORDS), size=8 + int(rng.integers(0, 12))))
        for _ in range(n_para)
    ]
    text = "\n".join([title] + paras)

    n_links = int(min(rng.zipf(1.3), 30))
    hrefs: list[str] = []
    for _ in range(n_links):
        r = rng.random()
        if r < 0.08:  # external / dangling target
            hrefs.append(f"https://ext{int(rng.integers(0, 50))}.example/r?x=1&y={int(rng.integers(0, 9))}")
            continue
        if r < 0.70:
            t_site = site
        else:  # cross-site, biased to low (hub) sites
            t_site = int(n_sites * rng.random() ** 3.0)
        t_size = int(sizes[t_site])
        t_k = int(t_size * rng.random() ** 2.5)  # biased to page 0 (hub pages)
        hrefs.append(page_url(t_site, t_k))
    if hrefs and rng.random() < 0.3:
        hrefs.append(hrefs[0])  # deliberate duplicate link
    if rng.random() < 0.1:
        hrefs.append(url)  # deliberate self-link

    anchors = "".join(
        f'<a href="{_html.escape(h, quote=True)}">{_WORDS[int(rng.integers(0, len(_WORDS)))]}</a>'
        for h in hrefs
    )
    body = "".join(f"<p>{p}</p>" for p in paras)
    page_html = (
        f"<html><head><title>{title}</title></head>"
        f"<body>{body}<nav>{anchors}</nav></body></html>"
    ).encode("utf-8")

    return url, int(_EPOCH_US + i * 1_000_000), page_html, text, _LANGS[i % 3]


def pages_batch(indices: np.ndarray, n_pages: int, seed: int = 42) -> pa.Table:
    """Render a batch of pages by global row index → Arrow table."""
    sizes, offsets = site_layout(n_pages, seed)
    rows = [_render_page(int(i), sizes, offsets, seed) for i in indices]
    cols = list(zip(*rows)) if rows else ([], [], [], [], [])
    return pa.Table.from_arrays(
        [
            pa.array(cols[0], type=pa.string()),
            pa.array(np.asarray(cols[1], dtype=np.int64)).cast(pa.timestamp("us")),
            pa.array(cols[2], type=pa.binary()),
            pa.array(cols[3], type=pa.string()),
            pa.array(cols[4], type=pa.string()),
        ],
        schema=PAGES_SCHEMA,
    )


def pages_table(n_pages: int, seed: int = 42) -> pa.Table:
    """Whole table in one call — small fixtures / sequential oracle runs."""
    return pages_batch(np.arange(n_pages), n_pages, seed)


def pages_dataset(n_pages: int, seed: int = 42, num_blocks: int | None = None):
    """Distributed generation as a Ray Dataset (lazy)."""
    import ray.data as rd

    layout_seed = seed  # closure-captured; layout recomputed per task (cheap)

    def _gen(batch: pa.Table) -> pa.Table:
        return pages_batch(batch.column("id").to_numpy(), n_pages, layout_seed)

    ds = rd.range(n_pages, override_num_blocks=num_blocks)
    return ds.map_batches(_gen, batch_format="pyarrow", batch_size=4096)


def write_pages(out_dir: str, n_pages: int, seed: int = 42, num_blocks: int | None = None) -> str:
    """Generate + write the pages table as partitioned parquet (cached).

    A manifest records (n_pages, seed); matching manifest → reuse, so
    bench runs don't regenerate.
    """
    manifest = os.path.join(out_dir, "_MANIFEST.json")
    want = {"n_pages": n_pages, "seed": seed, "version": 3}
    if os.path.exists(manifest):
        with open(manifest) as f:
            if json.load(f) == want:
                return out_dir
    import shutil

    shutil.rmtree(out_dir, ignore_errors=True)
    os.makedirs(out_dir, exist_ok=True)
    pages_dataset(n_pages, seed, num_blocks).write_parquet(out_dir)
    with open(manifest, "w") as f:
        json.dump(want, f)
    return out_dir
