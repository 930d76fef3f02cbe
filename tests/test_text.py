"""Text operators: stats vs python oracles, langid on known text,
fingerprint determinism, multimodal fake-codec plumbing."""

from __future__ import annotations

import re

import numpy as np
import pyarrow as pa
import ray.data as rd

from efficient_graph_algorithms_ray.functions.multimodal import (
    ImageDecoder,
    decode_rgb8,
    synthetic_images,
)
from efficient_graph_algorithms_ray.functions.text import (
    LangId,
    QualityScorer,
    doc_stats_batch,
    fingerprint_batch,
)


def _docs(texts):
    return pa.table(
        {
            "doc_id": pa.array(np.arange(len(texts), dtype=np.int64), type=pa.int64()),
            "text": pa.array(texts, type=pa.string()),
        }
    )


def test_doc_stats_counts():
    texts = ["the cat sat", "a  b\n c", "", "123 !?"]
    out = doc_stats_batch(_docs(texts)).to_pandas()
    assert list(out["n_tokens"]) == [3, 3, 0, 2]
    assert list(out["n_chars_text"]) == [len(t) for t in texts]
    assert list(out["n_alpha"]) == [len(re.findall("[A-Za-z]", t)) for t in texts]


def test_langid_on_clear_samples():
    texts = [
        "the cat and the dog went to the park for a walk in the morning",
        "der hund und die katze sind nicht mit dem zug zu dem park gefahren",
        "le chat et le chien sont dans la maison pour une petite pause",
        "zzz qqq xxx",
    ]
    out = (
        rd.from_arrow(_docs(texts))
        .map_batches(LangId, batch_format="pyarrow", concurrency=2)
        .to_pandas()
        .sort_values("doc_id")
    )
    assert list(out["pred_lang"]) == ["en", "de", "fr", "und"]


def test_quality_scorer_orders_sensibly():
    good = (
        "The quick brown fox jumps over the lazy dog and then runs through "
        "the quiet forest to find some food for the long cold winter ahead. " * 4
    )
    bad = "!!! ??? ### $$$ %%% 12345 67890 @@@@"
    out = (
        rd.from_arrow(_docs([good, bad]))
        .map_batches(QualityScorer, batch_format="pyarrow", concurrency=2)
        .to_pandas()
        .sort_values("doc_id")
    )
    assert out["quality"].iloc[0] > out["quality"].iloc[1] + 0.2


def test_fingerprint_whitespace_normalized_and_order_sensitive():
    out = fingerprint_batch(
        _docs(["hello  world", "hello world", "world hello"])
    ).to_pandas()
    assert out["fingerprint"].iloc[0] == out["fingerprint"].iloc[1]
    assert out["fingerprint"].iloc[0] != out["fingerprint"].iloc[2]


def test_image_decode_roundtrip_and_features():
    tbl = synthetic_images(32, size=16)
    arr0 = decode_rgb8(tbl.column("image")[0].as_py())
    assert arr0.shape == (16, 16, 3)
    out = (
        rd.from_arrow(tbl)
        .map_batches(
            ImageDecoder,
            fn_constructor_kwargs={"codec": "ega1"},
            batch_format="pyarrow",
            batch_size=8,
            concurrency=2,
        )
        .to_pandas()
        .sort_values("img_id")
    )
    assert len(out) == 32
    m0 = np.array(out["mean_rgb"].iloc[0])
    assert np.allclose(m0, arr0.reshape(-1, 3).mean(axis=0), atol=1e-5)
    assert out["phash"].nunique() > 16  # random images → distinct sketches


def test_real_codec_is_a_clear_stub():
    import pytest

    with pytest.raises(NotImplementedError):
        ImageDecoder(codec="real")


def test_hll_approx_distinct_within_tolerance():
    """HLL sketch estimate within ±3% of exact distinct counts."""
    from efficient_graph_algorithms_ray.functions.sketches import (
        hll_estimate,
        hll_merge,
        hll_sketch,
    )

    rng = np.random.Generator(np.random.Philox(key=[77, 0]))
    for true_n in (100, 5_000, 60_000):
        vals = rng.integers(0, 1 << 62, size=true_n, dtype=np.int64)
        vals = np.unique(vals)
        est = hll_estimate(hll_sketch(vals))
        assert abs(est - len(vals)) / len(vals) < 0.03, (true_n, est)
    # mergeability: sketch(A ∪ B) == merge(sketch(A), sketch(B))
    a = rng.integers(0, 1 << 62, size=3000, dtype=np.int64)
    b = rng.integers(0, 1 << 62, size=3000, dtype=np.int64)
    m = hll_merge(hll_sketch(a), hll_sketch(b))
    both = hll_sketch(np.concatenate([a, b]))
    assert np.array_equal(m, both)
