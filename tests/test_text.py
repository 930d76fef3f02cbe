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


def test_audio_features_real_pcm_decode():
    """PCM16 audio features are a REAL decode path (numpy only): a pure
    440 Hz tone yields centroid ≈ 440 and the analytic RMS/ZCR."""
    import numpy as np
    import ray.data as rd

    from efficient_graph_algorithms_ray.functions.multimodal import (
        AudioFeatures,
        encode_pcm16,
        synthetic_audio,
    )
    import pyarrow as pa

    sr = 16000
    t = np.arange(sr) / sr  # 1 second
    tone = (0.5 * np.sin(2 * np.pi * 440 * t) * 32767).astype(np.int16)
    tbl = pa.table(
        {
            "clip_id": pa.array([0], type=pa.int64()),
            "audio": pa.array([encode_pcm16(tone, sr)], type=pa.binary()),
            "sample_rate": pa.array([sr], type=pa.int32()),
        }
    )
    out = (
        rd.from_arrow(tbl)
        .map_batches(AudioFeatures, batch_format="pyarrow", batch_size=8, concurrency=2)
        .to_pandas()
    )
    assert abs(out["duration_s"][0] - 1.0) < 1e-6
    assert abs(out["rms"][0] - 0.5 / np.sqrt(2)) < 1e-3
    assert abs(out["zcr"][0] - 2 * 440 / sr) < 2e-3  # 2 crossings per cycle
    assert abs(out["spectral_centroid_hz"][0] - 440.0) < 5.0

    # determinism of the synthetic corpus + batch-size independence
    a = rd.from_arrow(synthetic_audio(16)).map_batches(
        AudioFeatures, batch_format="pyarrow", batch_size=4, concurrency=2
    ).to_pandas().sort_values("clip_id").reset_index(drop=True)
    b = rd.from_arrow(synthetic_audio(16)).map_batches(
        AudioFeatures, batch_format="pyarrow", batch_size=16, concurrency=2
    ).to_pandas().sort_values("clip_id").reset_index(drop=True)
    assert a.equals(b)


def test_video_frame_sampling_and_resize_compose():
    """EGV1 frame sampling (byte slicing — real) composes with the EGA1
    image decoder and the nearest-neighbor resize."""
    import ray.data as rd

    from efficient_graph_algorithms_ray.functions.multimodal import (
        ImageDecoder,
        decode_rgb8,
        frame_sample_ega1,
        resize_nearest_ega1,
        synthetic_videos,
    )

    vids = rd.from_arrow(synthetic_videos(4, n_frames=12, size=16))
    frames = vids.map_batches(frame_sample_ega1, batch_format="pyarrow", batch_size=2)
    fdf = frames.to_pandas()
    assert len(fdf) == 4 * 3  # every_n=4 over 12 frames
    assert sorted(set(fdf["frame"])) == [0, 4, 8]

    # rename for the image stages' schema contract
    import pyarrow as pa

    def _as_images(b: pa.Table) -> pa.Table:
        return pa.table(
            {
                "img_id": b.column("vid_id"),
                "image": b.column("image"),
                "channels": pa.array([3] * b.num_rows, type=pa.int32()),
            }
        )

    imgs = frames.map_batches(_as_images, batch_format="pyarrow")
    small = imgs.map_batches(
        lambda b: resize_nearest_ega1(b, target=(8, 8)), batch_format="pyarrow"
    )
    one = small.take(1)[0]
    assert decode_rgb8(one["image"]).shape == (8, 8, 3)
    feats = small.map_batches(
        ImageDecoder, batch_format="pyarrow", batch_size=8, concurrency=2
    )
    assert feats.count() == 12


def test_repetition_batch_hand_check():
    import pyarrow as pa

    from efficient_graph_algorithms_ray.functions.text import repetition_batch

    t = pa.table(
        {
            "doc_id": pa.array([0, 1, 2], type=pa.int64()),
            "text": pa.array(["a b a b a", "x y z", ""], type=pa.string()),
        }
    )
    out = repetition_batch(t).to_pydict()
    assert out["n_tokens"] == [5, 3, 0]
    # doc0: 5 tokens, 2 distinct → dup 0.6; top token 'a' 3/5; top
    # bigram ('a','b') or ('b','a') both 2 of 4 → 0.5
    assert out["dup_token_frac"][0] == 1.0 - 2 / 5
    assert out["top_token_frac"][0] == 3 / 5
    assert out["top_bigram_frac"][0] == 2 / 4
    # doc1: all distinct
    assert out["dup_token_frac"][1] == 0.0
    assert out["top_bigram_frac"][1] == 1 / 2
    # empty doc: all zeros
    assert out["dup_token_frac"][2] == 0.0 and out["top_bigram_frac"][2] == 0.0


def test_pii_scrub_hand_check():
    from efficient_graph_algorithms_ray.functions.text import hash_token, pii_scrub_batch

    texts = [
        "mail me at bob123@site42.org or alice@mail.net thanks",
        "call 555-0199 now or 555-12345 later from 10.0.3.200 or 11.0.0.1",
        "nothing sensitive here",
    ]
    out = pii_scrub_batch(_docs(texts))
    assert out.column("n_emails").to_pylist() == [2, 0, 0]
    # 555-12345 fails the \b suffix boundary only if 5 digits break the
    # match — \b555-[0-9]{4}\b rejects it (boundary sits inside digits)
    assert out.column("n_phones").to_pylist() == [0, 1, 0]
    # 11.0.0.1 is not in the private 10.x range
    assert out.column("n_ips").to_pylist() == [0, 1, 0]
    expected0 = "mail me at <EMAIL> or <EMAIL> thanks"
    expected1 = "call <PHONE> now or 555-12345 later from <IP> or 11.0.0.1"
    fps = out.column("scrub_fp").to_pylist()
    assert fps[0] == np.uint64(hash_token(expected0)).astype(np.int64)
    assert fps[1] == np.uint64(hash_token(expected1)).astype(np.int64)
    assert fps[2] == np.uint64(hash_token(texts[2])).astype(np.int64)


def test_train_hashed_logreg_learns_and_is_blocking_invariant():
    import numpy as np
    import pyarrow as pa
    import ray.data as rd

    from efficient_graph_algorithms_ray.functions.text import (
        hash_token,
        train_hashed_logreg,
    )
    from efficient_graph_algorithms_ray.sources.edges_synth import _splitmix64

    rng = np.random.default_rng(11)
    docs, langs = [], []
    for i in range(120):
        en = i % 2 == 0
        vocab = ["alpha", "beta", "gamma"] if en else ["delta", "epsi", "zeta"]
        docs.append(" ".join(rng.choice(vocab, size=20)))
        langs.append("en" if en else "de")
    tbl = pa.table(
        {
            "doc_id": pa.array(np.arange(120, dtype=np.int64)),
            "text": pa.array(docs, type=pa.string()),
            "lang": pa.array(langs, type=pa.string()),
        }
    )
    w1 = train_hashed_logreg(rd.from_arrow(tbl).repartition(1), iters=6)
    w2 = train_hashed_logreg(rd.from_arrow(tbl).repartition(9), iters=6)
    assert w1.column("w_r6").to_pylist() == w2.column("w_r6").to_pylist()
    # the en-marker buckets must be pushed positive, de-markers negative
    w = np.array(w1.column("w_r6").to_pylist())
    sd = np.uint64(0x5EED_FA57)

    def bucket(tok):
        return int(_splitmix64(np.uint64(hash_token(tok)) ^ sd) % np.uint64(64))

    en_score = sum(w[bucket(t)] for t in ("alpha", "beta", "gamma"))
    de_score = sum(w[bucket(t)] for t in ("delta", "epsi", "zeta"))
    assert en_score > 0 > de_score
