"""Pure-numpy baseline JPEG codec: transform exactness, roundtrip
quality, stream conformance, decoder generality, multimodal pipeline."""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pytest

from efficient_graph_algorithms_ray.functions.jpeg import (
    _C,
    _ZZ,
    _canonical_codes,
    _decode_table,
    _quality_tables,
    decode_jpeg,
    encode_jpeg,
)


def _psnr(a, b):
    mse = ((a.astype(np.float64) - b.astype(np.float64)) ** 2).mean()
    return 99.0 if mse == 0 else 10 * np.log10(255**2 / mse)


def test_dct_matrix_is_orthonormal_dct2():
    x = np.random.default_rng(0).normal(size=8)
    ref = np.array(
        [
            (np.sqrt(1 / 8) if k == 0 else np.sqrt(2 / 8))
            * sum(x[n] * np.cos((2 * n + 1) * k * np.pi / 16) for n in range(8))
            for k in range(8)
        ]
    )
    assert np.allclose(_C @ x, ref)
    assert np.allclose(_C @ _C.T, np.eye(8))


def test_zigzag_is_the_standard_order():
    assert _ZZ[:10].tolist() == [0, 1, 8, 16, 9, 2, 3, 10, 17, 24]
    assert sorted(_ZZ.tolist()) == list(range(64))
    assert _ZZ[-1] == 63


def test_huffman_tables_roundtrip():
    bits = [0, 2, 3, 1] + [0] * 12  # 2+3+1 = 6 symbols
    vals = [5, 9, 1, 2, 3, 7]
    codes = _canonical_codes(bits, vals)
    table = _decode_table(bits, vals)
    # every encoded symbol decodes back via the (length, code) table
    for sym, (code, ln) in codes.items():
        assert table[(ln, code)] == sym
    # canonical property: codes of one length are consecutive
    assert codes[5] == (0, 2) and codes[9] == (1, 2)


def test_roundtrip_gradient_high_quality():
    h, w = 24, 40
    yy, xx = np.mgrid[0:h, 0:w]
    img = np.stack(
        [(xx * 255 // w), (yy * 255 // h), ((xx + yy) * 255 // (w + h))], axis=-1
    ).astype(np.uint8)
    blob = encode_jpeg(img, quality=95)
    assert blob[:2] == b"\xff\xd8" and blob[-2:] == b"\xff\xd9"
    out = decode_jpeg(blob)
    assert out.shape == img.shape
    assert _psnr(out, img) > 40


def test_quality_100_is_tight_even_on_noise():
    rng = np.random.default_rng(3)
    img = rng.integers(0, 256, size=(16, 16, 3), dtype=np.uint8)
    out = decode_jpeg(encode_jpeg(img, quality=100))
    # only DCT rounding + YCbCr roundtrip remain at q=100 (all-1 tables)
    assert np.abs(out.astype(int) - img.astype(int)).max() <= 3
    lum, chrom = _quality_tables(100)
    assert (lum == 1).all() and (chrom == 1).all()


def test_lower_quality_monotonically_hurts():
    rng = np.random.default_rng(5)
    img = np.clip(
        rng.normal(128, 40, size=(32, 32, 3)).round(), 0, 255
    ).astype(np.uint8)
    p90 = _psnr(decode_jpeg(encode_jpeg(img, quality=90)), img)
    p30 = _psnr(decode_jpeg(encode_jpeg(img, quality=30)), img)
    assert p90 > p30 > 10
    assert len(encode_jpeg(img, quality=30)) < len(encode_jpeg(img, quality=90))


def test_grayscale_and_odd_sizes():
    yy, xx = np.mgrid[0:13, 0:21]
    g = ((xx * 7 + yy * 3) % 256).astype(np.uint8)
    out = decode_jpeg(encode_jpeg(g, quality=92))
    assert out.shape == g.shape  # non-multiple-of-8 dims crop back
    assert _psnr(out, g) > 25


def test_decoder_rejects_non_baseline():
    with pytest.raises(ValueError):
        decode_jpeg(b"\x00\x01notajpeg")
    # progressive SOF2 marker stream
    img = np.zeros((8, 8), dtype=np.uint8)
    blob = bytearray(encode_jpeg(img))
    i = blob.find(b"\xff\xc0")
    blob[i + 1] = 0xC2
    with pytest.raises(NotImplementedError):
        decode_jpeg(bytes(blob))


def test_jpeg_multimodal_pipeline_features_match_source():
    import ray.data as rd

    from efficient_graph_algorithms_ray.functions.multimodal import (
        ImageDecoder,
        synthetic_jpegs,
    )

    tbl = synthetic_jpegs(8, size=24, quality=95)
    feats = (
        rd.from_arrow(tbl)
        .map_batches(
            ImageDecoder,
            fn_constructor_kwargs={"codec": "jpeg"},
            batch_format="pyarrow",
            batch_size=4,
            concurrency=2,
        )
        .to_pandas()
        .sort_values("img_id")
        .reset_index(drop=True)
    )
    assert len(feats) == 8
    # decoded means must track the pre-encode means closely at q=95
    blobs = tbl.column("image").to_pylist()
    for i, blob in enumerate(blobs):
        arr = decode_jpeg(blob).reshape(-1, 3).astype(np.float64)
        assert np.allclose(feats.loc[i, "mean_rgb"], np.round(arr.mean(axis=0), 6))


def test_mjpeg_sampling_extracts_exact_frame_streams():
    from efficient_graph_algorithms_ray.functions.jpeg import encode_jpeg
    from efficient_graph_algorithms_ray.functions.multimodal import (
        encode_mjpeg,
        frame_sample_mjpeg,
    )

    rng = np.random.default_rng(8)
    frames = np.clip(
        rng.normal(128, 30, size=(6, 16, 16, 3)).round(), 0, 255
    ).astype(np.uint8)
    blob = encode_mjpeg(frames, quality=90)
    tbl = pa.table(
        {
            "vid_id": pa.array([3], type=pa.int64()),
            "video": pa.array([blob], type=pa.binary()),
        }
    )
    out = frame_sample_mjpeg(tbl, every_n=2)
    got_frames = out.column("frame").to_pylist()
    assert got_frames == [0, 2, 4]
    # sampled byte ranges are EXACTLY the per-frame JPEG streams
    for fi, img in zip(got_frames, out.column("image").to_pylist()):
        assert img == encode_jpeg(frames[fi], quality=90)
        dec = decode_jpeg(img)
        assert _psnr(dec, frames[fi]) > 25


def test_mjpeg_pipeline_end_to_end():
    import ray.data as rd

    from efficient_graph_algorithms_ray.pipelines.corpus import (
        q_mjpeg_frame_features,
    )

    out = q_mjpeg_frame_features("/root/testdata/sf0.001").to_pandas()
    assert len(out) == 48 * 2  # 8 frames sampled every 4 -> 2 per video
    assert {"img_id", "mean_rgb", "std_rgb", "phash"} <= set(out.columns)


def test_audio_codecs_roundtrip_and_features():
    import ray.data as rd

    from efficient_graph_algorithms_ray.functions.multimodal import (
        AudioFeatures,
        adpcm_decode,
        adpcm_encode,
        decode_audio,
        encode_audio,
        mulaw_decode,
        mulaw_encode,
    )

    t = np.arange(4000) / 16000
    x = (0.6 * np.sin(2 * np.pi * 440 * t) * 32767).astype(np.int16)

    # mu-law: 2:1, SNR > 30 dB, 256-code idempotence
    dec = mulaw_decode(mulaw_encode(x))
    err = x.astype(float) - dec.astype(float)
    assert 10 * np.log10((x.astype(float) ** 2).mean() / (err**2).mean()) > 30
    codes = np.arange(256, dtype=np.uint8)
    vals = mulaw_decode(codes)
    assert np.array_equal(mulaw_decode(mulaw_encode(vals)), vals)

    # ADPCM: 4:1, SNR > 20 dB on a tone
    y = adpcm_decode(adpcm_encode(x))
    err = x.astype(float) - y.astype(float)
    assert 10 * np.log10((x.astype(float) ** 2).mean() / (err**2).mean()) > 20
    assert len(adpcm_encode(x)) < len(x.tobytes()) // 3

    # container dispatch + the actor-pool feature stage on all codecs
    rows = []
    for i, codec in enumerate(("pcm16", "mulaw", "adpcm")):
        rows.append((i, encode_audio(x, 16000, codec)))
        got, sr = decode_audio(rows[-1][1])
        assert sr == 16000 and len(got) == len(x)
    tbl = pa.table(
        {
            "clip_id": pa.array([r[0] for r in rows], type=pa.int64()),
            "audio": pa.array([r[1] for r in rows], type=pa.binary()),
        }
    )
    feats = (
        rd.from_arrow(tbl)
        .map_batches(AudioFeatures, batch_format="pyarrow", batch_size=2, concurrency=2)
        .to_pandas()
        .sort_values("clip_id")
    )
    # the 440 Hz dominant peak survives every codec exactly (quantization
    # noise is broadband: it raises the magnitude-weighted CENTROID but
    # cannot move the spectral PEAK)
    for _, blob in rows:
        y, sr = decode_audio(blob)
        spec = np.abs(np.fft.rfft(y.astype(np.float64) / 32768))
        freqs = np.fft.rfftfreq(len(y), 1 / sr)
        assert abs(freqs[int(np.argmax(spec))] - 440) < 5
    # noisier codec -> higher centroid (pcm16 < mulaw < adpcm)
    c = feats.set_index("clip_id")["spectral_centroid_hz"]
    assert c[0] < c[1] < c[2]
    assert np.allclose(feats["duration_s"], 0.25)
