"""Pure-Python PNG codec: bit-exact roundtrips, all five scanline
filters, palette expansion, multimodal wiring."""

from __future__ import annotations

import struct
import zlib

import numpy as np
import pyarrow as pa
import pytest

from efficient_graph_algorithms_ray.functions.png import (
    _SIG,
    _chunk,
    decode_png,
    encode_png,
)


def test_roundtrip_bit_exact_rgb_gray_rgba():
    rng = np.random.default_rng(1)
    for shape in ((11, 17, 3), (8, 8), (5, 9, 4)):
        img = rng.integers(0, 256, size=shape, dtype=np.uint8)
        out = decode_png(encode_png(img))
        assert out.shape == img.shape
        assert np.array_equal(out, img)  # PNG is lossless


def _forward_filter(img: np.ndarray, ftypes: list[int]) -> bytes:
    """Build an IDAT stream using the GIVEN per-row filter types (the
    encoder-side transform our encoder never emits) so the decoder's
    un-filtering is tested against foreign streams."""
    h, w, c = img.shape
    stride = w * c
    flat = img.reshape(h, stride).astype(np.int32)
    raw = bytearray()
    prev = np.zeros(stride, dtype=np.int32)
    for y in range(h):
        ft = ftypes[y % len(ftypes)]
        cur = flat[y]
        line = cur.copy()
        for x in range(stride):
            a = cur[x - c] if x >= c else 0
            b = prev[x]
            cc = prev[x - c] if x >= c else 0
            if ft == 1:
                line[x] = cur[x] - a
            elif ft == 2:
                line[x] = cur[x] - b
            elif ft == 3:
                line[x] = cur[x] - ((a + b) >> 1)
            elif ft == 4:
                p = a + b - cc
                pa_, pb, pc = abs(p - a), abs(p - b), abs(p - cc)
                pred = a if (pa_ <= pb and pa_ <= pc) else (b if pb <= pc else cc)
                line[x] = cur[x] - pred
        raw.append(ft)
        raw += (line & 0xFF).astype(np.uint8).tobytes()
        prev = cur
    return bytes(raw)


def test_decoder_unfilters_all_filter_types():
    rng = np.random.default_rng(2)
    img = rng.integers(0, 256, size=(10, 7, 3), dtype=np.uint8)
    for ftypes in ([1], [2], [3], [4], [0, 1, 2, 3, 4]):
        ihdr = struct.pack(">IIBBBBB", 7, 10, 8, 2, 0, 0, 0)
        blob = (
            _SIG
            + _chunk(b"IHDR", ihdr)
            + _chunk(b"IDAT", zlib.compress(_forward_filter(img, ftypes)))
            + _chunk(b"IEND", b"")
        )
        out = decode_png(blob)
        assert np.array_equal(out, img), f"filter set {ftypes} failed"


def test_palette_expansion():
    palette = np.array([[255, 0, 0], [0, 255, 0], [0, 0, 255]], dtype=np.uint8)
    idx = np.array([[0, 1, 2], [2, 1, 0]], dtype=np.uint8)
    raw = bytearray()
    for y in range(2):
        raw.append(0)
        raw += idx[y].tobytes()
    ihdr = struct.pack(">IIBBBBB", 3, 2, 8, 3, 0, 0, 0)
    blob = (
        _SIG
        + _chunk(b"IHDR", ihdr)
        + _chunk(b"PLTE", palette.tobytes())
        + _chunk(b"IDAT", zlib.compress(bytes(raw)))
        + _chunk(b"IEND", b"")
    )
    out = decode_png(blob)
    assert np.array_equal(out, palette[idx])


def test_rejects_interlaced_and_garbage():
    with pytest.raises(ValueError):
        decode_png(b"nope")
    ihdr = struct.pack(">IIBBBBB", 4, 4, 8, 2, 0, 0, 1)  # interlace=1
    blob = _SIG + _chunk(b"IHDR", ihdr) + _chunk(b"IEND", b"")
    with pytest.raises(NotImplementedError):
        decode_png(blob)


def test_png_multimodal_decoder_features():
    import ray.data as rd

    from efficient_graph_algorithms_ray.functions.multimodal import ImageDecoder

    rng = np.random.default_rng(3)
    imgs = [rng.integers(0, 256, size=(12, 12, 3), dtype=np.uint8) for _ in range(6)]
    tbl = pa.table(
        {
            "img_id": pa.array(range(6), type=pa.int64()),
            "image": pa.array([encode_png(a) for a in imgs], type=pa.binary()),
        }
    )
    feats = (
        rd.from_arrow(tbl)
        .map_batches(
            ImageDecoder,
            fn_constructor_kwargs={"codec": "png"},
            batch_format="pyarrow",
            batch_size=3,
            concurrency=2,
        )
        .to_pandas()
        .sort_values("img_id")
        .reset_index(drop=True)
    )
    for i, a in enumerate(imgs):
        want = np.round(a.reshape(-1, 3).astype(np.float64).mean(axis=0), 6)
        assert np.allclose(feats.loc[i, "mean_rgb"], want)  # lossless -> exact
