"""Multimodal columns: opaque binary payloads + typed metadata.

Image/audio/video payloads are ``binary`` columns with sidecar
metadata (width/height/channels or sample_rate/frames), processed by
actor-pool ``map_batches`` stages with small batch sizes (large rows
→ keep batch × concurrency inside worker heaps, per the memory
guidance in SURVEY §4).

The real codec libraries (PIL/libav/etc.) are NOT in this container,
so the decode step is split:

- ``decode_rgb8`` — a deterministic *fake* codec for a self-describing
  EGA1 header format (documented below), used by the tests and the
  deterministic synthetic generator; clearly marked.
- ``ImageDecoder(codec="real")`` — raises ``NotImplementedError`` with
  the dependency it would need; the Ray-side plumbing (actor
  signature, schema, batch sizing, output layout) is identical for
  both, so swapping in a real codec is a one-function change.

Payload format EGA1 (fake, deterministic): ``b"EGA1" + uint16 width +
uint16 height + uint8 channels + payload`` where payload is
width*height*channels bytes (row-major uint8).
"""

from __future__ import annotations

import struct

import numpy as np
import pyarrow as pa

MAGIC = b"EGA1"
HEADER = struct.Struct("<4sHHB")


def encode_rgb8(arr: np.ndarray) -> bytes:
    """uint8 HxWxC array → EGA1 blob (the synthetic 'codec')."""
    h, w, c = arr.shape
    return HEADER.pack(MAGIC, w, h, c) + arr.tobytes()


def decode_rgb8(blob: bytes) -> np.ndarray:
    """EGA1 blob → uint8 HxWxC array. Deterministic fake decode."""
    magic, w, h, c = HEADER.unpack_from(blob, 0)
    if magic != MAGIC:
        raise ValueError("not an EGA1 payload")
    arr = np.frombuffer(blob, dtype=np.uint8, offset=HEADER.size, count=w * h * c)
    return arr.reshape(h, w, c)


def synthetic_images(n: int, seed: int = 42, size: int = 32) -> pa.Table:
    """Deterministic synthetic image table (img_id, image, width, height, channels)."""
    blobs, ws, hs, cs = [], [], [], []
    for i in range(n):
        rng = np.random.Generator(np.random.Philox(key=[seed, i]))
        h = w = size
        arr = rng.integers(0, 256, size=(h, w, 3), dtype=np.uint8)
        blobs.append(encode_rgb8(arr))
        ws.append(w)
        hs.append(h)
        cs.append(3)
    return pa.table(
        {
            "img_id": pa.array(np.arange(n, dtype=np.int64), type=pa.int64()),
            "image": pa.array(blobs, type=pa.binary()),
            "width": pa.array(ws, type=pa.int32()),
            "height": pa.array(hs, type=pa.int32()),
            "channels": pa.array(cs, type=pa.int32()),
        }
    )


class ImageDecoder:
    """Actor-pool stage: binary image column → decoded features.

    codec='ega1' (deterministic fake) is fully functional; codec='real'
    documents the stub boundary — the surrounding Ray plumbing (batch
    schema in/out, actor lifecycle, sizing) is the real deliverable.
    Use: ``ds.map_batches(ImageDecoder, fn_constructor_kwargs=
    {"codec": "ega1"}, batch_format="pyarrow", batch_size=64,
    concurrency=N)`` — small batches because rows are megabyte-scale.
    """

    def __init__(self, codec: str = "ega1") -> None:
        if codec == "real":
            raise NotImplementedError(
                "real image codecs (PIL / turbojpeg) are not available in this "
                "container; swap decode_rgb8 for the library call when present"
            )
        self.codec = codec

    def __call__(self, batch: pa.Table) -> pa.Table:
        blobs = batch.column("image").to_pylist()
        means = np.empty((len(blobs), 3))
        stds = np.empty((len(blobs), 3))
        phashes = np.empty(len(blobs), dtype=np.uint64)
        for i, blob in enumerate(blobs):
            arr = decode_rgb8(blob)
            f = arr.reshape(-1, arr.shape[2]).astype(np.float64)
            means[i] = f.mean(axis=0)[:3]
            stds[i] = f.std(axis=0)[:3]
            phashes[i] = _phash64(arr)
        from ..util import list_array

        return pa.table(
            {
                "img_id": batch.column("img_id"),
                "mean_rgb": list_array(list(np.round(means, 6)), np.float64, pa.float64()),
                "std_rgb": list_array(list(np.round(stds, 6)), np.float64, pa.float64()),
                "phash": pa.array(phashes, type=pa.uint64()),
            }
        )


def _phash64(arr: np.ndarray) -> np.uint64:
    """Perceptual-hash-like 64-bit sketch: 8×8 grayscale grid vs median."""
    gray = arr.astype(np.float64).mean(axis=2)
    h, w = gray.shape
    ys = (np.arange(8) * h) // 8
    xs = (np.arange(8) * w) // 8
    cells = np.add.reduceat(np.add.reduceat(gray, ys, axis=0), xs, axis=1)
    bits = (cells > np.median(cells)).flatten()
    return np.uint64(
        np.sum((np.uint64(1) << np.arange(64, dtype=np.uint64))[bits], dtype=np.uint64)
    )


def resize_stub(batch: pa.Table, target: tuple[int, int] = (224, 224)) -> pa.Table:
    """Resize stage — STUB: needs a real image library.

    Raises NotImplementedError by design; kept so the pipeline shape
    (schema contract: image binary in → image binary out + new
    width/height) is pinned by tests.
    """
    raise NotImplementedError(
        "resize requires an image library not present in this container"
    )


def frame_sample_stub(batch: pa.Table, every_n: int = 30) -> pa.Table:
    """Video frame-sampling stage — STUB (no codecs in container)."""
    raise NotImplementedError(
        "video decode requires libav/ffmpeg, not present in this container"
    )
