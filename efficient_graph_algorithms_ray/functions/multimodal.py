"""Multimodal columns: opaque binary payloads + typed metadata.

Image/audio/video payloads are ``binary`` columns with sidecar
metadata (width/height/channels or sample_rate/frames), processed by
actor-pool ``map_batches`` stages with small batch sizes (large rows
→ keep batch × concurrency inside worker heaps, per the memory
guidance in SURVEY §4).

The codec LIBRARIES (PIL/libav/etc.) are NOT in this container; the
decode step therefore has three tiers:

- ``ImageDecoder(codec="jpeg")`` — REAL compressed-image decoding via
  the in-repo pure-numpy baseline JPEG codec (``functions/jpeg.py``,
  implemented from the public ITU-T T.81 spec: marker parse, DHT
  canonical Huffman, dequant, IDCT, YCbCr→RGB). Baseline 4:4:4 and
  grayscale streams decode for real; progressive/subsampled raise.
- ``decode_rgb8`` — a deterministic *fake* codec for a self-describing
  EGA1 header format (documented below), kept for cheap fixtures.
- ``ImageDecoder(codec="real")`` — raises ``NotImplementedError`` for
  the codecs that genuinely need a native library (PNG/WebP/H.264);
  the Ray-side plumbing (actor signature, schema, batch sizing,
  output layout) is identical for every tier.

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
                "native-library codecs (WebP/H.264 inter-frame) are not "
                "available in this container; baseline JPEG and PNG ARE "
                "implemented in-repo — use codec='jpeg' (functions/jpeg.py) "
                "or codec='png' (functions/png.py)"
            )
        if codec == "jpeg":
            from .jpeg import decode_jpeg  # compile/bind once per actor

            self._decode = lambda blob: _as_hwc(decode_jpeg(blob))
        elif codec == "png":
            from .png import decode_png

            self._decode = lambda blob: _as_hwc(decode_png(blob))[:, :, :3]
        else:
            self._decode = decode_rgb8
        self.codec = codec

    def __call__(self, batch: pa.Table) -> pa.Table:
        blobs = batch.column("image").to_pylist()
        means = np.empty((len(blobs), 3))
        stds = np.empty((len(blobs), 3))
        phashes = np.empty(len(blobs), dtype=np.uint64)
        for i, blob in enumerate(blobs):
            arr = self._decode(blob)
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


def _as_hwc(arr: np.ndarray) -> np.ndarray:
    """Grayscale H×W → H×W×3 (replicated) so the feature schema is
    channel-uniform."""
    if arr.ndim == 2:
        return np.repeat(arr[:, :, None], 3, axis=2)
    return arr


def synthetic_jpegs(n: int, seed: int = 42, size: int = 24, quality: int = 90) -> pa.Table:
    """Deterministic synthetic JPEG table (img_id, image, width, height,
    channels) — REAL baseline-JPEG payloads produced by the in-repo
    encoder (functions/jpeg.py): per-image seeded smooth gradients +
    low-frequency texture (compressible, like real photos)."""
    from .jpeg import encode_jpeg

    blobs = []
    for i in range(n):
        rng = np.random.Generator(np.random.Philox(key=[seed, 7000 + i]))
        yy, xx = np.mgrid[0:size, 0:size].astype(np.float64)
        fx, fy = rng.uniform(0.5, 3.0, 2)
        ph = rng.uniform(0, 2 * np.pi, 3)
        chans = [
            127.5
            + 100 * np.sin(2 * np.pi * (fx * xx / size + fy * yy / size) + ph[c])
            + rng.normal(0, 4, (size, size))
            for c in range(3)
        ]
        arr = np.clip(np.stack(chans, axis=-1).round(), 0, 255).astype(np.uint8)
        blobs.append(encode_jpeg(arr, quality=quality))
    return pa.table(
        {
            "img_id": pa.array(np.arange(n, dtype=np.int64), type=pa.int64()),
            "image": pa.array(blobs, type=pa.binary()),
            "width": pa.array(np.full(n, size, dtype=np.int32), type=pa.int32()),
            "height": pa.array(np.full(n, size, dtype=np.int32), type=pa.int32()),
            "channels": pa.array(np.full(n, 3, dtype=np.int32), type=pa.int32()),
        }
    )


def jpeg_recompress(batch: pa.Table, target: tuple[int, int] = (16, 16), quality: int = 85) -> pa.Table:
    """REAL decode→resize→re-encode stage for baseline JPEG payloads
    (the thumbnailing step of a web image pipeline): pure-numpy decode
    (functions/jpeg.py), nearest-neighbor resample, baseline re-encode.
    Schema contract identical to ``resize_nearest_ega1``."""
    from .jpeg import decode_jpeg, encode_jpeg

    th, tw = target
    out = []
    for blob in batch.column("image").to_pylist():
        arr = _as_hwc(decode_jpeg(blob))
        h, w, _ = arr.shape
        ys = (np.arange(th) * h) // th
        xs = (np.arange(tw) * w) // tw
        out.append(encode_jpeg(np.ascontiguousarray(arr[ys][:, xs]), quality=quality))
    return pa.table(
        {
            "img_id": batch.column("img_id"),
            "image": pa.array(out, type=pa.binary()),
            "width": pa.array(np.full(len(out), tw, dtype=np.int32), type=pa.int32()),
            "height": pa.array(np.full(len(out), th, dtype=np.int32), type=pa.int32()),
            "channels": batch.column("channels"),
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


def resize_nearest_ega1(batch: pa.Table, target: tuple[int, int] = (16, 16)) -> pa.Table:
    """Resize stage — REAL for EGA1 payloads (nearest-neighbor
    resampling is pure numpy indexing; no image library needed).
    Schema contract: image binary in → image binary out with updated
    width/height. For real codecs see ``resize_stub``."""
    th, tw = target
    blobs = batch.column("image").to_pylist()
    out = []
    for blob in blobs:
        arr = decode_rgb8(blob)
        h, w, _ = arr.shape
        ys = (np.arange(th) * h) // th
        xs = (np.arange(tw) * w) // tw
        out.append(encode_rgb8(np.ascontiguousarray(arr[ys][:, xs])))
    return pa.table(
        {
            "img_id": batch.column("img_id"),
            "image": pa.array(out, type=pa.binary()),
            "width": pa.array(np.full(len(out), tw, dtype=np.int32), type=pa.int32()),
            "height": pa.array(np.full(len(out), th, dtype=np.int32), type=pa.int32()),
            "channels": batch.column("channels"),
        }
    )


def resize_stub(batch: pa.Table, target: tuple[int, int] = (224, 224)) -> pa.Table:
    """Resize stage for REAL codecs — STUB: needs an image library.

    Raises NotImplementedError by design (``resize_nearest_ega1`` is
    the functional path for the fake codec; the schema contract is
    identical).
    """
    raise NotImplementedError(
        "resize requires an image library not present in this container"
    )


# --- audio: PCM16 is decodable with numpy alone — fully REAL path ---------

AUDIO_MAGIC = b"EGW1"  # fake container: magic + uint32 sample_rate + PCM16-LE
AUDIO_HEADER = struct.Struct("<4sI")


def encode_pcm16(samples: np.ndarray, sample_rate: int = 16000) -> bytes:
    """int16 sample array → EGW1 blob."""
    return AUDIO_HEADER.pack(AUDIO_MAGIC, sample_rate) + samples.astype("<i2").tobytes()


def decode_pcm16(blob: bytes) -> tuple[np.ndarray, int]:
    """EGW1 blob → (int16 samples, sample_rate). Pure numpy — a REAL
    decode, not a stub (PCM needs no codec library)."""
    magic, sr = AUDIO_HEADER.unpack_from(blob, 0)
    if magic != AUDIO_MAGIC:
        raise ValueError("not an EGW1 payload")
    return np.frombuffer(blob, dtype="<i2", offset=AUDIO_HEADER.size), int(sr)


def synthetic_audio(n: int, seed: int = 42, seconds: float = 0.5, sample_rate: int = 16000) -> pa.Table:
    """Deterministic synthetic audio table (clip_id, audio, sample_rate):
    a per-clip tone + noise mix, PCM16 in the EGW1 container."""
    blobs = []
    t = np.arange(int(seconds * sample_rate)) / sample_rate
    for i in range(n):
        rng = np.random.Generator(np.random.Philox(key=[seed, i]))
        freq = 100.0 + 50.0 * (i % 40)
        wave = 0.5 * np.sin(2 * np.pi * freq * t) + 0.05 * rng.standard_normal(len(t))
        blobs.append(encode_pcm16((np.clip(wave, -1, 1) * 32767).astype(np.int16), sample_rate))
    return pa.table(
        {
            "clip_id": pa.array(np.arange(n, dtype=np.int64), type=pa.int64()),
            "audio": pa.array(blobs, type=pa.binary()),
            "sample_rate": pa.array(
                np.full(n, sample_rate, dtype=np.int32), type=pa.int32()
            ),
        }
    )


MULAW_MAGIC = b"EGWU"  # magic + uint32 sample_rate + mu-law bytes
ADPCM_MAGIC = b"EGWA"  # magic + uint32 sample_rate + IMA ADPCM stream


def encode_audio(samples: np.ndarray, sample_rate: int = 16000, codec: str = "pcm16") -> bytes:
    """int16 samples → container bytes under the chosen REAL codec:
    'pcm16' (EGW1), 'mulaw' (EGWU, G.711 2:1), 'adpcm' (EGWA, IMA
    4:1)."""
    if codec == "pcm16":
        return encode_pcm16(samples, sample_rate)
    if codec == "mulaw":
        return AUDIO_HEADER.pack(MULAW_MAGIC, sample_rate) + mulaw_encode(samples).tobytes()
    if codec == "adpcm":
        return AUDIO_HEADER.pack(ADPCM_MAGIC, sample_rate) + adpcm_encode(samples)
    raise ValueError(f"unknown audio codec {codec}")


def decode_audio(blob: bytes) -> tuple[np.ndarray, int]:
    """Container bytes → (int16 samples, sample_rate); dispatches on
    the magic: PCM16 passthrough, μ-law table expansion, ADPCM
    predictor replay — all REAL decodes, no codec library."""
    magic, sr = AUDIO_HEADER.unpack_from(blob, 0)
    body = blob[AUDIO_HEADER.size :]
    if magic == AUDIO_MAGIC:
        return np.frombuffer(body, dtype="<i2"), int(sr)
    if magic == MULAW_MAGIC:
        return mulaw_decode(np.frombuffer(body, dtype=np.uint8)), int(sr)
    if magic == ADPCM_MAGIC:
        return adpcm_decode(body), int(sr)
    raise ValueError("unknown audio container magic")


class AudioFeatures:
    """Actor-pool stage: PCM16 audio column → per-clip features
    (duration, RMS, zero-crossing rate, spectral centroid via rfft) —
    the audio analogue of ``ImageDecoder``, fully functional (PCM16
    decoding is numpy; only compressed codecs would need a stub).
    Use small ``batch_size`` — rows are the big payload."""

    def __init__(self) -> None:
        pass  # stateless; class form keeps the actor-pool shape

    def __call__(self, batch: pa.Table) -> pa.Table:
        blobs = batch.column("audio").to_pylist()
        dur = np.empty(len(blobs))
        rms = np.empty(len(blobs))
        zcr = np.empty(len(blobs))
        cent = np.empty(len(blobs))
        for i, blob in enumerate(blobs):
            x, sr = decode_audio(blob)
            xf = x.astype(np.float64) / 32768.0
            dur[i] = len(xf) / sr
            rms[i] = float(np.sqrt(np.mean(xf * xf))) if len(xf) else 0.0
            zcr[i] = (
                float(np.mean(np.signbit(xf[1:]) != np.signbit(xf[:-1]))) if len(xf) > 1 else 0.0
            )
            if len(xf):
                spec = np.abs(np.fft.rfft(xf))
                freqs = np.fft.rfftfreq(len(xf), d=1.0 / sr)
                tot = spec.sum()
                cent[i] = float((freqs * spec).sum() / tot) if tot > 0 else 0.0
            else:
                cent[i] = 0.0
        return pa.table(
            {
                "clip_id": batch.column("clip_id"),
                "duration_s": pa.array(np.round(dur, 6)),
                "rms": pa.array(np.round(rms, 6)),
                "zcr": pa.array(np.round(zcr, 6)),
                "spectral_centroid_hz": pa.array(np.round(cent, 2)),
            }
        )


# --- compressed audio: REAL G.711 μ-law + IMA ADPCM codecs (numpy) --------

_MULAW_BIAS = 0x84
_MULAW_CLIP = 32635


def mulaw_encode(samples: np.ndarray) -> np.ndarray:
    """int16 PCM → uint8 G.711 μ-law (ITU-T G.711, public spec) —
    vectorized numpy, the classic 2:1 companding codec."""
    x = samples.astype(np.int32)
    sign = (x < 0).astype(np.uint8) * 0x80
    mag = np.minimum(np.abs(x), _MULAW_CLIP) + _MULAW_BIAS
    exp = (np.floor(np.log2(mag)) - 7).astype(np.int32)
    exp = np.clip(exp, 0, 7)
    mant = (mag >> (exp + 3)) & 0x0F
    return (~(sign | (exp.astype(np.uint8) << 4) | mant.astype(np.uint8))).astype(
        np.uint8
    )


def mulaw_decode(codes: np.ndarray) -> np.ndarray:
    """uint8 μ-law → int16 PCM (exact inverse of the companding law)."""
    c = ~codes.astype(np.uint8)
    sign = c & 0x80
    exp = (c >> 4) & 0x07
    mant = c & 0x0F
    mag = (((mant.astype(np.int32) << 3) + _MULAW_BIAS) << exp) - _MULAW_BIAS
    return np.where(sign != 0, -mag, mag).astype(np.int16)


_IMA_INDEX_TABLE = np.array([-1, -1, -1, -1, 2, 4, 6, 8] * 2, dtype=np.int32)
_IMA_STEP_TABLE = np.array(
    [
        7, 8, 9, 10, 11, 12, 13, 14, 16, 17, 19, 21, 23, 25, 28, 31, 34, 37,
        41, 45, 50, 55, 60, 66, 73, 80, 88, 97, 107, 118, 130, 143, 157, 173,
        190, 209, 230, 253, 279, 307, 337, 371, 408, 449, 494, 544, 598, 658,
        724, 796, 876, 963, 1060, 1166, 1282, 1411, 1552, 1707, 1878, 2066,
        2272, 2499, 2749, 3024, 3327, 3660, 4026, 4428, 4871, 5358, 5894,
        6484, 7132, 7845, 8630, 9493, 10442, 11487, 12635, 13899, 15289,
        16818, 18500, 20350, 22385, 24623, 27086, 29794, 32767,
    ],
    dtype=np.int32,
)


def adpcm_encode(samples: np.ndarray) -> bytes:
    """int16 PCM → IMA ADPCM nibble stream (4:1, IMA/DVI spec): a
    2-byte predictor seed + 1-byte step index + packed 4-bit codes."""
    x = samples.astype(np.int32)
    pred = int(x[0]) if len(x) else 0
    index = 0
    nibbles = []
    for s in x:
        step = int(_IMA_STEP_TABLE[index])
        diff = int(s) - pred
        code = 0
        if diff < 0:
            code = 8
            diff = -diff
        if diff >= step:
            code |= 4
            diff -= step
        if diff >= step >> 1:
            code |= 2
            diff -= step >> 1
        if diff >= step >> 2:
            code |= 1
        # reconstruct exactly as the decoder will
        delta = step >> 3
        if code & 4:
            delta += step
        if code & 2:
            delta += step >> 1
        if code & 1:
            delta += step >> 2
        pred = pred - delta if code & 8 else pred + delta
        pred = max(-32768, min(32767, pred))
        index = max(0, min(88, index + int(_IMA_INDEX_TABLE[code & 0x0F])))
        nibbles.append(code)
    packed = bytearray()
    for i in range(0, len(nibbles) - 1, 2):
        packed.append(nibbles[i] | (nibbles[i + 1] << 4))
    if len(nibbles) % 2:
        packed.append(nibbles[-1])
    head = struct.pack("<hBBi", int(x[0]) if len(x) else 0, 0, 0, len(x))
    return head + bytes(packed)


def adpcm_decode(blob: bytes) -> np.ndarray:
    """IMA ADPCM stream (our header framing) → int16 PCM."""
    seed, index, _, n = struct.unpack_from("<hBBi", blob, 0)
    data = blob[8:]
    out = np.empty(n, dtype=np.int16)
    pred = int(seed)
    idx = int(index)
    for i in range(n):
        b = data[i // 2]
        code = (b >> 4) if i % 2 else (b & 0x0F)
        step = int(_IMA_STEP_TABLE[idx])
        delta = step >> 3
        if code & 4:
            delta += step
        if code & 2:
            delta += step >> 1
        if code & 1:
            delta += step >> 2
        pred = pred - delta if code & 8 else pred + delta
        pred = max(-32768, min(32767, pred))
        out[i] = pred
        idx = max(0, min(88, idx + int(_IMA_INDEX_TABLE[code])))
    return out


# --- video: fake EGV1 container → REAL frame sampling (byte slicing) ------

VIDEO_MAGIC = b"EGV1"  # magic + uint16 w + uint16 h + uint8 c + uint16 n_frames
VIDEO_HEADER = struct.Struct("<4sHHBH")


def encode_video(frames: np.ndarray) -> bytes:
    """uint8 [n, h, w, c] frame stack → EGV1 blob."""
    n, h, w, c = frames.shape
    return VIDEO_HEADER.pack(VIDEO_MAGIC, w, h, c, n) + frames.tobytes()


def synthetic_videos(n: int, seed: int = 42, n_frames: int = 12, size: int = 16) -> pa.Table:
    """Deterministic synthetic video table (vid_id, video, n_frames)."""
    blobs = []
    for i in range(n):
        rng = np.random.Generator(np.random.Philox(key=[seed, 1000 + i]))
        frames = rng.integers(0, 256, size=(n_frames, size, size, 3), dtype=np.uint8)
        blobs.append(encode_video(frames))
    return pa.table(
        {
            "vid_id": pa.array(np.arange(n, dtype=np.int64), type=pa.int64()),
            "video": pa.array(blobs, type=pa.binary()),
            "n_frames": pa.array(np.full(n, n_frames, dtype=np.int32), type=pa.int32()),
        }
    )


def frame_sample_ega1(batch: pa.Table, every_n: int = 4) -> pa.Table:
    """Video frame-sampling — REAL for the EGV1 container (frames are
    fixed-stride byte slices; no codec needed): one output row per
    sampled frame, re-encoded as an EGA1 image (composable with
    ``ImageDecoder``/``resize_nearest_ega1``). For real containers see
    ``frame_sample_stub``."""
    out_vid, out_frame, out_img = [], [], []
    for vid_id, blob in zip(
        batch.column("vid_id").to_pylist(), batch.column("video").to_pylist()
    ):
        magic, w, h, c, n = VIDEO_HEADER.unpack_from(blob, 0)
        if magic != VIDEO_MAGIC:
            raise ValueError("not an EGV1 payload")
        frames = np.frombuffer(
            blob, dtype=np.uint8, offset=VIDEO_HEADER.size, count=n * h * w * c
        ).reshape(n, h, w, c)
        for f in range(0, n, every_n):
            out_vid.append(vid_id)
            out_frame.append(f)
            out_img.append(encode_rgb8(frames[f]))
    return pa.table(
        {
            "vid_id": pa.array(out_vid, type=pa.int64()),
            "frame": pa.array(out_frame, type=pa.int64()),
            "image": pa.array(out_img, type=pa.binary()),
        }
    )


MJPEG_MAGIC = b"EGVJ"  # magic + uint16 n_frames + uint32 lengths[n] + JPEG streams


def encode_mjpeg(frames: np.ndarray, quality: int = 90) -> bytes:
    """uint8 [n, h, w, 3] frame stack → MJPEG-style container: an index
    of per-frame byte lengths followed by REAL baseline-JPEG streams
    (the in-repo T.81 encoder). Motion-JPEG is the classic
    intra-only video codec — every frame independently seekable."""
    from .jpeg import encode_jpeg

    blobs = [encode_jpeg(f, quality=quality) for f in frames]
    out = bytearray(MJPEG_MAGIC)
    out += struct.pack("<H", len(blobs))
    for b in blobs:
        out += struct.pack("<I", len(b))
    for b in blobs:
        out += b
    return bytes(out)


def synthetic_mjpeg_videos(
    n: int, seed: int = 42, n_frames: int = 8, size: int = 24, quality: int = 90
) -> pa.Table:
    """Deterministic MJPEG video table (vid_id, video, n_frames):
    per-video drifting gradient scenes, REAL JPEG frames."""
    blobs = []
    for i in range(n):
        rng = np.random.Generator(np.random.Philox(key=[seed, 9000 + i]))
        yy, xx = np.mgrid[0:size, 0:size].astype(np.float64)
        fx, fy = rng.uniform(0.5, 2.5, 2)
        frames = []
        for t in range(n_frames):
            ph = 2 * np.pi * t / n_frames
            chans = [
                127.5 + 100 * np.sin(2 * np.pi * (fx * xx + fy * yy) / size + ph + c)
                for c in range(3)
            ]
            frames.append(
                np.clip(np.stack(chans, axis=-1).round(), 0, 255).astype(np.uint8)
            )
        blobs.append(encode_mjpeg(np.stack(frames), quality=quality))
    return pa.table(
        {
            "vid_id": pa.array(np.arange(n, dtype=np.int64), type=pa.int64()),
            "video": pa.array(blobs, type=pa.binary()),
            "n_frames": pa.array(np.full(n, n_frames, dtype=np.int32), type=pa.int32()),
        }
    )


def frame_sample_mjpeg(batch: pa.Table, every_n: int = 4) -> pa.Table:
    """REAL compressed-video frame sampling: the MJPEG index gives
    every frame's byte range, so sampling extracts ONLY the chosen
    frames' JPEG streams — no decode of skipped frames (the seek
    behavior a real pipeline needs). Output rows carry raw JPEG bytes,
    composable with ``ImageDecoder(codec='jpeg')`` and
    ``jpeg_recompress``."""
    out_vid, out_frame, out_img = [], [], []
    for vid_id, blob in zip(
        batch.column("vid_id").to_pylist(), batch.column("video").to_pylist()
    ):
        if blob[:4] != MJPEG_MAGIC:
            raise ValueError("not an EGVJ (MJPEG) payload")
        (n,) = struct.unpack_from("<H", blob, 4)
        lengths = struct.unpack_from(f"<{n}I", blob, 6)
        offs = np.concatenate(([0], np.cumsum(lengths))).astype(np.int64) + 6 + 4 * n
        for f in range(0, n, every_n):
            out_vid.append(vid_id)
            out_frame.append(f)
            out_img.append(blob[offs[f] : offs[f + 1]])
    return pa.table(
        {
            "vid_id": pa.array(out_vid, type=pa.int64()),
            "frame": pa.array(out_frame, type=pa.int64()),
            "image": pa.array(out_img, type=pa.binary()),
        }
    )


def frame_sample_stub(batch: pa.Table, every_n: int = 30) -> pa.Table:
    """Video frame-sampling for REAL containers — STUB (no libav/ffmpeg
    in this container; ``frame_sample_ega1`` is the functional path)."""
    raise NotImplementedError(
        "video decode requires libav/ffmpeg, not present in this container"
    )
