"""Pure-Python PNG codec (RFC 2083 / W3C PNG spec, stdlib zlib only).

REAL lossless-image support for the multimodal stages: PNG is DEFLATE
(zlib, in the standard library) + per-scanline byte filters — no
native image library needed.

- ``decode_png``: parses the chunk stream (IHDR/PLTE/IDAT/IEND),
  inflates, and un-filters every scanline (all five filter types:
  None/Sub/Up/Average/Paeth). Supports 8-bit grayscale (0), RGB (2),
  palette (3), gray+alpha (4) and RGBA (6), non-interlaced. Adam7
  interlacing raises ``NotImplementedError`` (the documented
  boundary).
- ``encode_png``: 8-bit gray/RGB/RGBA encoder (filter 0 scanlines,
  one zlib stream) used to synthesize deterministic test payloads —
  and to verify the decoder against streams OUR encoder did not
  shape (the decoder handles arbitrary conformant filter choices).

Lossless: encode→decode roundtrips are bit-exact, which the tests
assert (unlike the JPEG path, where quantization is the lossy step).
"""

from __future__ import annotations

import struct
import zlib

import numpy as np

_SIG = b"\x89PNG\r\n\x1a\n"


def _chunk(tag: bytes, body: bytes) -> bytes:
    return (
        struct.pack(">I", len(body))
        + tag
        + body
        + struct.pack(">I", zlib.crc32(tag + body) & 0xFFFFFFFF)
    )


def encode_png(arr: np.ndarray) -> bytes:
    """uint8 H×W (gray), H×W×3 (RGB) or H×W×4 (RGBA) → PNG bytes."""
    if arr.dtype != np.uint8:
        raise ValueError("encode_png expects uint8")
    if arr.ndim == 2:
        color_type, channels = 0, 1
        flat = arr[:, :, None]
    elif arr.ndim == 3 and arr.shape[2] == 3:
        color_type, channels = 2, 3
        flat = arr
    elif arr.ndim == 3 and arr.shape[2] == 4:
        color_type, channels = 6, 4
        flat = arr
    else:
        raise ValueError(f"unsupported array shape {arr.shape}")
    h, w = arr.shape[:2]
    ihdr = struct.pack(">IIBBBBB", w, h, 8, color_type, 0, 0, 0)
    raw = bytearray()
    for y in range(h):
        raw.append(0)  # filter type None
        raw += flat[y].tobytes()
    out = bytearray(_SIG)
    out += _chunk(b"IHDR", ihdr)
    out += _chunk(b"IDAT", zlib.compress(bytes(raw), 6))
    out += _chunk(b"IEND", b"")
    return bytes(out)


def _paeth(a: np.ndarray, b: np.ndarray, c: np.ndarray) -> np.ndarray:
    p = a.astype(np.int32) + b.astype(np.int32) - c.astype(np.int32)
    pa_ = np.abs(p - a)
    pb = np.abs(p - b)
    pc = np.abs(p - c)
    out = np.where((pa_ <= pb) & (pa_ <= pc), a, np.where(pb <= pc, b, c))
    return out.astype(np.uint8)


def decode_png(data: bytes) -> np.ndarray:
    """PNG bytes → uint8 array (H×W, H×W×3 or H×W×4).

    Handles every scanline filter type; palette images expand to RGB;
    gray+alpha returns H×W×4 (alpha kept). 16-bit depth and Adam7
    interlacing raise NotImplementedError."""
    if data[: len(_SIG)] != _SIG:
        raise ValueError("not a PNG stream")
    pos = len(_SIG)
    width = height = None
    bit_depth = color_type = interlace = None
    palette = None
    idat = bytearray()
    while pos < len(data):
        (length,) = struct.unpack_from(">I", data, pos)
        tag = data[pos + 4 : pos + 8]
        body = data[pos + 8 : pos + 8 + length]
        pos += 12 + length
        if tag == b"IHDR":
            width, height, bit_depth, color_type, _, _, interlace = struct.unpack(
                ">IIBBBBB", body
            )
            if bit_depth != 8:
                raise NotImplementedError("only 8-bit depth supported")
            if interlace != 0:
                raise NotImplementedError("Adam7 interlacing unsupported")
        elif tag == b"PLTE":
            palette = np.frombuffer(body, dtype=np.uint8).reshape(-1, 3)
        elif tag == b"IDAT":
            idat += body
        elif tag == b"IEND":
            break
    if width is None:
        raise ValueError("missing IHDR")
    channels = {0: 1, 2: 3, 3: 1, 4: 2, 6: 4}[color_type]
    raw = zlib.decompress(bytes(idat))
    stride = width * channels
    if len(raw) != height * (stride + 1):
        raise ValueError("IDAT size mismatch")
    out = np.zeros((height, stride), dtype=np.uint8)
    prev = np.zeros(stride, dtype=np.uint8)
    bpp = channels  # bytes per pixel at 8-bit depth
    for y in range(height):
        ft = raw[y * (stride + 1)]
        line = np.frombuffer(
            raw, dtype=np.uint8, count=stride, offset=y * (stride + 1) + 1
        ).copy()
        if ft == 0:  # None
            cur = line
        elif ft == 1:  # Sub — sequential within the row
            cur = line
            for x in range(bpp, stride):
                cur[x] = (int(cur[x]) + int(cur[x - bpp])) & 0xFF
        elif ft == 2:  # Up
            cur = (line.astype(np.int32) + prev).astype(np.uint8)
        elif ft == 3:  # Average
            cur = line
            for x in range(stride):
                left = int(cur[x - bpp]) if x >= bpp else 0
                cur[x] = (int(cur[x]) + ((left + int(prev[x])) >> 1)) & 0xFF
        elif ft == 4:  # Paeth
            cur = line
            for x in range(stride):
                a = int(cur[x - bpp]) if x >= bpp else 0
                c = int(prev[x - bpp]) if x >= bpp else 0
                b = int(prev[x])
                cur[x] = (
                    int(cur[x])
                    + int(_paeth(np.uint8(a), np.uint8(b), np.uint8(c)))
                ) & 0xFF
        else:
            raise ValueError(f"unknown filter type {ft}")
        out[y] = cur
        prev = out[y]
    img = out.reshape(height, width, channels)
    if color_type == 3:
        if palette is None:
            raise ValueError("palette image without PLTE")
        img = palette[img[:, :, 0]]
    if img.shape[2] == 1:
        return img[:, :, 0]
    return img
