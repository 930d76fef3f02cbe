"""Pure-numpy baseline JPEG codec (ITU-T T.81 / JFIF, public spec).

REAL compressed-image support for the multimodal stages — no PIL /
libjpeg in this container, so the codec is implemented from the
public standard:

- ``decode_jpeg``: a general baseline decoder — parses SOI/APP*/DQT/
  SOF0/DHT/SOS/EOI, builds canonical Huffman tables from the DHT
  segments in the stream (any spec-conformant tables, not just the
  ones our encoder emits), entropy-decodes DC-differential + AC
  run-length coefficients, dequantizes, inverse-zigzags, applies the
  orthonormal 8×8 IDCT and the JFIF YCbCr→RGB transform. Supports
  8-bit baseline with 1 or 3 components at 4:4:4 (h=v=1); progressive
  (SOF2) and subsampled streams raise ``NotImplementedError`` — the
  documented remaining boundary.
- ``encode_jpeg``: a baseline 4:4:4 encoder (Annex-K quantization
  tables with the libjpeg quality scaling, simple fixed-length
  canonical Huffman tables emitted in DHT — valid, just not
  entropy-optimal) used to synthesize deterministic test/benchmark
  streams.

The 8×8 DCT is the exact orthonormal matrix form (cross-checked in
tests against ``scipy.fft.dct(type=2, norm='ortho')``); quantization
is the only lossy step, so quality-100 roundtrips are tight.
"""

from __future__ import annotations

import struct

import numpy as np

# --- constants (ITU-T T.81 Annex K) ---------------------------------------

_QT_LUM = np.array(
    [
        [16, 11, 10, 16, 24, 40, 51, 61],
        [12, 12, 14, 19, 26, 58, 60, 55],
        [14, 13, 16, 24, 40, 57, 69, 56],
        [14, 17, 22, 29, 51, 87, 80, 62],
        [18, 22, 37, 56, 68, 109, 103, 77],
        [24, 35, 55, 64, 81, 104, 113, 92],
        [49, 64, 78, 87, 103, 121, 120, 101],
        [72, 92, 95, 98, 112, 100, 103, 99],
    ],
    dtype=np.int64,
)

_QT_CHROM = np.array(
    [
        [17, 18, 24, 47, 99, 99, 99, 99],
        [18, 21, 26, 66, 99, 99, 99, 99],
        [24, 26, 56, 99, 99, 99, 99, 99],
        [47, 66, 99, 99, 99, 99, 99, 99],
        [99, 99, 99, 99, 99, 99, 99, 99],
        [99, 99, 99, 99, 99, 99, 99, 99],
        [99, 99, 99, 99, 99, 99, 99, 99],
        [99, 99, 99, 99, 99, 99, 99, 99],
    ],
    dtype=np.int64,
)


def _zigzag_indices() -> np.ndarray:
    """(64,) flat indices of the 8×8 grid in JPEG zigzag order
    (generated, not transcribed)."""
    order = []
    for s in range(15):
        diag = [(r, s - r) for r in range(8) if 0 <= s - r < 8]
        if s % 2 == 0:
            diag = diag[::-1]  # even diagonals run bottom-left → top-right
        order.extend(diag)
    return np.array([r * 8 + c for r, c in order], dtype=np.int64)


_ZZ = _zigzag_indices()
_INV_ZZ = np.argsort(_ZZ)


def _dct_matrix() -> np.ndarray:
    """Orthonormal 8×8 DCT-II matrix: C @ x applies the 1-D DCT."""
    k = np.arange(8)[:, None]
    n = np.arange(8)[None, :]
    c = np.cos((2 * n + 1) * k * np.pi / 16)
    c[0, :] *= 1 / np.sqrt(2)
    return c * 0.5


_C = _dct_matrix()


def _quality_tables(quality: int) -> tuple[np.ndarray, np.ndarray]:
    """Annex-K tables under the libjpeg quality convention."""
    q = int(np.clip(quality, 1, 100))
    s = 5000 // q if q < 50 else 200 - 2 * q
    lum = np.clip((_QT_LUM * s + 50) // 100, 1, 255)
    chrom = np.clip((_QT_CHROM * s + 50) // 100, 1, 255)
    return lum, chrom


# --- bit I/O ----------------------------------------------------------------


class _BitWriter:
    def __init__(self) -> None:
        self.buf = bytearray()
        self.acc = 0
        self.nbits = 0

    def write(self, code: int, length: int) -> None:
        self.acc = (self.acc << length) | (code & ((1 << length) - 1))
        self.nbits += length
        while self.nbits >= 8:
            byte = (self.acc >> (self.nbits - 8)) & 0xFF
            self.buf.append(byte)
            if byte == 0xFF:
                self.buf.append(0x00)  # byte stuffing
            self.nbits -= 8
        self.acc &= (1 << self.nbits) - 1

    def flush(self) -> bytes:
        if self.nbits:
            pad = 8 - self.nbits
            self.write((1 << pad) - 1, pad)  # pad with 1s
        return bytes(self.buf)


class _BitReader:
    """Entropy-segment bit reader with 0xFF00 unstuffing; stops at any
    real marker."""

    def __init__(self, data: bytes, pos: int) -> None:
        self.data = data
        self.pos = pos
        self.acc = 0
        self.nbits = 0

    def _fill(self) -> None:
        b = self.data[self.pos]
        if b == 0xFF:
            nxt = self.data[self.pos + 1]
            if nxt == 0x00:
                self.pos += 2
            else:
                raise EOFError("hit marker inside entropy data")
        else:
            self.pos += 1
        self.acc = (self.acc << 8) | b
        self.nbits += 8

    def read_bit(self) -> int:
        if self.nbits == 0:
            self._fill()
        self.nbits -= 1
        return (self.acc >> self.nbits) & 1

    def read_bits(self, n: int) -> int:
        v = 0
        for _ in range(n):
            v = (v << 1) | self.read_bit()
        return v


# --- Huffman ----------------------------------------------------------------


def _canonical_codes(bits: list[int], vals: list[int]) -> dict[int, tuple[int, int]]:
    """symbol → (code, length) from a DHT (bits, huffval) spec."""
    codes: dict[int, tuple[int, int]] = {}
    code = 0
    k = 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            codes[vals[k]] = (code, length)
            code += 1
            k += 1
        code <<= 1
    return codes


def _decode_table(bits: list[int], vals: list[int]) -> dict[tuple[int, int], int]:
    """(length, code) → symbol lookup for the bit-serial decoder."""
    out: dict[tuple[int, int], int] = {}
    code = 0
    k = 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            out[(length, code)] = vals[k]
            code += 1
            k += 1
        code <<= 1
    return out


def _read_symbol(br: _BitReader, table: dict[tuple[int, int], int]) -> int:
    code = 0
    for length in range(1, 17):
        code = (code << 1) | br.read_bit()
        sym = table.get((length, code))
        if sym is not None:
            return sym
    raise ValueError("invalid Huffman code in entropy stream")


def _magnitude(v: int) -> tuple[int, int]:
    """signed value → (size, raw bits) per the T.81 magnitude coding."""
    if v == 0:
        return 0, 0
    size = int(abs(v)).bit_length()
    raw = v if v > 0 else v + (1 << size) - 1
    return size, raw


def _extend(raw: int, size: int) -> int:
    if size == 0:
        return 0
    return raw if raw >= (1 << (size - 1)) else raw - (1 << size) + 1


# --- encoder ---------------------------------------------------------------

# Simple valid canonical tables for OUR encoder: all 12 DC symbols get
# 4-bit codes; all 162 AC symbols get 8-bit codes. Suboptimal but
# spec-conformant — the decoder reads whatever DHT declares.
_DC_SYMS = list(range(12))
_AC_SYMS = [0x00, 0xF0] + [
    (r << 4) | s for r in range(16) for s in range(1, 11)
]
_DC_BITS = [0, 0, 0, 12] + [0] * 12
_AC_BITS = [0] * 7 + [len(_AC_SYMS)] + [0] * 8


def _rgb_to_ycbcr(arr: np.ndarray) -> np.ndarray:
    r, g, b = arr[..., 0], arr[..., 1], arr[..., 2]
    y = 0.299 * r + 0.587 * g + 0.114 * b
    cb = -0.168736 * r - 0.331264 * g + 0.5 * b + 128.0
    cr = 0.5 * r - 0.418688 * g - 0.081312 * b + 128.0
    return np.stack([y, cb, cr], axis=-1)


def _ycbcr_to_rgb(y: np.ndarray, cb: np.ndarray, cr: np.ndarray) -> np.ndarray:
    r = y + 1.402 * (cr - 128.0)
    g = y - 0.344136 * (cb - 128.0) - 0.714136 * (cr - 128.0)
    b = y + 1.772 * (cb - 128.0)
    return np.clip(np.stack([r, g, b], axis=-1).round(), 0, 255).astype(np.uint8)


def _encode_component(
    plane: np.ndarray,
    qt: np.ndarray,
) -> list[np.ndarray]:
    """plane (H8, W8) float → list of 64-coef zigzag int blocks."""
    h8, w8 = plane.shape
    blocks = []
    for by in range(h8 // 8):
        for bx in range(w8 // 8):
            blk = plane[by * 8 : by * 8 + 8, bx * 8 : bx * 8 + 8] - 128.0
            coef = _C @ blk @ _C.T
            q = np.round(coef / qt).astype(np.int64)
            blocks.append(q.ravel()[_ZZ])
    return blocks


def encode_jpeg(arr: np.ndarray, quality: int = 90) -> bytes:
    """uint8 H×W×3 (or H×W grayscale) → baseline JFIF bytes (4:4:4)."""
    gray = arr.ndim == 2
    h, w = arr.shape[:2]
    lum_qt, chrom_qt = _quality_tables(quality)
    ph, pw = -(-h // 8) * 8, -(-w // 8) * 8

    if gray:
        planes = [arr.astype(np.float64)]
        qts = [lum_qt]
        qt_ids = [0]
    else:
        ycc = _rgb_to_ycbcr(arr.astype(np.float64))
        planes = [ycc[..., 0], ycc[..., 1], ycc[..., 2]]
        qts = [lum_qt, chrom_qt, chrom_qt]
        qt_ids = [0, 1, 1]

    def _pad(p):
        out = np.empty((ph, pw))
        out[:h, :w] = p
        out[h:, :w] = p[h - 1 : h, :]
        out[:, w:] = out[:, w - 1 : w]
        return out

    comp_blocks = [
        _encode_component(_pad(p), qt) for p, qt in zip(planes, qts)
    ]

    dc_codes = _canonical_codes(_DC_BITS, _DC_SYMS)
    ac_codes = _canonical_codes(_AC_BITS, _AC_SYMS)

    bw = _BitWriter()
    prev_dc = [0] * len(planes)
    n_blocks = len(comp_blocks[0])
    for bi in range(n_blocks):
        for ci in range(len(planes)):
            zz = comp_blocks[ci][bi]
            diff = int(zz[0]) - prev_dc[ci]
            prev_dc[ci] = int(zz[0])
            size, raw = _magnitude(diff)
            code, ln = dc_codes[size]
            bw.write(code, ln)
            if size:
                bw.write(raw, size)
            run = 0
            last_nz = int(np.max(np.nonzero(zz)[0])) if np.any(zz[1:]) else 0
            for k in range(1, 64):
                v = int(zz[k])
                if v == 0:
                    run += 1
                    continue
                while run > 15:
                    code, ln = ac_codes[0xF0]
                    bw.write(code, ln)
                    run -= 16
                size, raw = _magnitude(v)
                code, ln = ac_codes[(run << 4) | size]
                bw.write(code, ln)
                bw.write(raw, size)
                run = 0
            if last_nz < 63:
                code, ln = ac_codes[0x00]  # EOB
                bw.write(code, ln)
    entropy = bw.flush()

    out = bytearray()
    out += b"\xff\xd8"  # SOI
    out += b"\xff\xe0" + struct.pack(">H", 16) + b"JFIF\x00\x01\x01\x00\x00\x01\x00\x01\x00\x00"
    for tq, qt in ((0, lum_qt), (1, chrom_qt)) if not gray else ((0, lum_qt),):
        out += b"\xff\xdb" + struct.pack(">H", 67) + bytes([tq])
        out += bytes(int(x) for x in qt.ravel()[_ZZ])
    nf = 1 if gray else 3
    out += b"\xff\xc0" + struct.pack(">HBHHB", 8 + 3 * nf, 8, h, w, nf)
    for ci in range(nf):
        out += bytes([ci + 1, 0x11, qt_ids[ci]])
    for tc, th, bits, vals in (
        (0, 0, _DC_BITS, _DC_SYMS),
        (1, 0, _AC_BITS, _AC_SYMS),
    ):
        out += b"\xff\xc4" + struct.pack(">H", 3 + 16 + len(vals))
        out += bytes([(tc << 4) | th]) + bytes(bits) + bytes(vals)
    out += b"\xff\xda" + struct.pack(">HB", 6 + 2 * nf, nf)
    for ci in range(nf):
        out += bytes([ci + 1, 0x00])  # DC table 0, AC table 0
    out += b"\x00\x3f\x00"
    out += entropy
    out += b"\xff\xd9"  # EOI
    return bytes(out)


# --- decoder ---------------------------------------------------------------


def decode_jpeg(data: bytes) -> np.ndarray:
    """Baseline JFIF bytes → uint8 array (H×W×3, or H×W for grayscale).

    General over spec-conformant baseline 4:4:4 / grayscale streams
    (tables read from the stream); SOF2 progressive and subsampled
    streams raise NotImplementedError."""
    if data[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG stream (missing SOI)")
    pos = 2
    qtables: dict[int, np.ndarray] = {}
    htables: dict[tuple[int, int], dict[tuple[int, int], int]] = {}
    frame = None
    scan = None
    while pos < len(data):
        if data[pos] != 0xFF:
            raise ValueError(f"expected marker at {pos}")
        marker = data[pos + 1]
        pos += 2
        if marker == 0xD9:  # EOI
            break
        if marker in (0x01,) or 0xD0 <= marker <= 0xD7:
            continue  # standalone markers
        seglen = struct.unpack_from(">H", data, pos)[0]
        seg_end = pos + seglen
        body = data[pos + 2 : seg_end]
        if marker == 0xDB:  # DQT
            i = 0
            while i < len(body):
                pq, tq = body[i] >> 4, body[i] & 0xF
                if pq != 0:
                    raise NotImplementedError("16-bit quant tables unsupported")
                tbl = np.frombuffer(body, dtype=np.uint8, count=64, offset=i + 1).astype(
                    np.int64
                )
                qtables[tq] = tbl[_INV_ZZ].reshape(8, 8)
                i += 65
        elif marker == 0xC4:  # DHT
            i = 0
            while i < len(body):
                tc, th = body[i] >> 4, body[i] & 0xF
                bits = list(body[i + 1 : i + 17])
                n = sum(bits)
                vals = list(body[i + 17 : i + 17 + n])
                htables[(tc, th)] = _decode_table(bits, vals)
                i += 17 + n
        elif marker == 0xC0:  # SOF0 baseline
            prec, h, w, nf = struct.unpack_from(">BHHB", body, 0)
            if prec != 8:
                raise NotImplementedError("only 8-bit precision supported")
            comps = []
            for ci in range(nf):
                cid, hv, tq = body[6 + 3 * ci : 9 + 3 * ci]
                if hv != 0x11:
                    raise NotImplementedError(
                        "subsampled JPEG (h,v != 1,1) unsupported; 4:4:4 only"
                    )
                comps.append((cid, tq))
            frame = (h, w, comps)
        elif marker in (0xC1, 0xC2, 0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA, 0xCB, 0xCD, 0xCE, 0xCF):
            raise NotImplementedError("only baseline sequential (SOF0) supported")
        elif marker == 0xDA:  # SOS
            ns = body[0]
            scan = []
            for si in range(ns):
                cid, tda = body[1 + 2 * si : 3 + 2 * si]
                scan.append((cid, tda >> 4, tda & 0xF))
            pos = seg_end
            break  # entropy data follows
        pos = seg_end
    if frame is None or scan is None:
        raise ValueError("missing SOF0/SOS")

    h, w, comps = frame
    nf = len(comps)
    bw8, bh8 = -(-w // 8), -(-h // 8)
    planes = [np.empty((bh8 * 8, bw8 * 8)) for _ in range(nf)]
    qt_of = {cid: qtables[tq] for cid, tq in comps}
    br = _BitReader(data, pos)
    prev_dc = {cid: 0 for cid, _ in comps}
    for by in range(bh8):
        for bx in range(bw8):
            for cid, td, ta in scan:
                dc_tab = htables[(0, td)]
                ac_tab = htables[(1, ta)]
                zz = np.zeros(64, dtype=np.int64)
                size = _read_symbol(br, dc_tab)
                diff = _extend(br.read_bits(size), size)
                prev_dc[cid] += diff
                zz[0] = prev_dc[cid]
                k = 1
                while k < 64:
                    sym = _read_symbol(br, ac_tab)
                    if sym == 0x00:  # EOB
                        break
                    if sym == 0xF0:  # ZRL
                        k += 16
                        continue
                    run, size = sym >> 4, sym & 0xF
                    k += run
                    if k > 63:
                        raise ValueError("AC run overflows block")
                    zz[k] = _extend(br.read_bits(size), size)
                    k += 1
                coef = (zz * qt_of[cid].ravel()[_ZZ]).astype(np.float64)
                blk = np.zeros(64)
                blk[_ZZ] = coef
                pix = _C.T @ blk.reshape(8, 8) @ _C + 128.0
                ci = [i for i, (c, _) in enumerate(comps) if c == cid][0]
                planes[ci][by * 8 : by * 8 + 8, bx * 8 : bx * 8 + 8] = pix

    if nf == 1:
        return np.clip(planes[0][:h, :w].round(), 0, 255).astype(np.uint8)
    y, cb, cr = (p[:h, :w] for p in planes)
    return _ycbcr_to_rgb(y, cb, cr)
