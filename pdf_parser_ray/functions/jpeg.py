"""Pure-stdlib baseline JPEG codec (ITU-T T.81 sequential DCT).

Decode supports the common web baseline: SOF0/SOF1 Huffman sequential,
8-bit precision, 1 or 3 components, any sampling factors up to 2x2
(4:4:4 / 4:2:2 / 4:2:0), restart intervals. Progressive (SOF2),
arithmetic coding, 12-bit precision and hierarchical modes raise
``ValueError`` — callers degrade to ``decode_ok=False`` rather than
crash, the functions/png.py convention.

The encoder writes 4:4:4 (or single-component grayscale) interchange
JFIF streams with the Annex-K quantization tables (libjpeg-style quality
scaling) and the Annex-K "typical" Huffman tables, and exists so tests
and the synthetic media corpus can drive the REAL decode path without
external media files. The decoder builds its Huffman/quant tables from
the stream's own DQT/DHT segments, so encode→decode is self-consistent
by construction.

Everything here is from the public standard: marker structure (T.81
§B), Huffman coding (§C + Annex K.3), the zigzag order (Figure A.6),
DCT/IDCT as the orthonormal 8×8 DCT-II matrix pair, and the JFIF
YCbCr<->RGB transform. No external codec library is used.
"""

from __future__ import annotations

import struct

import numpy as np

from pdf_parser_ray.functions.native import (
    decode_image_native,
    native_available,
)

# zigzag scan order: ZIGZAG[k] = natural (row-major) index of the k-th
# coefficient in scan order (T.81 Figure A.6)
ZIGZAG = np.array(
    [
        0, 1, 8, 16, 9, 2, 3, 10,
        17, 24, 32, 25, 18, 11, 4, 5,
        12, 19, 26, 33, 40, 48, 41, 34,
        27, 20, 13, 6, 7, 14, 21, 28,
        35, 42, 49, 56, 57, 50, 43, 36,
        29, 22, 15, 23, 30, 37, 44, 51,
        58, 59, 52, 45, 38, 31, 39, 46,
        53, 60, 61, 54, 47, 55, 62, 63,
    ],
    dtype=np.int64,
)

# Annex K.1/K.2 quantization tables (natural order)
QUANT_LUMA = np.array(
    [
        16, 11, 10, 16, 24, 40, 51, 61,
        12, 12, 14, 19, 26, 58, 60, 55,
        14, 13, 16, 24, 40, 57, 69, 56,
        14, 17, 22, 29, 51, 87, 80, 62,
        18, 22, 37, 56, 68, 109, 103, 77,
        24, 35, 55, 64, 81, 104, 113, 92,
        49, 64, 78, 87, 103, 121, 120, 101,
        72, 92, 95, 98, 112, 100, 103, 99,
    ],
    dtype=np.int64,
)
QUANT_CHROMA = np.array(
    [
        17, 18, 24, 47, 99, 99, 99, 99,
        18, 21, 26, 66, 99, 99, 99, 99,
        24, 26, 56, 99, 99, 99, 99, 99,
        47, 66, 99, 99, 99, 99, 99, 99,
        99, 99, 99, 99, 99, 99, 99, 99,
        99, 99, 99, 99, 99, 99, 99, 99,
        99, 99, 99, 99, 99, 99, 99, 99,
        99, 99, 99, 99, 99, 99, 99, 99,
    ],
    dtype=np.int64,
)

# Annex K.3 "typical" Huffman specs: (BITS[1..16], HUFFVAL)
DC_LUMA_SPEC = (
    [0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0],
    list(range(12)),
)
DC_CHROMA_SPEC = (
    [0, 3, 1, 1, 1, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0],
    list(range(12)),
)
AC_LUMA_SPEC = (
    [0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 125],
    [
        0x01, 0x02, 0x03, 0x00, 0x04, 0x11, 0x05, 0x12,
        0x21, 0x31, 0x41, 0x06, 0x13, 0x51, 0x61, 0x07,
        0x22, 0x71, 0x14, 0x32, 0x81, 0x91, 0xA1, 0x08,
        0x23, 0x42, 0xB1, 0xC1, 0x15, 0x52, 0xD1, 0xF0,
        0x24, 0x33, 0x62, 0x72, 0x82, 0x09, 0x0A, 0x16,
        0x17, 0x18, 0x19, 0x1A, 0x25, 0x26, 0x27, 0x28,
        0x29, 0x2A, 0x34, 0x35, 0x36, 0x37, 0x38, 0x39,
        0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49,
        0x4A, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58, 0x59,
        0x5A, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68, 0x69,
        0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78, 0x79,
        0x7A, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89,
        0x8A, 0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98,
        0x99, 0x9A, 0xA2, 0xA3, 0xA4, 0xA5, 0xA6, 0xA7,
        0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5, 0xB6,
        0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5,
        0xC6, 0xC7, 0xC8, 0xC9, 0xCA, 0xD2, 0xD3, 0xD4,
        0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA, 0xE1, 0xE2,
        0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA,
        0xF1, 0xF2, 0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8,
        0xF9, 0xFA,
    ],
)
AC_CHROMA_SPEC = (
    [0, 2, 1, 2, 4, 4, 3, 4, 7, 5, 4, 4, 0, 1, 2, 119],
    [
        0x00, 0x01, 0x02, 0x03, 0x11, 0x04, 0x05, 0x21,
        0x31, 0x06, 0x12, 0x41, 0x51, 0x07, 0x61, 0x71,
        0x13, 0x22, 0x32, 0x81, 0x08, 0x14, 0x42, 0x91,
        0xA1, 0xB1, 0xC1, 0x09, 0x23, 0x33, 0x52, 0xF0,
        0x15, 0x62, 0x72, 0xD1, 0x0A, 0x16, 0x24, 0x34,
        0xE1, 0x25, 0xF1, 0x17, 0x18, 0x19, 0x1A, 0x26,
        0x27, 0x28, 0x29, 0x2A, 0x35, 0x36, 0x37, 0x38,
        0x39, 0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48,
        0x49, 0x4A, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58,
        0x59, 0x5A, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68,
        0x69, 0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78,
        0x79, 0x7A, 0x82, 0x83, 0x84, 0x85, 0x86, 0x87,
        0x88, 0x89, 0x8A, 0x92, 0x93, 0x94, 0x95, 0x96,
        0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3, 0xA4, 0xA5,
        0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4,
        0xB5, 0xB6, 0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3,
        0xC4, 0xC5, 0xC6, 0xC7, 0xC8, 0xC9, 0xCA, 0xD2,
        0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA,
        0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9,
        0xEA, 0xF2, 0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8,
        0xF9, 0xFA,
    ],
)


def _dct_matrix() -> np.ndarray:
    """Orthonormal 8x8 DCT-II matrix C: forward F = C @ f @ C.T, inverse
    f = C.T @ F @ C."""
    x = np.arange(8, dtype=np.float64)
    c = np.cos((2 * x[None, :] + 1) * x[:, None] * np.pi / 16) / 2.0
    c[0, :] /= np.sqrt(2.0)
    return c


_DCT = _dct_matrix()


def _canonical_codes(bits: list[int], vals: list[int]) -> dict[int, tuple[int, int]]:
    """symbol -> (code, length) canonical Huffman assignment (T.81 §C.2)."""
    out: dict[int, tuple[int, int]] = {}
    code = 0
    k = 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            out[vals[k]] = (code, length)
            code += 1
            k += 1
        code <<= 1
    return out


def _decode_table(bits: list[int], vals: list[int]) -> dict[tuple[int, int], int]:
    """(length, code) -> symbol, the decoder-side view of the same canon."""
    enc = _canonical_codes(bits, vals)
    return {(ln, code): sym for sym, (code, ln) in enc.items()}


def scale_quant(base: np.ndarray, quality: int) -> np.ndarray:
    """libjpeg-style quality scaling of an Annex-K table (public formula:
    scale = 5000/q below 50 else 200-2q; entries clamped to 1..255)."""
    quality = min(100, max(1, quality))
    scale = 5000 // quality if quality < 50 else 200 - 2 * quality
    return np.clip((base * scale + 50) // 100, 1, 255).astype(np.int64)


# ---- bit IO ----------------------------------------------------------------


class _BitWriter:
    def __init__(self) -> None:
        self.out = bytearray()
        self.acc = 0
        self.nbits = 0

    def write(self, code: int, length: int) -> None:
        self.acc = (self.acc << length) | (code & ((1 << length) - 1))
        self.nbits += length
        while self.nbits >= 8:
            self.nbits -= 8
            b = (self.acc >> self.nbits) & 0xFF
            self.out.append(b)
            if b == 0xFF:  # byte stuffing (§B.1.1.5)
                self.out.append(0x00)
        self.acc &= (1 << self.nbits) - 1

    def flush(self) -> bytes:
        if self.nbits:
            pad = 8 - self.nbits
            self.write((1 << pad) - 1, pad)  # pad with 1-bits
        return bytes(self.out)


class _BitReader:
    """Entropy-coded-segment reader: unstuffs 0xFF00, stops at markers."""

    def __init__(self, data: bytes, pos: int) -> None:
        self.data = data
        self.pos = pos
        self.acc = 0
        self.nbits = 0

    def _fill(self) -> None:
        if self.pos >= len(self.data):
            raise ValueError("truncated entropy stream")
        b = self.data[self.pos]
        if b == 0xFF:
            if self.pos + 1 >= len(self.data):
                # a lone trailing 0xFF is a truncation, not a stuffed byte;
                # decoding it as entropy data would emit one spurious byte
                # before the error surfaced
                raise ValueError("truncated entropy stream")
            nxt = self.data[self.pos + 1]
            if nxt != 0x00:
                raise ValueError("marker inside entropy segment")
            self.pos += 2
        else:
            self.pos += 1
        self.acc = (self.acc << 8) | b
        self.nbits += 8

    def read_bit(self) -> int:
        if self.nbits == 0:
            self._fill()
        self.nbits -= 1
        return (self.acc >> self.nbits) & 1

    def receive(self, n: int) -> int:
        v = 0
        for _ in range(n):
            v = (v << 1) | self.read_bit()
        return v

    def huff(self, table: dict[tuple[int, int], int]) -> int:
        code = 0
        for length in range(1, 17):
            code = (code << 1) | self.read_bit()
            sym = table.get((length, code))
            if sym is not None:
                return sym
        raise ValueError("invalid Huffman code")

    def restart(self) -> None:
        """Byte-align and consume an RSTn marker (§B.2.1.2)."""
        self.acc = 0
        self.nbits = 0
        if (
            self.pos + 1 >= len(self.data)
            or self.data[self.pos] != 0xFF
            or not (0xD0 <= self.data[self.pos + 1] <= 0xD7)
        ):
            raise ValueError("expected restart marker")
        self.pos += 2


def _extend(v: int, t: int) -> int:
    """Sign-extend a t-bit magnitude (T.81 §F.2.2.1 EXTEND)."""
    if t == 0:
        return 0
    return v if v >= (1 << (t - 1)) else v - (1 << t) + 1


# ---- encoder ---------------------------------------------------------------


def encode_jpeg(
    width: int,
    height: int,
    pixels: np.ndarray,
    quality: int = 90,
    grayscale: bool = False,
    subsampling: str = "444",
) -> bytes:
    """Baseline JFIF bytes for flat uint8 pixels (RGB 3*w*h, or w*h with
    ``grayscale=True``), Annex-K tables scaled by ``quality``.
    ``subsampling``: "444" (one block per component per MCU) or "420"
    (Y 2x2 per MCU, chroma 2x2-box-averaged — the common web layout,
    which also exercises the decoder's upsampling path)."""
    if subsampling not in ("444", "420"):
        raise ValueError("subsampling must be '444' or '420'")
    pixels = np.asarray(pixels, dtype=np.uint8).ravel()
    if grayscale:
        planes = [pixels.reshape(height, width).astype(np.float64)]
        samp = [(1, 1)]
    else:
        rgb = pixels.reshape(height, width, 3).astype(np.float64)
        r, g, b = rgb[..., 0], rgb[..., 1], rgb[..., 2]
        planes = [
            0.299 * r + 0.587 * g + 0.114 * b,
            -0.168736 * r - 0.331264 * g + 0.5 * b + 128.0,
            0.5 * r - 0.418688 * g - 0.081312 * b + 128.0,
        ]
        samp = (
            [(1, 1)] * 3 if subsampling == "444" else [(2, 2), (1, 1), (1, 1)]
        )
    qtabs = [scale_quant(QUANT_LUMA, quality), scale_quant(QUANT_CHROMA, quality)]
    n_comp = len(planes)
    hmax = max(s[0] for s in samp)
    vmax = max(s[1] for s in samp)
    mcus_x = -(-width // (8 * hmax))
    mcus_y = -(-height // (8 * vmax))

    def pad_edge(plane: np.ndarray, ph: int, pw: int) -> np.ndarray:
        out = np.empty((ph, pw), dtype=np.float64)
        h0, w0 = plane.shape
        out[:h0, :w0] = plane
        out[h0:, :w0] = plane[-1:, :]  # edge-replicate pad
        out[:, w0:] = out[:, w0 - 1 : w0]
        return out

    # per-component quantized zigzag coefficients on the MCU-aligned block
    # grid (nby x nbx row-major), vectorized DCT
    comp_coefs = []
    grids = []
    for ci in range(n_comp):
        h_i, v_i = samp[ci]
        plane = planes[ci]
        if (h_i, v_i) != (hmax, vmax):
            # box-average downsample by the sampling ratio (pad to even
            # first so the 2x2 mean is defined at odd edges)
            fy, fx = vmax // v_i, hmax // h_i
            p = pad_edge(
                plane, -(-plane.shape[0] // fy) * fy, -(-plane.shape[1] // fx) * fx
            )
            plane = p.reshape(
                p.shape[0] // fy, fy, p.shape[1] // fx, fx
            ).mean(axis=(1, 3))
        nbx, nby = mcus_x * h_i, mcus_y * v_i
        padded = pad_edge(plane, nby * 8, nbx * 8)
        blocks = (
            padded.reshape(nby, 8, nbx, 8).transpose(0, 2, 1, 3).reshape(-1, 8, 8)
        ) - 128.0
        coefs = _DCT @ blocks @ _DCT.T
        q = qtabs[0 if ci == 0 else 1].reshape(8, 8)
        quant = np.round(coefs / q).astype(np.int64).reshape(-1, 64)
        comp_coefs.append(quant[:, ZIGZAG])
        grids.append((nbx, nby))

    dc_specs = [DC_LUMA_SPEC, DC_CHROMA_SPEC]
    ac_specs = [AC_LUMA_SPEC, AC_CHROMA_SPEC]
    dc_enc = [_canonical_codes(*s) for s in dc_specs]
    ac_enc = [_canonical_codes(*s) for s in ac_specs]

    def emit_block(w_bits: _BitWriter, t: int, zz: np.ndarray, pred: int) -> int:
        diff = int(zz[0]) - pred
        size = abs(diff).bit_length()
        code, ln = dc_enc[t][size]
        w_bits.write(code, ln)
        if size:
            w_bits.write(diff if diff >= 0 else diff + (1 << size) - 1, size)
        run = 0
        for k in range(1, 64):
            v = int(zz[k])
            if v == 0:
                run += 1
                continue
            while run > 15:
                code, ln = ac_enc[t][0xF0]  # ZRL
                w_bits.write(code, ln)
                run -= 16
            size = abs(v).bit_length()
            code, ln = ac_enc[t][(run << 4) | size]
            w_bits.write(code, ln)
            w_bits.write(v if v >= 0 else v + (1 << size) - 1, size)
            run = 0
        if run:
            code, ln = ac_enc[t][0x00]  # EOB
            w_bits.write(code, ln)
        return int(zz[0])

    w_bits = _BitWriter()
    preds = [0] * n_comp
    for my in range(mcus_y):
        for mx in range(mcus_x):
            for ci in range(n_comp):
                h_i, v_i = samp[ci]
                nbx = grids[ci][0]
                for v in range(v_i):
                    for hh in range(h_i):
                        bi = (my * v_i + v) * nbx + (mx * h_i + hh)
                        preds[ci] = emit_block(
                            w_bits, 0 if ci == 0 else 1, comp_coefs[ci][bi],
                            preds[ci],
                        )
    scan = w_bits.flush()

    out = bytearray(b"\xff\xd8")  # SOI
    out += b"\xff\xe0" + struct.pack(">H", 16) + b"JFIF\x00\x01\x01\x00" + struct.pack(
        ">HH", 1, 1
    ) + b"\x00\x00"
    for tq in range(2 if n_comp == 3 else 1):
        zz_tab = qtabs[tq][ZIGZAG]
        out += b"\xff\xdb" + struct.pack(">HB", 67, tq) + bytes(
            int(x) for x in zz_tab
        )
    out += b"\xff\xc0" + struct.pack(
        ">HBHHB", 8 + 3 * n_comp, 8, height, width, n_comp
    )
    for ci in range(n_comp):
        out += bytes(
            [ci + 1, (samp[ci][0] << 4) | samp[ci][1], 0 if ci == 0 else 1]
        )
    for tc, specs in ((0, dc_specs), (1, ac_specs)):
        for th in range(2 if n_comp == 3 else 1):
            bits, vals = specs[th]
            out += b"\xff\xc4" + struct.pack(
                ">HB", 19 + len(vals), (tc << 4) | th
            ) + bytes(bits) + bytes(vals)
    out += b"\xff\xda" + struct.pack(">HB", 6 + 2 * n_comp, n_comp)
    for ci in range(n_comp):
        out += bytes([ci + 1, 0x00 if ci == 0 else 0x11])
    out += b"\x00\x3f\x00"
    out += scan
    out += b"\xff\xd9"  # EOI
    return bytes(out)


# ---- decoder ---------------------------------------------------------------


def decode_jpeg(
    payload: bytes, max_pixels: int = 64_000_000, backend: str = "auto"
) -> tuple[int, int, np.ndarray]:
    """(width, height, flat uint8 pixels — RGB for 3 components, single
    channel for grayscale) from a baseline sequential JPEG. Raises
    ValueError on anything malformed or outside the supported baseline.

    ``backend``: ``"auto"`` routes through the native (Pillow) decoder when
    importable — the 100x-scale escape hatch for this codec's per-symbol
    Python Huffman loop; identical dims/channels, pixels within one
    intensity step (IDCTs are implementation-defined at the ulp level;
    equivalence pinned in tests/test_native_codec.py). ``"stdlib"`` forces
    the pure-Python baseline codec; ``"native"`` requires Pillow."""
    if backend not in ("auto", "stdlib", "native"):
        raise ValueError(f"unknown backend {backend!r}")
    # magic sniff BEFORE backend routing: Pillow would happily decode a
    # PNG handed to decode_jpeg, making the format contract (and
    # decode_ok) environment-dependent
    if payload[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG SOI")
    if backend == "native" or (backend == "auto" and native_available()):
        return decode_image_native(payload, max_pixels)
    qtabs: dict[int, np.ndarray] = {}
    htabs: dict[tuple[int, int], dict[tuple[int, int], int]] = {}
    frame = None
    restart_interval = 0
    i = 2
    while i + 4 <= len(payload):
        if payload[i] != 0xFF:
            raise ValueError("expected marker")
        marker = payload[i + 1]
        if marker == 0xD9:  # EOI before SOS
            raise ValueError("no scan data")
        length = struct.unpack_from(">H", payload, i + 2)[0]
        seg = payload[i + 4 : i + 2 + length]
        if len(seg) != length - 2:
            raise ValueError("truncated segment")
        if marker == 0xDB:  # DQT: possibly several tables per segment
            j = 0
            while j < len(seg):
                pq, tq = seg[j] >> 4, seg[j] & 0x0F
                if pq != 0:
                    raise ValueError("16-bit quant tables unsupported")
                zz = np.frombuffer(seg, dtype=np.uint8, count=64, offset=j + 1)
                nat = np.zeros(64, dtype=np.int64)
                nat[ZIGZAG] = zz
                qtabs[tq] = nat
                j += 65
        elif marker == 0xC4:  # DHT
            j = 0
            while j < len(seg):
                tc, th = seg[j] >> 4, seg[j] & 0x0F
                bits = list(seg[j + 1 : j + 17])
                n = sum(bits)
                vals = list(seg[j + 17 : j + 17 + n])
                if len(vals) != n:
                    raise ValueError("truncated DHT")
                htabs[(tc, th)] = _decode_table(bits, vals)
                j += 17 + n
        elif marker in (0xC0, 0xC1):  # SOF0/SOF1: Huffman sequential
            prec, h, w, nc = struct.unpack_from(">BHHB", seg, 0)
            if prec != 8:
                raise ValueError("only 8-bit precision supported")
            if nc not in (1, 3):
                raise ValueError(f"unsupported component count {nc}")
            if w <= 0 or h <= 0 or w * h > max_pixels:
                raise ValueError("bad dimensions")
            comps = []
            for c in range(nc):
                cid, hv, tq = seg[6 + 3 * c : 9 + 3 * c]
                comps.append(
                    {"id": cid, "h": hv >> 4, "v": hv & 0x0F, "tq": tq}
                )
            if any(
                not (1 <= c["h"] <= 2 and 1 <= c["v"] <= 2) for c in comps
            ):
                raise ValueError("sampling factors above 2x2 unsupported")
            frame = {"w": w, "h": h, "comps": comps}
        elif marker in (0xC2, 0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA, 0xCB, 0xCD, 0xCE, 0xCF):
            raise ValueError("non-baseline SOF (progressive/arithmetic)")
        elif marker == 0xDD:  # DRI
            restart_interval = struct.unpack_from(">H", seg, 0)[0]
        elif marker == 0xDA:  # SOS
            if frame is None:
                raise ValueError("SOS before SOF")
            ns = seg[0]
            scan_sel = []
            for c in range(ns):
                cs, tdta = seg[1 + 2 * c : 3 + 2 * c]
                scan_sel.append((cs, tdta >> 4, tdta & 0x0F))
            return _decode_scan(
                payload, i + 2 + length, frame, scan_sel, qtabs, htabs,
                restart_interval,
            )
        # APPn / COM / others: skip
        i += 2 + length
    raise ValueError("no SOS marker")


def _decode_scan(
    data: bytes,
    pos: int,
    frame: dict,
    scan_sel: list[tuple[int, int, int]],
    qtabs: dict[int, np.ndarray],
    htabs: dict,
    restart_interval: int,
) -> tuple[int, int, np.ndarray]:
    w, h, comps = frame["w"], frame["h"], frame["comps"]
    if len(scan_sel) != len(comps):
        raise ValueError("partial scans unsupported")
    hmax = max(c["h"] for c in comps)
    vmax = max(c["v"] for c in comps)
    mcus_x = -(-w // (8 * hmax))
    mcus_y = -(-h // (8 * vmax))

    by_id = {c["id"]: c for c in comps}
    order = []
    for cs, td, ta in scan_sel:
        c = by_id.get(cs)
        if c is None:
            raise ValueError("scan references unknown component")
        dc = htabs.get((0, td))
        ac = htabs.get((1, ta))
        q = qtabs.get(c["tq"])
        if dc is None or ac is None or q is None:
            raise ValueError("missing Huffman/quant table")
        order.append((c, dc, ac, q))

    # per-component quantized coefficient store, natural block grid
    stores = []
    for c, _, _, _ in order:
        nbx = mcus_x * c["h"]
        nby = mcus_y * c["v"]
        stores.append(np.zeros((nby * nbx, 64), dtype=np.int64))

    br = _BitReader(data, pos)
    preds = [0] * len(order)
    mcu_idx = 0
    for my in range(mcus_y):
        for mx in range(mcus_x):
            if restart_interval and mcu_idx and mcu_idx % restart_interval == 0:
                br.restart()
                preds = [0] * len(order)
            for ci, (c, dc_tab, ac_tab, _) in enumerate(order):
                for v in range(c["v"]):
                    for hh in range(c["h"]):
                        zz = np.zeros(64, dtype=np.int64)
                        t = br.huff(dc_tab)
                        if t > 11:
                            raise ValueError("bad DC size")
                        diff = _extend(br.receive(t), t)
                        preds[ci] += diff
                        zz[0] = preds[ci]
                        k = 1
                        while k < 64:
                            rs = br.huff(ac_tab)
                            r, s = rs >> 4, rs & 0x0F
                            if s == 0:
                                if r == 15:
                                    k += 16
                                    continue
                                break  # EOB
                            k += r
                            if k > 63:
                                raise ValueError("AC run past block end")
                            zz[k] = _extend(br.receive(s), s)
                            k += 1
                        bx = mx * c["h"] + hh
                        byy = my * c["v"] + v
                        stores[ci][byy * (mcus_x * c["h"]) + bx] = zz
            mcu_idx += 1

    # dequantize + vectorized IDCT + assemble planes
    planes = []
    for (c, _, _, q), zz_blocks in zip(order, stores):
        nbx = mcus_x * c["h"]
        nby = mcus_y * c["v"]
        nat = np.zeros_like(zz_blocks, dtype=np.float64)
        nat[:, ZIGZAG] = zz_blocks
        nat *= q[None, :].astype(np.float64)
        blocks = nat.reshape(-1, 8, 8)
        spatial = _DCT.T @ blocks @ _DCT + 128.0
        plane = (
            spatial.reshape(nby, nbx, 8, 8)
            .transpose(0, 2, 1, 3)
            .reshape(nby * 8, nbx * 8)
        )
        # upsample to full MCU-grid resolution, then crop to image dims
        plane = np.repeat(
            np.repeat(plane, vmax // c["v"], axis=0), hmax // c["h"], axis=1
        )[:h, :w]
        planes.append(plane)

    if len(planes) == 1:
        return w, h, np.clip(np.round(planes[0]), 0, 255).astype(np.uint8).ravel()
    y, cb, cr = planes
    r = y + 1.402 * (cr - 128.0)
    g = y - 0.344136 * (cb - 128.0) - 0.714136 * (cr - 128.0)
    b = y + 1.772 * (cb - 128.0)
    rgb = np.stack([r, g, b], axis=-1)
    return w, h, np.clip(np.round(rgb), 0, 255).astype(np.uint8).ravel()
