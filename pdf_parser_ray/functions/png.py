"""Pure-stdlib baseline PNG codec: zlib inflate + scanline unfiltering.

Decode supports the common web baseline — 8-bit depth, color types gray
(0), RGB (2), palette (3), gray+alpha (4), RGBA (6), non-interlaced.
16-bit depth and Adam7 interlacing raise ``ValueError`` (callers degrade
to ``decode_ok=False`` rather than crash). The encoder writes filter-0
scanlines and is used by tests as the decode inverse.

No external codec library: DEFLATE is stdlib ``zlib`` (PNG's only
compression method) and the five scanline filters are plain byte
arithmetic mod 256 (PNG spec §6), so this closes the "PNG is honestly
gated on codec availability" gap without new dependencies.
"""

from __future__ import annotations

import struct
import zlib

import numpy as np

from pdf_parser_ray.functions.native import (
    decode_image_native,
    native_available,
)

PNG_SIGNATURE = b"\x89PNG\r\n\x1a\n"
_CHANNELS = {0: 1, 2: 3, 3: 1, 4: 2, 6: 4}


def decode_png(
    payload: bytes, max_pixels: int = 64_000_000, backend: str = "auto"
) -> tuple[int, int, np.ndarray]:
    """(width, height, flat uint8 pixel array) from a baseline PNG.

    Palette images are expanded to RGB. Raises ValueError (or zlib.error)
    on anything malformed or outside the supported baseline.
    ``max_pixels`` bounds accepted dimensions — batch feature-extraction
    callers pass a lower cap because the left-dependent unfilters iterate
    per pixel.

    ``backend``: ``"auto"`` routes through the native (Pillow) decoder when
    importable — PNG is lossless, so native pixels are EXACTLY the stdlib
    pixels (pinned in tests/test_native_codec.py); ``"stdlib"`` forces the
    pure-Python codec; ``"native"`` requires Pillow."""
    if backend not in ("auto", "stdlib", "native"):
        raise ValueError(f"unknown backend {backend!r}")
    # magic sniff BEFORE backend routing: Pillow would happily decode a
    # JPEG handed to decode_png, making the format contract (and
    # decode_ok) environment-dependent
    if payload[:8] != PNG_SIGNATURE:
        raise ValueError("not a PNG signature")
    if backend == "native" or (backend == "auto" and native_available()):
        return decode_image_native(payload, max_pixels)
    i = 8
    ihdr = None
    plte = None
    idat: list[bytes] = []
    while i + 8 <= len(payload):
        length, ctype = struct.unpack_from(">I4s", payload, i)
        data = payload[i + 8 : i + 8 + length]
        if len(data) < length:
            raise ValueError("truncated chunk")
        if ctype == b"IHDR":
            if length != 13:
                raise ValueError("bad IHDR length")
            ihdr = struct.unpack(">IIBBBBB", data)
        elif ctype == b"PLTE":
            plte = data
        elif ctype == b"IDAT":
            idat.append(data)
        elif ctype == b"IEND":
            break
        i += 12 + length  # length + type + data + crc
    if ihdr is None or not idat:
        raise ValueError("missing IHDR or IDAT")
    w, h, depth, color_type, comp, filt, interlace = ihdr
    if depth != 8:
        raise ValueError(f"unsupported bit depth {depth}")
    if comp != 0 or filt != 0:
        raise ValueError("nonstandard compression/filter method")
    if interlace != 0:
        raise ValueError("Adam7 interlacing unsupported")
    if color_type not in _CHANNELS:
        raise ValueError(f"bad color type {color_type}")
    if w <= 0 or h <= 0 or w * h > max_pixels:
        raise ValueError("bad dimensions")

    ch = _CHANNELS[color_type]
    stride = w * ch
    expected = h * (stride + 1)
    # bounded inflate: a decompression bomb must fail the length check,
    # not allocate its full claimed output first; d.eof keeps the
    # end-of-stream + adler32 verification a plain zlib.decompress gives
    d = zlib.decompressobj()
    raw = d.decompress(b"".join(idat), expected + 1)
    if len(raw) != expected or not d.eof:
        raise ValueError("decompressed length mismatch")

    out = np.zeros((h, stride), dtype=np.uint8)
    prev = np.zeros(stride, dtype=np.uint8)
    for y in range(h):
        f = raw[y * (stride + 1)]
        line = np.frombuffer(raw, np.uint8, stride, y * (stride + 1) + 1).copy()
        if f == 0:  # None
            cur = line
        elif f == 1:  # Sub: left-neighbor chains accumulate per channel lane
            cur = np.add.accumulate(
                line.reshape(w, ch), axis=0, dtype=np.uint8
            ).reshape(stride)
        elif f == 2:  # Up (uint8 addition wraps mod 256 per spec)
            cur = line + prev
        elif f == 3:  # Average — per-pixel loop, vectorized across channels
            lp = line.reshape(w, ch).astype(np.int16)
            up = prev.reshape(w, ch).astype(np.int16)
            rec = np.empty((w, ch), dtype=np.int16)
            left = np.zeros(ch, dtype=np.int16)
            for x in range(w):
                left = (lp[x] + ((left + up[x]) >> 1)) & 0xFF
                rec[x] = left
            cur = rec.astype(np.uint8).reshape(stride)
        elif f == 4:  # Paeth — per-pixel loop, vectorized across channels
            lp = line.reshape(w, ch).astype(np.int16)
            up = prev.reshape(w, ch).astype(np.int16)
            rec = np.empty((w, ch), dtype=np.int16)
            left = np.zeros(ch, dtype=np.int16)
            upleft = np.zeros(ch, dtype=np.int16)
            for x in range(w):
                p = left + up[x] - upleft
                pa_ = np.abs(p - left)
                pb = np.abs(p - up[x])
                pc_ = np.abs(p - upleft)
                pred = np.where(
                    (pa_ <= pb) & (pa_ <= pc_), left, np.where(pb <= pc_, up[x], upleft)
                )
                left = (lp[x] + pred) & 0xFF
                rec[x] = left
                upleft = up[x]
            cur = rec.astype(np.uint8).reshape(stride)
        else:
            raise ValueError(f"bad filter byte {f}")
        out[y] = cur
        prev = cur

    pixels = out.reshape(-1)
    if color_type == 3:
        if plte is None or len(plte) % 3:
            raise ValueError("palette image without valid PLTE")
        pal = np.frombuffer(plte, np.uint8).reshape(-1, 3)
        if int(pixels.max(initial=0)) >= len(pal):
            raise ValueError("palette index out of range")
        pixels = pal[pixels].reshape(-1)
    return int(w), int(h), pixels


def encode_png(
    width: int, height: int, pixels: np.ndarray, color_type: int = 2
) -> bytes:
    """Baseline PNG bytes (8-bit, filter-0 scanlines) from a flat uint8
    pixel array — the test-side inverse of :func:`decode_png` (palette
    encoding not supported)."""
    if color_type == 3:
        raise ValueError("palette encoding not supported")
    ch = _CHANNELS[color_type]
    arr = np.asarray(pixels, dtype=np.uint8).reshape(height, width * ch)
    raw = b"".join(b"\x00" + arr[y].tobytes() for y in range(height))

    def chunk(ctype: bytes, data: bytes) -> bytes:
        return (
            struct.pack(">I", len(data))
            + ctype
            + data
            + struct.pack(">I", zlib.crc32(ctype + data))
        )

    ihdr = struct.pack(">IIBBBBB", width, height, 8, color_type, 0, 0, 0)
    return (
        PNG_SIGNATURE
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", zlib.compress(raw))
        + chunk(b"IEND", b"")
    )
