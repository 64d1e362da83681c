"""Availability-gated native image decode (the optional Pillow fast path).

The pure-stdlib codecs in :mod:`functions.jpeg` / :mod:`functions.png` are
the sandbox-honest baseline, but the JPEG codec's per-symbol Python Huffman
loop would dominate a mostly-JPEG corpus at 100x scale. When Pillow is
importable, the public ``decode_jpeg`` / ``decode_png`` entry points route
through it instead (``backend="auto"``); when it is not — as in this
sandbox — behavior is byte-identical to the stdlib path. The equivalence
contract between the two backends is pinned in
``tests/test_native_codec.py`` (exact for PNG, which is lossless; dims
exact + pixels within one intensity step for JPEG, whose IDCT is
implementation-defined at the ulp level).

Probing happens once per process at first use — inside an actor pool that
is once per actor, the ``MediaDecoder.__init__`` contract.
"""

from __future__ import annotations

import io

import numpy as np

_PROBED = False
_PIL_IMAGE = None


def _pil():
    """The ``PIL.Image`` module if Pillow is importable, else None."""
    global _PROBED, _PIL_IMAGE
    if not _PROBED:
        try:
            from PIL import Image as _img  # type: ignore

            _PIL_IMAGE = _img
        except ImportError:
            _PIL_IMAGE = None
        _PROBED = True
    return _PIL_IMAGE


def native_available() -> bool:
    return _pil() is not None


# PIL modes with a faithful interleaved-uint8 layout matching the stdlib
# decoders' channel conventions; anything else converts to RGB (palette
# expansion — same law as the stdlib PNG path's PLTE expansion).
_DIRECT_MODES = {"L": 1, "LA": 2, "RGB": 3, "RGBA": 4}


def decode_image_native(
    payload: bytes, max_pixels: int = 64_000_000
) -> tuple[int, int, np.ndarray]:
    """(width, height, flat uint8 pixels) via Pillow, with the stdlib
    decoders' channel conventions (grayscale 1ch, gray+alpha 2ch, RGB 3ch,
    RGBA 4ch; palette expands to RGB). Raises ValueError on any decode
    failure or when Pillow is absent, so callers keep one error contract
    across backends. Note the native path accepts formats the stdlib
    baseline rejects (progressive JPEG, 16-bit PNG downconverted by PIL) —
    a recall improvement, not a parity break: no oracle covers those
    payloads and ``decode_ok`` semantics stay per-payload."""
    img_mod = _pil()
    if img_mod is None:
        raise ValueError("native backend requested but Pillow is not importable")
    try:
        img = img_mod.open(io.BytesIO(payload))
        w, h = img.size
        if w <= 0 or h <= 0 or w * h > max_pixels:
            raise ValueError("bad dimensions")
        if img.mode not in _DIRECT_MODES:
            img = img.convert("RGB")
        arr = np.asarray(img, dtype=np.uint8)
    except ValueError:
        raise
    except Exception as exc:  # PIL raises OSError/SyntaxError/... — fold
        # into the one error type the degrade paths already catch
        raise ValueError(f"native decode failed: {exc}") from exc
    return w, h, arr.reshape(-1)
