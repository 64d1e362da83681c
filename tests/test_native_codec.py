"""Native-codec escape hatch (functions/native.py): routing, error
contract, and stdlib<->native equivalence.

Pillow is absent in this sandbox, so the true cross-backend pixel
equivalence test is import-gated (it runs wherever Pillow exists); the
routing plumbing is pinned here with a mock Image module, the same
convention as the Lance contract pins."""

from __future__ import annotations

import importlib.util

import numpy as np
import pytest

from pdf_parser_ray.functions import native
from pdf_parser_ray.functions.jpeg import decode_jpeg, encode_jpeg
from pdf_parser_ray.functions.png import decode_png, encode_png
from pdf_parser_ray.ops import multimodal

HAVE_PIL = importlib.util.find_spec("PIL") is not None


def _rgb(w, h, seed=7):
    rng = np.random.RandomState(seed)
    return rng.randint(0, 256, size=w * h * 3, dtype=np.int64).astype(np.uint8)


# ---- routing without Pillow -------------------------------------------------


def test_auto_equals_stdlib_when_native_absent():
    if HAVE_PIL:
        pytest.skip("Pillow present: auto routes native on this machine")
    px = _rgb(9, 6)
    png = encode_png(9, 6, px, color_type=2)
    w1, h1, p1 = decode_png(png, backend="auto")
    w2, h2, p2 = decode_png(png, backend="stdlib")
    assert (w1, h1) == (w2, h2) == (9, 6)
    np.testing.assert_array_equal(p1, p2)
    jpg = encode_jpeg(9, 6, px, quality=90)
    wa, ha, pa_ = decode_jpeg(jpg, backend="auto")
    ws, hs, ps = decode_jpeg(jpg, backend="stdlib")
    assert (wa, ha) == (ws, hs) == (9, 6)
    np.testing.assert_array_equal(pa_, ps)


def test_native_backend_raises_when_absent():
    if HAVE_PIL:
        pytest.skip("Pillow present")
    with pytest.raises(ValueError, match="not importable"):
        decode_jpeg(b"\xff\xd8junk", backend="native")
    with pytest.raises(ValueError, match="not importable"):
        decode_png(b"\x89PNG\r\n\x1a\njunk", backend="native")
    # wrong magic is rejected BEFORE backend routing, regardless of backend
    with pytest.raises(ValueError, match="not a JPEG SOI"):
        decode_jpeg(b"\x89PNG\r\n\x1a\njunk", backend="native")
    with pytest.raises(ValueError, match="not a PNG signature"):
        decode_png(b"\xff\xd8junk", backend="native")


def test_unknown_backend_rejected():
    with pytest.raises(ValueError, match="unknown backend"):
        decode_jpeg(b"\xff\xd8", backend="pil")
    with pytest.raises(ValueError, match="unknown backend"):
        decode_png(b"", backend="fast")


# ---- routing plumbing pinned with a mock Image module -----------------------


class _FakeImg:
    def __init__(self, w: int, h: int):
        self.size = (w, h)
        self.mode = "RGB"
        self._arr = (np.arange(w * h * 3) % 251).astype(np.uint8).reshape(h, w, 3)

    def __array__(self, dtype=None, copy=None):
        a = self._arr if dtype is None else self._arr.astype(dtype)
        return np.array(a) if copy else a


class _FakeImageModule:
    opened_payloads: list[bytes] = []

    @staticmethod
    def open(fp):
        _FakeImageModule.opened_payloads.append(fp.read())
        return _FakeImg(5, 4)


@pytest.fixture
def fake_native(monkeypatch):
    _FakeImageModule.opened_payloads = []
    monkeypatch.setattr(native, "_PIL_IMAGE", _FakeImageModule)
    monkeypatch.setattr(native, "_PROBED", True)
    yield _FakeImageModule


def test_auto_routes_native_when_available(fake_native):
    payload = b"\xff\xd8\xff\xe0whatever"
    w, h, flat = decode_jpeg(payload, backend="auto")
    assert (w, h) == (5, 4)
    assert flat.shape == (5 * 4 * 3,)
    assert fake_native.opened_payloads == [payload]
    # stdlib stays forced-reachable under the same (mocked) availability
    px = _rgb(5, 4)
    jpg = encode_jpeg(5, 4, px, quality=90)
    ws, hs, _ = decode_jpeg(jpg, backend="stdlib")
    assert (ws, hs) == (5, 4)


def test_png_auto_routes_native_when_available(fake_native):
    w, h, flat = decode_png(b"\x89PNG\r\n\x1a\nrest", backend="auto")
    assert (w, h) == (5, 4) and flat.size == 60


def test_media_decoder_uses_native_route(fake_native):
    dec = multimodal.MediaDecoder()  # public default: fake=False
    out = dec._decode("ref", b"\xff\xd8\xff\xe0payload")
    assert out["decode_ok"] is True
    assert (out["width"], out["height"]) == (5, 4)
    assert len(out["feature"]) == dec.feature_dim


def test_native_pixel_cap_and_error_contract(fake_native):
    with pytest.raises(ValueError, match="bad dimensions"):
        native.decode_image_native(b"\xff\xd8x", max_pixels=10)

    class _Boom:
        @staticmethod
        def open(fp):
            raise OSError("cannot identify image file")

    native._PIL_IMAGE = _Boom
    with pytest.raises(ValueError, match="native decode failed"):
        native.decode_image_native(b"\xff\xd8x")


# ---- true cross-backend equivalence (runs wherever Pillow exists) -----------


@pytest.mark.skipif(not HAVE_PIL, reason="Pillow not importable")
def test_native_equivalence_png_exact():
    for w, h, ct in ((13, 7, 2), (8, 8, 0), (5, 9, 6)):
        ch = {0: 1, 2: 3, 6: 4}[ct]
        px = _rgb(w, h)[: w * h * ch]
        payload = encode_png(w, h, px, color_type=ct)
        ws, hs, ps = decode_png(payload, backend="stdlib")
        wn, hn, pn = decode_png(payload, backend="native")
        assert (ws, hs) == (wn, hn) == (w, h)
        np.testing.assert_array_equal(ps, pn)  # PNG is lossless: exact


@pytest.mark.skipif(not HAVE_PIL, reason="Pillow not importable")
def test_native_equivalence_jpeg_dims_exact_pixels_close():
    for w, h, sub in ((16, 16, "444"), (13, 7, "420")):
        px = _rgb(w, h)
        payload = encode_jpeg(w, h, px, quality=92, subsampling=sub)
        ws, hs, ps = decode_jpeg(payload, backend="stdlib")
        wn, hn, pn = decode_jpeg(payload, backend="native")
        assert (ws, hs) == (wn, hn) == (w, h)
        # IDCT implementations are spec-equivalent but not ulp-identical:
        # dims/channels exact, pixel intensities within a small bound
        assert ps.shape == pn.shape
        assert np.abs(ps.astype(np.int16) - pn.astype(np.int16)).max() <= 2


# ---- public defaults are the real kernels (VERDICT r4 item 2) ---------------


def test_public_default_media_features_is_real(ray_session):
    import pyarrow as pa
    import ray

    rows = [
        {
            "doc_id": "d",
            "media_ref": f"img://d/{i}",
            "media_type": "image",
            "payload": multimodal.synthesize_ppm(f"img://d/{i}"),
        }
        for i in range(6)
    ]
    media = ray.data.from_arrow(
        pa.Table.from_pylist(rows, schema=multimodal.MEDIA_SCHEMA)
    )
    got = (
        multimodal.media_features(media, concurrency=1)
        .to_pandas()
        .sort_values("media_ref")
        .reset_index(drop=True)
    )
    want = (
        multimodal.media_features(media, fake=False, concurrency=1)
        .to_pandas()
        .sort_values("media_ref")
        .reset_index(drop=True)
    )
    assert got.equals(want)
    assert got.decode_ok.all()  # real decode, not the ref-hash stub
    # and it is genuinely the real path: widths obey the synth closed form
    import hashlib

    for _, r in got.iterrows():
        d = hashlib.md5(r.media_ref.encode()).digest()
        assert r.width == 4 + d[0] % 32 and r.height == 4 + d[1] % 32


def test_public_default_resize_is_real(ray_session):
    import pyarrow as pa
    import ray

    rows = [
        {
            "doc_id": "d",
            "media_ref": "img://d/0",
            "media_type": "image",
            "payload": multimodal.synthesize_png("img://d/0"),
        }
    ]
    media = ray.data.from_arrow(
        pa.Table.from_pylist(rows, schema=multimodal.MEDIA_SCHEMA)
    )
    got = multimodal.resize_media(media, max_side=8).to_pandas()
    want = multimodal.resize_media(media, max_side=8, fake=False).to_pandas()
    assert got.equals(want)
    assert bool(got.decode_ok.iloc[0]) and len(got.payload.iloc[0]) > 0
