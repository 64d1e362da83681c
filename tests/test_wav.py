"""WAV codec (functions/wav.py): round trips, chunk-walk edges, and the
audio decoder stage. Pure numpy/stdlib — no Ray needed."""

import struct

import numpy as np
import pytest

from pdf_parser_ray.functions.wav import decode_wav, encode_wav


def test_pcm16_roundtrip_mono_and_stereo():
    rng = np.random.RandomState(3)
    for ch in (1, 2):
        vals = rng.randint(-32768, 32767, size=777 * ch).astype(np.int16)
        n, c, rate, out = decode_wav(encode_wav(vals, 44100, channels=ch))
        assert (n, c, rate) == (777, ch, 44100)
        assert np.array_equal(out, vals)


def test_unknown_chunks_and_odd_size_padding_are_skipped():
    vals = np.arange(10, dtype=np.int16)
    data = encode_wav(vals, 8000)
    # splice an odd-sized junk chunk (requires the pad-byte walk) between
    # the WAVE id and fmt
    junk = b"JUNK" + struct.pack("<I", 3) + b"abc" + b"\x00"
    patched = data[:12] + junk + data[12:]
    patched = patched[:4] + struct.pack("<I", len(patched) - 8) + patched[8:]
    n, c, rate, out = decode_wav(patched)
    assert (n, c, rate) == (10, 1, 8000)
    assert np.array_equal(out, vals)


def test_8bit_wav_bias():
    # 8-bit WAV stores unsigned with a 128 bias
    fmt = struct.pack("<HHIIHH", 1, 1, 8000, 8000, 1, 8)
    pcm = bytes([0, 128, 255, 200])
    body = (
        b"WAVE" + b"fmt " + struct.pack("<I", 16) + fmt
        + b"data" + struct.pack("<I", 4) + pcm
    )
    payload = b"RIFF" + struct.pack("<I", len(body)) + body
    n, c, rate, out = decode_wav(payload)
    assert n == 4
    assert out.tolist() == [-128, 0, 127, 72]


def test_rejections_degrade_in_stage():
    from pdf_parser_ray.ops import multimodal as mm

    vals = np.arange(8, dtype=np.int16)
    good = encode_wav(vals, 8000)
    # IEEE-float format tag (3) must raise in the codec
    bad_fmt = bytearray(good)
    bad_fmt[20] = 3
    with pytest.raises(ValueError):
        decode_wav(bytes(bad_fmt))
    with pytest.raises(ValueError):
        decode_wav(b"RIFFxxxxNOPE")
    with pytest.raises(ValueError):
        decode_wav(good, max_samples=4)
    dec = mm.AudioDecoder()
    assert not dec._decode(b"\xff\xd8junk")["decode_ok"]
    ok = dec._decode(good)
    assert ok["decode_ok"] and ok["n_samples"] == 8 and ok["duration_ms"] == 1


def test_synthesized_wav_matches_closed_form():
    import hashlib

    from pdf_parser_ray.ops import multimodal as mm

    ref = "img://9/p4/0"
    d = hashlib.md5(ref.encode()).digest()
    out = mm.AudioDecoder()._decode(mm.synthesize_wav(ref))
    assert out["decode_ok"]
    assert out["n_samples"] == 500 + d[0] * 37 + d[1]
    assert out["channels"] == 1 + d[2] % 2
    assert out["sample_rate"] == 8000
    assert out["duration_ms"] == out["n_samples"] * 1000 // 8000
    assert out["rms"] > 0.0
