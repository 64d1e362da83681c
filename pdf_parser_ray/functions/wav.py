"""Pure-stdlib WAV (RIFF PCM) codec — the audio member of the multimodal
decode family (functions/png.py, functions/jpeg.py are the image members).

Decode supports the interchange baseline: RIFF/WAVE containers with a
PCM ``fmt `` chunk (format tag 1), 8- or 16-bit samples, any channel
count, unknown chunks skipped (the spec's chunk-walk rule, including the
odd-size pad byte). Compressed formats (IEEE float, ADPCM, extensible)
raise ``ValueError`` — callers degrade to ``decode_ok=False``, the
png/jpeg convention. The encoder writes canonical PCM16 files and exists
so the synthetic media corpus can drive the real decode path.

Everything here is the public RIFF/WAVE layout (Microsoft/IBM 1991
multimedia spec): little-endian chunks, ``fmt `` fields
(tag, channels, rate, byte rate, block align, bits), ``data`` payload.
"""

from __future__ import annotations

import struct

import numpy as np


def encode_wav(
    samples: np.ndarray, sample_rate: int = 8000, channels: int = 1
) -> bytes:
    """Canonical PCM16 WAV bytes from an int16 sample array (flat,
    channel-interleaved when ``channels`` > 1)."""
    pcm = np.asarray(samples, dtype="<i2").tobytes()
    block_align = channels * 2
    fmt = struct.pack(
        "<HHIIHH", 1, channels, sample_rate, sample_rate * block_align,
        block_align, 16,
    )
    body = (
        b"WAVE"
        + b"fmt " + struct.pack("<I", len(fmt)) + fmt
        + b"data" + struct.pack("<I", len(pcm)) + pcm
    )
    return b"RIFF" + struct.pack("<I", len(body)) + body


def decode_wav(
    payload: bytes, max_samples: int = 64_000_000
) -> tuple[int, int, int, np.ndarray]:
    """(n_samples_per_channel, channels, sample_rate, flat int16 samples)
    from a PCM WAV. Raises ValueError on anything malformed or outside
    the PCM baseline."""
    if len(payload) < 12 or payload[:4] != b"RIFF" or payload[8:12] != b"WAVE":
        raise ValueError("not a RIFF/WAVE stream")
    pos = 12
    fmt = None
    data = None
    while pos + 8 <= len(payload):
        ctype = payload[pos : pos + 4]
        size = struct.unpack_from("<I", payload, pos + 4)[0]
        chunk = payload[pos + 8 : pos + 8 + size]
        if len(chunk) < size:
            raise ValueError("truncated chunk")
        if ctype == b"fmt ":
            if size < 16:
                raise ValueError("short fmt chunk")
            fmt = struct.unpack_from("<HHIIHH", chunk, 0)
        elif ctype == b"data":
            data = chunk
        pos += 8 + size + (size & 1)  # chunks pad to even offsets
    if fmt is None or data is None:
        raise ValueError("missing fmt or data chunk")
    tag, channels, rate, _byte_rate, _block_align, bits = fmt
    if tag != 1:
        raise ValueError(f"non-PCM format tag {tag}")
    if bits not in (8, 16):
        raise ValueError(f"unsupported bit depth {bits}")
    if channels <= 0 or rate <= 0:
        raise ValueError("bad channel count or rate")
    width = bits // 8
    n_frames = len(data) // (width * channels)
    if n_frames * channels > max_samples:
        raise ValueError("sample count over caller's cap")
    usable = n_frames * channels * width
    if bits == 16:
        samples = np.frombuffer(data, dtype="<i2", count=usable // 2)
    else:
        # 8-bit WAV is unsigned with a 128 bias (the spec's one asymmetry)
        samples = (
            np.frombuffer(data, dtype=np.uint8, count=usable).astype(np.int16)
            - 128
        )
    return n_frames, channels, rate, samples
