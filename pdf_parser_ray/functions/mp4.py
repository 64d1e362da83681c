"""Pure-stdlib ISO-BMFF (MP4) metadata probe — the video member of the
multimodal family. No frame decode (that is honestly codec-gated); the
CONTAINER layout is public (ISO/IEC 14496-12) and carries the metadata a
pipeline needs for video columns: duration, track count, and the video
track's pixel dimensions.

Supported: 32-bit and 64-bit box sizes (``size == 1`` -> largesize),
``size == 0`` (box runs to end of payload), version 0 and 1 ``mvhd`` /
``tkhd``, any box order, unknown boxes skipped. Malformed streams raise
``ValueError`` — callers degrade to ``decode_ok=False``, the codec-family
convention.

The writer emits a minimal valid ``ftyp`` + ``moov(mvhd, trak(tkhd))``
skeleton so the synthetic corpus can drive the real box walk.
"""

from __future__ import annotations

import struct


def _walk_boxes(payload: bytes, start: int, end: int):
    """Yield (box_type, body_start, body_end) for each box in a range."""
    pos = start
    while pos + 8 <= end:
        size = struct.unpack_from(">I", payload, pos)[0]
        btype = payload[pos + 4 : pos + 8]
        body = pos + 8
        if size == 1:
            if pos + 16 > end:
                raise ValueError("truncated largesize box")
            size = struct.unpack_from(">Q", payload, pos + 8)[0]
            body = pos + 16
        elif size == 0:
            size = end - pos
        if size < body - pos or pos + size > end:
            raise ValueError("box size out of range")
        yield btype, body, pos + size
        pos += size


def probe_mp4(payload: bytes) -> dict:
    """{'duration_ms', 'n_tracks', 'width', 'height'} from an MP4/ISO-BMFF
    stream. Dimensions come from the first track with nonzero tkhd width
    (the video track; audio tracks carry 0x0). Raises ValueError when the
    stream is not BMFF or the moov/mvhd metadata is missing/truncated."""
    boxes = {t: (s, e) for t, s, e in _walk_boxes(payload, 0, len(payload))}
    if b"ftyp" not in boxes or b"moov" not in boxes:
        raise ValueError("missing ftyp or moov box")
    moov_s, moov_e = boxes[b"moov"]
    duration_ms = None
    n_tracks = 0
    width = height = 0
    for btype, s, e in _walk_boxes(payload, moov_s, moov_e):
        if btype == b"mvhd":
            version = payload[s]
            if version == 1:
                timescale, duration = struct.unpack_from(">IQ", payload, s + 20)
            else:
                timescale, duration = struct.unpack_from(">II", payload, s + 12)
            if timescale == 0:
                raise ValueError("zero mvhd timescale")
            duration_ms = duration * 1000 // timescale
        elif btype == b"trak":
            n_tracks += 1
            for t2, s2, e2 in _walk_boxes(payload, s, e):
                if t2 == b"tkhd":
                    version = payload[s2]
                    # width/height are the LAST 8 bytes of tkhd in both
                    # versions: 16.16 fixed point
                    w_fx, h_fx = struct.unpack_from(">II", payload, e2 - 8)
                    if w_fx and not width:
                        width, height = w_fx >> 16, h_fx >> 16
    if duration_ms is None:
        raise ValueError("missing mvhd")
    return {
        "duration_ms": int(duration_ms),
        "n_tracks": n_tracks,
        "width": int(width),
        "height": int(height),
    }


def _box(btype: bytes, body: bytes) -> bytes:
    return struct.pack(">I", 8 + len(body)) + btype + body


def write_mp4_skeleton(
    duration_ms: int, width: int, height: int, timescale: int = 1000
) -> bytes:
    """Minimal valid BMFF skeleton: ftyp + moov(mvhd, trak(tkhd)) with the
    given movie duration and one video track of the given dimensions.
    (No media data — a metadata-only sidecar, which is exactly what the
    probe reads.)"""
    ftyp = _box(b"ftyp", b"isom" + struct.pack(">I", 512) + b"isomiso2")
    duration = duration_ms * timescale // 1000
    mvhd = _box(
        b"mvhd",
        struct.pack(">BBBB", 0, 0, 0, 0)          # version 0 + flags
        + struct.pack(">II", 0, 0)                # creation, modification
        + struct.pack(">II", timescale, duration)
        + struct.pack(">I", 0x00010000)           # rate 1.0
        + struct.pack(">H", 0x0100)               # volume 1.0
        + b"\x00" * 10                            # reserved
        + struct.pack(">9I", 0x10000, 0, 0, 0, 0x10000, 0, 0, 0, 0x40000000)
        + b"\x00" * 24                            # predefined
        + struct.pack(">I", 2),                   # next track id
    )
    tkhd = _box(
        b"tkhd",
        struct.pack(">BBBB", 0, 0, 0, 7)          # version 0, enabled
        + struct.pack(">II", 0, 0)                # creation, modification
        + struct.pack(">I", 1)                    # track id
        + struct.pack(">I", 0)                    # reserved
        + struct.pack(">I", duration)
        + b"\x00" * 8                             # reserved
        + struct.pack(">HHHH", 0, 0, 0, 0)        # layer/group/volume/rsvd
        + struct.pack(">9I", 0x10000, 0, 0, 0, 0x10000, 0, 0, 0, 0x40000000)
        + struct.pack(">II", width << 16, height << 16),
    )
    moov = _box(b"moov", mvhd + _box(b"trak", tkhd))
    return ftyp + moov
