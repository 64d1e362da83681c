"""ISO-BMFF probe (functions/mp4.py): skeleton round trips, box-walk
edges (largesize, size-0, unknown boxes, version-1 headers), and the
prober stage. Pure stdlib — no Ray needed."""

import struct

import pytest

from pdf_parser_ray.functions.mp4 import probe_mp4, write_mp4_skeleton


def test_skeleton_roundtrip():
    data = write_mp4_skeleton(duration_ms=4321, width=640, height=360)
    meta = probe_mp4(data)
    assert meta == {
        "duration_ms": 4321,
        "n_tracks": 1,
        "width": 640,
        "height": 360,
    }


def test_unknown_boxes_skipped_and_free_space():
    data = write_mp4_skeleton(duration_ms=100, width=32, height=16)
    free = struct.pack(">I", 16) + b"free" + b"\x00" * 8
    # junk before AND after moov must not confuse the walk
    ftyp_len = struct.unpack_from(">I", data, 0)[0]
    patched = data[:ftyp_len] + free + data[ftyp_len:] + free
    assert probe_mp4(patched)["duration_ms"] == 100


def test_largesize_and_size_zero_boxes():
    data = write_mp4_skeleton(duration_ms=250, width=48, height=48)
    ftyp_len = struct.unpack_from(">I", data, 0)[0]
    moov = data[ftyp_len:]
    moov_len = struct.unpack_from(">I", moov, 0)[0]
    # rewrite moov as a largesize box (size=1 + 64-bit size)
    large = (
        struct.pack(">I", 1)
        + moov[4:8]
        + struct.pack(">Q", moov_len + 8)
        + moov[8:]
    )
    assert probe_mp4(data[:ftyp_len] + large)["duration_ms"] == 250
    # size-0 final box (runs to end of payload)
    zero = struct.pack(">I", 0) + moov[4:]
    assert probe_mp4(data[:ftyp_len] + zero)["duration_ms"] == 250


def test_version1_mvhd_parsed():
    data = bytearray(write_mp4_skeleton(duration_ms=777, width=16, height=16))
    # locate mvhd and rebuild as version 1 (64-bit times)
    i = bytes(data).find(b"mvhd")
    body = i + 4
    timescale, duration = struct.unpack_from(">II", data, body + 12)
    v1_body = (
        struct.pack(">BBBB", 1, 0, 0, 0)
        + struct.pack(">QQ", 0, 0)
        + struct.pack(">IQ", timescale, duration)
        + bytes(data[body + 20 : body + 100])
    )
    old_size = struct.unpack_from(">I", data, i - 4)[0]
    v1 = struct.pack(">I", 8 + len(v1_body)) + b"mvhd" + v1_body
    patched = bytes(data[: i - 4]) + v1 + bytes(data[i - 4 + old_size :])
    # fix the enclosing moov size
    j = patched.find(b"moov")
    new_moov_size = struct.unpack_from(">I", patched, j - 4)[0] + len(v1) - old_size
    patched = (
        patched[: j - 4] + struct.pack(">I", new_moov_size) + patched[j:]
    )
    assert probe_mp4(patched)["duration_ms"] == 777


def test_rejections_degrade_in_stage():
    import pyarrow as pa

    from pdf_parser_ray.ops import multimodal as mm

    with pytest.raises(ValueError):
        probe_mp4(b"not a bmff stream at all")
    with pytest.raises(ValueError):  # truncated box claim
        probe_mp4(struct.pack(">I", 999) + b"ftyp" + b"isom")
    batch = pa.Table.from_pylist(
        [
            {"doc_id": "d", "media_ref": "r", "media_type": "video",
             "payload": b"junk"},
            {"doc_id": "d", "media_ref": "r2", "media_type": "video",
             "payload": mm.synthesize_mp4("r2")},
        ],
        schema=mm.MEDIA_SCHEMA,
    )
    out = mm.VideoProber()(batch).to_pylist()
    assert not out[0]["decode_ok"]
    assert out[1]["decode_ok"] and out[1]["n_tracks"] == 1


def test_synthesized_mp4_matches_closed_form():
    import hashlib

    from pdf_parser_ray.ops import multimodal as mm

    ref = "img://11/p6/0"
    d = hashlib.md5(ref.encode()).digest()
    meta = probe_mp4(mm.synthesize_mp4(ref))
    assert meta["duration_ms"] == 1000 + d[0] * 97 + d[1]
    assert meta["width"] == 16 * (1 + d[2] % 64)
    assert meta["height"] == 16 * (1 + d[3] % 64)
