"""Shared deterministic 64-bit content hashing.

One definition for every operator that buckets or samples by md5: the top
8 digest bytes big-endian, shifted into the non-negative int64 range. The
SQL-oracle equivalent is ``('0x'||substr(md5(x),1,16))::UBIGINT >> 1`` —
keep the two in lockstep (tests/test_ops.py pins the Python side; the
driver gate pins the SQL side through every hash-bucketed oracle).
"""

from __future__ import annotations

import hashlib


def md5_64(s: str) -> int:
    """Non-negative int64 from md5(s): digest[:8] big-endian >> 1."""
    return int.from_bytes(hashlib.md5(s.encode()).digest()[:8], "big") >> 1


def md5_bucket(s: str, n_buckets: int) -> int:
    """Stable bucket id in [0, n_buckets)."""
    return md5_64(s) % n_buckets
