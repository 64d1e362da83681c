"""Arrow block utilities shared across operators."""

from __future__ import annotations

from typing import Callable

import pyarrow as pa


def schema_pin(schema: pa.Schema) -> Callable[[pa.Table], pa.Table]:
    """A ``map_batches`` function pinning every block to ``schema``.

    Ray 2.49 emits SCHEMA-LESS empty blocks in two places — pandas
    ``map_groups`` output, and any map stage fed a zero-row block (the UDF
    is never invoked there) — and such blocks break downstream
    union/join/concat ("no match for key field"). Appending this pin after
    a pandas tail restores one declared Arrow schema: matching blocks are
    selected+cast (column order and types normalized), anything else
    becomes a typed empty block."""

    def pin(batch: pa.Table) -> pa.Table:
        if set(schema.names) <= set(batch.column_names):
            return batch.select(schema.names).cast(schema)
        return pa.Table.from_pylist([], schema=schema)

    return pin
