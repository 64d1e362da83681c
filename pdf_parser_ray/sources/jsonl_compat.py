"""Reference-compatible JSONL outputs.

A user of the reference gets four files per run (main.py:39-45):
``usb_pd_pages.jsonl``, ``usb_pd_metadata.jsonl``, ``usb_pd_toc.jsonl``,
``usb_pd_spec.jsonl``. This module renders the same logical tables from the
Ray extraction output as JSONL directories (Ray's ``write_json`` writes one
line per row, ``ensure_ascii=False``-equivalent UTF-8), and provides the
reference's tolerant JSONL reader semantics (utils/helpers.py:67-101) as a
Ray read for ingesting legacy stage files.
"""

from __future__ import annotations

import json
from typing import Any, Iterator

import pyarrow as pa
import ray.data

from pdf_parser_ray.pipelines.extract import (
    metadata_table,
    sections_table,
    toc_table,
)

MAX_LINE_CHARS = 1_000_000  # oversize-line guard (helpers.py:82-87)


def write_reference_outputs(
    doc_results: ray.data.Dataset, out_dir: str, materialize: bool = False
) -> dict[str, str]:
    """Write toc/spec/metadata JSONL dirs from one extraction result.

    The caller should pass a re-read of a written extraction; deriving all
    three sinks from a live pipeline would re-execute it per sink. When a
    re-read isn't available, pass ``materialize=True`` to pin the
    extraction in the object store once instead — the convenience that
    removes the triple-execution foot-gun for ad-hoc callers.
    """
    if materialize:
        doc_results = doc_results.materialize()
    paths = {}
    for name, table in (
        ("toc", toc_table(doc_results)),
        ("spec", sections_table(doc_results)),
        ("metadata", metadata_table(doc_results)),
    ):
        path = f"{out_dir}/{name}"
        table.write_json(path)
        paths[name] = path
    return paths


def read_jsonl_tolerant(path: str) -> ray.data.Dataset:
    """Reference JSONL-reader semantics as a Ray pipeline: skip blank lines,
    skip lines longer than 1e6 chars, recover per line on parse errors
    (helpers.py:67-101) — expressed as read_text + a validity filter.
    ``.gz`` paths stream through Arrow's gzip decompressor (web-corpus
    JSONL ships compressed; the per-line tolerance is identical)."""

    def parse(batch: pa.Table) -> pa.Table:
        rows: list[dict[str, Any]] = []
        for line in batch["text"].to_pylist():
            if not line or not line.strip():
                continue
            if len(line) > MAX_LINE_CHARS:
                continue
            try:
                rows.append({"record": json.dumps(json.loads(line), sort_keys=True)})
            except json.JSONDecodeError:
                continue
        return pa.Table.from_pylist(rows, schema=pa.schema([("record", pa.string())]))

    read_kwargs = (
        {"arrow_open_stream_args": {"compression": "gzip"}}
        if str(path).endswith(".gz")
        else {}
    )
    return ray.data.read_text(path, **read_kwargs).map_batches(
        parse, batch_format="pyarrow"
    )


def iter_reference_records(path: str) -> Iterator[dict[str, Any]]:
    """Driver-side generator equivalent (for small legacy files)."""
    with open(path, encoding="utf-8") as f:
        for line in f:
            if not line.strip() or len(line) > MAX_LINE_CHARS:
                continue
            try:
                yield json.loads(line)
            except json.JSONDecodeError:
                continue
