"""Stage 1: corpus rows -> rendered per-page rows (``map_batches``).

A callable class (actor-pool stage): the warm state is the compiled regex
banks, which Python caches at module import per worker process — the actor
form also gives a stable place for per-actor metrics and mirrors the
reference's warm-parser state (SURVEY.md §2.3 ST1). Per-page output rows are
the unit the groupby(doc_id) shuffle moves, so giant documents (one corpus
row) fan out into many small rows here — the skew tamer for multi-hundred
page docs.

All rendered strings are finalized HERE, before the Arrow block boundary
(see doclogic.render module docstring).
"""

from __future__ import annotations

from typing import Any

import pyarrow as pa

from pdf_parser_ray.doclogic import render
from pdf_parser_ray.doclogic.pipeline import page_row_from_record
from pdf_parser_ray.schemas import PAGE_ROW_SCHEMA
from pdf_parser_ray.synthgen import _stable_hash


def bucket_of(doc_id: str, n_buckets: int) -> int:
    """Deterministic, process-independent partition assignment."""
    return _stable_hash(doc_id) % n_buckets


def _empty_doc_row(doc_id: str, bucket: int, failure: bool) -> dict[str, Any]:
    # marker page is -1: a real page number can never be negative (page_break
    # texts parse via isdecimal), so empty/failed-doc markers can't collide
    # with genuine page-0 content
    return {
        "doc_id": doc_id,
        "bucket": bucket,
        "page": -1,
        "page_order": 0,
        "text": "",
        "rendered": "",
        "nontext_spans": [],
        "n_tables": 0,
        "n_images": 0,
        "n_annotations": 0,
        "n_layout_lines": 0,
        "coverage_score": 0.0,
        "parse_failure": failure,
    }


def render_pages(batch: pa.Table, n_buckets: int = 64) -> pa.Table:
    """corpus (doc_id, spans) batch -> page rows batch.

    Stateless (the warm regex banks live at module level, paid once per
    worker process), so it runs as elastic tasks — no actor-pool ramp-up,
    parallelism follows the block count. Semantic parse failures (malformed
    span payloads) become a single ``parse_failure`` row for the document —
    counted in partition metrics, never a task crash (the reference degrades
    per page the same way, extractor.py:141-148).
    """
    out_rows: list[dict[str, Any]] = []
    doc_ids = batch["doc_id"].to_pylist()
    spans_col = batch["spans"].to_pylist()
    for doc_id, spans in zip(doc_ids, spans_col):
        doc_id = str(doc_id)
        bucket = bucket_of(doc_id, n_buckets)
        try:
            pages = render.spans_to_pages(spans or [])
            for order, page in enumerate(pages):
                row = page_row_from_record(page)
                row["doc_id"] = doc_id
                row["bucket"] = bucket
                row["page_order"] = order
                row["parse_failure"] = False
                out_rows.append(row)
            if not pages:
                out_rows.append(_empty_doc_row(doc_id, bucket, failure=False))
        except Exception:
            out_rows.append(_empty_doc_row(doc_id, bucket, failure=True))
    return pa.Table.from_pylist(out_rows, schema=PAGE_ROW_SCHEMA)


class PageRenderer:
    """Actor-pool form of :func:`render_pages` — use when a deployment
    wants fixed warm workers (e.g. models in ``__init__``); the default
    pipeline uses the task form."""

    def __init__(self, n_buckets: int = 64):
        self.n_buckets = n_buckets

    def __call__(self, batch: pa.Table) -> pa.Table:
        return render_pages(batch, self.n_buckets)
