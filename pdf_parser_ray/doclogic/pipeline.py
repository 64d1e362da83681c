"""Single-document pipeline: the correctness oracle and the assembler core.

``run_document`` composes the reference's five pipeline steps (main.py:92-102)
per document over span input:

    spans -> page records -> metadata -> TOC (pages<=60) -> sections
          -> flagship output spans (+ coverage stats)

The Ray pipeline distributes the page-record construction + rendering across
chunk tasks and runs ``assemble_document`` inside the per-doc group; tests
verify the distributed output is span-sequence-equal to ``run_document`` run
single-process — the north-rule invariant.
"""

from __future__ import annotations

from typing import Any

from pdf_parser_ray.doclogic import metadata as md
from pdf_parser_ray.doclogic import render, sections, toc

TOC_MAX_PAGE = 60  # TOC search window (main.py:194-202)


def page_row_from_record(page: dict[str, Any]) -> dict[str, Any]:
    """Lightweight, Arrow-safe per-page row used between pipeline stages.

    All strings are rendered here, before any block boundary; the nested page
    record never crosses stages.
    """
    return {
        "page": page["page"],
        "text": page.get("text", "") or "",
        "rendered": render.comprehensive_page_content(page),
        "nontext_spans": render.page_nontext_output_spans(page),
        "n_tables": len(page.get("tables", [])),
        "n_images": len(page.get("images", [])),
        "n_annotations": len(page.get("metadata", {}).get("annotations", [])),
        "n_layout_lines": len(page.get("layout", {}).get("text_lines", [])),
        "coverage_score": page.get("coverage_stats", {}).get("coverage_score", 0.0),
    }


def assemble_document(
    doc_id: str,
    page_rows: list[dict[str, Any]],
    strip_boilerplate: bool = True,
) -> dict[str, Any]:
    """Doc-level assembly over per-page rows (sorted here by page).

    Runs metadata -> TOC -> sections -> output spans and computes the
    document coverage stats (validation step equivalent).
    """
    page_rows = sorted(page_rows, key=lambda r: r["page"])

    doc_metadata = md.parse_metadata(page_rows)
    # doc_title flows from metadata even when 'Unknown' (main.py:204-210
    # falls back only when the metadata step itself failed).
    doc_title = doc_metadata.get("doc_title", toc.FALLBACK_DOC_TITLE)

    toc_pages = [r for r in page_rows if r.get("page", 0) <= TOC_MAX_PAGE]
    toc_entries = toc.parse_toc(toc_pages, doc_title)

    # the reference never passes the metadata title into the section stage
    # (main.py:54-58 constructs SectionParser with its fixed default); the
    # metadata title reaches sections only through each TOC entry
    section_records = sections.parse_sections(
        page_rows, toc_entries, sections.DEFAULT_SECTION_DOC_TITLE
    )

    out_spans = render.assemble_output_spans(page_rows, strip_boilerplate)

    return {
        "doc_id": doc_id,
        "metadata": doc_metadata,
        "toc": toc_entries,
        "sections": section_records,
        "spans": out_spans,
        "stats": document_stats(doc_id, page_rows, toc_entries, section_records, out_spans),
    }


def document_stats(
    doc_id: str,
    page_rows: list[dict[str, Any]],
    toc_entries: list[dict[str, Any]],
    section_records: list[dict[str, Any]],
    out_spans: list[dict[str, Any]],
) -> dict[str, Any]:
    """Per-document coverage/count metrics (validation_report.py:109-177,
    coverage_calculator.py:34-138) — the per-partition lineage counters the
    north rule requires roll these up."""
    total_pages = len(page_rows)
    pages_with_text = sum(1 for r in page_rows if (r.get("text", "") or "").strip())
    valid_toc = sections.validate_toc_entries(toc_entries)
    covered = sections.calculate_page_coverage(valid_toc, total_pages)
    return {
        "doc_id": doc_id,
        "total_pages": total_pages,
        "pages_with_text": pages_with_text,
        # per-content-type page indicators (coverage_calculator.py:59-81)
        "pages_with_tables": sum(1 for r in page_rows if r.get("n_tables", 0) > 0),
        "pages_with_images": sum(1 for r in page_rows if r.get("n_images", 0) > 0),
        "pages_with_annotations": sum(
            1 for r in page_rows if r.get("n_annotations", 0) > 0
        ),
        "pages_with_layout": sum(
            1 for r in page_rows if r.get("n_layout_lines", 0) > 0
        ),
        "toc_entries": len(toc_entries),
        "sections": len(section_records),
        "spans_out": len(out_spans),
        "toc_covered_pages": len(covered),
        "page_coverage_pct": _safe_pct(pages_with_text, total_pages),
        "toc_coverage_pct": _safe_pct(len(covered), total_pages),
    }


def _safe_pct(numerator: int, denominator: int) -> float:
    """round((n/d)*100, 2), 0.0 on zero denominator
    (coverage_calculator.py:216-222)."""
    if denominator == 0:
        return 0.0
    return round(numerator / denominator * 100, 2)


def run_document(
    doc_id: str,
    spans: list[dict[str, Any]],
    strip_boilerplate: bool = True,
) -> dict[str, Any]:
    """Single-process oracle: full per-document pipeline from raw spans."""
    pages = render.spans_to_pages(spans)
    page_rows = [page_row_from_record(p) for p in pages]
    return assemble_document(doc_id, page_rows, strip_boilerplate)
