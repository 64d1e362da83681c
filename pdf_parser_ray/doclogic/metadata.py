"""Document-metadata extraction (reference: parsers/metadata_parser.py).

Four regex fields over the concatenated text of the first five pages.
Per-document-local: the Ray pipeline computes it inside the per-doc group
(filter page <= 5 -> join text in page order -> regex), no re-read of the
source as the reference does (metadata_parser.py:100-111).
"""

from __future__ import annotations

from typing import Any

from pdf_parser_ray.doclogic import textproc

# Field -> pattern (metadata_parser.py:82-94). Patterns are applied
# case-insensitively with first-match .group(1).strip() semantics.
METADATA_PATTERNS: dict[str, str] = {
    "doc_title": r"(Universal Serial Bus.*Power Delivery Specification)",
    "revision": r"(?:Revision|Rev\.?)[: ]+\s*([0-9.]+)",
    "version": r"(?:Version|V)\s*[:]?\s*([0-9.]+)",
    "release_date": r"(?:Release Date|Published:?)\s*[:]?\s*([0-9]{4}(?:-[0-9]{1,2})?)",
}

DEFAULT_VALUE = "Unknown"
METADATA_START_PAGE = 1
METADATA_END_PAGE = 5


def combine_page_text(pages: list[dict[str, Any]]) -> str:
    """Newline-join of page texts in given order (metadata_parser.py:113-115)."""
    return "\n".join(page.get("text", "") for page in pages)


def parse_metadata(pages: list[dict[str, Any]]) -> dict[str, str]:
    """Extract the four metadata fields from the first-5-pages text.

    ``pages`` is the full page-record list in page order; the 1..5 window cut
    happens here (metadata_parser.py:96-111).
    """
    window = [
        p
        for p in pages
        if METADATA_START_PAGE <= p.get("page", 0) <= METADATA_END_PAGE
    ]
    text = combine_page_text(window)
    return {
        field: textproc.extract_field_with_regex(pattern, text, DEFAULT_VALUE)
        for field, pattern in METADATA_PATTERNS.items()
    }
