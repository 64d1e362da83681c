"""Section assembly (reference: parsers/section_parser.py + section/ pkg).

Three per-document section streams, concatenated then stably sorted by
(page, section_id or ""):

1. TOC sections      — one per valid TOC entry; content = the comprehensive
   render of pages [entry.page, next_entry.page - 1] (section_parser.py:134-172,
   page_manager.py:53-67).
2. page sections     — pages not covered by any TOC range
   (section_parser.py:174-214, toc_processor.py:37-75).
3. content sections  — pages with no section yet and > 100 chars of raw text:
   natural heading-split sections, else one "intelligent" section
   (section_parser.py:237-369).

All joins here (TOC lead/lag J1, TOC x pages range join J2, uncovered-page
anti-joins J3/J4) are per-document-local: the Ray pipeline runs this inside
the per-doc group after the groupby(doc_id) shuffle, so no secondary shuffle
is needed.

``page_rows`` is the lightweight per-page row: {page, text, rendered} with
``rendered`` the pre-computed comprehensive content string (rendered before
any Arrow boundary). total_pages follows the reference's PageManager, which
counts records rather than taking the max page number (page_manager.py:20-27).
"""

from __future__ import annotations

import re
from typing import Any, Optional

from pdf_parser_ray.doclogic.headings import detect_heading
from pdf_parser_ray.doclogic.render import comprehensive_content_range

_NUMBERED_LINE_RE = re.compile(r"^\d+(\.\d+)*\s+")
_LETTERED_LINE_RE = re.compile(r"^[A-Z](\.\d+)*\s+")

# SectionParser's constructor default (section_parser.py:37): the reference's
# main pipeline never passes the metadata title to the section stage, so
# page/content sections and the TOC-entry fallback always use this fixed
# title — the metadata-derived title reaches sections only via each TOC
# entry's own doc_title field.
DEFAULT_SECTION_DOC_TITLE = "USB Power Delivery Specification"

SECTION_FIELDS = (
    "doc_title",
    "section_id",
    "title",
    "full_path",
    "page",
    "level",
    "parent_id",
    "content",
    "tags",
)


def validate_toc_entries(toc_entries: list[dict[str, Any]]) -> list[dict[str, Any]]:
    """Keep entries with positive int pages, stably sorted by page
    (toc_processor.py:28-35)."""
    valid = [
        e for e in toc_entries if isinstance(e.get("page"), int) and e["page"] > 0
    ]
    return sorted(valid, key=lambda x: x.get("page", 0))


def calculate_page_coverage(
    sorted_entries: list[dict[str, Any]], total_pages: int
) -> set[int]:
    """Union of per-entry page ranges; entry i covers
    [page_i, max(page_{i+1} - 1, page_i)], last entry to total_pages
    (toc_processor.py:37-75)."""
    covered: set[int] = set()
    for i, entry in enumerate(sorted_entries):
        start = int(entry["page"])
        if i + 1 < len(sorted_entries):
            end = int(sorted_entries[i + 1]["page"]) - 1
        else:
            end = total_pages
        covered.update(range(start, max(end, start) + 1))
    return covered


def _analyze_content(content: str) -> dict[str, Any]:
    """Indicator flags over rendered content (section_builder.py:88-99)."""
    return {
        "has_tables": "TABLES" in content or "|" in content,
        "has_images": "IMAGES" in content or "Image" in content,
        "has_annotations": "ANNOTATIONS" in content,
        "has_layout_text": "LAYOUT TEXT" in content,
        "content_length": len(content),
    }


def _content_tags(content: str) -> list[str]:
    """'enhanced_extraction' + contains_* + size tier
    (section_builder.py:101-125)."""
    analysis = _analyze_content(content)
    tags = ["enhanced_extraction"]
    if analysis["has_tables"]:
        tags.append("contains_tables")
    if analysis["has_images"]:
        tags.append("contains_images")
    if analysis["has_annotations"]:
        tags.append("contains_annotations")
    if analysis["has_layout_text"]:
        tags.append("has_layout_info")
    length = analysis["content_length"]
    if length > 5000:
        tags.append("large_content")
    elif length > 1000:
        tags.append("medium_content")
    else:
        tags.append("small_content")
    return tags


def build_from_toc_entry(
    entry: dict[str, Any], content: str, default_doc_title: str
) -> dict[str, Any]:
    """Section record from a TOC entry (section_builder.py:33-55, 127-146).

    level/parent/full_path are recomputed from section_id (not taken from the
    entry), with section_id coerced to '' when falsy."""
    section_id = entry.get("section_id", "") or ""
    level = len(section_id.split(".")) if section_id else 1
    parent_id = (
        ".".join(section_id.split(".")[:-1])
        if section_id and "." in section_id
        else None
    )
    title = entry.get("title", "") or ""
    return {
        "doc_title": entry.get("doc_title") or default_doc_title,
        "section_id": section_id,
        "title": title,
        "full_path": f"{section_id} {title}".strip(),
        "page": int(entry.get("page", 0)),
        "level": level,
        "parent_id": parent_id,
        "content": content if content is not None else "",
        "tags": entry.get("tags", []) or [],
    }


def build_page_section(
    doc_title: str, page_number: int, content: str, heading: Optional[str] = None
) -> dict[str, Any]:
    """'Page-N' section with content-derived tags
    (section_builder.py:57-86)."""
    title = heading or f"Enhanced Page {page_number}"
    safe_content = content if content is not None else ""
    return {
        "doc_title": doc_title,
        "section_id": f"Page-{page_number}",
        "title": title,
        "full_path": f"Page-{page_number} {title}",
        "page": page_number,
        "level": 1,
        "parent_id": None,
        "content": safe_content,
        "tags": _content_tags(safe_content),
    }


def looks_like_heading(line: str) -> bool:
    """Natural-section heading test (section_parser.py:371-392): numbered,
    lettered, short ALL-CAPS, or short colon-terminated lines."""
    if not line or len(line) > 100:
        return False
    if _NUMBERED_LINE_RE.match(line):
        return True
    if _LETTERED_LINE_RE.match(line):
        return True
    if line.isupper() and len(line.split()) <= 6:
        return True
    if line.endswith(":") and len(line.split()) <= 8:
        return True
    return False


def detect_enhanced_heading(content: str, page_num: int) -> Optional[str]:
    """Strategy detector over the first 10 lines, shape fallback over the
    first 5, last resort 'Content from Page N' (section_parser.py:395-426)."""
    if not content:
        return f"Content from Page {page_num}"
    lines = content.split("\n")
    for line in lines[:10]:
        if line is not None:
            heading = detect_heading(line)
            if heading:
                return heading
    for line in lines[:5]:
        if line is not None:
            line = line.strip()
            if line and len(line) < 100:
                if (
                    line.isupper()
                    or any(c.isdigit() for c in line[:10])
                    or line.count(" ") <= 8
                ):
                    return line
    return f"Content from Page {page_num}"


def _natural_sections(
    doc_title: str, page_num: int, text: str
) -> list[dict[str, Any]]:
    """Heading-delimited sections from raw page text; a section is emitted
    when its accumulated content exceeds 100 chars (section_parser.py:318-369)."""
    sections: list[dict[str, Any]] = []
    current: list[str] = []
    heading: Optional[str] = None
    for line in text.split("\n"):
        line = line.strip()
        if not line:
            continue
        if looks_like_heading(line):
            if current and heading:
                content = "\n".join(current)
                if len(content.strip()) > 100:
                    sections.append(
                        build_page_section(doc_title, page_num, content, heading)
                    )
            heading = line
            current = []
        else:
            current.append(line)
    if current and heading:
        content = "\n".join(current)
        if len(content.strip()) > 100:
            sections.append(build_page_section(doc_title, page_num, content, heading))
    return sections


def _intelligent_section(
    doc_title: str, page_num: int, text: str
) -> dict[str, Any]:
    """Single best-paragraph section for a page without natural structure
    (section_parser.py:273-316)."""
    paragraphs = [p.strip() for p in text.split("\n\n") if len(p.strip()) > 50]
    if paragraphs:
        main_content = max(paragraphs, key=len)
        if len(main_content) < 200 and len(text.strip()) > len(main_content):
            main_content = text.strip()[:1000]
    else:
        main_content = text.strip()[:1000]

    heading = detect_enhanced_heading(main_content, page_num)
    if not heading or len(heading) < 5:
        lower = text.lower()
        if any(k in lower for k in ("usb", "power", "delivery", "voltage", "current", "protocol")):
            heading = f"USB Power Delivery Content - Page {page_num}"
        elif any(k in lower for k in ("specification", "requirement", "standard")):
            heading = f"Technical Specification - Page {page_num}"
        else:
            heading = f"Document Content - Page {page_num}"
    return build_page_section(doc_title, page_num, main_content, heading)


def parse_sections(
    page_rows: list[dict[str, Any]],
    toc_entries: list[dict[str, Any]],
    doc_title: str,
) -> list[dict[str, Any]]:
    """Full per-document section workflow (section_parser.py:109-223).

    ``page_rows``: [{page, text, rendered}] in document order.
    Returns section dicts sorted by (page, section_id or '').
    """
    total_pages = len(page_rows)
    rendered_by_page = {r["page"]: r.get("rendered", "") or "" for r in page_rows}
    valid_toc = validate_toc_entries(toc_entries)

    # stream 1: TOC sections with lead()-style content ranges
    toc_sections: list[dict[str, Any]] = []
    for i, entry in enumerate(valid_toc):
        start_page = int(entry["page"])
        end_page = (
            int(valid_toc[i + 1]["page"]) - 1
            if i + 1 < len(valid_toc)
            else total_pages
        )
        content = comprehensive_content_range(
            rendered_by_page, total_pages, start_page, end_page
        )
        toc_sections.append(build_from_toc_entry(entry, content, doc_title))

    # stream 2: uncovered pages (anti-join vs TOC coverage set)
    covered = calculate_page_coverage(valid_toc, total_pages)
    page_sections: list[dict[str, Any]] = []
    for page_num in range(1, total_pages + 1):
        if page_num not in covered:
            content = rendered_by_page.get(page_num, "")
            if content and content.strip():
                heading = detect_enhanced_heading(content, page_num)
                page_sections.append(
                    build_page_section(doc_title, page_num, content, heading)
                )

    # stream 3: content-based sections for pages with no section yet
    existing_pages = {s["page"] for s in toc_sections + page_sections}
    content_sections: list[dict[str, Any]] = []
    for row in page_rows:
        page_num = row.get("page", 0)
        if page_num > 0 and page_num not in existing_pages:
            text = row.get("text", "") or ""
            if len(text.strip()) > 100:
                natural = _natural_sections(doc_title, page_num, text)
                if natural:
                    content_sections.extend(natural)
                else:
                    content_sections.append(
                        _intelligent_section(doc_title, page_num, text)
                    )

    all_sections = toc_sections + page_sections + content_sections
    all_sections.sort(key=lambda s: (s["page"], s["section_id"] or ""))
    return all_sections
