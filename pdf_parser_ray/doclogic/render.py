"""Span -> page-record construction and content rendering.

The corpus row is ``(doc_id, spans: list<struct<kind, text, media_ref,
offset>>)`` — the interleaved text+media content the reference would have
produced per page (BASELINE.json input_hint). ``page_break`` spans (text =
page number) open each page; the remaining kinds map onto the reference's
page-record fields (parsers/extractor.py:150-180):

    text / heading / toc_line -> page ``text``   (newline-joined, M1)
    table       -> tables[] with text_representation (extractor.py:240-258)
    image       -> images[] (media_ref as name, extractor.py:260-291)
    layout_text -> layout.text_lines (extractor.py:293-337)
    annotation  -> metadata.annotations (extractor.py:339-363)

Rendering rule for cross-stage safety: any value that feeds string rendering
is rendered to its final string *before* crossing an Arrow block boundary, so
type round-trips (int -> float etc.) can never change output bytes.
"""

from __future__ import annotations

from typing import Any, Optional

TEXT_KINDS = ("text", "heading", "toc_line")

PAGE_BREAK_JOINER = "\n\n=== PAGE BREAK ===\n\n"


def spans_to_pages(spans: list[dict[str, Any]]) -> list[dict[str, Any]]:
    """Build ordered page records from a document's span sequence.

    Spans are processed in ``offset`` order. A ``page_break`` span starts a
    new page whose number is ``int(span.text)`` (falls back to sequential).
    Spans before any page_break belong to page 1.
    """
    ordered = sorted(spans, key=lambda s: s.get("offset", 0))
    pages: list[dict[str, Any]] = []
    current: Optional[dict[str, Any]] = None

    def new_page(number: int) -> dict[str, Any]:
        return {
            "page": number,
            "_text_parts": [],
            "_tables": [],
            "_images": [],
            "_layout_lines": [],
            "_annotations": [],
        }

    for span in ordered:
        kind = span.get("kind", "")
        text = span.get("text", "") or ""
        if kind == "page_break":
            # isdecimal, not isdigit: superscript/vulgar digits pass
            # isdigit() but crash int(); numbers beyond int32 would crash
            # the Arrow page-row schema mid-task — both fall back to
            # sequential numbering (shared code, so oracle == distributed)
            number = int(text) if text.isdecimal() else -1
            if not (0 <= number <= 2**31 - 1):
                number = len(pages) + 1 if current is None else current["page"] + 1
                # the sequential fallback itself can overflow right after a
                # page numbered 2^31-1 — cap it (page_order keeps duplicate
                # capped pages deterministic)
                number = min(number, 2**31 - 1)
            if current is not None:
                pages.append(current)
            current = new_page(number)
            continue
        if current is None:
            current = new_page(1)
        if kind in TEXT_KINDS:
            current["_text_parts"].append(text)
        elif kind == "table":
            current["_tables"].append(text)
        elif kind == "image":
            current["_images"].append(span.get("media_ref", "") or "")
        elif kind == "layout_text":
            current["_layout_lines"].extend(
                line for line in text.splitlines() if line.strip()
            )
        elif kind == "annotation":
            current["_annotations"].append(text)
        # unknown kinds are ignored (semantic parse failure is handled upstream)
    if current is not None:
        pages.append(current)

    return [_finalize_page(p) for p in pages]


def _finalize_page(raw: dict[str, Any]) -> dict[str, Any]:
    """Assemble the reference-shaped page record (extractor.py:150-180)."""
    text = "\n".join(raw["_text_parts"])
    tables = []
    for i, rep in enumerate(raw["_tables"]):
        rows = [r for r in rep.split("\n") if r.strip()]
        data = [r.split(" | ") for r in rows]
        tables.append(
            {
                "table_id": i + 1,
                "rows": len(data),
                "cols": len(data[0]) if data else 0,
                "data": data,
                "text_representation": rep,
            }
        )
    images = [
        {
            "image_id": i + 1,
            "bbox": [],
            "width": 0,
            "height": 0,
            "object_type": "image",
            "name": name or f"image_{i + 1}",
        }
        for i, name in enumerate(raw["_images"])
    ]
    text_lines = [
        {"y_position": float(i), "text": line.strip(), "char_count": len(line)}
        for i, line in enumerate(raw["_layout_lines"])
    ]
    annotations = [
        {"type": "Text", "content": content, "bbox": []}
        for content in raw["_annotations"]
    ]
    page = {
        "page": raw["page"],
        "text": text,
        "tables": tables,
        "images": images,
        "layout": {
            "page_width": 612.0,
            "page_height": 792.0,
            "char_count": sum(len(t) for t in raw["_text_parts"]),
            "text_lines": text_lines,
            "visual_elements": {"rectangles": 0, "lines": 0, "curves": 0},
        },
        "metadata": {"rotation": 0, "annotations": annotations},
    }
    page["coverage_stats"] = page_coverage_stats(page)
    return page


def page_coverage_stats(page: dict[str, Any]) -> dict[str, Any]:
    """Indicator-weighted coverage score (extractor.py:365-398):
    text .4, tables .2, images .2, annotations .1, visual elements .1."""
    text = page.get("text", "")
    visual = page.get("layout", {}).get("visual_elements", {})
    stats = {
        "text_length": len(text),
        "has_text": bool(text.strip()),
        "table_count": len(page.get("tables", [])),
        "image_count": len(page.get("images", [])),
        "annotation_count": len(page.get("metadata", {}).get("annotations", [])),
        "visual_elements": visual,
        "coverage_score": 0.0,
    }
    score = 0.0
    if stats["has_text"]:
        score += 0.4
    if stats["table_count"] > 0:
        score += 0.2
    if stats["image_count"] > 0:
        score += 0.2
    if stats["annotation_count"] > 0:
        score += 0.1
    if sum(visual.values()) > 0:
        score += 0.1
    stats["coverage_score"] = min(1.0, score)
    return stats


def table_to_text(table: list[list[str]]) -> str:
    """Rows joined with ' | ', lines with newline (extractor.py:400-413)."""
    if not table:
        return ""
    lines = []
    for row in table:
        if row:
            row_text = " | ".join(str(cell or "") for cell in row)
            if row_text.strip():
                lines.append(row_text)
    return "\n".join(lines)


def comprehensive_page_content(page: dict[str, Any]) -> str:
    """The ordered '=== BLOCK ===' render of one page — the core span render
    whose output ordering defines the flagship span order.

    Reference: parsers/section/page_manager.py:69-148. Block order: TEXT
    CONTENT, TABLES, IMAGES, LAYOUT TEXT, ANNOTATIONS; blocks joined with a
    blank line. Empty-ish blocks are skipped exactly as the reference does
    (note IMAGES is emitted whenever the images list is non-empty).
    """
    if not page:
        return ""
    parts: list[str] = []

    text = page.get("text", "") or ""
    if text and text.strip():
        parts.append(f"=== TEXT CONTENT ===\n{text}")

    tables = page.get("tables", [])
    if tables:
        table_content = "\n".join(
            f"Table {t.get('table_id', i + 1)}:\n{t.get('text_representation', '') or ''}"
            for i, t in enumerate(tables)
            if t.get("text_representation", "") or ""
        )
        if table_content.strip():
            parts.append(f"=== TABLES ===\n{table_content}")

    images = page.get("images", [])
    if images:
        image_content = "\n".join(
            f"Image {img.get('image_id', i + 1)}: {img.get('name', 'unnamed')} "
            f"({img.get('width', 0)}x{img.get('height', 0)})"
            for i, img in enumerate(images)
        )
        parts.append(f"=== IMAGES ===\n{image_content}")

    layout = page.get("layout", {})
    if layout and layout.get("text_lines"):
        layout_content = "\n".join(
            (line.get("text", "") or "")
            for line in layout.get("text_lines", [])
            if (line.get("text", "") or "").strip()
        )
        if layout_content and layout_content.strip():
            parts.append(f"=== LAYOUT TEXT ===\n{layout_content}")

    annotations = page.get("metadata", {}).get("annotations", [])
    if annotations:
        annot_content = "\n".join(
            f"Annotation ({a.get('type', 'unknown')}): {a.get('content', '') or ''}"
            for a in annotations
            if (a.get("content", "") or "").strip()
        )
        if annot_content and annot_content.strip():
            parts.append(f"=== ANNOTATIONS ===\n{annot_content}")

    return "\n\n".join(p for p in parts if p is not None)


def comprehensive_content_range(
    rendered_by_page: dict[int, str], total_pages: int, start_page: int, end_page: int
) -> str:
    """Join pre-rendered page content over an inclusive page range with the
    PAGE BREAK marker (page_manager.py:53-67). Missing pages contribute ''."""
    start = max(1, start_page)
    end = min(total_pages, end_page)
    parts = [rendered_by_page.get(n, "") for n in range(start, end + 1)]
    return PAGE_BREAK_JOINER.join(parts).strip()


def page_nontext_output_spans(page: dict[str, Any]) -> list[dict[str, str]]:
    """Flagship output spans for one page, excluding the text span.

    One span per table / image / annotation plus one joined layout_text span,
    in the comprehensive-render block order (page_manager.py:69-148). The
    text span is prepended at document assembly, where doc-level boilerplate
    stripping applies.
    """
    spans: list[dict[str, str]] = []
    for t in page.get("tables", []):
        rep = t.get("text_representation", "") or ""
        if rep:
            spans.append({"kind": "table", "text": rep, "media_ref": ""})
    for img in page.get("images", []):
        spans.append({"kind": "image", "text": "", "media_ref": img.get("name", "") or ""})
    layout_lines = [
        (line.get("text", "") or "")
        for line in page.get("layout", {}).get("text_lines", [])
        if (line.get("text", "") or "").strip()
    ]
    if layout_lines:
        spans.append({"kind": "layout_text", "text": "\n".join(layout_lines), "media_ref": ""})
    for a in page.get("metadata", {}).get("annotations", []):
        content = a.get("content", "") or ""
        if content.strip():
            spans.append({"kind": "annotation", "text": content, "media_ref": ""})
    return spans


def boilerplate_lines(page_texts: list[str]) -> set[str]:
    """Header/footer candidates: stripped lines of length >= 4 occurring on at
    least ``max(3, n_pages // 2 + 1)`` distinct pages.

    The repeated-line heuristic the north-star calls for; the reference has no
    equivalent (its corpus is a single trusted PDF), so the rule is defined
    here and mirrored exactly in the oracle.
    """
    n_pages = len(page_texts)
    threshold = max(3, n_pages // 2 + 1)
    if n_pages < threshold:
        return set()
    counts: dict[str, int] = {}
    for text in page_texts:
        seen_on_page = set()
        for line in text.splitlines():
            key = line.strip()
            if len(key) >= 4 and key not in seen_on_page:
                seen_on_page.add(key)
                counts[key] = counts.get(key, 0) + 1
    return {line for line, n in counts.items() if n >= threshold}


def strip_lines(text: str, boiler: set[str]) -> str:
    """Drop boilerplate lines from a page text, preserving other lines."""
    if not boiler:
        return text
    return "\n".join(line for line in text.splitlines() if line.strip() not in boiler)


def assemble_output_spans(
    page_rows: list[dict[str, Any]], strip_boilerplate: bool = True
) -> list[dict[str, Any]]:
    """Document-level flagship output: ordered spans with dense offsets.

    ``page_rows`` must be sorted by page and carry ``text`` (raw page text)
    and ``nontext_spans`` (pre-rendered per-page spans). Emits per page: a
    ``text`` span (boilerplate-stripped when enabled, skipped when blank)
    followed by the page's non-text spans; offsets are the dense global
    sequence — the (kind, text, media_ref, order) invariant surface.
    """
    boiler: set[str] = (
        boilerplate_lines([r.get("text", "") or "" for r in page_rows])
        if strip_boilerplate
        else set()
    )
    out: list[dict[str, Any]] = []
    offset = 0
    for row in page_rows:
        text = strip_lines(row.get("text", "") or "", boiler)
        if text.strip():
            out.append({"kind": "text", "text": text, "media_ref": "", "offset": offset})
            offset += 1
        for span in row.get("nontext_spans", []) or []:
            out.append(
                {
                    "kind": span["kind"],
                    "text": span["text"],
                    "media_ref": span["media_ref"],
                    "offset": offset,
                }
            )
            offset += 1
    return out
