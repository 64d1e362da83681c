"""Table-of-contents parsing (reference: parsers/toc_parser.py).

Per-document, order-dependent three-pass extraction over (page, line) pairs:

1. primary pass  — 7 high-precision patterns, first match wins
   (toc_parser.py:82-113); non-matching lines become *potential* entries
   (toc_parser.py:560-587).
2. enhanced pass — 8 looser patterns over all lines, skipping lines already
   contained in a primary entry's full_path; scan-order-dependent because the
   seen-title set mutates as entries are accepted (toc_parser.py:381-472).
3. fallback pass — high-confidence potential entries (toc_parser.py:620-659).

Then a stable sort by (page, title) + first-wins dedup on
(page, title.lower()[:50]) and a 1..9999 page filter (toc_parser.py:661-691).

Everything here is per-document-local: the Ray pipeline runs it inside the
per-doc group after the groupby(doc_id) shuffle, so the order-dependence never
crosses a partition boundary. Pattern matching per line is the hot loop; the
patterns are compiled once per process at import.
"""

from __future__ import annotations

import re
from typing import Any, Optional

from pdf_parser_ray.doclogic import textproc

FALLBACK_DOC_TITLE = "Universal Serial Bus Power Delivery Specification"

TOC_START_INDICATORS = ["table of contents", "contents"]

# Primary patterns, in priority order (toc_parser.py:85-113).
PRIMARY_PATTERNS: list[re.Pattern] = [
    re.compile(p, re.IGNORECASE)
    for p in [
        # numbered section, dotted leader to page
        r"^\s*(?P<section_id>\d+(?:\.\d+)*)\s+(?P<title>[^.]+?)"
        r"\s*\.{3,}\s*(?P<page>\d{1,4})\s*$",
        # numbered section, wide-space separation
        r"^\s*(?P<section_id>\d+(?:\.\d+)*)\s+(?P<title>.{5,80}?)"
        r"\s{3,}(?P<page>\d{1,4})\s*$",
        # Table / Figure references
        r"^\s*(?P<prefix>Table|Figure)\s*(?P<section_id>\d+(?:\.\d+)*)"
        r"\s+(?P<title>.{5,100}?)\s*\.{3,}\s*(?P<page>\d{1,4})\s*$",
        # Appendix / Annex
        r"^\s*(?P<annex>Appendix|Annex)\s+(?P<section_id>[A-Z])"
        r"\s+(?P<title>.{5,80}?)\s*\.{3,}\s*(?P<page>\d{1,4})\s*$",
        # Chapter
        r"^\s*(?P<chapter>Chapter)\s+(?P<section_id>\d+)"
        r"\s+(?P<title>.{5,80}?)\s*\.{3,}\s*(?P<page>\d{1,4})\s*$",
        # plain capitalized title with long dotted leader
        r"^(?P<title>[A-Z][^.]{10,80}?)\s*\.{4,}\s*(?P<page>\d{1,4})\s*$",
        # alpha-numbered (A.1, B.2.3)
        r"^\s*(?P<section_id>[A-Z]\.\d+(?:\.\d+)*)\s+(?P<title>.{5,80}?)"
        r"\s*\.{3,}\s*(?P<page>\d{1,4})\s*$",
    ]
]

# Enhanced (looser) patterns (toc_parser.py:391-419).
ENHANCED_PATTERNS: list[re.Pattern] = [
    re.compile(p, re.IGNORECASE)
    for p in [
        r"^\s*(?P<section_id>\d+(?:\.\d+)*)\s*(?P<title>.{3,100}?)"
        r"\s+(?P<page>\d{1,4})\s*$",
        r"^\s*(?P<prefix>Table|Figure|Equation)\s*"
        r"(?P<section_id>\d+(?:\.\d+)*)\s*(?P<title>.{3,80}?)"
        r"\s+(?P<page>\d{1,4})\s*$",
        r"^\s*[•\-\*]\s*(?P<title>.{5,80}?)\s+(?P<page>\d{1,4})\s*$",
        r"^\s*(?P<section_id>\d+\.\d+\.\d+)\s+(?P<title>.{5,60}?)"
        r"\s+(?P<page>\d{1,4})\s*$",
        r"^\s*(?P<title>References?|Bibliography|Index|Glossary)"
        r"\s+(?P<page>\d{1,4})\s*$",
        r"^\s*(?P<section_id>[IVX]+(?:\.[IVX]+)*)\s+(?P<title>.{5,80}?)"
        r"\s*\.{3,}\s*(?P<page>\d{1,4})\s*$",
        r"^\s*(?P<section_id>[A-Z](?:\.[A-Z])*(?:\.\d+)*)"
        r"\s+(?P<title>.{5,80}?)\s*\.{3,}\s*(?P<page>\d{1,4})\s*$",
    ]
]

# Technical-junk detectors (toc_parser.py:273-283).
TECHNICAL_PATTERNS: list[re.Pattern] = [
    re.compile(p)
    for p in [
        r"^\d+\s+\d+\s+\d+",
        r"^[01\s]+$",
        r"hex\s+data",
        r"bit\s*=\s*\d",
        r"k-code",
        r"byte\s+\d",
        r"^[a-z]\d+rx",
        r"preamble.*training",
        r"data\s+object\s+\d",
    ]
]

_EXCESS_DOTS_RE = re.compile(r"\.{4,}")

GENUINE_TOC_KEYWORDS = [
    "introduction", "overview", "specification", "requirements",
    "protocol", "interface", "power", "delivery", "usb",
    "connector", "cable", "message", "communication",
    "appendix", "annex", "reference", "glossary", "index",
    "chapter", "section", "figure", "table", "example",
]

CONFIDENCE_KEYWORDS = [
    "introduction", "overview", "summary", "conclusion",
    "references", "appendix", "index", "glossary", "abstract",
]


def clean_title(title: str) -> str:
    """Normalize a matched TOC title (toc_parser.py:302-334).

    Kills 4+-dot leaders, truncates >120-char titles at a sentence boundary
    (first '.'-piece if < 80 chars, else a hard [:80] cut), strips trailing
    dots/spaces, collapses whitespace, and fixes ' .' -> '.'.
    """
    if not title:
        return ""
    cleaned = title.strip()
    cleaned = _EXCESS_DOTS_RE.sub("", cleaned)
    if len(cleaned) > 120:
        sentences = cleaned.split(".")
        if len(sentences) > 1 and len(sentences[0]) < 80:
            cleaned = sentences[0].strip()
        else:
            cleaned = cleaned[:80].strip()
    while cleaned and cleaned[-1] in ". ":
        cleaned = cleaned[:-1]
    cleaned = " ".join(cleaned.split())
    cleaned = cleaned.replace("  ", " ").replace(" .", ".")
    return cleaned


def parse_page_number(page_str: Optional[str]) -> int:
    """int when all digits, else 0 (toc_parser.py:336-338)."""
    return int(page_str) if page_str and page_str.isdigit() else 0


def entry_level(section_id: Optional[str]) -> int:
    """Hierarchy depth = dot segments of the id; 1 when no id
    (toc_parser.py:340-342)."""
    return len(section_id.split(".")) if section_id else 1


def parent_id_of(section_id: Optional[str]) -> Optional[str]:
    """Id minus its last dot segment; None for top level
    (toc_parser.py:344-350)."""
    if section_id and "." in section_id:
        return ".".join(section_id.split(".")[:-1])
    return None


def generate_entry_tags(title: str) -> list[str]:
    """Keyword-class tags from the title (toc_parser.py:352-379)."""
    tags: list[str] = []
    t = (title or "").lower()
    if any(w in t for w in ("introduction", "overview", "summary")):
        tags.append("introductory")
    if any(w in t for w in ("conclusion", "summary", "results")):
        tags.append("concluding")
    if any(w in t for w in ("appendix", "annex", "supplement")):
        tags.append("supplementary")
    if any(w in t for w in ("reference", "bibliography", "citation")):
        tags.append("reference")
    if any(w in t for w in ("table", "figure", "diagram", "chart")):
        tags.append("visual_content")
    if any(w in t for w in ("specification", "requirement", "standard")):
        tags.append("specification")
    return tags


def looks_like_technical_data(title: str) -> bool:
    """Reject data-table fragments masquerading as titles
    (toc_parser.py:268-293)."""
    title_lower = title.lower().strip()
    for pattern in TECHNICAL_PATTERNS:
        if pattern.search(title_lower):
            return True
    if len(title.strip()) < 10 and any(c.isdigit() for c in title):
        return True
    return False


def looks_like_genuine_toc_entry(title: str) -> bool:
    """Keyword or proper-heading shape check (toc_parser.py:474-513)."""
    title_clean = title.strip()
    if len(title_clean) < 5 or len(title_clean) > 100:
        return False
    words = title_clean.split()
    if len(words) < 2:
        return False
    title_lower = title_clean.lower()
    if any(kw in title_lower for kw in GENUINE_TOC_KEYWORDS):
        return True
    if (
        title_clean[0].isupper()
        and not title_clean.isupper()
        and len([w for w in words if len(w) > 2]) >= 2
    ):
        return True
    return False


def _is_high_quality_entry(entry: dict[str, Any]) -> bool:
    """Primary-pass quality gate (toc_parser.py:236-266)."""
    title = entry.get("title", "")
    page = entry.get("page", 0)
    if not title or len(title.strip()) < 5:
        return False
    if len(title) > 120:
        return False
    if not isinstance(page, int) or page < 1 or page > 1047:
        return False
    if title.count(".") > 15:
        return False
    if looks_like_technical_data(title):
        return False
    if sum(1 for c in title if c.isdigit()) > len(title) * 0.4:
        return False
    return True


def match_primary(line: str) -> dict[str, Any]:
    """First primary pattern to match the stripped line -> raw entry dict,
    else {} (toc_parser.py:180-209)."""
    clean_line = line.strip()
    for pattern in PRIMARY_PATTERNS:
        match = pattern.match(clean_line)
        if match:
            groups = match.groupdict()
            section_id = groups.get("section_id")
            if groups.get("annex"):
                section_id = f"{groups['annex'].capitalize()} {section_id}".strip()
            elif groups.get("chapter"):
                section_id = f"Chapter {section_id}" if section_id else None
            return {
                "section_id": section_id,
                "title": clean_title(groups.get("title", "")),
                "page": parse_page_number(groups.get("page")),
                "full_path": clean_line,
            }
    return {}


def _make_entry(doc_title: str, entry_data: dict[str, Any]) -> dict[str, Any]:
    """Assemble the final TOC entry record (toc_parser.py:211-226)."""
    section_id = entry_data.get("section_id")
    return {
        "doc_title": doc_title,
        "section_id": section_id,
        "title": entry_data.get("title"),
        "page": entry_data.get("page"),
        "level": entry_level(section_id),
        "parent_id": parent_id_of(section_id),
        "full_path": entry_data.get("full_path"),
        "tags": generate_entry_tags(entry_data.get("title", "")),
    }


def analyze_potential_line(line: str, page_num: int) -> Optional[dict[str, Any]]:
    """Lines whose last word is a plausible page number -> candidate for the
    fallback pass, with a confidence score (toc_parser.py:560-587)."""
    clean_line = line.strip()
    if len(clean_line) < 5 or len(clean_line) > 200:
        return None
    words = clean_line.split()
    if len(words) < 2:
        return None
    last_word = words[-1]
    if last_word.isdigit() and 1 <= int(last_word) <= 9999:
        title_part = " ".join(words[:-1]).strip()
        if title_part and not title_part.isdigit():
            return {
                "line": clean_line,
                "potential_title": title_part,
                "potential_page": int(last_word),
                "source_page": page_num,
                "confidence": toc_confidence(clean_line),
            }
    return None


def toc_confidence(line: str) -> float:
    """Heuristic confidence that a line is a TOC row (toc_parser.py:589-618)."""
    score = 0.0
    line_lower = line.lower()
    for keyword in CONFIDENCE_KEYWORDS:
        if keyword in line_lower:
            score += 0.3
            break
    if ".." in line or "  " in line:
        score += 0.2
    words = line.split()
    if 2 <= len(words) <= 15:
        score += 0.2
    if any(w[0].isupper() for w in words if w):
        score += 0.1
    return min(1.0, score)


def _enhanced_pass(
    doc_title: str,
    original_entries: list[dict[str, Any]],
    lines: list[tuple[int, str]],
) -> list[dict[str, Any]]:
    """Looser second pass; mutates a seen-title set in scan order
    (toc_parser.py:381-472). Must run over the same line slice as the
    primary pass to preserve the reference's order-dependence."""
    enhanced: list[dict[str, Any]] = []
    existing_titles = {e.get("title", "").lower() for e in original_entries}
    # full_path containment probe against primary entries (toc_parser.py:429-431)
    original_paths = [e.get("full_path", "") for e in original_entries]

    for _page_num, line in lines:
        clean_line = line.strip()
        if not clean_line[-1:].isdigit():
            # same trailing-page-number gate as the primary pass
            continue
        if any(clean_line in path for path in original_paths):
            continue
        for pattern in ENHANCED_PATTERNS:
            match = pattern.match(clean_line)
            if match:
                groups = match.groupdict()
                page = parse_page_number(groups.get("page"))
                title = clean_title(groups.get("title", ""))
                if (
                    page
                    and 1 <= page <= 1047
                    and len(title.strip()) >= 5
                    and title.lower() not in existing_titles
                    and not title.lower().startswith("page ")
                    and not looks_like_technical_data(title)
                    and looks_like_genuine_toc_entry(title)
                ):
                    section_id = groups.get("section_id", f"Section-{page}")
                    enhanced.append(
                        {
                            "doc_title": doc_title,
                            "section_id": section_id,
                            "title": title,
                            "page": page,
                            "level": entry_level(groups.get("section_id")),
                            "parent_id": parent_id_of(groups.get("section_id")),
                            "full_path": clean_line,
                            "tags": ["enhanced_extraction"],
                        }
                    )
                    existing_titles.add(title.lower())
                    # break only on ACCEPTANCE: a matching-but-rejected
                    # pattern falls through to the next (toc_parser.py:470)
                    break
    return enhanced


def _fallback_pass(
    doc_title: str, potential_entries: list[dict[str, Any]]
) -> list[dict[str, Any]]:
    """Promote high-confidence potential lines missed by both regex passes
    (toc_parser.py:620-659). Titles here are NOT re-cleaned — the reference
    keeps the raw title_part."""
    out: list[dict[str, Any]] = []
    for entry in potential_entries:
        title = entry.get("potential_title", "")
        if (
            entry.get("confidence", 0) >= 0.6
            and not looks_like_technical_data(title)
            and looks_like_genuine_toc_entry(title)
        ):
            if (
                len(title.strip()) >= 8
                and len(title.split()) >= 2
                and not title.lower().startswith(("error", "data object", "byte", "bit"))
            ):
                out.append(
                    _make_entry(
                        doc_title,
                        {
                            "section_id": None,
                            "title": title,
                            "page": entry["potential_page"],
                            "full_path": entry["line"],
                        },
                    )
                )
    return out


def dedup_and_validate(entries: list[dict[str, Any]]) -> list[dict[str, Any]]:
    """Stable sort by (page, title), keep the first of each
    (page, title.lower().strip()[:50]) key, then a 1..9999 page filter
    (toc_parser.py:661-691)."""
    if not entries:
        return entries
    unique: list[dict[str, Any]] = []
    seen: set[tuple[int, str]] = set()
    for entry in sorted(entries, key=lambda x: (x.get("page", 0), x.get("title", "") or "")):
        page = entry.get("page", 0)
        title = (entry.get("title", "") or "").lower().strip()
        key = (page, title[:50])
        if key not in seen:
            seen.add(key)
            unique.append(entry)
    return [e for e in unique if 1 <= e.get("page", 0) <= 9999]


def flatten_pages_to_lines(pages: list[dict[str, Any]]) -> list[tuple[int, str]]:
    """(page_number, rstripped-line) pairs in document order
    (toc_parser.py:123-133)."""
    lines: list[tuple[int, str]] = []
    for page in pages:
        page_number = page.get("page", page.get("page_number", 0))
        for line in textproc.split_into_lines(page.get("text", "")):
            lines.append((page_number, line))
    return lines


def parse_toc(
    pages: list[dict[str, Any]], doc_title: str = FALLBACK_DOC_TITLE
) -> list[dict[str, Any]]:
    """Full three-pass TOC extraction over page records.

    ``pages`` must already be filtered to the TOC search window (the caller
    applies the page <= 60 cut, main.py:194-202) and be in page order.
    Reference orchestration: toc_parser.py:115-178; like the reference's
    parse_toc, any internal error degrades to an empty TOC (toc_parser.py:
    78-80) so the rest of the document's outputs survive — e.g. a line
    ending in a superscript digit passes ``isdigit`` but crashes ``int()``.
    """
    try:
        return _parse_toc_inner(pages, doc_title)
    except Exception:
        return []


def _parse_toc_inner(
    pages: list[dict[str, Any]], doc_title: str
) -> list[dict[str, Any]]:
    lines = flatten_pages_to_lines(pages)
    start_index = textproc.find_content_start(lines, TOC_START_INDICATORS)
    lines = lines[start_index:]

    toc_entries: list[dict[str, Any]] = []
    potential_entries: list[dict[str, Any]] = []
    for page_num, line in lines:
        # fast path: every primary/enhanced pattern and the potential-line
        # analyzer require a trailing page number, so a line whose last
        # non-space char isn't a digit can't produce an entry — skip the
        # 14-pattern regex cascade entirely (semantics-preserving; the 922
        # golden lines all end with digits)
        if not line.rstrip()[-1:].isdigit():
            continue
        entry = match_primary(line)
        if entry and entry.get("page") and _is_high_quality_entry(entry):
            toc_entries.append(_make_entry(doc_title, entry))
        else:
            potential = analyze_potential_line(line, page_num)
            if potential:
                potential_entries.append(potential)

    toc_entries.extend(_enhanced_pass(doc_title, toc_entries, lines))
    toc_entries.extend(_fallback_pass(doc_title, potential_entries))
    return dedup_and_validate(toc_entries)
