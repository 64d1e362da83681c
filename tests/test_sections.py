"""Section assembly tests (reference section_parser.py + section/ pkg)."""

from pdf_parser_ray.doclogic import sections


def test_validate_and_coverage():
    entries = [{"page": 5}, {"page": 2}, {"page": "x"}, {"page": 0}]
    valid = sections.validate_toc_entries(entries)
    assert [e["page"] for e in valid] == [2, 5]
    covered = sections.calculate_page_coverage(valid, 10)
    # entry@2 covers 2..4, entry@5 (last) covers 5..10
    assert covered == set(range(2, 11))


def test_coverage_same_page_entries():
    valid = sections.validate_toc_entries([{"page": 3}, {"page": 3}])
    # first entry range end = 3-1=2 < start -> clamped to start
    assert sections.calculate_page_coverage(valid, 3) == {3}


def test_build_from_toc_entry_recomputes_hierarchy():
    s = sections.build_from_toc_entry(
        {"section_id": "1.2.3", "title": "T", "page": 4, "tags": ["x"], "level": 99},
        "content",
        "Doc",
    )
    assert s["level"] == 3 and s["parent_id"] == "1.2"
    assert s["full_path"] == "1.2.3 T"
    assert s["doc_title"] == "Doc" and s["tags"] == ["x"]
    # falsy section_id -> '' with level 1
    s = sections.build_from_toc_entry({"section_id": None, "title": "T", "page": 1}, None, "D")
    assert s["section_id"] == "" and s["level"] == 1 and s["content"] == ""


def test_build_page_section_tags():
    s = sections.build_page_section("D", 7, "=== TABLES ===\nx | y", None)
    assert s["section_id"] == "Page-7"
    assert s["title"] == "Enhanced Page 7"
    assert "contains_tables" in s["tags"] and "small_content" in s["tags"]
    s2 = sections.build_page_section("D", 7, "z" * 2000, "H")
    assert "medium_content" in s2["tags"]


def test_looks_like_heading():
    assert sections.looks_like_heading("1.2 Foo")
    assert sections.looks_like_heading("A.1 Bar")
    assert sections.looks_like_heading("SHORT CAPS LINE")
    assert sections.looks_like_heading("Something brief:")
    assert not sections.looks_like_heading("plain sentence here")
    assert not sections.looks_like_heading("x" * 101)


def test_detect_enhanced_heading_fallbacks():
    assert sections.detect_enhanced_heading("", 3) == "Content from Page 3"
    assert sections.detect_enhanced_heading("1.1 Overview\nbody", 3) == "1.1 Overview"
    # shape fallback: short line, few words
    assert sections.detect_enhanced_heading("plainword\n" + "y" * 200, 3) == "plainword"


def test_parse_sections_streams():
    page_rows = [
        {"page": 1, "text": "Table of Contents", "rendered": "=== TEXT CONTENT ===\nToC"},
        {"page": 2, "text": "covered", "rendered": "=== TEXT CONTENT ===\ncovered"},
        {"page": 3, "text": "uncovered page content", "rendered": "=== TEXT CONTENT ===\nuncovered"},
    ]
    toc_entries = [{"section_id": "1", "title": "One", "page": 2, "tags": [], "doc_title": "D"}]
    out = sections.parse_sections(page_rows, toc_entries, "D")
    # TOC entry covers 2..3 (last entry -> total_pages); page 1 uncovered
    ids = [s["section_id"] for s in out]
    assert "1" in ids and "Page-1" in ids
    assert out == sorted(out, key=lambda s: (s["page"], s["section_id"] or ""))


def test_content_sections_for_uncovered_long_text():
    long_text = "1.1 Heading Line\n" + "\n".join(f"content line {i} with words" for i in range(10))
    page_rows = [{"page": 1, "text": long_text, "rendered": ""}]
    out = sections.parse_sections(page_rows, [], "D")
    # rendered is empty -> no uncovered-page section; falls to content-based
    assert len(out) >= 1
    assert all(s["section_id"].startswith("Page-") for s in out)
