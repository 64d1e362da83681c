"""TOC parser unit tests + the reference golden-file anchor.

The anchor test pins M12-M20 byte-for-byte without the source PDF: every row
of the reference's committed golden output (usb_pd_toc.jsonl, 922 rows) must
reproduce exactly when its full_path line is fed back through our matcher
(SURVEY.md §5)."""

import json

import pytest

from pdf_parser_ray.doclogic import toc

GOLDEN = "/root/reference/usb_pd_toc.jsonl"
ENTRY_KEYS = ["section_id", "title", "page", "level", "parent_id", "full_path", "tags"]


def test_clean_title():
    assert toc.clean_title("  Overview .... ") == "Overview"
    assert toc.clean_title("Title....more") == "Titlemore"  # 4+ dots removed
    assert toc.clean_title("") == ""
    long = "Sentence one. " + "x" * 150
    assert toc.clean_title(long) == "Sentence one"
    assert toc.clean_title("a  b") == "a b"


def test_parse_page_number():
    assert toc.parse_page_number("42") == 42
    assert toc.parse_page_number("4a") == 0
    assert toc.parse_page_number(None) == 0


def test_level_and_parent():
    assert toc.entry_level("1.2.3") == 3
    assert toc.entry_level(None) == 1
    assert toc.entry_level("Appendix A") == 1
    assert toc.parent_id_of("1.2.3") == "1.2"
    assert toc.parent_id_of("7") is None
    assert toc.parent_id_of(None) is None


def test_technical_data_detector():
    assert toc.looks_like_technical_data("1 2 3 sequence")
    assert toc.looks_like_technical_data("0 1 0 1")
    assert toc.looks_like_technical_data("bit = 3 meaning")
    assert toc.looks_like_technical_data("ab1")  # short with digit
    assert not toc.looks_like_technical_data("Introduction to Power")


def test_match_primary_patterns():
    e = toc.match_primary("1.2 Overview of Things ..... 17")
    assert e["section_id"] == "1.2" and e["page"] == 17
    e = toc.match_primary("Appendix A Cable Assemblies ..... 900")
    assert e["section_id"] == "Appendix A"
    e = toc.match_primary("Chapter 2 Protocol Basics ..... 30")
    assert e["section_id"] == "Chapter 2"
    # plain-title pattern: no section_id group
    e = toc.match_primary("Last Transition" + "." * 30 + "94")
    assert e["section_id"] is None and e["title"] == "Last Transition"
    assert toc.match_primary("not a toc line") == {}


def test_dedup_and_validate():
    entries = [
        {"page": 3, "title": "B"},
        {"page": 3, "title": "b"},  # dup after lower()
        {"page": 1, "title": "A"},
        {"page": 0, "title": "bad page"},
    ]
    out = toc.dedup_and_validate(entries)
    assert [(e["page"], e["title"]) for e in out] == [(1, "A"), (3, "B")]


def test_parse_toc_end_to_end():
    pages = [
        {"page": 1, "text": "Table of Contents\n1.1 Introduction Overview ..... 2\n1.2 Power Requirements ..... 3"},
        {"page": 2, "text": "body text here"},
    ]
    entries = toc.parse_toc(pages, "Doc")
    assert [e["section_id"] for e in entries] == ["1.1", "1.2"]
    assert entries[0]["doc_title"] == "Doc"
    assert entries[0]["tags"] == ["introductory"]


@pytest.mark.parametrize("chunk", range(4))
def test_golden_anchor_922_rows(chunk):
    rows = [json.loads(line) for line in open(GOLDEN)]
    rows = rows[chunk::4]
    for r in rows:
        e = toc.match_primary(r["full_path"])
        assert e, f"no primary match: {r['full_path'][:80]}"
        ent = toc._make_entry(r["doc_title"], e)
        for k in ENTRY_KEYS:
            assert ent[k] == r[k], (k, ent[k], r[k], r["full_path"][:80])
