"""Unit tests for doclogic.textproc (reference utils/text_utils.py)."""

from pdf_parser_ray.doclogic import textproc


def test_extract_field_with_regex():
    assert (
        textproc.extract_field_with_regex(r"(?:Revision|Rev\.?)[: ]+\s*([0-9.]+)", "Revision: 3.2 x")
        == "3.2"
    )
    assert textproc.extract_field_with_regex(r"(zz)", "abc") == "Unknown"
    assert textproc.extract_field_with_regex(r"(zz)", "abc", default="d") == "d"
    # case-insensitive search semantics
    assert textproc.extract_field_with_regex(r"version\s*([0-9.]+)", "VERSION 1.1") == "1.1"


def test_split_into_lines():
    assert textproc.split_into_lines("a \nb\t\nc") == ["a", "b", "c"]
    assert textproc.split_into_lines("") == []
    assert textproc.split_into_lines(None) == []


def test_find_content_start():
    lines = [(1, "intro"), (1, "Table of Contents"), (2, "1.1 Foo ... 3")]
    assert textproc.find_content_start(lines, ["table of contents", "contents"]) == 2
    # word-boundary: 'contents' inside a larger word does not match
    assert textproc.find_content_start([(1, "discontentsed")], ["contents"]) == 0
    assert textproc.find_content_start([(1, "no match")], ["contents"]) == 0


def test_clean_text_and_numbers():
    assert textproc.clean_text("  x  ") == "x"
    assert textproc.clean_text("") == ""
    assert textproc.extract_numbers("a1 b22 c333") == [1, 22, 333]
