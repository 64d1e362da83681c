"""Metadata extraction tests (reference metadata_parser.py)."""

import json

from pdf_parser_ray.doclogic import metadata


def test_parse_metadata_fields():
    pages = [
        {"page": 1, "text": "Universal Serial Bus Power Delivery Specification\nRevision: 3.2\nVersion 1.1\nRelease Date: 2024-10"},
        {"page": 6, "text": "Revision: 9.9"},  # outside the 5-page window
    ]
    md = metadata.parse_metadata(pages)
    assert md["doc_title"] == "Universal Serial Bus Power Delivery Specification"
    assert md["revision"] == "3.2"
    assert md["version"] == "1.1"
    assert md["release_date"] == "2024-10"


def test_parse_metadata_defaults():
    md = metadata.parse_metadata([{"page": 1, "text": "nothing relevant"}])
    assert set(md.values()) <= {"Unknown"} or all(v == "Unknown" for v in md.values())


def test_golden_metadata_row_shape():
    golden = json.loads(open("/root/reference/usb_pd_metadata.jsonl").readline())
    assert set(golden) == set(metadata.METADATA_PATTERNS)
    # our patterns re-extract the golden values from a reconstructed header
    text = (
        f"{golden['doc_title']}\nRevision: {golden['revision']}\n"
        f"Version {golden['version']}\nRelease Date: {golden['release_date']}"
    )
    md = metadata.parse_metadata([{"page": 1, "text": text}])
    assert md == golden
