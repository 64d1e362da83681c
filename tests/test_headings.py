"""Unit tests for heading strategies (reference heading_strategies.py)."""

from pdf_parser_ray.doclogic.headings import (
    allcaps_heading_confidence,
    detect_heading,
    mixedcap_heading_confidence,
    numbered_heading_confidence,
)


def test_numbered():
    assert numbered_heading_confidence("1.2.3 Title") == min(1.0, 0.6 + 2 * 0.2)
    assert numbered_heading_confidence("12 Overview") == 0.6
    assert numbered_heading_confidence("no number") == 0.0
    # dot count runs over the WHOLE line (reference quirk)
    assert numbered_heading_confidence("1 A.B.C.D") == 1.0


def test_allcaps():
    assert allcaps_heading_confidence("POWER DELIVERY") == 1.0
    assert allcaps_heading_confidence("ab") == 0.0
    assert allcaps_heading_confidence("A-") == 0.0  # <2 uppercase alphas
    assert allcaps_heading_confidence("Mixed Case") == 0.0  # pattern fails


def test_mixedcap():
    assert mixedcap_heading_confidence("Title Case Words") == 1.0
    assert mixedcap_heading_confidence("word") == 0.0  # <2 words
    assert mixedcap_heading_confidence("all lower words here") == 0.0
    assert mixedcap_heading_confidence("Cap lower") == 0.5  # 1/2 >= max(1,1)


def test_detect_heading():
    assert detect_heading("  1.1 Overview  ") == "1.1 Overview"
    assert detect_heading("POWER DELIVERY") == "POWER DELIVERY"
    assert detect_heading("") is None
    assert detect_heading(None) is None
    assert detect_heading("all lowercase words") is None


def test_winning_strategy_attribution():
    from pdf_parser_ray.doclogic.headings import winning_strategy

    assert winning_strategy("1.2.3 Overview of Things") == "numbered_heading_confidence"
    assert winning_strategy("SYSTEM ARCHITECTURE") == "allcaps_heading_confidence"
    assert winning_strategy("Getting Started Guide") == "mixedcap_heading_confidence"
    assert winning_strategy("plain lowercase sentence here") is None
    assert winning_strategy("") is None
    assert winning_strategy(None) is None


def test_heading_strategy_stats_counts(ray_session):
    import ray.data

    from pdf_parser_ray.ops.text_analysis import heading_strategy_stats

    ds = ray.data.from_items(
        [
            # numbered wins only when mixedcap's capitalized-word ratio
            # stays under its confidence (mostly-lowercase tail words)
            {"text": "1.2 intro section about the engine\nSYSTEM DESIGN\nplain words only here"},
            {"text": "Getting Started\n4.1 overview of the storage layer"},
        ]
    )
    out = heading_strategy_stats(ds).to_pandas().set_index("strategy")
    assert out.loc["numbered_heading_confidence", "n_lines"] == 2
    assert out.loc["allcaps_heading_confidence", "n_lines"] == 1
    assert out.loc["mixedcap_heading_confidence", "n_lines"] == 1
