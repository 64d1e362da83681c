"""Corpus-level validation report (reference step 5).

The reference re-reads its four JSONL outputs and computes counts/coverage
single-threaded (validation_report.py:56-177, coverage_calculator.py:34-214);
here the same metrics are streaming aggregates over the extraction result —
no re-read, no materialization beyond a fixed-size summary row.
"""

from __future__ import annotations

from typing import Any, Optional

import ray.data
from ray.data.aggregate import Count, Sum


def _safe_pct(numerator: float, denominator: float) -> float:
    """round((n/d)*100, 2), 0.0 on zero denominator
    (coverage_calculator.py:216-222)."""
    if not denominator:
        return 0.0
    return round(numerator / denominator * 100, 2)


def validation_summary(doc_results: ray.data.Dataset) -> dict[str, Any]:
    """The reference's validation_report.xlsx row + enhanced coverage
    metrics, computed corpus-wide in ONE aggregate pass.

    Columns mirror validation_report.py:109-177 (Metadata/ToC/Sections/
    PagesWithText/TOCCoveredPages/PageCoverage) and
    coverage_calculator.calculate_comprehensive_coverage's weighted score
    (text .4, tables .2, images .2, annotations .1, layout .1).
    """
    agg = doc_results.aggregate(
        Count(alias_name="n_docs"),
        Sum("total_pages", alias_name="total_pages"),
        Sum("pages_with_text", alias_name="pages_with_text"),
        Sum("pages_with_tables", alias_name="pages_with_tables"),
        Sum("pages_with_images", alias_name="pages_with_images"),
        Sum("pages_with_annotations", alias_name="pages_with_annotations"),
        Sum("pages_with_layout", alias_name="pages_with_layout"),
        Sum("n_toc_entries", alias_name="toc_entries"),
        Sum("n_sections", alias_name="sections"),
        Sum("n_spans", alias_name="spans"),
        Sum("toc_covered_pages", alias_name="toc_covered_pages"),
        Sum("parse_failure", alias_name="parse_failures"),
    )
    total_pages = agg["total_pages"] or 0
    coverage = {
        "text_coverage": _safe_pct(agg["pages_with_text"] or 0, total_pages),
        "table_coverage": _safe_pct(agg["pages_with_tables"] or 0, total_pages),
        "image_coverage": _safe_pct(agg["pages_with_images"] or 0, total_pages),
        "annotation_coverage": _safe_pct(agg["pages_with_annotations"] or 0, total_pages),
        "layout_coverage": _safe_pct(agg["pages_with_layout"] or 0, total_pages),
    }
    coverage["overall_coverage"] = round(
        coverage["text_coverage"] * 0.4
        + coverage["table_coverage"] * 0.2
        + coverage["image_coverage"] * 0.2
        + coverage["annotation_coverage"] * 0.1
        + coverage["layout_coverage"] * 0.1,
        2,
    )
    return {
        "n_docs": agg["n_docs"],
        "total_pages": int(total_pages),
        "pages_with_text": int(agg["pages_with_text"] or 0),
        "toc_entries": int(agg["toc_entries"] or 0),
        "sections": int(agg["sections"] or 0),
        "spans": int(agg["spans"] or 0),
        "toc_covered_pages": int(agg["toc_covered_pages"] or 0),
        "parse_failures": int(agg["parse_failures"] or 0),
        "page_coverage_pct": _safe_pct(agg["pages_with_text"] or 0, total_pages),
        "toc_coverage_pct": _safe_pct(agg["toc_covered_pages"] or 0, total_pages),
        "enhanced_coverage_metrics": coverage,
    }


def write_validation_report(
    summary: dict[str, Any], output_path: str
) -> Optional[str]:
    """Excel report with JSON fallback (validation_report.py:189-208): a
    driver-side write of one summary row, never a Ray op."""
    import json

    import pandas as pd

    flat = {k: v for k, v in summary.items() if not isinstance(v, dict)}
    try:
        pd.DataFrame([flat]).to_excel(output_path, index=False)
        return output_path
    except Exception:
        import os

        fallback = os.path.splitext(output_path)[0] + ".json"
        with open(fallback, "w") as f:
            json.dump(summary, f, indent=2)
        return fallback
