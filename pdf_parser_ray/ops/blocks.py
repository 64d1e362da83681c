"""DOM-style block classification over text lines (north-star: "boilerplate
strip ... and DOM-style block classification for HTML-ish spans").

The corpus carries pre-extracted text, so the classifier works on layout
signals that survive extraction: list markers, nav-separator density,
indentation, link-ish markers, punctuation/stopword density. Fully
vectorized — one pandas/numpy pass per batch, classes assigned with a
single ``np.select`` cascade.

Classes: heading | paragraph | list_item | nav | code | table_row | short
| blank. ``main_content_filter`` keeps the content-bearing classes — the
text analogue of readability-style boilerplate stripping, complementing the
repeated-line header/footer removal in ``doclogic.render``.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import ray.data

BLOCK_SCHEMA = pa.schema(
    [
        ("doc_id", pa.string()),
        ("line_idx", pa.int32()),
        ("block_class", pa.string()),
        ("line", pa.string()),
    ]
)

CONTENT_CLASSES = ("heading", "paragraph", "list_item")


def classify_lines(lines: pd.Series) -> np.ndarray:
    """Vectorized class per line. Order of rules = priority."""
    s = lines.fillna("")
    stripped = s.str.strip()
    n = stripped.str.len().to_numpy()
    n_words = stripped.str.count(r"\S+").to_numpy()
    indent = (s.str.len() - s.str.lstrip().str.len()).to_numpy()
    bullet = stripped.str.match(r"^([\-\*•▪·]|\d+[.)])\s+").to_numpy()
    pipeish = stripped.str.count(r"\s\|\s").to_numpy()
    navsep = stripped.str.count(r"\s*[|·/>]\s*").to_numpy()
    linkish = stripped.str.count(r"(https?://|www\.|\[\d+\])").to_numpy()
    upper_ratio = np.divide(
        stripped.str.count(r"[A-Z]").to_numpy(),
        np.maximum(stripped.str.count(r"[A-Za-z]").to_numpy(), 1),
    )
    endpunct = stripped.str.match(r".*[.!?:;]$").to_numpy()
    codeish = stripped.str.match(
        r"^(def |class |import |from |#include|{|}|</?\w+[ >])"
    ).to_numpy()

    conditions = [
        n == 0,
        codeish | (indent >= 4) & (n_words <= 12),
        bullet,
        pipeish >= 1,
        (navsep >= 2) & (n_words <= 12) | (linkish >= 2),
        (n_words <= 6) & (upper_ratio > 0.6) & (n >= 4),
        (n_words >= 2) & (n_words <= 12) & ~endpunct & (upper_ratio > 0.1),
        n_words >= 5,
    ]
    choices = [
        "blank",
        "code",
        "list_item",
        "table_row",
        "nav",
        "heading",
        "heading",
        "paragraph",
    ]
    return np.select(conditions, choices, default="short")


def classify_blocks(
    ds: ray.data.Dataset, text_col: str = "text", id_col: str = "doc_id"
) -> ray.data.Dataset:
    """Explode documents to (doc_id, line_idx, block_class, line) rows."""

    def run(batch: pa.Table) -> pa.Table:
        doc_ids = batch[id_col].to_pylist()
        texts = pc.cast(batch[text_col], pa.string()).to_pylist()
        out_ids, out_idx, out_lines = [], [], []
        for doc_id, text in zip(doc_ids, texts):
            lines = (text or "").split("\n")
            out_ids.extend([str(doc_id)] * len(lines))
            out_idx.extend(range(len(lines)))
            out_lines.extend(lines)
        classes = classify_lines(pd.Series(out_lines, dtype="object"))
        return pa.table(
            {
                "doc_id": pa.array(out_ids, pa.string()),
                "line_idx": pa.array(out_idx, pa.int32()),
                "block_class": pa.array(classes, pa.string()),
                "line": pa.array(out_lines, pa.string()),
            }
        ).cast(BLOCK_SCHEMA)

    return ds.map_batches(run, batch_format="pyarrow")


def main_content_filter(
    ds: ray.data.Dataset,
    text_col: str = "text",
    id_col: str = "doc_id",
    keep: tuple[str, ...] = CONTENT_CLASSES,
) -> ray.data.Dataset:
    """Boilerplate strip via block classes: rebuild each document keeping
    only content-bearing lines, preserving order. One row per doc:
    (doc_id, main_text, n_lines_kept, n_lines_total)."""

    def run(batch: pa.Table) -> pa.Table:
        doc_ids = batch[id_col].to_pylist()
        texts = pc.cast(batch[text_col], pa.string()).to_pylist()
        rows = []
        for doc_id, text in zip(doc_ids, texts):
            lines = (text or "").split("\n")
            classes = classify_lines(pd.Series(lines, dtype="object"))
            kept = [l for l, c in zip(lines, classes) if c in keep]
            rows.append(
                {
                    "doc_id": str(doc_id),
                    "main_text": "\n".join(kept),
                    "n_lines_kept": len(kept),
                    "n_lines_total": len(lines),
                }
            )
        return pa.Table.from_pylist(
            rows,
            schema=pa.schema(
                [
                    ("doc_id", pa.string()),
                    ("main_text", pa.string()),
                    ("n_lines_kept", pa.int32()),
                    ("n_lines_total", pa.int32()),
                ]
            ),
        )

    return ds.map_batches(run, batch_format="pyarrow")
