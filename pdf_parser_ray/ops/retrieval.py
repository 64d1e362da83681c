"""Ranked retrieval over a documents table: Okapi BM25 top-k.

The reference repo's search surface is a per-document term scan
(reference: utils/helpers.py search_terms_in_text — see
functions/search.py for that op); BM25 is the corpus-level ranked
extension a training-data pipeline needs for query-driven curation
(e.g. pulling topical subsets out of 100 TB of web text).

Scale shape (no corpus shuffle):

- pass 1 tokenizes each batch once and emits BOUNDED partials: one row
  per query term with its document-frequency partial, plus the batch's
  doc/token totals carried on the first term's row (a fixed column slot,
  never an in-band sentinel key). One tiny ``groupby(term)`` merges
  them — output rows == len(terms).
- the (idf, avgdl) table broadcasts once via ``ray.put``; pass 2 scores
  every batch locally and pre-trims to its local top-k, so the final
  global sort sees at most k rows per batch.

Float-parity law (the repo's oracle convention): every constant and
every parenthesis in the score formula appears IDENTICALLY in the SQL
oracle (see ``bm25_sql``); the final score is rounded half-even to 6
(Python ``round`` on a Python float == DuckDB ``round_even``) and the
top-k cut sorts on the ROUNDED score with doc_id ascending tiebreak, so
the cut can never straddle a 6th-decimal boundary differently.
"""

from __future__ import annotations

import math

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import ray.data


def _normalize_terms(query_terms: list[str]) -> list[str]:
    """Lowercase + order-preserving dedupe — the op and the SQL generator
    share this so the per-term sum order is identical on both sides."""
    return list(dict.fromkeys(t.lower() for t in query_terms))


def bm25_top_docs(
    ds: ray.data.Dataset,
    query_terms: list[str],
    k: int = 20,
    k1: float = 1.2,
    b: float = 0.75,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> ray.data.Dataset:
    """Top-k documents by Okapi BM25 for a bag of query terms.

    Tokenization is the repo's whitespace law (``lower().split()``, the
    SQL side is ``regexp_extract_all(lower(COALESCE(text,'')), '\\S+')``).
    idf is the Robertson/Sparck-Jones smoothed form
    ``ln((N - df + 0.5) / (df + 0.5) + 1)`` (non-negative, as in Lucene).
    Docs with a null id are dropped up front (they cannot be ranked);
    null text scores 0 and is cut by the ``score > 0`` filter.

    Returns (id_col, score) rows, score rounded half-even to 6,
    ordered (score desc, id asc), at most k rows."""
    import ray as _ray
    from ray.data.aggregate import Sum

    terms = _normalize_terms(query_terms)
    if not terms:
        raise ValueError("bm25_top_docs needs at least one query term")

    # capture the id type BEFORE any transform: a fully-empty dataset's
    # schema() is None after map_batches (Ray 2.49 schema-less blocks).
    # ds.schema() is Ray's wrapper (names/types lists), not pyarrow's.
    _schema = ds.schema()
    id_type = _schema.types[_schema.names.index(id_col)]

    ds = ds.select_columns([id_col, text_col]).map_batches(
        lambda t: t.filter(pc.is_valid(t[id_col])), batch_format="pyarrow"
    )

    def stat_partials(batch: pa.Table) -> pa.Table:
        texts = pc.cast(batch[text_col], pa.string()).to_pylist()
        df = {t: 0 for t in terms}
        n_docs = 0
        dl_total = 0
        for text in texts:
            toks = (text or "").lower().split()
            n_docs += 1
            dl_total += len(toks)
            seen = set(toks)
            for t in terms:
                if t in seen:
                    df[t] += 1
        # corpus totals ride the FIRST term's row (a fixed column slot;
        # an in-band sentinel key could collide with a real query term)
        return pa.table(
            {
                "term": pa.array(terms, pa.string()),
                "df": pa.array([df[t] for t in terms], pa.int64()),
                "n_docs": pa.array(
                    [n_docs] + [0] * (len(terms) - 1), pa.int64()
                ),
                "dl_total": pa.array(
                    [dl_total] + [0] * (len(terms) - 1), pa.int64()
                ),
            }
        )

    stats = (
        ds.map_batches(stat_partials, batch_format="pyarrow")
        .groupby("term")
        .aggregate(
            Sum("df", alias_name="df"),
            Sum("n_docs", alias_name="n_docs"),
            Sum("dl_total", alias_name="dl_total"),
        )
        .take_all()  # bounded: exactly len(terms) rows
    )
    n = sum(int(r["n_docs"]) for r in stats)
    total_dl = sum(int(r["dl_total"]) for r in stats)
    if n == 0:
        return ray.data.from_arrow(
            pa.table(
                {id_col: pa.array([], id_type), "score": pa.array([], pa.float64())}
            )
        )
    avgdl = total_dl / n  # int/int: the exact same double as the oracle's
    df_by_term = {r["term"]: int(r["df"]) for r in stats}
    # idf in the op's term order — the score sums per-term contributions
    # left-to-right in this order, and the SQL adds them in the same order
    idf = [
        math.log((float(n - df_by_term[t]) + 0.5) / (float(df_by_term[t]) + 0.5) + 1.0)
        for t in terms
    ]
    ref = _ray.put((terms, idf, avgdl, k1, b))

    class Score:
        def __init__(self, ref, k: int):
            self.terms, self.idf, self.avgdl, self.k1, self.b = _ray.get(ref)
            self.k = k

        def __call__(self, batch: pa.Table) -> pa.Table:
            ids = batch[id_col]
            texts = pc.cast(batch[text_col], pa.string()).to_pylist()
            scores = np.empty(len(texts), dtype=np.float64)
            for i, text in enumerate(texts):
                toks = (text or "").lower().split()
                dl = len(toks)
                tf: dict[str, int] = {}
                for tok in toks:
                    tf[tok] = tf.get(tok, 0) + 1
                s = 0.0
                for t, w in zip(self.terms, self.idf):
                    f = tf.get(t, 0)
                    if f == 0:
                        continue  # a zero contribution adds exactly 0.0
                    s = s + w * (
                        (f * (self.k1 + 1.0))
                        / (
                            f
                            + self.k1
                            * ((1.0 - self.b) + self.b * (dl / self.avgdl))
                        )
                    )
                # Python float round == round_even in the oracle
                scores[i] = round(float(s), 6)
            keep = scores > 0.0
            out = pa.table(
                {
                    id_col: ids.filter(pa.array(keep)),
                    "score": pa.array(scores[keep], pa.float64()),
                }
            )
            if out.num_rows > self.k:
                # local pre-trim: (-score, id) lexsort keeps the global
                # top-k candidates, so the final sort sees <= k rows/batch
                order = pc.sort_indices(
                    out,
                    sort_keys=[("score", "descending"), (id_col, "ascending")],
                )
                out = out.take(order[: self.k])
            return out

    return (
        ds.map_batches(
            Score,
            batch_format="pyarrow",
            fn_constructor_args=(ref, k),
            concurrency=(1, 8),
        )
        .sort(["score", id_col], descending=[True, False])
        .limit(k)
    )


def bm25_sql(
    query_terms: list[str],
    k: int = 20,
    k1: float = 1.2,
    b: float = 0.75,
    table: str = "documents",
    id_col: str = "doc_id",
    text_col: str = "text",
) -> str:
    """The DuckDB oracle for :func:`bm25_top_docs` — same tokenization,
    same constants, same parenthesization, same left-to-right per-term
    sum order, round_even(.,6) on the total, (score desc, id) cut."""
    terms = _normalize_terms(query_terms)
    tf_cols = ", ".join(
        f"len(list_filter(toks, x -> x = '{t}')) AS tf{i}"
        for i, t in enumerate(terms)
    )
    df_cols = ", ".join(
        f"SUM(CASE WHEN tf{i} > 0 THEN 1 ELSE 0 END)::BIGINT AS df{i}"
        for i in range(len(terms))
    )
    contribs = " + ".join(
        f"(CASE WHEN tf{i} = 0 THEN 0.0 ELSE "
        f"ln((CAST(s.n - s.df{i} AS DOUBLE) + 0.5) / (CAST(s.df{i} AS DOUBLE) + 0.5) + 1.0)"
        f" * ((tf{i} * ({k1!r} + 1.0)) / (tf{i} + {k1!r} * ((1.0 - {b!r}) + {b!r} * (dl / s.avgdl)))) END)"
        for i in range(len(terms))
    )
    return (
        f"WITH d AS (SELECT {id_col}, "
        f"regexp_extract_all(lower(COALESCE({text_col}, '')), '\\S+') AS toks "
        f"FROM {table} WHERE {id_col} IS NOT NULL), "
        f"tf AS (SELECT {id_col}, len(toks) AS dl, {tf_cols} FROM d), "
        f"s AS (SELECT COUNT(*) AS n, "
        f"CAST(SUM(dl) AS BIGINT)::DOUBLE / COUNT(*) AS avgdl, {df_cols} FROM tf), "
        f"scored AS (SELECT {id_col}, round_even({contribs}, 6) AS score FROM tf, s) "
        f"SELECT {id_col}, score FROM scored WHERE score > 0.0 "
        f"ORDER BY score DESC, {id_col} LIMIT {k}"
    )
