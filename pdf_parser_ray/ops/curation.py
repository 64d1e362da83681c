"""Corpus-curation operators for training-data pipelines: PII scrubbing,
repetition scoring, corpus-wide n-gram statistics, stratified sampling.

All map stages are vectorized (Arrow RE2 kernels / pandas groupby); the one
wide op (``top_ngrams``) pre-aggregates per batch and bounds the shuffle to
(ngram, partial_count) rows with a per-bucket top-k before the global merge.
Regex transforms use RE2 via ``pyarrow.compute`` — the same engine DuckDB
uses, so the SQL oracles match byte-for-byte.
"""

from __future__ import annotations

import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import ray.data

from pdf_parser_ray.functions.hashing import md5_bucket

# order matters: URLs first (emails can appear inside URLs), then emails,
# then phone-ish number runs on the already-redacted text
URL_RE = r"https?://[^\s]+"
EMAIL_RE = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
PHONE_RE = r"\+?\d[\d\-\s]{7,}\d"


def scrub_pii(
    ds: ray.data.Dataset, text_col: str = "text", id_col: str = "doc_id"
) -> ray.data.Dataset:
    """Redact URLs, emails and phone-like number runs; emit per-doc counts.

    Sequential single-pass RE2 kernels per class over the batch; counts are
    taken on the text as it stands BEFORE that class's replacement (so an
    email inside a URL counts as URL only).
    """

    def scrub(batch: pa.Table) -> pa.Table:
        text = pc.cast(batch[text_col], pa.string())
        n_urls = pc.count_substring_regex(text, URL_RE)
        text = pc.replace_substring_regex(text, URL_RE, "<URL>")
        n_emails = pc.count_substring_regex(text, EMAIL_RE)
        text = pc.replace_substring_regex(text, EMAIL_RE, "<EMAIL>")
        n_phones = pc.count_substring_regex(text, PHONE_RE)
        text = pc.replace_substring_regex(text, PHONE_RE, "<PHONE>")
        return pa.table(
            {
                id_col: batch[id_col],
                "clean_text": text,
                "n_urls": pc.cast(n_urls, pa.int64()),
                "n_emails": pc.cast(n_emails, pa.int64()),
                "n_phones": pc.cast(n_phones, pa.int64()),
            }
        )

    return ds.select_columns([id_col, text_col]).map_batches(
        scrub, batch_format="pyarrow"
    )


def repetition_score(
    ds: ray.data.Dataset, text_col: str = "text", id_col: str = "doc_id"
) -> ray.data.Dataset:
    """Per-doc line-repetition metrics — the standard boilerplate/spam
    signal: total lines, distinct lines, duplicate-line ratio, and the
    modal line's share. One pandas explode + groupby per batch."""

    def score(batch: pa.Table) -> pa.Table:
        ids = batch[id_col].to_pylist()
        texts = pc.cast(batch[text_col], pa.string()).to_pylist()
        frame = pd.DataFrame(
            {
                "doc": pd.Series(ids).repeat(
                    [len((t or "").split("\n")) for t in texts]
                ).to_numpy(),
                "line": [ln for t in texts for ln in (t or "").split("\n")],
            }
        )
        g = frame.groupby("doc", sort=False)["line"]
        agg = pd.DataFrame(
            {
                "n_lines": g.size(),
                "n_distinct": g.nunique(),
                "top_freq": g.agg(lambda s: s.value_counts().iloc[0]),
            }
        ).reset_index()
        dup_ratio = 1.0 - agg["n_distinct"] / agg["n_lines"]
        top_share = agg["top_freq"] / agg["n_lines"]
        return pa.table(
            {
                id_col: pa.array(agg["doc"]),
                "n_lines": pa.array(agg["n_lines"].astype("int64")),
                "n_distinct_lines": pa.array(agg["n_distinct"].astype("int64")),
                "dup_line_ratio": pa.array(
                    [float(f"{v:.6f}") for v in dup_ratio], pa.float64()
                ),
                "top_line_share": pa.array(
                    [float(f"{v:.6f}") for v in top_share], pa.float64()
                ),
            }
        )

    return ds.select_columns([id_col, text_col]).map_batches(
        score, batch_format="pyarrow"
    )


_NGRAM_BUCKETS = 64


def top_ngrams(
    ds: ray.data.Dataset,
    n: int = 2,
    k: int = 20,
    text_col: str = "text",
) -> ray.data.Dataset:
    """Corpus-wide top-k word n-grams (lowercased, whitespace tokens).

    Scale shape: per-batch partial counts (dict accumulation — measured
    faster than the pandas equivalent, see inline note), ONE groupby over
    hash(ngram) buckets
    (every partial of an ngram lands in one bucket, so per-bucket sums are
    exact totals and the per-bucket top-k is safe), then a global merge of
    buckets x k rows. Ties break by ngram ascending."""

    def partial_counts(batch: pa.Table) -> pa.Table:
        # dict-accumulation measured 3.7x FASTER than the pandas
        # explode+shift-concat equivalent on sf0.1 (0.06 s vs 0.22 s per
        # 40k docs): counting into a dict is C-speed and allocates nothing,
        # while the "vectorized" path materializes the full exploded token
        # and concatenated gram series. The output is per-DISTINCT-gram, so
        # the emitted table (and its md5 bucket loop) stays vocabulary-sized.
        texts = pc.cast(batch[text_col], pa.string()).to_pylist()
        counts: dict[str, int] = {}
        for text in texts:
            toks = (text or "").lower().split()
            for i in range(len(toks) - n + 1):
                g = " ".join(toks[i : i + n])
                counts[g] = counts.get(g, 0) + 1
        grams = list(counts)
        return pa.table(
            {
                "ngram": pa.array(grams, pa.string()),
                "n": pa.array([counts[g] for g in grams], pa.int64()),
                "_b": pa.array(
                    [md5_bucket(g, _NGRAM_BUCKETS) for g in grams], pa.int64()
                ),
            }
        )

    def bucket_topk(group: pd.DataFrame) -> pd.DataFrame:
        agg = group.groupby("ngram", as_index=False)["n"].sum()
        agg = agg.sort_values(["n", "ngram"], ascending=[False, True]).head(k)
        return agg[["ngram", "n"]]

    return (
        ds.select_columns([text_col])
        .map_batches(partial_counts, batch_format="pyarrow")
        .groupby("_b")
        .map_groups(bucket_topk, batch_format="pandas")
        .sort(["n", "ngram"], descending=[True, False])
        .limit(k)
    )


def stratified_sample(
    ds: ray.data.Dataset,
    pct: int = 10,
    stratum_col: str = "lang",
    id_col: str = "doc_id",
    pct_by_stratum: dict[str, int] | None = None,
) -> ray.data.Dataset:
    """Deterministic per-stratum hash sampling for train/eval splits: keep a
    row when ``md5_64(doc_id) % 100 < pct`` (per-stratum overrides via
    ``pct_by_stratum``). Same split on every run and every cluster, and
    closed-form for the SQL oracle — the per-stratum generalization of
    ``deterministic_sample``."""

    def keep(batch: pa.Table) -> pa.Table:
        ids = pc.cast(batch[id_col], pa.string()).to_pylist()
        buckets = [md5_bucket(i, 100) for i in ids]
        strata = batch[stratum_col].to_pylist()
        limits = [
            (pct_by_stratum or {}).get(s, pct) for s in strata
        ]
        mask = pa.array([b < lim for b, lim in zip(buckets, limits)])
        return batch.filter(mask)

    return ds.map_batches(keep, batch_format="pyarrow").sort(id_col)


def doc_frequency(
    ds: ray.data.Dataset, k: int = 20, text_col: str = "text"
) -> ray.data.Dataset:
    """Corpus-wide top-k tokens by DOCUMENT frequency (how many docs contain
    the token at least once) — the df side of tf-idf. Same exact-top-k
    shape as :func:`top_ngrams`: per-batch partials over per-doc DISTINCT
    tokens, one hash-bucket groupby (totals complete per bucket), global
    merge of buckets x k rows; ties break by token ascending."""

    def partials(batch: pa.Table) -> pa.Table:
        counts: dict[str, int] = {}
        for text in pc.cast(batch[text_col], pa.string()).to_pylist():
            for tok in set((text or "").lower().split()):
                counts[tok] = counts.get(tok, 0) + 1
        toks = list(counts)
        return pa.table(
            {
                "token": pa.array(toks, pa.string()),
                "df": pa.array([counts[t] for t in toks], pa.int64()),
                "_b": pa.array(
                    [md5_bucket(t, _NGRAM_BUCKETS) for t in toks], pa.int64()
                ),
            }
        )

    def bucket_topk(group: pd.DataFrame) -> pd.DataFrame:
        agg = group.groupby("token", as_index=False)["df"].sum()
        agg = agg.sort_values(["df", "token"], ascending=[False, True]).head(k)
        return agg[["token", "df"]]

    return (
        ds.select_columns([text_col])
        .map_batches(partials, batch_format="pyarrow")
        .groupby("_b")
        .map_groups(bucket_topk, batch_format="pandas")
        .sort(["df", "token"], descending=[True, False])
        .limit(k)
    )


def tfidf_top_terms(
    ds: ray.data.Dataset,
    k: int = 3,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> ray.data.Dataset:
    """Per-document top-k TF-IDF terms: score = tf * ln(N / df).

    Two passes: (1) corpus document-frequency table via per-batch partials
    + one groupby (vocabulary-sized); (2) the df map broadcasts via
    ray.put and every batch scores its documents locally — per-doc top-k
    never shuffles. The broadcast assumes a bounded vocabulary (true for
    natural language); a co-partitioned join on token is the swap-in when
    it is not. Ties break by token ascending; scores rounded half-even to
    6 so the SQL oracle (round_even + identical ln) matches exactly."""
    import math

    import ray as _ray
    from ray.data.aggregate import Sum

    def df_partials(batch: pa.Table) -> pa.Table:
        counts: dict[str, int] = {}
        n_docs = batch.num_rows
        for text in pc.cast(batch[text_col], pa.string()).to_pylist():
            for tok in set((text or "").lower().split()):
                counts[tok] = counts.get(tok, 0) + 1
        toks = list(counts)
        t = pa.table(
            {
                "token": pa.array(toks + ["\x00__n_docs__"], pa.string()),
                "df": pa.array(
                    [counts[t_] for t_ in toks] + [n_docs], pa.int64()
                ),
            }
        )
        return t

    df_table = (
        ds.select_columns([text_col])
        .map_batches(df_partials, batch_format="pyarrow")
        .groupby("token")
        .aggregate(Sum("df", alias_name="df"))
    )
    df_map: dict[str, int] = {}
    n_total = 0
    for batch in df_table.iter_batches(batch_format="pyarrow"):
        for tok, df in zip(batch["token"].to_pylist(), batch["df"].to_pylist()):
            if tok == "\x00__n_docs__":
                n_total = int(df)
            else:
                df_map[tok] = int(df)
    ref = _ray.put((df_map, n_total))

    class Score:
        def __init__(self, ref, k: int):
            self.df, self.n = _ray.get(ref)
            self.k = k

        def __call__(self, batch: pa.Table) -> pa.Table:
            out_id, out_tok, out_score = [], [], []
            ids = batch[id_col].to_pylist()
            for doc_id, text in zip(
                ids, pc.cast(batch[text_col], pa.string()).to_pylist()
            ):
                tf: dict[str, int] = {}
                for tok in (text or "").lower().split():
                    tf[tok] = tf.get(tok, 0) + 1
                scored = sorted(
                    (
                        (-round(c * math.log(self.n / self.df[t]), 6), t)
                        for t, c in tf.items()
                    ),
                )[: self.k]
                for neg_s, t in scored:
                    out_id.append(doc_id)
                    out_tok.append(t)
                    out_score.append(-neg_s)
            return pa.table(
                {
                    id_col: pa.array(out_id),
                    "token": pa.array(out_tok, pa.string()),
                    "tfidf": pa.array(out_score, pa.float64()),
                }
            )

    return ds.select_columns([id_col, text_col]).map_batches(
        Score,
        fn_constructor_kwargs={"ref": ref, "k": k},
        batch_format="pyarrow",
        concurrency=(1, 8),
    )
