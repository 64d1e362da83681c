"""Corpus-curation operators for training-data pipelines: PII scrubbing,
repetition scoring, corpus-wide n-gram statistics, stratified sampling.

All map stages are vectorized (Arrow RE2 kernels / pandas groupby); the one
wide op (``top_ngrams``) pre-aggregates per batch and bounds the shuffle to
(ngram, partial_count) rows with a per-bucket top-k before the global merge.
Regex transforms use RE2 via ``pyarrow.compute`` — the same engine DuckDB
uses, so the SQL oracles match byte-for-byte.
"""

from __future__ import annotations

from fractions import Fraction

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import ray.data

from pdf_parser_ray.functions.hashing import md5_64, md5_bucket
from pdf_parser_ray.functions.tables import schema_pin

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
    modal line's share. One pandas explode + groupby per batch. Rows with
    a null id drop (unattributable; the SQL oracle filters identically —
    a SQL GROUP BY would otherwise MERGE all null-id docs into one
    nonsense row)."""

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
                # pin the id type: on an empty batch pandas yields an object
                # column that Arrow infers as null-typed, breaking block concat
                id_col: pa.array(agg["doc"].tolist(), type=batch[id_col].type),
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


def _count_distinct_tokens(text: str) -> dict[str, int]:
    """Per-doc distinct-token indicator counts (the df partial)."""
    return {tok: 1 for tok in set((text or "").lower().split())}


def _exact_topk(
    ds: "ray.data.Dataset",
    count_fn,
    key_name: str,
    val_name: str,
    k: int,
    text_col: str,
) -> "ray.data.Dataset":
    """Shared corpus-wide exact-top-k machinery (top_ngrams /
    doc_frequency): per-batch dict partials via ``count_fn(text) ->
    {key: n}``, ONE groupby over hash(key) buckets — every partial of a
    key lands in one bucket, so per-bucket sums are exact totals and the
    per-bucket top-k is safe — then a global merge of buckets x k rows.
    Ties break by key ascending. Dict accumulation measured 3.7x faster
    than the pandas explode equivalent on sf0.1 (counting is C-speed and
    allocates nothing; the emitted table is per-DISTINCT-key)."""

    def partials(batch: pa.Table) -> pa.Table:
        counts: dict[str, int] = {}
        for text in pc.cast(batch[text_col], pa.string()).to_pylist():
            for key, n in count_fn(text).items():
                counts[key] = counts.get(key, 0) + n
        keys = list(counts)
        return pa.table(
            {
                key_name: pa.array(keys, pa.string()),
                val_name: pa.array([counts[g] for g in keys], pa.int64()),
                "_b": pa.array(
                    [md5_bucket(g, _NGRAM_BUCKETS) for g in keys], pa.int64()
                ),
            }
        )

    def bucket_topk(group: pd.DataFrame) -> pd.DataFrame:
        agg = group.groupby(key_name, as_index=False)[val_name].sum()
        agg = agg.sort_values([val_name, key_name], ascending=[False, True]).head(k)
        return agg[[key_name, val_name]]

    return (
        ds.select_columns([text_col])
        .map_batches(partials, batch_format="pyarrow")
        .groupby("_b")
        .map_groups(bucket_topk, batch_format="pandas")
        .map_batches(
            schema_pin(pa.schema([(key_name, pa.string()), (val_name, pa.int64())])),
            batch_format="pyarrow",
        )
        .sort([val_name, key_name], descending=[True, False])
        .limit(k)
    )


def top_ngrams(
    ds: ray.data.Dataset,
    n: int = 2,
    k: int = 20,
    text_col: str = "text",
) -> ray.data.Dataset:
    """Corpus-wide top-k word n-grams (lowercased, whitespace tokens) —
    see :func:`_exact_topk` for the scale shape."""

    def count_ngrams(text: str) -> dict[str, int]:
        toks = (text or "").lower().split()
        counts: dict[str, int] = {}
        for i in range(len(toks) - n + 1):
            g = " ".join(toks[i : i + n])
            counts[g] = counts.get(g, 0) + 1
        return counts

    return _exact_topk(ds, count_ngrams, "ngram", "n", k, text_col)


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
    the token at least once) — the df side of tf-idf; same
    :func:`_exact_topk` shape as top_ngrams."""
    return _exact_topk(ds, _count_distinct_tokens, "token", "df", k, text_col)


def tfidf_top_terms(
    ds: ray.data.Dataset,
    k: int = 3,
    text_col: str = "text",
    id_col: str = "doc_id",
    broadcast_max_vocab: int = 2_000_000,
) -> ray.data.Dataset:
    """Per-document top-k TF-IDF terms: score = tf * ln(N / df).

    Pass 1 builds the corpus document-frequency table (per-batch dict
    partials + one token groupby — vocabulary-sized, stays distributed).
    Pass 2 routes by the MEASURED vocabulary size, the same size-route
    pattern as verify_pairs_jaccard:

    - at or below ``broadcast_max_vocab`` distinct tokens the df table
      broadcasts once via ray.put and every batch scores its documents
      locally — per-doc top-k never shuffles (the natural-language case:
      vocabulary ≪ corpus);
    - above it (100 TB of web text: billions of raw whitespace tokens) the
      df table never leaves the cluster: (doc, token, tf) rows co-partition
      with (token, df) rows on hash(token) for the idf attach, then
      re-group on hash(doc) for the per-doc top-k
      (:func:`_tfidf_join_path`). Identical output by construction —
      pinned by a forced-route equality test.

    Ties break by token ascending; scores rounded half-even to 6 so the
    SQL oracle (round_even + identical ln) matches exactly."""
    import math

    import ray as _ray
    from ray.data.aggregate import Sum

    def df_partials(batch: pa.Table) -> pa.Table:
        counts: dict[str, int] = {}
        for text in pc.cast(batch[text_col], pa.string()).to_pylist():
            for tok in _count_distinct_tokens(text):
                counts[tok] = counts.get(tok, 0) + 1
        toks = list(counts)
        return pa.table(
            {
                "token": pa.array(toks, pa.string()),
                "df": pa.array([counts[t_] for t_ in toks], pa.int64()),
            }
        )

    # corpus size via its own count (a metadata-only pass for file reads);
    # an in-band sentinel token would collide with real data containing it
    n_total = ds.count()
    df_table = (
        ds.select_columns([text_col])
        .map_batches(df_partials, batch_format="pyarrow")
        .groupby("token")
        .aggregate(Sum("df", alias_name="df"))
        .materialize()  # vocab-sized; pinned once for count + either route
    )
    if df_table.count() > broadcast_max_vocab:
        return _tfidf_join_path(ds, df_table, n_total, k, text_col, id_col)

    df_map: dict[str, int] = {}
    for batch in df_table.iter_batches(batch_format="pyarrow"):
        for tok, df in zip(batch["token"].to_pylist(), batch["df"].to_pylist()):
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
                    # pin the id type: an all-empty-text batch would emit a
                    # null-typed empty column and break block concat
                    id_col: pa.array(out_id, type=batch[id_col].type),
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


_TFIDF_JOIN_BUCKETS = 64


def _tfidf_join_path(
    ds: ray.data.Dataset,
    df_table: ray.data.Dataset,
    n_total: int,
    k: int,
    text_col: str,
    id_col: str,
) -> ray.data.Dataset:
    """Unbounded-vocabulary TF-IDF: co-partitioned token join, no driver
    dict (the message-passing shape of dedup._verify_pairs_join).

    Stage 1 explodes documents to (doc, token, tf) rows and unions them
    with the (token, df) table under one schema; one groupby on
    hash(token) attaches df to every tf row — a token's rows all land in
    one bucket, so the attach is a local pandas merge. Stage 2 re-groups
    the scored rows on hash(doc) and takes each document's top-k. The
    shuffles move (id, token, two ints) rows — never texts, never a
    vocabulary-sized object to the driver.

    Scoring is byte-identical to the broadcast path: same
    round(tf * math.log(n/df), 6), same (-score, token) tie-break."""
    import math

    msg_schema = pa.schema(
        [
            ("token", pa.string()),
            ("side", pa.int8()),  # 0 = (doc, tf) row, 1 = (token, df) row
            ("doc", pa.string()),
            ("tf", pa.int64()),
            ("df", pa.int64()),
            ("_tb", pa.int64()),
        ]
    )
    try:
        id_type = ds.schema().base_schema.field(id_col).type
    except Exception:
        id_type = pa.string()

    def tf_rows(batch: pa.Table) -> pa.Table:
        docs, toks, tfs = [], [], []
        ids = pc.cast(batch[id_col], pa.string()).to_pylist()
        for doc_id, text in zip(
            ids, pc.cast(batch[text_col], pa.string()).to_pylist()
        ):
            tf: dict[str, int] = {}
            for tok in (text or "").lower().split():
                tf[tok] = tf.get(tok, 0) + 1
            docs.extend([doc_id] * len(tf))
            toks.extend(tf)
            tfs.extend(tf.values())
        return pa.table(
            {
                "token": pa.array(toks, pa.string()),
                "side": pa.array([0] * len(toks), pa.int8()),
                "doc": pa.array(docs, pa.string()),
                "tf": pa.array(tfs, pa.int64()),
                "df": pa.array([None] * len(toks), pa.int64()),
                "_tb": pa.array(
                    [md5_bucket(t_, _TFIDF_JOIN_BUCKETS) for t_ in toks],
                    pa.int64(),
                ),
            }
        ).cast(msg_schema)

    def df_rows(batch: pa.Table) -> pa.Table:
        toks = batch["token"].to_pylist()
        return pa.table(
            {
                "token": pa.array(toks, pa.string()),
                "side": pa.array([1] * len(toks), pa.int8()),
                "doc": pa.array([None] * len(toks), pa.string()),
                "tf": pa.array([None] * len(toks), pa.int64()),
                "df": pc.cast(batch["df"], pa.int64()),
                "_tb": pa.array(
                    [md5_bucket(t_, _TFIDF_JOIN_BUCKETS) for t_ in toks],
                    pa.int64(),
                ),
            }
        ).cast(msg_schema)

    def attach_df(group: pd.DataFrame) -> pd.DataFrame:
        # nullable int64 reaches pandas as float64; values are exact
        # (counts < 2^53) and non-null after the inner merge
        dfs = group[group["side"] == 1][["token", "df"]]
        tfs = group[group["side"] == 0][["doc", "token", "tf"]]
        m = tfs.merge(dfs, on="token", how="inner")
        m["tf"] = m["tf"].astype("int64")
        m["df"] = m["df"].astype("int64")
        m["_db"] = [md5_bucket(d, _TFIDF_JOIN_BUCKETS) for d in m["doc"]]
        return m[["doc", "token", "tf", "df", "_db"]]

    def doc_topk(group: pd.DataFrame) -> pd.DataFrame:
        out_doc, out_tok, out_score = [], [], []
        for doc, g in group.groupby("doc", sort=False):
            # int(c)/int(df): pandas hands back np.int64, and
            # round(np.float64, 6) uses numpy's scaled-double rounding —
            # one ULP off Python's correctly-rounded decimal round at
            # 6th-decimal boundaries, which would break route equality
            scored = sorted(
                (
                    (-round(int(c) * math.log(n_total / int(df)), 6), t_)
                    for t_, c, df in zip(g["token"], g["tf"], g["df"])
                )
            )[:k]
            for neg_s, t_ in scored:
                out_doc.append(doc)
                out_tok.append(t_)
                out_score.append(-neg_s)
        return pd.DataFrame(
            {"doc": out_doc, "token": out_tok, "tfidf": out_score}
        )

    out_schema = pa.schema(
        [(id_col, id_type), ("token", pa.string()), ("tfidf", pa.float64())]
    )

    def finalize(batch: pa.Table) -> pa.Table:
        # pandas map_groups emits schema-less empty blocks; pin + restore
        # the caller's id type (ids crossed the shuffle stringified)
        if "doc" not in batch.column_names:
            return pa.Table.from_pylist([], schema=out_schema)
        return pa.table(
            {
                id_col: pc.cast(batch["doc"], id_type),
                "token": pc.cast(batch["token"], pa.string()),
                "tfidf": pc.cast(batch["tfidf"], pa.float64()),
            }
        )

    msgs = ds.select_columns([id_col, text_col]).map_batches(
        tf_rows, batch_format="pyarrow"
    )
    dfm = df_table.map_batches(df_rows, batch_format="pyarrow")
    return (
        msgs.union(dfm)
        .groupby("_tb")
        .map_groups(attach_df, batch_format="pandas")
        .groupby("_db")
        .map_groups(doc_topk, batch_format="pandas")
        .map_batches(finalize, batch_format="pyarrow")
    )


def pack_shards(
    ds: ray.data.Dataset,
    token_budget: int = 4096,
    range_size: int = 100,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> ray.data.Dataset:
    """Assign documents to training shards by token budget: docs are taken
    in id order within fixed id RANGES (bucket = id // range_size, so
    ranges pack independently and in parallel), and a doc lands in shard
    ``prior_range_tokens // token_budget`` — budget-quantized contiguous
    packing (a shard may overflow by less than one doc, the standard
    trade). shard_id = range_bucket * 2^32 + local_shard is globally
    unique and reproducible on any cluster.

    Scale shape: one groupby over id ranges; inside a range a vectorized
    cumsum. The sequential prefix never crosses ranges, which is what
    makes the op parallel — and expressible as a windowed SUM for the
    oracle. Token count = whitespace tokens."""

    def count_tokens(batch: pa.Table) -> pa.Table:
        # rows without an id cannot be placed in an id-ordered shard — drop
        # them up front (the oracle filters identically)
        batch = batch.filter(pc.is_valid(batch[id_col]))
        ids = pc.cast(batch[id_col], pa.int64())
        return pa.table(
            {
                id_col: ids,
                "n_tokens": pc.cast(
                    pc.count_substring_regex(
                        pc.cast(batch[text_col], pa.string()), r"\S+"
                    ),
                    pa.int64(),
                ).fill_null(0),  # null text = 0 tokens, never NaN-poisoned cumsum
                "_rb": pc.divide(ids, range_size),
            }
        )

    def pack(group: pd.DataFrame) -> pd.DataFrame:
        g = group.sort_values(id_col, kind="mergesort")
        prior = g["n_tokens"].cumsum() - g["n_tokens"]
        local = (prior // token_budget).astype("int64")
        g = g.assign(shard_id=g["_rb"].astype("int64") * (1 << 32) + local)
        return g[[id_col, "n_tokens", "shard_id"]]

    return (
        ds.select_columns([id_col, text_col])
        .map_batches(count_tokens, batch_format="pyarrow")
        .groupby("_rb")
        .map_groups(pack, batch_format="pandas")
        .map_batches(
            schema_pin(
                pa.schema(
                    [
                        (id_col, pa.int64()),
                        ("n_tokens", pa.int64()),
                        ("shard_id", pa.int64()),
                    ]
                )
            ),
            batch_format="pyarrow",
        )
    )


# ---- context-window chunking ----------------------------------------------


def chunk_documents(
    ds: ray.data.Dataset,
    window: int = 256,
    stride: int = 192,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> ray.data.Dataset:
    """Split each document into overlapping token windows — the
    context-window packing step before tokenization/training.

    Chunk rule (deterministic, SQL-expressible): tokens = whitespace
    split; chunk i covers tokens [i*stride, min(i*stride + window, n));
    n_chunks = 1 for 0 < n <= window, else 1 + ceil((n - window) /
    stride) — so the final chunk always covers the tail and no chunk is
    empty. Docs with no tokens emit no rows. ``chunk_text`` re-joins
    with single spaces (the split-rejoin normalizes whitespace — the
    oracle's array_to_string does the same).

    A pure map stage: no shuffle, each batch fans out to its own chunk
    rows (flat_map shape inside one map_batches), so it streams at any
    corpus size. ``stride < window`` gives overlap; ``stride == window``
    gives disjoint chunks.
    """
    if window <= 0 or stride <= 0:
        raise ValueError("window and stride must be positive")

    def chunks(batch: pa.Table) -> pa.Table:
        ids = batch[id_col].to_pylist()
        texts = pc.cast(batch[text_col], pa.string()).to_pylist()
        out_id, out_ck, out_nt, out_tx = [], [], [], []
        for doc, t in zip(ids, texts):
            toks = (t or "").split()
            n = len(toks)
            if n == 0:
                continue
            n_chunks = 1 if n <= window else 1 + -(-(n - window) // stride)
            for i in range(n_chunks):
                lo = i * stride
                hi = min(lo + window, n)
                out_id.append(doc)
                out_ck.append(i)
                out_nt.append(hi - lo)
                out_tx.append(" ".join(toks[lo:hi]))
        return pa.table(
            {
                id_col: pa.array(out_id, type=batch[id_col].type),
                "chunk_id": pa.array(out_ck, pa.int64()),
                "n_tokens": pa.array(out_nt, pa.int64()),
                "chunk_text": pa.array(out_tx, pa.string()),
            }
        )

    return ds.select_columns([id_col, text_col]).map_batches(
        chunks, batch_format="pyarrow"
    )


_SENT_RE = r"[^.!?]+[.!?]*"


def split_sentences(
    ds: ray.data.Dataset, text_col: str = "text", id_col: str = "doc_id"
) -> ray.data.Dataset:
    """Explode each document into sentence-ish segments with ordinals —
    the unit for sentence-level dedup / filtering / alignment pipelines.

    Sentence law (deterministic, SQL-expressible): every maximal run of
    non-terminator characters plus its trailing ``[.!?]+`` run —
    ``regexp_extract_all(text, '[^.!?]+[.!?]*')``. Each sentence keeps
    its terminal punctuation and any leading whitespace (no trim: SQL
    TRIM and Python strip disagree on the whitespace set). Texts of only
    terminators or null emit no rows; docs keep their null ids (the
    chunk_documents convention). A pure map stage: each batch fans out
    to its own rows, no shuffle at any corpus size.
    """
    import re

    sent_re = re.compile(_SENT_RE)

    def sentences(batch: pa.Table) -> pa.Table:
        ids = batch[id_col].to_pylist()
        texts = pc.cast(batch[text_col], pa.string()).to_pylist()
        out_id, out_ix, out_s = [], [], []
        for doc, t in zip(ids, texts):
            for i, s in enumerate(sent_re.findall(t or "")):
                out_id.append(doc)
                out_ix.append(i + 1)
                out_s.append(s)
        return pa.table(
            {
                id_col: pa.array(out_id, type=batch[id_col].type),
                "sent_idx": pa.array(out_ix, pa.int64()),
                "sentence": pa.array(out_s, pa.string()),
            }
        )

    return ds.select_columns([id_col, text_col]).map_batches(
        sentences, batch_format="pyarrow"
    )


def normalize_text(
    ds: ray.data.Dataset, text_col: str = "text", id_col: str = "doc_id"
) -> ray.data.Dataset:
    """Canonical text normalization: lowercase, collapse every whitespace
    run to one space, strip the ends. Three RE2/utf8 Arrow kernels per
    batch — byte-identical to the DuckDB regexp_replace oracle (both
    engines are RE2; trim is done by regex, NOT TRIM(), because SQL TRIM
    strips only ASCII spaces while the collapse step has already turned
    all whitespace into spaces). Null text stays null.
    """

    def norm(batch: pa.Table) -> pa.Table:
        text = pc.cast(batch[text_col], pa.string())
        low = pc.utf8_lower(text)
        collapsed = pc.replace_substring_regex(low, r"\s+", " ")
        stripped = pc.replace_substring_regex(collapsed, r"^ | $", "")
        return pa.table(
            {
                id_col: batch[id_col],
                "norm_text": stripped,
                "n_chars": pc.cast(pc.utf8_length(stripped), pa.int64()),
            }
        )

    return ds.map_batches(norm, batch_format="pyarrow")


# ---- unigram-LM surprisal scoring ------------------------------------------


def lm_surprisal(
    ds: ray.data.Dataset,
    text_col: str = "text",
    id_col: str = "doc_id",
    broadcast_max_vocab: int = 2_000_000,
) -> ray.data.Dataset:
    """Per-document unigram language-model surprisal — the "how surprising
    is this doc under the corpus itself" quality signal (the cheap stand-in
    for perplexity filtering a la CCNet).

    Surprisal is INTEGER-quantized: for corpus token count c and corpus
    size N, ``surprisal(t) = bit_length(N // c)`` — floor-log2 of the
    inverse frequency computed in pure integer arithmetic, so every
    aggregate (per-doc totals, either route) is exact on any engine and
    any summation order; only the final per-doc mean touches floats, and
    it goes through printf-style decimal rounding. A float ``ln``-based
    score would hang the hash gate on engine ULP differences.

    Two passes, the tf-idf shape: pass 1 counts corpus token occurrences
    (per-batch dict partials + one vocabulary-sized token groupby); pass
    2 routes by measured vocabulary size — at or below
    ``broadcast_max_vocab`` the count table broadcasts via ray.put and
    docs score locally; above it (unbounded web vocab) the counts never
    leave the cluster: (doc, token, tf) rows co-partition with
    (token, c) rows on hash(token), then ONE integer-sum groupby per doc
    (:func:`_lm_surprisal_join_path`). Identical output by construction —
    pinned by a forced-route equality test. Docs with no tokens emit no
    row (the chunk_documents convention).

    Output: (id, n_tokens, total_surprisal, mean_surprisal).
    """
    import ray as _ray
    from ray.data.aggregate import Sum

    def tf_partials(batch: pa.Table) -> pa.Table:
        counts: dict[str, int] = {}
        for text in pc.cast(batch[text_col], pa.string()).to_pylist():
            for tok in (text or "").lower().split():
                counts[tok] = counts.get(tok, 0) + 1
        toks = list(counts)
        return pa.table(
            {
                "token": pa.array(toks, pa.string()),
                "c": pa.array([counts[t_] for t_ in toks], pa.int64()),
            }
        )

    cnt_table = (
        ds.select_columns([text_col])
        .map_batches(tf_partials, batch_format="pyarrow")
        .groupby("token")
        .aggregate(Sum("c", alias_name="c"))
        .materialize()  # vocab-sized; pinned once for N + count + either route
    )
    n_total = int(cnt_table.sum("c") or 0)
    try:
        id_type = ds.schema().base_schema.field(id_col).type
    except Exception:
        id_type = pa.int64()
    out_schema = pa.schema(
        [
            (id_col, id_type),
            ("n_tokens", pa.int64()),
            ("total_surprisal", pa.int64()),
            ("mean_surprisal", pa.float64()),
        ]
    )
    if n_total == 0:
        return ray.data.from_arrow(pa.Table.from_pylist([], schema=out_schema))
    if cnt_table.count() > broadcast_max_vocab:
        return _lm_surprisal_join_path(
            ds, cnt_table, n_total, text_col, id_col, out_schema
        )

    surp: dict[str, int] = {}
    for batch in cnt_table.iter_batches(batch_format="pyarrow"):
        for tok, c in zip(batch["token"].to_pylist(), batch["c"].to_pylist()):
            surp[tok] = (n_total // int(c)).bit_length()
    ref = _ray.put(surp)

    class Score:
        def __init__(self, ref):
            self.surp = _ray.get(ref)

        def __call__(self, batch: pa.Table) -> pa.Table:
            out_id, out_n, out_t, out_m = [], [], [], []
            for doc_id, text in zip(
                batch[id_col].to_pylist(),
                pc.cast(batch[text_col], pa.string()).to_pylist(),
            ):
                # tokens absent from the vocab pass (possible only when a
                # nondeterministic upstream re-executes differently between
                # the two passes) are SKIPPED — the same answer the join
                # route's inner merge gives, so route equality holds even
                # off the deterministic-input happy path
                scores = [
                    s
                    for s in (
                        self.surp.get(t_)
                        for t_ in (text or "").lower().split()
                    )
                    if s is not None
                ]
                if not scores:
                    continue
                total = sum(scores)
                out_id.append(doc_id)
                out_n.append(len(scores))
                out_t.append(total)
                out_m.append(float(f"{total / len(scores):.6f}"))
            return pa.table(
                {
                    id_col: pa.array(out_id, type=batch[id_col].type),
                    "n_tokens": pa.array(out_n, pa.int64()),
                    "total_surprisal": pa.array(out_t, pa.int64()),
                    "mean_surprisal": pa.array(out_m, pa.float64()),
                }
            )

    return ds.select_columns([id_col, text_col]).map_batches(
        Score,
        fn_constructor_kwargs={"ref": ref},
        batch_format="pyarrow",
        concurrency=(1, 8),
    )


def _lm_surprisal_join_path(
    ds: ray.data.Dataset,
    cnt_table: ray.data.Dataset,
    n_total: int,
    text_col: str,
    id_col: str,
    out_schema: pa.Schema,
) -> ray.data.Dataset:
    """Unbounded-vocabulary surprisal: co-partitioned token join (the
    _tfidf_join_path message-passing shape), then per-doc INTEGER sums via
    a plain Ray groupby — exact under any partitioning, so route equality
    with the broadcast path is by construction."""
    from ray.data.aggregate import Sum

    id_type = out_schema.field(id_col).type
    msg_schema = pa.schema(
        [
            ("token", pa.string()),
            ("side", pa.int8()),  # 0 = (doc, tf) row, 1 = (token, c) row
            ("doc", pa.string()),
            ("tf", pa.int64()),
            ("c", pa.int64()),
            ("_tb", pa.int64()),
        ]
    )

    def tf_rows(batch: pa.Table) -> pa.Table:
        docs, toks, tfs = [], [], []
        ids = pc.cast(batch[id_col], pa.string()).to_pylist()
        for doc_id, text in zip(
            ids, pc.cast(batch[text_col], pa.string()).to_pylist()
        ):
            tf: dict[str, int] = {}
            for tok in (text or "").lower().split():
                tf[tok] = tf.get(tok, 0) + 1
            docs.extend([doc_id] * len(tf))
            toks.extend(tf)
            tfs.extend(tf.values())
        return pa.table(
            {
                "token": pa.array(toks, pa.string()),
                "side": pa.array([0] * len(toks), pa.int8()),
                "doc": pa.array(docs, pa.string()),
                "tf": pa.array(tfs, pa.int64()),
                "c": pa.array([None] * len(toks), pa.int64()),
                "_tb": pa.array(
                    [md5_bucket(t_, _TFIDF_JOIN_BUCKETS) for t_ in toks],
                    pa.int64(),
                ),
            }
        ).cast(msg_schema)

    def c_rows(batch: pa.Table) -> pa.Table:
        toks = batch["token"].to_pylist()
        return pa.table(
            {
                "token": pa.array(toks, pa.string()),
                "side": pa.array([1] * len(toks), pa.int8()),
                "doc": pa.array([None] * len(toks), pa.string()),
                "tf": pa.array([None] * len(toks), pa.int64()),
                "c": pc.cast(batch["c"], pa.int64()),
                "_tb": pa.array(
                    [md5_bucket(t_, _TFIDF_JOIN_BUCKETS) for t_ in toks],
                    pa.int64(),
                ),
            }
        ).cast(msg_schema)

    def attach(group: pd.DataFrame) -> pd.DataFrame:
        cs = group[group["side"] == 1][["token", "c"]]
        tfs = group[group["side"] == 0][["doc", "token", "tf"]]
        m = tfs.merge(cs, on="token", how="inner")
        # nullable int64 reaches pandas as float64; counts < 2^53 so the
        # int round-trip is exact
        tf_i = m["tf"].astype("int64")
        s = [(n_total // int(c)).bit_length() for c in m["c"]]
        return pd.DataFrame(
            {
                "doc": m["doc"],
                "nt": tf_i,
                "ts": tf_i.to_numpy() * np.asarray(s, dtype=np.int64),
            }
        )

    attach_schema = pa.schema(
        [("doc", pa.string()), ("nt", pa.int64()), ("ts", pa.int64())]
    )

    def finalize(batch: pa.Table) -> pa.Table:
        if "doc" not in batch.column_names or batch.num_rows == 0:
            return pa.Table.from_pylist([], schema=out_schema)
        nt = batch["nt"].to_pylist()
        ts = batch["ts"].to_pylist()
        return pa.table(
            {
                id_col: pc.cast(batch["doc"], id_type),
                "n_tokens": pa.array([int(x) for x in nt], pa.int64()),
                "total_surprisal": pa.array([int(x) for x in ts], pa.int64()),
                "mean_surprisal": pa.array(
                    [float(f"{int(t) / int(n):.6f}") for t, n in zip(ts, nt)],
                    pa.float64(),
                ),
            }
        )

    msgs = ds.select_columns([id_col, text_col]).map_batches(
        tf_rows, batch_format="pyarrow"
    )
    cm = cnt_table.map_batches(c_rows, batch_format="pyarrow")
    return (
        msgs.union(cm)
        .groupby("_tb")
        .map_groups(attach, batch_format="pandas")
        # pin to Arrow: pandas map_groups emits schema-less empty blocks
        # that break the following groupby
        .map_batches(schema_pin(attach_schema), batch_format="pyarrow")
        .groupby("doc")
        .aggregate(Sum("nt", alias_name="nt"), Sum("ts", alias_name="ts"))
        .map_batches(finalize, batch_format="pyarrow")
    )


# ---- deterministic train/val/test split ------------------------------------


_SPLIT_BUCKETS = 10_000


def _split_cutoffs(fractions: "dict[str, float]") -> "tuple[list[str], list[int]]":
    """Exact-decimal cumulative bucket cutoffs (Fraction(str(f)) reads the
    decimal the caller wrote: 0.07 + 0.58 -> 65/100 -> 6500, never 6499).
    The single definition behind assign_splits, curate_corpus AND the
    curate CLI — validation lives here so NO entry point can silently
    misallocate on fractions that don't sum to 1 (the force-closed last
    cutoff would otherwise mask it)."""
    total = sum(fractions.values())
    if not 0.999 <= total <= 1.001:
        raise ValueError(f"fractions must sum to 1, got {total}")
    names = list(fractions)
    cutoffs: list[int] = []
    cum = Fraction(0)
    for name_ in names:
        cum += Fraction(str(fractions[name_]))
        cutoffs.append(int(cum * _SPLIT_BUCKETS))
    cutoffs[-1] = _SPLIT_BUCKETS  # rounding slack never orphans a bucket
    return names, cutoffs


def _split_of(bucket: int, names: "list[str]", cutoffs: "list[int]") -> str:
    """bucket -> split name: the first cutoff strictly above the bucket
    (the SQL CASE WHEN bucket < cut chain). Separated from the hashing so
    the boundary law is directly testable."""
    for name_, cut in zip(names, cutoffs):
        if bucket < cut:
            return name_
    return names[-1]  # unreachable: cutoffs[-1] == _SPLIT_BUCKETS


def _bucket_and_split(
    ids, names: "list[str]", cutoffs: "list[int]", salt: str
) -> "tuple[list, list]":
    """Per-id (bucket, split) under the md5 hash; null id -> (NULL bucket,
    last split) — the SQL CASE-ELSE answer."""
    buckets, splits = [], []
    for i in ids:
        if i is None:
            buckets.append(None)
            splits.append(names[-1])
            continue
        b = md5_bucket(f"{salt}:{i}", _SPLIT_BUCKETS)
        buckets.append(b)
        splits.append(_split_of(b, names, cutoffs))
    return buckets, splits


def assign_splits(
    ds: ray.data.Dataset,
    fractions: "dict[str, float] | None" = None,
    id_col: str = "doc_id",
    salt: str = "split",
) -> ray.data.Dataset:
    """Deterministic train/val/test assignment by content hash of the id —
    the standard shuffle-free split for training corpora: stable under
    re-partitioning, resumable re-runs, and corpus growth (a doc's split
    never changes when other docs are added or the job is re-sharded).

    Each row hashes ``salt + ":" + str(id)`` (md5_64) into one of 10,000
    buckets; cumulative fraction cutoffs (exact decimal arithmetic via
    Fraction — float accumulation would misplace boundary buckets, e.g.
    0.07+0.58 -> 0.6499…, cutoff 6499 not 6500) map buckets to split
    names in insertion order of ``fractions``. Rows with a null id get a
    NULL bucket and land in the LAST split — the same answer SQL gives
    (NULL hash -> every ``bucket < cut`` comparison is NULL -> CASE falls
    through to the ELSE arm), keeping the oracle audit exact.

    Pure map — no shuffle, no state; the exact bucket expression is
    reproducible in SQL (see the `assign_splits` oracle), which is the
    point: a split defined by an engine-portable hash can be audited by
    any other engine touching the corpus.

    Output: input row id + (bucket, split).
    """
    fractions = fractions or {"train": 0.8, "val": 0.1, "test": 0.1}
    names, cutoffs = _split_cutoffs(fractions)

    def assign(batch: pa.Table) -> pa.Table:
        buckets, splits = _bucket_and_split(
            batch[id_col].to_pylist(), names, cutoffs, salt
        )
        return pa.table(
            {
                id_col: batch[id_col],
                "bucket": pa.array(buckets, pa.int64()),
                "split": pa.array(splits, pa.string()),
            }
        )

    return ds.select_columns([id_col]).map_batches(assign, batch_format="pyarrow")


# ---- end-to-end corpus curation ---------------------------------------------


_CURATE_BUCKETS = 256


def curate_corpus(
    ds: ray.data.Dataset,
    text_col: str = "text",
    id_col: str = "doc_id",
    lang_col: str = "lang",
    min_stop_hits: int = 1,
    fractions: "dict[str, float] | None" = None,
    salt: str = "split",
) -> ray.data.Dataset:
    """The end-to-end training-data curation pipeline, composed from the
    op families this package provides — the shape a real 100-TB corpus
    run takes:

    1. **quality gate** — Gopher rules (Rae et al. 2021 §A1.1) as one
       vectorized map (:func:`~pdf_parser_ray.ops.text_analysis.
       gopher_rules` with the text/lang columns passed through), then a
       zero-copy Arrow filter on ``keep``. Map-only: no shuffle.
    2. **exact dedup** — keep the min-id row per distinct surviving text:
       md5-bucketed groupby, rows compared on the REAL text inside each
       coarse bucket (collision-safe, the exact_dedup convention). The
       ONLY shuffle, over the post-filter corpus.
    3. **split assignment** — the engine-portable md5 bucket hash of
       :func:`assign_splits`, inlined so the kept row's attribute columns
       ride along. Map-only.

    Output: (id, lang, n_words, bucket, split) for every kept document.

    Every stage is individually hash-verified against its own SQL oracle
    (`gopher_rules`, `exact_dedup`, `assign_splits`); this composite has
    its own end-to-end oracle — filter + window-dedup + hash CASE in one
    query — so the COMPOSITION is gate-checked too, not just the parts.
    """
    from pdf_parser_ray.ops.text_analysis import gopher_rules

    fractions = fractions or {"train": 0.8, "val": 0.1, "test": 0.1}
    names, cutoffs = _split_cutoffs(fractions)

    flagged = gopher_rules(
        ds, text_col=text_col, min_stop_hits=min_stop_hits,
        passthrough=(text_col, lang_col),
    )

    def keep_filter(batch: pa.Table) -> pa.Table:
        t = batch.filter(pc.fill_null(batch["keep"], False))
        texts = pc.cast(t[text_col], pa.string()).to_pylist()
        return pa.table(
            {
                id_col: t[id_col],
                lang_col: t[lang_col],
                "n_words": t["n_words"],
                text_col: t[text_col],
                "_b": pa.array(
                    [md5_64(x) % _CURATE_BUCKETS for x in texts], pa.int64()
                ),
            }
        )

    def first_per_text(group: pa.Table) -> pa.Table:
        # min id per distinct text (SQL ROW_NUMBER ... ORDER BY id, NULLS
        # LAST); compare on the real text, not its hash. Stays in Arrow —
        # a pandas round-trip would float int64 ids when the group holds
        # a null id (precision loss above 2^53) and breaks string ids.
        idx = pc.sort_indices(
            group,
            sort_keys=[(id_col, "ascending")],
            null_placement="at_end",
        )
        g = group.take(idx)
        texts = pd.Series(g[text_col].to_pylist(), dtype=object)
        keep = ~texts.duplicated(keep="first")
        return g.select([id_col, lang_col, "n_words"]).filter(
            pa.array(keep.to_numpy(), pa.bool_())
        )

    # derive the id field type from the input (string doc_ids are first-
    # class here, like exact_dedup / assign_splits)
    try:
        id_type = ds.schema().base_schema.field(id_col).type
    except Exception:
        id_type = pa.int64()
    deduped_schema = pa.schema(
        [(id_col, id_type), (lang_col, pa.string()), ("n_words", pa.int64())]
    )

    def split_assign(batch: pa.Table) -> pa.Table:
        buckets, splits = _bucket_and_split(
            batch[id_col].to_pylist(), names, cutoffs, salt
        )
        return pa.table(
            {
                id_col: batch[id_col],
                lang_col: batch[lang_col],
                "n_words": pc.cast(batch["n_words"], pa.int64()),
                "bucket": pa.array(buckets, pa.int64()),
                "split": pa.array(splits, pa.string()),
            }
        )

    return (
        flagged.map_batches(keep_filter, batch_format="pyarrow")
        .groupby("_b")
        .map_groups(first_per_text, batch_format="pyarrow")
        .map_batches(schema_pin(deduped_schema), batch_format="pyarrow")
        .map_batches(split_assign, batch_format="pyarrow")
    )


# ---- data mixing: per-source token rebalancing ------------------------------


_MIX_BUCKETS = 1_000_000


def rebalance_sources(
    ds: ray.data.Dataset,
    targets: "dict[str, float] | None" = None,
    default_share: float = 0.03,
    source_col: str = "source",
    text_col: str = "text",
    id_col: str = "doc_id",
    salt: str = "mix",
) -> ray.data.Dataset:
    """Domain-weight rebalancing (the DoReMi/data-mixing step): downsample
    each source so it contributes at most its target share of the ORIGINAL
    corpus token count, by deterministic per-doc hash — no shuffle of the
    corpus, stable under re-partitioning and resume.

    Two passes:

    1. **stats** — per-source token totals: per-batch Arrow-kernel token
       counts pre-aggregate to (source, tokens) partials, one
       sources-sized groupby. The result broadcasts as a plain dict (a
       corpus has dozens of sources, not millions).
    2. **filter** — keep a doc when ``md5_bucket(salt:id, 1e6) <
       thresh[source]`` with ``thresh = min(1e6, ppm * total_tokens //
       source_tokens)`` — ALL integer arithmetic (ppm = the target share
       scaled to parts-per-million through exact Fraction math), so the
       SQL oracle recomputes identical thresholds from the same table
       with no float anywhere. A source with zero tokens keeps
       everything (nothing to downsample).

    ``targets`` maps source -> share for specific sources;
    ``default_share`` covers the rest (and a null source). Expected kept
    tokens per source ~= min(source_tokens, share * total_tokens);
    sampling is per-doc, so the realized share fluctuates by the doc-size
    distribution — the standard trade for a one-pass deterministic mix.

    Output: (id, source, n_tokens) for kept docs.
    """
    import ray as _ray
    from ray.data.aggregate import Sum

    targets = targets or {}

    def tok_partials(batch: pa.Table) -> pa.Table:
        text = pc.fill_null(pc.cast(batch[text_col], pa.string()), "")
        ntok = pc.cast(pc.count_substring_regex(text, r"\S+"), pa.int64())
        part = (
            pa.table({"source": batch[source_col], "ntok": ntok})
            .group_by("source")
            .aggregate([("ntok", "sum")])
        )
        # prefix-encode the shuffle key: Ray 2.49's groupby sort crashes
        # on a null string key ('<' between None and str), and an in-band
        # sentinel could collide with a real source name — a one-byte
        # prefix ("\x01" + name / "\x00" for null) cannot
        keys = [
            "\x01" + v if v is not None else "\x00"
            for v in part["source"].to_pylist()
        ]
        return pa.table(
            {
                "skey": pa.array(keys, pa.string()),
                "ntok": pc.cast(part["ntok_sum"], pa.int64()),
            }
        )

    stats = (
        ds.select_columns([source_col, text_col])
        .map_batches(tok_partials, batch_format="pyarrow")
        .groupby("skey")
        .aggregate(Sum("ntok", alias_name="ntok"))
        .take_all()  # sources-sized: dozens of rows
    )
    total = sum(int(r["ntok"] or 0) for r in stats)
    thresh: dict = {}
    for r in stats:
        src = r["skey"][1:] if r["skey"].startswith("\x01") else None
        st = int(r["ntok"] or 0)
        share = targets.get(src, default_share) if src is not None else default_share
        ppm = int(Fraction(str(share)) * _MIX_BUCKETS)
        thresh[src] = (
            _MIX_BUCKETS if st == 0 else min(_MIX_BUCKETS, (ppm * total) // st)
        )
    ref = _ray.put(thresh)

    class Keep:
        def __init__(self, ref):
            self.thresh = _ray.get(ref)

        def __call__(self, batch: pa.Table) -> pa.Table:
            text = pc.fill_null(pc.cast(batch[text_col], pa.string()), "")
            ntok = pc.cast(pc.count_substring_regex(text, r"\S+"), pa.int64())
            ids = batch[id_col].to_pylist()
            srcs = batch[source_col].to_pylist()
            mask = pa.array(
                [
                    i is not None
                    and md5_bucket(f"{salt}:{i}", _MIX_BUCKETS)
                    < self.thresh.get(s, _MIX_BUCKETS)
                    for i, s in zip(ids, srcs)
                ],
                pa.bool_(),
            )
            return pa.table(
                {
                    id_col: batch[id_col],
                    source_col: batch[source_col],
                    "n_tokens": ntok,
                }
            ).filter(mask)

    return ds.select_columns([id_col, source_col, text_col]).map_batches(
        Keep,
        fn_constructor_kwargs={"ref": ref},
        batch_format="pyarrow",
        concurrency=(1, 8),
    )


# ---- perplexity-style filtering: keep the least-surprising fraction ---------


def surprisal_filter(
    ds: ray.data.Dataset,
    keep_frac: float = 0.9,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> ray.data.Dataset:
    """CCNet-style perplexity filtering, composed from this package's own
    primitives: score every doc with :func:`lm_surprisal` (integer-
    quantized unigram surprisal), rank corpus-wide with
    :func:`~pdf_parser_ray.ops.relational.global_rank` (distributed
    ROW_NUMBER: ascending mean_surprisal, id tie-break), keep the
    lowest-surprisal ``keep_frac`` of docs — rank <= floor(keep_frac * N)
    with the cutoff in exact Fraction arithmetic.

    The scored table (one row per doc — the reduction lm_surprisal
    already produces) is materialized once: global_rank walks its input
    three times (min/max, bucket counts, rank), and re-walking would
    re-run the two-pass scorer each time.

    Output: (id, mean_surprisal, rank) for kept docs.
    """
    from pdf_parser_ray.ops.relational import global_rank

    scored = lm_surprisal(ds, text_col=text_col, id_col=id_col).materialize()
    n = scored.count()
    cutoff = int(Fraction(str(keep_frac)) * n)
    ranked = global_rank(
        scored.select_columns([id_col, "mean_surprisal"]),
        "mean_surprisal",
        id_col=id_col,
        descending=False,
    )

    def cut(batch: pa.Table) -> pa.Table:
        t = batch.select([id_col, "mean_surprisal", "rank"])
        return t.filter(pc.less_equal(batch["rank"], cutoff))

    return ranked.map_batches(cut, batch_format="pyarrow")


def pmi_top_pairs(
    ds: ray.data.Dataset,
    k: int = 20,
    min_count: int = 5,
    text_col: str = "text",
) -> ray.data.Dataset:
    """Top-k adjacent-token collocations by pointwise mutual information —
    the vocabulary-curation op that surfaces multiword units ("new york",
    "machine learning") worth single tokens.

    PMI law (shared verbatim with the SQL oracle):
    ``round_even(ln((c_ab / B) / ((c_a / T) * (c_b / T))), 6)`` over
    DOUBLEs from exact int64 counts — c_ab = corpus count of the adjacent
    pair (within-document only, the \\S+ lower() tokenization), c_a/c_b =
    unigram counts, T/B = total token/bigram counts. Ties at the k-cut
    break (pmi desc, w1 asc, w2 asc) on the ROUNDED pmi.

    Scale shape: per-batch partial count dicts (bounded by the batch's
    vocabulary) -> ONE groupby(key) Sum — the only corpus-sized shuffle;
    pairs below ``min_count`` drop before the attach stages, and the two
    c_a/c_b attaches are co-partitioned unions on hash(word) (the
    _tfidf_join_path shape) — no vocabulary-sized driver dict at any
    corpus size. Null text tokenizes empty.
    """
    from ray.data.aggregate import Sum

    def partials(batch: pa.Table) -> pa.Table:
        uni: dict[str, int] = {}
        big: dict[str, int] = {}
        for text in pc.cast(batch[text_col], pa.string()).to_pylist():
            toks = (text or "").lower().split()
            for t in toks:
                uni[t] = uni.get(t, 0) + 1
            for a, b in zip(toks, toks[1:]):
                key = f"{a} {b}"  # tokens are \S+: ' ' can never collide
                big[key] = big.get(key, 0) + 1
        keys = [f"u {w}" for w in uni] + [f"b {g}" for g in big]
        counts = list(uni.values()) + list(big.values())
        return pa.table(
            {
                "key": pa.array(keys, pa.string()),
                "c": pa.array(counts, pa.int64()),
            }
        )

    counts = (
        ds.select_columns([text_col])
        .map_batches(partials, batch_format="pyarrow")
        .groupby("key")
        .aggregate(Sum("c", alias_name="c"))
        .materialize()  # totals + two attach stages read it; count once
    )

    def _side_total(prefix: str) -> int:
        agg = (
            counts.map_batches(
                lambda t, _p=prefix: pa.table(
                    {
                        "c": t.filter(
                            pc.starts_with(t["key"], pattern=_p)
                        )["c"]
                    }
                ),
                batch_format="pyarrow",
            )
            .aggregate(Sum("c", alias_name="c"))
        )
        return int(agg.get("c") or 0)

    t_total = _side_total("u ")
    b_total = _side_total("b ")
    if b_total == 0:
        return ray.data.from_arrow(
            pa.table(
                {
                    "w1": pa.array([], pa.string()),
                    "w2": pa.array([], pa.string()),
                    "c_pair": pa.array([], pa.int64()),
                    "pmi": pa.array([], pa.float64()),
                }
            )
        )

    msg_schema = pa.schema(
        [
            ("w", pa.string()),       # the attach word this row is keyed on
            ("side", pa.int8()),      # 0 = bigram row, 1 = unigram count row
            ("w1", pa.string()),
            ("w2", pa.string()),
            ("c_pair", pa.int64()),
            ("c_a", pa.int64()),
            ("c_b", pa.int64()),
            ("uc", pa.int64()),
            ("_b", pa.int64()),
        ]
    )
    pin = schema_pin(msg_schema)

    def split_rows(batch: pa.Table) -> pa.Table:
        keys = batch["key"].to_pylist()
        cs = batch["c"].to_pylist()
        w, side, w1s, w2s, cp, ca, cb, uc, bk = [], [], [], [], [], [], [], [], []
        for key, c in zip(keys, cs):
            kind, _, rest = key.partition(" ")
            if kind == "u":
                w.append(rest)
                side.append(1)
                w1s.append(None)
                w2s.append(None)
                cp.append(None)
                ca.append(None)
                cb.append(None)
                uc.append(c)
            else:
                a, _, b = rest.partition(" ")
                if c < min_count:
                    continue  # drop before any attach work
                w.append(a)  # stage 1 keys on w1
                side.append(0)
                w1s.append(a)
                w2s.append(b)
                cp.append(c)
                ca.append(None)
                cb.append(None)
                uc.append(None)
            bk.append(md5_bucket(w[-1], _TFIDF_JOIN_BUCKETS))
        return pa.table(
            {
                "w": pa.array(w, pa.string()),
                "side": pa.array(side, pa.int8()),
                "w1": pa.array(w1s, pa.string()),
                "w2": pa.array(w2s, pa.string()),
                "c_pair": pa.array(cp, pa.int64()),
                "c_a": pa.array(ca, pa.int64()),
                "c_b": pa.array(cb, pa.int64()),
                "uc": pa.array(uc, pa.int64()),
                "_b": pa.array(bk, pa.int64()),
            }
        ).cast(msg_schema)

    def attach(col: str, rekey):
        """Per-bucket: map unigram rows' counts onto bigram rows' ``col``,
        then re-key for the next stage (dict lookup, not merge: int64
        counts must never float through unmatched-row NaNs)."""

        def fn(group: pa.Table) -> pa.Table:
            bgr = group.filter(pc.equal(group["side"], pa.scalar(0, pa.int8())))
            uni = group.filter(pc.equal(group["side"], pa.scalar(1, pa.int8())))
            lut = dict(
                zip(uni["w"].to_pylist(), uni["uc"].to_pylist())
            )
            ws = bgr["w"].to_pylist()
            vals = pa.array([lut.get(x) for x in ws], pa.int64())
            bgr = bgr.set_column(bgr.schema.get_field_index(col), col, vals)
            new_key = bgr[rekey].to_pylist()
            bgr = bgr.set_column(
                bgr.schema.get_field_index("w"), "w",
                pa.array(new_key, pa.string()),
            )
            return bgr.set_column(
                bgr.schema.get_field_index("_b"), "_b",
                pa.array(
                    [md5_bucket(x, _TFIDF_JOIN_BUCKETS) for x in new_key],
                    pa.int64(),
                ),
            )

        return fn

    rows = (
        counts.map_batches(split_rows, batch_format="pyarrow")
        .map_batches(pin, batch_format="pyarrow")
        # three consumers (uni twice, big once): without this pin the
        # vocabulary-sized split_rows Python loop re-runs per consumer
        .materialize()
    )

    def _side_filter(side: int):
        def fn(batch: pa.Table) -> pa.Table:
            return batch.filter(
                pc.equal(batch["side"], pa.scalar(side, pa.int8()))
            )

        return fn

    uni_rows = rows.map_batches(_side_filter(1), batch_format="pyarrow").map_batches(
        pin, batch_format="pyarrow"
    )
    big_rows = rows.map_batches(_side_filter(0), batch_format="pyarrow").map_batches(
        pin, batch_format="pyarrow"
    )
    # stage 1: attach c_a on hash(w1); stage 2: attach c_b on hash(w2).
    # unigram rows re-enter the second union unchanged (their w is the
    # unigram word, which is exactly the key stage 2 groups on).
    stage1 = (
        big_rows.union(uni_rows)
        .groupby("_b")
        .map_groups(attach("c_a", "w2"), batch_format="pyarrow")
        .map_batches(pin, batch_format="pyarrow")
    )
    stage2 = (
        stage1.union(uni_rows)
        .groupby("_b")
        .map_groups(attach("c_b", "w1"), batch_format="pyarrow")
        .map_batches(pin, batch_format="pyarrow")
    )

    def score(batch: pa.Table) -> pa.Table:
        c_ab = batch["c_pair"].to_numpy(zero_copy_only=False).astype(np.float64)
        c_a = batch["c_a"].to_numpy(zero_copy_only=False).astype(np.float64)
        c_b = batch["c_b"].to_numpy(zero_copy_only=False).astype(np.float64)
        pmi = np.round(
            np.log((c_ab / b_total) / ((c_a / t_total) * (c_b / t_total))), 6
        )
        out = pa.table(
            {
                "w1": batch["w1"],
                "w2": batch["w2"],
                "c_pair": batch["c_pair"],
                "pmi": pa.array(pmi, pa.float64()),
            }
        )
        if out.num_rows > k:  # local pre-trim, the bm25 top-k shape
            order = pc.sort_indices(
                out,
                sort_keys=[
                    ("pmi", "descending"),
                    ("w1", "ascending"),
                    ("w2", "ascending"),
                ],
            )
            out = out.take(order[:k])
        return out

    return (
        stage2.map_batches(score, batch_format="pyarrow")
        .sort(["pmi", "w1", "w2"], descending=[True, False, False])
        .limit(k)
    )


def pmi_sql(
    k: int = 20,
    min_count: int = 5,
    table: str = "documents",
    text_col: str = "text",
) -> str:
    """The DuckDB oracle for :func:`pmi_top_pairs` — same tokenization,
    same PMI expression tree, same rounded tie-break."""
    return (
        f"WITH toks AS (SELECT regexp_extract_all(lower(COALESCE({text_col}, "
        f"'')), '\\S+') AS l FROM {table}), "
        "uni AS (SELECT unnest(l) AS w FROM toks), "
        "ucnt AS (SELECT w, CAST(COUNT(*) AS BIGINT) AS c FROM uni GROUP BY w), "
        "tot AS (SELECT CAST(SUM(c) AS BIGINT) AS t FROM ucnt), "
        "bg AS (SELECT unnest(list_transform(range(1, len(l)), "
        "p -> l[p] || ' ' || l[p + 1])) AS g FROM toks), "
        "bcnt AS (SELECT split_part(g, ' ', 1) AS w1, split_part(g, ' ', 2) "
        "AS w2, CAST(COUNT(*) AS BIGINT) AS c_pair FROM bg GROUP BY g"
        f" HAVING COUNT(*) >= {min_count}), "
        "btot AS (SELECT CAST(SUM(c_pair) AS BIGINT) AS b FROM ("
        "  SELECT COUNT(*) AS c_pair FROM bg GROUP BY g)) "
        "SELECT bc.w1, bc.w2, bc.c_pair, "
        "round_even(ln((CAST(bc.c_pair AS DOUBLE) / btot.b) / "
        "((CAST(ua.c AS DOUBLE) / tot.t) * (CAST(ub.c AS DOUBLE) / tot.t)))"
        ", 6) AS pmi "
        "FROM bcnt bc JOIN ucnt ua ON ua.w = bc.w1 "
        "JOIN ucnt ub ON ub.w = bc.w2, tot, btot "
        f"ORDER BY pmi DESC, bc.w1, bc.w2 LIMIT {k}"
    )
