"""Text-analysis operators over a documents table (doc_id, text, ...).

Everything is a vectorized ``map_batches`` transform: Arrow compute kernels
(``count_substring_regex``, ``utf8_length``) where they exist, numpy where
they don't. No per-row Python in the counting paths; the language-ID and
fingerprint stages use compiled regex + token sets per batch (still the
C-speed path of re/str).
"""

from __future__ import annotations

import re

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import ray.data

_TOKEN_RE = r"\S+"
_WORD_RE = re.compile(r"[a-z']+")

# tiny per-language stopword banks for the n-gram/stopword heuristic
_LANG_STOPWORDS: dict[str, frozenset[str]] = {
    "en": frozenset("the and of to a in is it you that was for on are with as".split()),
    "es": frozenset("el la de que y a en un ser se no haber por con su".split()),
    "fr": frozenset("le la de et les des en un du une que est pour qui dans".split()),
    "de": frozenset("der die und in den von zu das mit sich des auf ist nicht".split()),
}


# GPT2-style pre-tokenizer shape: contraction suffixes, letter runs, digit
# runs, punctuation runs (RE2 \p classes — identical semantics in Arrow's
# count_substring_regex and DuckDB's regexp_extract_all, so SQL-oracle-able)
_BPE_TOKEN_RE = r"'(?:s|d|m|t|ll|ve|re)| ?\p{L}+| ?\p{N}+| ?[^\s\p{L}\p{N}]+"


def doc_stats(ds: ray.data.Dataset, text_col: str = "text") -> ray.data.Dataset:
    """Per-doc counting stats: chars, lines, whitespace tokens, alpha chars,
    BPE-ish subword-boundary tokens.

    All five counters are single Arrow kernels over the batch.
    """

    def stats(batch: pa.Table) -> pa.Table:
        text = pc.cast(batch[text_col], pa.string())
        n_chars = pc.utf8_length(text)
        n_lines = pc.add(pc.count_substring(text, "\n"), 1)
        n_tokens = pc.count_substring_regex(text, _TOKEN_RE)
        n_alpha = pc.count_substring_regex(text, "[A-Za-z]")
        n_bpe = pc.count_substring_regex(text, _BPE_TOKEN_RE)
        return pa.table(
            {
                "doc_id": batch["doc_id"],
                "n_chars": pc.cast(n_chars, pa.int64()),
                "n_lines": pc.cast(n_lines, pa.int64()),
                "n_tokens": pc.cast(n_tokens, pa.int64()),
                "n_alpha": pc.cast(n_alpha, pa.int64()),
                "n_bpe_tokens": pc.cast(n_bpe, pa.int64()),
            }
        )

    return ds.map_batches(stats, batch_format="pyarrow")


def quality_score(ds: ray.data.Dataset, text_col: str = "text") -> ray.data.Dataset:
    """Quality heuristics: length, punctuation density, stopword ratio,
    mean word length, and a composite [0,1] score.

    The score formula is defined here (the reference has no corpus-quality
    scoring); it rewards mid-length docs with natural punctuation/stopword
    rates — the usual pre-training quality gates.
    """

    def score(batch: pa.Table) -> pa.Table:
        # all-Arrow counters (no pandas copy): RE2 kernels, the same
        # engine family as the DuckDB oracle's regexp_extract_all
        text = pc.fill_null(pc.cast(batch[text_col], pa.string()), "")

        def f64(arr) -> np.ndarray:
            return arr.to_numpy(zero_copy_only=False).astype(np.float64)

        n_chars = f64(pc.utf8_length(text))
        n_tokens = f64(pc.count_substring_regex(text, r"\S+"))
        n_punct = f64(pc.count_substring_regex(text, r"[.,;:!?]"))
        n_stop = f64(
            pc.count_substring_regex(
                pc.utf8_lower(text),
                r"\b(?:the|and|of|to|a|in|is|it|that|for)\b",
            )
        )
        tokens_safe = np.maximum(n_tokens, 1.0)
        punct_ratio = n_punct / tokens_safe
        stop_ratio = n_stop / tokens_safe
        mean_word_len = np.where(n_tokens > 0, (n_chars - (n_tokens - 1)) / tokens_safe, 0.0)
        length_component = np.clip(n_tokens / 100.0, 0.0, 1.0) * 0.4
        stop_component = np.clip(stop_ratio / 0.3, 0.0, 1.0) * 0.3
        punct_component = np.clip(punct_ratio / 0.1, 0.0, 1.0) * 0.2
        word_component = np.where((mean_word_len >= 3) & (mean_word_len <= 10), 0.1, 0.0)
        return pa.table(
            {
                "doc_id": batch["doc_id"],
                "n_tokens": pa.array(n_tokens.astype(np.int64)),
                "punct_ratio": pa.array(np.round(punct_ratio, 6)),
                "stop_ratio": pa.array(np.round(stop_ratio, 6)),
                "quality": pa.array(
                    np.round(length_component + stop_component + punct_component + word_component, 6)
                ),
            }
        )

    return ds.map_batches(score, batch_format="pyarrow")


_SCRIPTS: list[tuple[str, str]] = [
    # (name, RE2 class) in PRIORITY order — dominant-script ties resolve
    # to the earlier entry, identically in the op and the SQL CASE chain
    ("latin", r"\p{Latin}"),
    ("cyrillic", r"\p{Cyrillic}"),
    ("han", r"\p{Han}"),
    ("kana", r"\p{Hiragana}|\p{Katakana}"),
    ("digit", r"[0-9]"),
]


def script_mix(ds: ray.data.Dataset, text_col: str = "text") -> ray.data.Dataset:
    """Per-doc Unicode-script composition: counts per script class
    (Latin / Cyrillic / Han / Kana / digits), the dominant script, and its
    share of the doc's codepoints — the script-level complement to
    :class:`LangId` for routing a multilingual crawl (e.g. picking the
    tokenizer or the language-ID model family per shard).

    All counters are single Arrow RE2 kernels (the same engine family as
    DuckDB's regexp_extract_all — script classes verified char-identical);
    null text counts as empty, dominant = 'none' when no class hits.
    Floats follow the repo law: np.round(,6) against round_even in SQL.
    """

    def mix(batch: pa.Table) -> pa.Table:
        text = pc.fill_null(pc.cast(batch[text_col], pa.string()), "")
        n_chars = (
            pc.utf8_length(text).to_numpy(zero_copy_only=False).astype(np.int64)
        )
        counts = {
            name: pc.count_substring_regex(text, pat)
            .to_numpy(zero_copy_only=False)
            .astype(np.int64)
            for name, pat in _SCRIPTS
        }
        stacked = np.stack([counts[name] for name, _ in _SCRIPTS])
        maxc = stacked.max(axis=0)
        dominant = np.select(
            [(maxc > 0) & (counts[name] == maxc) for name, _ in _SCRIPTS],
            [name for name, _ in _SCRIPTS],
            default="none",
        )
        ratio = np.where(
            n_chars > 0, np.round(maxc.astype(np.float64) / n_chars, 6), 0.0
        )
        cols: dict = {"doc_id": batch["doc_id"]}
        cols["n_chars"] = pa.array(n_chars, pa.int64())
        for name, _ in _SCRIPTS:
            cols[f"n_{name}"] = pa.array(counts[name], pa.int64())
        cols["dominant_script"] = pa.array(dominant.astype(object), pa.string())
        cols["dominant_ratio"] = pa.array(ratio, pa.float64())
        return pa.table(cols)

    return ds.map_batches(mix, batch_format="pyarrow")


class LangId:
    """Stopword-hit language classifier — an actor-pool stage: the token
    regex and stopword banks are built once per actor."""

    def __init__(self):
        self.word_re = _WORD_RE
        self.banks = {k: v for k, v in _LANG_STOPWORDS.items()}

    def __call__(self, batch: pa.Table) -> pa.Table:
        texts = pc.cast(batch["text"], pa.string()).to_pylist()
        langs = []
        scores = []
        for text in texts:
            tokens = self.word_re.findall((text or "").lower()[:4000])
            if not tokens:
                langs.append("und")
                scores.append(0.0)
                continue
            best_lang, best = "und", 0.0
            for lang, bank in self.banks.items():
                hit = sum(1 for t in tokens if t in bank) / len(tokens)
                if hit > best:
                    best_lang, best = lang, hit
            langs.append(best_lang if best > 0.02 else "und")
            scores.append(round(best, 6))
        return pa.table(
            {
                "doc_id": batch["doc_id"],
                "lang_pred": pa.array(langs, pa.string()),
                "lang_score": pa.array(scores, pa.float64()),
            }
        )


def lang_id(ds: ray.data.Dataset, concurrency=(1, 8)) -> ray.data.Dataset:
    return ds.map_batches(
        LangId, batch_format="pyarrow", batch_size=2048, concurrency=concurrency
    )


def fingerprint(ds: ray.data.Dataset, text_col: str = "text") -> ray.data.Dataset:
    """64-bit FNV-1a document fingerprint plus a rolling-window min-hash of
    token 4-grams (a cheap content fingerprint stable under small shifts).
    Null text fingerprints as ''; null-id rows drop (oracle parity)."""

    from pdf_parser_ray.functions.hashing import md5_64 as h64

    # C-speed 64-bit content hash (md5 prefix) — a per-character Python
    # FNV loop over whole documents was the hot cost of this op

    def fp(batch: pa.Table) -> pa.Table:
        # null-id rows drop (a fingerprint with no id keys nothing; the
        # oracle's per-doc gram GROUP BY would merge all null-id docs)
        batch = batch.filter(pc.is_valid(batch["doc_id"]))
        texts = pc.cast(batch[text_col], pa.string()).to_pylist()
        full_hashes, rolling = [], []
        for text in texts:
            text = text or ""
            full_hashes.append(h64(text))
            tokens = text.split()
            if len(tokens) >= 4:
                rolling.append(
                    min(h64(" ".join(tokens[i : i + 4])) for i in range(len(tokens) - 3))
                )
            else:
                rolling.append(full_hashes[-1])
        return pa.table(
            {
                "doc_id": batch["doc_id"],
                "fingerprint": pa.array(full_hashes, pa.int64()),
                "rolling_min": pa.array(rolling, pa.int64()),
            }
        )

    return ds.map_batches(fp, batch_format="pyarrow")


def heading_strategy_stats(
    ds: ray.data.Dataset, text_col: str = "text"
) -> ray.data.Dataset:
    """Corpus-wide heading-strategy match counts (the reference's Strategy
    counters, heading_strategies.py:26-52, as a distributed aggregate):
    explode lines, attribute each detected heading to its winning strategy
    (doclogic.headings.winning_strategy), pre-aggregate per batch, one tiny
    groupby over <=3 strategy keys."""
    from ray.data.aggregate import Sum

    from pdf_parser_ray.doclogic.headings import winning_strategy

    def partial(batch: pa.Table) -> pa.Table:
        counts: dict[str, int] = {}
        for text in pc.cast(batch[text_col], pa.string()).to_pylist():
            for line in (text or "").split("\n"):
                name = winning_strategy(line)
                if name:
                    counts[name] = counts.get(name, 0) + 1
        return pa.table(
            {
                "strategy": pa.array(list(counts), pa.string()),
                "n": pa.array(list(counts.values()), pa.int64()),
            }
        )

    return (
        ds.select_columns([text_col])
        .map_batches(partial, batch_format="pyarrow")
        .groupby("strategy")
        .aggregate(Sum("n", alias_name="n_lines"))
        .sort("strategy")
    )


# ---- Gopher-style quality rules -------------------------------------------

# the required-stopword bank from the Gopher rule set (Rae et al. 2021,
# "Scaling Language Models" §A1.1 — public)
_GOPHER_STOPWORDS = ("the", "be", "to", "of", "and", "that", "have", "with")


def gopher_rules(
    ds: ray.data.Dataset,
    text_col: str = "text",
    min_words: int = 50,
    max_words: int = 100_000,
    min_stop_hits: int = 2,
    passthrough: "tuple[str, ...]" = (),
) -> ray.data.Dataset:
    """Gopher-style document quality rules as explicit per-doc columns plus
    a composite ``keep`` flag — the rule-based sibling of the weighted
    :func:`quality_score`.

    Rules (Rae et al. 2021 §A1.1): word count in [min_words, max_words];
    mean word length in [3, 10]; symbol-to-word ratio (#, ellipsis)
    <= 0.1; < 90% of lines bullet-started; < 30% of lines
    ellipsis-ended; >= 80% of words contain an alphabetic character;
    >= 2 distinct required stopwords present.

    Every counter is ONE Arrow ``count_substring_regex`` / boolean kernel
    over the batch (RE2 — semantically identical to DuckDB's
    ``regexp_extract_all``, which is what makes the op hash-oracle-able).
    Rule comparisons use the UNROUNDED double ratios; the reported ratio
    columns round half-even (Python round op-side, ``round_even``
    SQL-side — the integer-ratio convention from the dedup family).
    Null text coalesces to '' (one empty line, zero words, keep=false).

    ``passthrough`` appends the named input columns to the output unchanged
    (so a downstream stage — e.g. :func:`~pdf_parser_ray.ops.curation.
    curate_corpus` — can filter on ``keep`` without a join back to the
    corpus).
    """

    def rules(batch: pa.Table) -> pa.Table:
        text = pc.fill_null(pc.cast(batch[text_col], pa.string()), "")
        f = lambda arr: arr.to_numpy(zero_copy_only=False).astype(np.float64)
        n_words = f(pc.count_substring_regex(text, r"\S+"))
        n_schars = f(pc.count_substring_regex(text, r"\S"))
        n_sym = f(pc.count_substring(text, "#")) + f(
            pc.count_substring_regex(text, r"\.\.\.|…")
        )
        n_alpha_w = f(pc.count_substring_regex(text, r"\S*[A-Za-z]\S*"))
        n_lines = f(pc.count_substring(text, "\n")) + 1.0
        n_bullet = f(pc.count_substring_regex(text, r"(?:^|\n)[ \t]*[-*•]"))
        n_ell_end = f(pc.count_substring_regex(text, r"(?:\.\.\.|…)[ \t]*(?:\n|$)"))
        n_stop = np.zeros(len(n_words), dtype=np.int64)
        low = pc.utf8_lower(text)
        for w in _GOPHER_STOPWORDS:
            n_stop += (
                pc.match_substring_regex(low, rf"\b{w}\b")
                .to_numpy(zero_copy_only=False)
                .astype(np.int64)
            )

        words_safe = np.maximum(n_words, 1.0)
        mwl = np.where(n_words > 0, n_schars / words_safe, 0.0)
        sym_ratio = np.where(n_words > 0, n_sym / words_safe, 0.0)
        alpha_frac = np.where(n_words > 0, n_alpha_w / words_safe, 0.0)
        bullet_frac = n_bullet / n_lines
        ell_frac = n_ell_end / n_lines
        keep = (
            (n_words >= min_words)
            & (n_words <= max_words)
            & (mwl >= 3.0)
            & (mwl <= 10.0)
            & (sym_ratio <= 0.1)
            & (bullet_frac < 0.9)
            & (ell_frac < 0.3)
            & (alpha_frac >= 0.8)
            & (n_stop >= min_stop_hits)
        )
        r6 = lambda xs: pa.array([round(float(x), 6) for x in xs], pa.float64())
        cols = {
            "doc_id": batch["doc_id"],
            "n_words": pa.array(n_words.astype(np.int64)),
            "mean_word_len": r6(mwl),
            "symbol_ratio": r6(sym_ratio),
            "frac_alpha_words": r6(alpha_frac),
            "frac_bullet_lines": r6(bullet_frac),
            "frac_ellipsis_lines": r6(ell_frac),
            "n_stop_hits": pa.array(n_stop),
            "keep": pa.array(keep),
        }
        for c in passthrough:
            cols[c] = batch[c]
        return pa.table(cols)

    return ds.map_batches(rules, batch_format="pyarrow")
