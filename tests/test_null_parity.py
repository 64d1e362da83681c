"""Null-path oracle parity: the driver gate runs on a null-free synthetic
corpus, so every hand-rolled null decision in an op is a LATENT divergence
until something exercises it (three review rounds each caught one). This
test closes the class: it rebuilds the gate's exact compare (row count +
sorted-column value hash) over a documents/events/embeddings trio that is
FULL of nulls — null ids, null text, null sources, null keys, null and
empty embeddings — for every query whose op hand-rolls null semantics.
"""

import hashlib

import duckdb
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

import ray.data  # noqa: F401  (ray_session fixture owns the session)


def _value_hash(df: pd.DataFrame) -> str:
    # scripts/check_queries.py::value_hash, verbatim semantics
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        df[c] = df[c].astype(str)
    rows = sorted(df.apply("|".join, axis=1).tolist()) if len(df) else []
    return hashlib.sha256("\n".join(rows).encode()).hexdigest()[:16]


GOOD = (
    "the quick brown fox jumps over the lazy dog and that is fine "
    "to have be of " * 5
).strip()


@pytest.fixture(scope="module")
def null_sf_dir(tmp_path_factory):
    d = tmp_path_factory.mktemp("null_sf")
    docs = pa.table(
        {
            "doc_id": pa.array([1, 2, None, 4, 5, 6, None, 10, 20], pa.int64()),
            "text": pa.array(
                [
                    GOOD,
                    None,                        # null text, real id
                    GOOD,                        # real text, null id
                    "",                          # empty text
                    GOOD + " extra tail words", # near-dup of 1
                    GOOD,                        # exact dup of 1
                    None,                        # both null
                    GOOD,                        # id%10==0: held-out side dup
                    None,                        # held-out side, null text
                ],
                pa.string(),
            ),
            "lang": pa.array(
                ["en", "en", "de", None, "fr", "en", None, "en", None],
                pa.string(),
            ),
            "source": pa.array(
                ["a", None, "a", "b", None, "a", "b", "c", None], pa.string()
            ),
            "n_chars": pa.array(
                [len(GOOD), None, len(GOOD), 0, 10, len(GOOD), None,
                 len(GOOD), None],
                pa.int64(),
            ),
        }
    )
    pq.write_table(docs, f"{d}/documents.parquet")

    ts = pa.array(
        [1_700_000_000_000_000 + i * 30_000_000 for i in range(8)],
        pa.timestamp("us"),
    )
    events = pa.table(
        {
            "event_id": pa.array(list(range(8)), pa.int64()),
            "ts": ts,
            "user_id": pa.array([1, 1, None, None, 2, 2, 1, None], pa.int64()),
            # 'view'/'purchase' are the funnel query's step labels: user 1
            # converts (view@0 -> purchase@6), user 2 views and never
            # purchases (-1 sentinel), null users/types drop
            "event_type": pa.array(
                ["view", "c", "c", "view", None, "view", "purchase", None],
                pa.string(),
            ),
            "value": pa.array([1.0] * 8, pa.float64()),
            "props": pa.array(["{}"] * 8, pa.string()),
        }
    )
    pq.write_table(events, f"{d}/events.parquet")

    # 64-dim (the semantic_dedup oracle unrolls dim=64); small integers so
    # float32 storage is exact. Rows: valid, null vec, empty vec, valid,
    # null id with valid vec.
    def _vec(seed):
        return [float((seed * 37 + j * 11) % 13 - 6) for j in range(64)]

    # vec_ids 10 and 11 share one vector and straddle the %10 split the
    # cross-corpus embedding query uses, so the near-dup family (exact,
    # sign-LSH and cross-corpus) each surface >= 1 REAL pair here — an
    # all-empty Ray pair result loses its schema (Ray 2.49 zero-row blocks
    # are schema-less), which would turn this replay into a vacuous check
    # vec_id 0 is the knn family's query vector — it must exist and be
    # valid for those replays (a missing/null QUERY is a crash, not a
    # null-semantics question)
    emb = pa.table(
        {
            "vec_id": pa.array([0, 1, 2, 3, 4, None, 10, 11], pa.int64()),
            "embedding": pa.array(
                [_vec(0), _vec(1), None, [], _vec(4), _vec(5), _vec(7), _vec(7)],
                pa.list_(pa.float32()),
            ),
            "label": pa.array([1, 0, 1, 0, 1, 0, 1, 0], pa.int32()),
        }
    )
    pq.write_table(emb, f"{d}/embeddings.parquet")
    return str(d)


# every query whose op hand-rolls null semantics (drop vs NULL-row vs
# sentinel) — each decision must equal what its own oracle SQL answers
NULL_SENSITIVE = [
    "assign_splits",
    "lm_surprisal",
    "dup_span_stats",
    "rebalance_sources",
    "dedup_lines",
    "curate_corpus",
    "gopher_rules",
    "repetition_score",
    "exact_dedup",
    "exact_dedup_ids",
    "dedup_events",
    "event_rate_anomaly",
    "trending_terms",
    "funnel_conversion",
    "cohort_retention",
    "windowed_distinct",
    "rrf_search",
    "quantize_embeddings",
    "semantic_dedup",
    "top_docs_per_source",
    "chars_quantiles_by_lang",
    "heavy_hitter_sources",
    "cross_corpus_near_dups",
    "cross_corpus_embedding_near_dups",
    "embedding_near_dup",
    "embedding_near_dup_lsh",
    "knn_bruteforce",
    "knn_join",
    "bm25_top_docs",
    "bm25_index_top_docs",
    "bm25_incr_index_top_docs",
    "hybrid_search",
    # text-family ops that coalesce early — cheap to pin, and the corpus
    # exercises their null text / null id paths too
    "script_mix",
    "split_sentences",
    "scrub_pii",
    "chunk_documents",
    "normalize_text",
    "doc_stats",
    "lang_id",
    "fingerprint",
    "quality_score",
    "top_ngrams",
    "pmi_top_pairs",
    "doc_frequency",
    "simhash",
]


@pytest.mark.parametrize("name", NULL_SENSITIVE)
def test_null_laden_corpus_matches_oracle(ray_session, null_sf_dir, name):
    import sys

    sys.path.insert(0, "/root/repo")
    import __ray_entry__ as em

    res = em.queries()[name](null_sf_dir)
    got = res.to_pandas() if hasattr(res, "to_pandas") else res

    con = duckdb.connect()
    for t in ("documents", "events", "embeddings"):
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{null_sf_dir}/{t}.parquet')"
        )
    want = con.sql(em.oracle_sql()[name]).df()

    assert len(got) == len(want), f"{name}: rows {len(got)} vs {len(want)}"
    assert sorted(got.columns) == sorted(want.columns)
    assert _value_hash(got) == _value_hash(want), f"{name}: value hash mismatch"
