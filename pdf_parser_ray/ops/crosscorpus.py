"""Cross-corpus operators: benchmark-contamination check, a
Bloom-filter membership filter, and MinHash near-dup decontamination.

All three answer "how does corpus B relate to corpus A?" without ever
joining the two corpora on text:

* :func:`contamination_scores` — per test doc, the fraction of its
  distinct word n-grams that appear ANYWHERE in the train corpus (the
  standard train/test overlap report in LLM data work). A distributed
  inverted semi-join: both sides explode to (gram_hash, …) postings, one
  coarse groupby co-locates every posting of a gram, per-bucket hit
  partials re-group by doc. Text never crosses a shuffle.

* :func:`cross_corpus_near_dups` — NEAR-duplicate (train, test) pairs
  via cross-side-only MinHash-LSH band collisions plus exact-Jaccard
  verify: the fuzzy sibling of contamination_scores for paraphrased
  leakage.

* :func:`bloom_filter_novel` — membership of each candidate doc's exact
  text in a reference corpus via a seeded Bloom filter. The classic
  broadcast-filter-instead-of-shuffle-anti-join shape: the reference
  reduces to an ``m_bits``-bit bitmap (bounded by ``m_bits`` REGARDLESS
  of corpus size), broadcast once with ``ray.put``; candidates stream
  through a vectorized membership probe. No false negatives; false
  positives are deterministic under the seeded hash (so the op is still
  exactly reproducible — in SQL too).

The reference repo has no cross-corpus operators (it is a single-corpus
PDF parser); these are the training-data-pipeline extensions the graft
brief lists as first-class. Hashing is md5-derived and
process-independent, per the dedup-family convention (dedup.py:17).
"""

from __future__ import annotations

import hashlib

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import ray.data

from pdf_parser_ray.functions.hashing import md5_64
from pdf_parser_ray.functions.tables import schema_pin
from pdf_parser_ray.ops.dedup import _DEDUP_BUCKETS as _BUCKETS
from pdf_parser_ray.ops.dedup import shingle_hash_sets

_CONTAM_SCHEMA = pa.schema(
    [
        ("doc_id", pa.string()),
        ("n_grams", pa.int64()),
        ("n_hits", pa.int64()),
        ("contamination", pa.float64()),
    ]
)


def contamination_scores(
    test_ds: ray.data.Dataset,
    train_ds: ray.data.Dataset,
    n: int = 5,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> ray.data.Dataset:
    """Per test document: how many of its distinct word ``n``-grams occur
    anywhere in the train corpus, and the contaminated fraction.

    Shingle convention = :func:`~pdf_parser_ray.ops.dedup._word_ngrams`
    (shared with the whole MinHash/Jaccard family): < n tokens collapse
    to one joined shingle; docs with an EMPTY shingle set (null/blank
    text) emit no row — mirroring the SQL unnest-of-empty-list oracle.

    Stages (the only rows that shuffle are (hash, id, small ints)):

    1. each side explodes to postings — train rows carry just the gram
       hash (deduped per batch: per-bucket hit tests only need set
       membership), test rows carry (gram hash, doc, set size).
    2. groupby coarse gram-hash bucket: every posting of a gram lands in
       one bucket, so membership is decided locally; emit one
       (doc, sz, hits) partial per test doc per bucket (hits may be 0 —
       the doc row must survive even if nothing matched).
    3. re-group by doc hash, sum hits -> ratio.

    Hit counting is over 64-bit gram hashes; a cross-corpus collision
    (odds ~n_grams²/2⁶⁵) would count one extra gram — self-consistent
    and identical on both op and oracle sides only when the oracle
    intersects strings, where it is instead vanishingly-rare noise;
    documented, as in :func:`~pdf_parser_ray.ops.dedup.ngram_jaccard_pairs`.
    """

    post_schema = pa.schema(
        [
            ("gh", pa.int64()),
            ("doc", pa.string()),
            ("sz", pa.int64()),
            ("side", pa.int8()),  # 0 = train gram, 1 = test posting
            ("_b", pa.int64()),
        ]
    )

    def train_postings(batch: pa.Table) -> pa.Table:
        texts = pc.cast(batch[text_col], pa.string()).to_pylist()
        hashes: set[int] = set()
        for s in shingle_hash_sets(texts, n):
            hashes.update(s)
        gh = list(hashes)
        return pa.table(
            {
                "gh": pa.array(gh, pa.int64()),
                "doc": pa.array([None] * len(gh), pa.string()),
                "sz": pa.array([0] * len(gh), pa.int64()),
                "side": pa.array([0] * len(gh), pa.int8()),
                "_b": pa.array([g % _BUCKETS for g in gh], pa.int64()),
            }
        ).cast(post_schema)

    def test_postings(batch: pa.Table) -> pa.Table:
        ids = batch[id_col].to_pylist()
        texts = pc.cast(batch[text_col], pa.string()).to_pylist()
        out_g, out_doc, out_sz = [], [], []
        for doc, hashes in zip(ids, shingle_hash_sets(texts, n)):
            for gh in hashes:
                out_g.append(gh)
                out_doc.append(str(doc))
                out_sz.append(len(hashes))
        return pa.table(
            {
                "gh": pa.array(out_g, pa.int64()),
                "doc": pa.array(out_doc, pa.string()),
                "sz": pa.array(out_sz, pa.int64()),
                "side": pa.array([1] * len(out_g), pa.int8()),
                "_b": pa.array([g % _BUCKETS for g in out_g], pa.int64()),
            }
        ).cast(post_schema)

    partial_schema = pa.schema(
        [("doc", pa.string()), ("sz", pa.int64()), ("hits", pa.int64()), ("_pb", pa.int64())]
    )

    def bucket_hits(group: pd.DataFrame) -> pd.DataFrame:
        train_ghs = set(group.loc[group["side"] == 0, "gh"])
        test = group[group["side"] == 1]
        if test.empty:
            return pd.DataFrame(
                {
                    "doc": pd.Series([], dtype=str),
                    "sz": pd.Series([], dtype="int64"),
                    "hits": pd.Series([], dtype="int64"),
                    "_pb": pd.Series([], dtype="int64"),
                }
            )
        hit = test["gh"].isin(train_ghs)
        agg = (
            test.assign(hit=hit.astype("int64"))
            .groupby("doc", as_index=False)
            .agg(sz=("sz", "first"), hits=("hit", "sum"))
        )
        agg["_pb"] = [h % _BUCKETS for h in (md5_64(d) for d in agg["doc"])]
        return agg[["doc", "sz", "hits", "_pb"]]

    def finalize(group: pd.DataFrame) -> pd.DataFrame:
        agg = group.groupby("doc", as_index=False).agg(
            sz=("sz", "first"), hits=("hits", "sum")
        )
        # integer-ratio rounding: Python round (correctly-rounded
        # half-even) op-side, round_even(…, 6) oracle-side — the
        # dyadic-tie pairing the dedup family standardized on
        ratio = [round(float(h) / float(s), 6) for h, s in zip(agg["hits"], agg["sz"])]
        return pd.DataFrame(
            {
                "doc_id": agg["doc"],
                "n_grams": agg["sz"],
                "n_hits": agg["hits"],
                "contamination": ratio,
            }
        )

    train = train_ds.select_columns([text_col]).map_batches(
        train_postings, batch_format="pyarrow"
    )
    test = test_ds.select_columns([id_col, text_col]).map_batches(
        test_postings, batch_format="pyarrow"
    )
    return (
        train.union(test)
        .groupby("_b")
        .map_groups(bucket_hits, batch_format="pandas")
        .map_batches(schema_pin(partial_schema), batch_format="pyarrow")
        .groupby("_pb")
        .map_groups(finalize, batch_format="pandas")
        .map_batches(schema_pin(_CONTAM_SCHEMA), batch_format="pyarrow")
    )


# ---- Bloom filter ---------------------------------------------------------

# position-space partitions for the distributed bitmap build; each slice
# bitmap is m_bits/_BLOOM_SLICES/8 bytes
_BLOOM_SLICES = 64


def _bloom_hashes(text: "str | None", m_bits: int) -> tuple[int, int]:
    """(h1, h2) double-hash bases in [0, m_bits), from a domain-separated
    md5 — chr(1)+text for real strings, chr(0) for SQL NULL, so null can
    never collide with the empty string (same convention, expressed over
    VARCHAR so the oracle can say CASE WHEN text IS NULL THEN chr(0) …,
    as exact_dedup_ids uses at the bytes level, dedup.py:98-102)."""
    key = ("\x01" + text) if text is not None else "\x00"
    hx = hashlib.md5(key.encode()).hexdigest()
    return int(hx[:16], 16) % m_bits, int(hx[16:32], 16) % m_bits


def _positions(h1: int, h2: int, k: int, m_bits: int) -> list[int]:
    # h1, h2 already < m_bits, so h1 + i*h2 stays far from int64 overflow
    return [(h1 + i * h2) % m_bits for i in range(k)]


def build_bloom_filter(
    ref_ds: ray.data.Dataset,
    m_bits: int = 1 << 20,
    k: int = 4,
    text_col: str = "text",
) -> np.ndarray:
    """Packed ``m_bits``-bit Bloom bitmap (uint8, MSB-first) of every
    distinct text in ``ref_ds``.

    Distributed build bounded by ``m_bits``, not corpus size: batches
    emit DISTINCT set-bit positions (≤ min(k·batch_docs, m_bits) rows per
    batch), one groupby on the position's slice of bit-space packs each
    slice locally, and the driver assembles ``_BLOOM_SLICES`` rows
    totalling m_bits/8 bytes — the take_all here is on a reduction-sized
    result by construction.

    ``m_bits`` must be a multiple of 8·``_BLOOM_SLICES`` (any power of two
    ≥ 2⁹) so every slice packs to whole bytes — validated HERE, not just in
    the novel-filter wrapper: a misaligned slice would silently overwrite
    its neighbour's first byte and break the no-false-negative contract."""
    if m_bits % (8 * _BLOOM_SLICES):
        raise ValueError(f"m_bits must be a multiple of {8 * _BLOOM_SLICES}")
    slice_bits = m_bits // _BLOOM_SLICES

    def positions(batch: pa.Table) -> pa.Table:
        texts = pc.cast(batch[text_col], pa.string()).to_pylist()
        pos: set[int] = set()
        for t in texts:
            h1, h2 = _bloom_hashes(t, m_bits)
            pos.update(_positions(h1, h2, k, m_bits))
        plist = list(pos)
        return pa.table(
            {
                "pos": pa.array(plist, pa.int64()),
                "_s": pa.array([p // slice_bits for p in plist], pa.int64()),
            }
        )

    def pack_slice(group: pd.DataFrame) -> pd.DataFrame:
        sid = int(group["_s"].iloc[0])
        lo = sid * slice_bits
        bits = np.zeros(slice_bits, dtype=bool)
        bits[group["pos"].to_numpy(dtype=np.int64) - lo] = True
        return pd.DataFrame({"slice_id": [sid], "bits": [np.packbits(bits).tobytes()]})

    rows = (
        ref_ds.select_columns([text_col])
        .map_batches(positions, batch_format="pyarrow")
        .groupby("_s")
        .map_groups(pack_slice, batch_format="pandas")
        .take_all()
    )
    bitmap = np.zeros(m_bits // 8, dtype=np.uint8)
    slice_bytes = slice_bits // 8
    for row in rows:
        sid = int(row["slice_id"])
        buf = np.frombuffer(row["bits"], dtype=np.uint8)
        bitmap[sid * slice_bytes : sid * slice_bytes + len(buf)] = buf
    return bitmap


def bloom_filter_novel(
    cand_ds: ray.data.Dataset,
    ref_ds: ray.data.Dataset,
    m_bits: int = 1 << 20,
    k: int = 4,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> ray.data.Dataset:
    """Per candidate doc: is its exact text definitely NOT in the
    reference corpus (``novel = true``), or possibly present?

    ``m_bits`` must be a multiple of 8·``_BLOOM_SLICES`` (powers of two
    ≥ 2⁹ all are). No false negatives ever; a false positive (novel text
    flagged not-novel) occurs iff all k probed bits happen to be set,
    P ≈ (set_bits/m)^k — and is DETERMINISTIC given the corpus and
    (m_bits, k), which is what makes the op hash-oracle-able. Size m at
    ~10 bits per expected distinct reference text for ~1% FP.
    ``m_bits`` alignment is validated by :func:`build_bloom_filter`."""
    bitmap_ref = ray.put(build_bloom_filter(ref_ds, m_bits, k, text_col))

    class Probe:
        def __init__(self, ref, k: int, m_bits: int):
            self.bitmap = ray.get(ref)
            self.k = k
            self.m = m_bits

        def __call__(self, batch: pa.Table) -> pa.Table:
            texts = pc.cast(batch[text_col], pa.string()).to_pylist()
            hs = np.array(
                [_bloom_hashes(t, self.m) for t in texts], dtype=np.int64
            ).reshape(-1, 2)
            novel = np.zeros(len(texts), dtype=bool)
            for i in range(self.k):
                pos = (hs[:, 0] + i * hs[:, 1]) % self.m
                bit = (self.bitmap[pos >> 3] >> (7 - (pos & 7))) & 1
                novel |= bit == 0
            return pa.table(
                {
                    id_col: batch[id_col],
                    "novel": pa.array(novel),
                }
            )

    return cand_ds.select_columns([id_col, text_col]).map_batches(
        Probe,
        fn_constructor_kwargs={"ref": bitmap_ref, "k": k, "m_bits": m_bits},
        batch_format="pyarrow",
        batch_size=4096,
        concurrency=(1, 8),
    )


def cross_corpus_near_dups(
    *,
    train: ray.data.Dataset,
    test: ray.data.Dataset,
    threshold: float = 0.8,
    num_perm: int = 64,
    band_size: int = 4,
    shingle_size: int = 5,
    id_col: str = "doc_id",
    text_col: str = "text",
    max_band_postings: "int | None" = None,
) -> ray.data.Dataset:
    """NEAR-duplicate pairs BETWEEN two corpora (train doc, test doc,
    exact Jaccard) — the fuzzy sibling of :func:`contamination_scores`:
    n-gram overlap catches verbatim leakage, this catches paraphrased /
    lightly-edited test documents via the same MinHash-LSH machinery the
    single-corpus dedup family uses (one shingle convention, one seeded
    permutation bank).

    Shape: each corpus hashes to (doc_id, band_id, band_hash) rows
    independently — identical band values to hashing the union, since the
    permutation bank is seed-deterministic — tagged with a side bit; one
    coarse band-hash groupby finds CROSS-side collisions only (within-side
    pairs are the single-corpus ops' job), then the standard routed
    exact-Jaccard verify scores candidates against the union corpus. Text
    never rides the band shuffle. Doc ids must be unique ACROSS the two
    corpora (the contamination-family contract); rows with a null id are
    dropped up front (SQL's NULL-comparison exclusion, robustly). The two
    sides are keyword-only — sibling contamination_scores takes (test,
    train) and a silent positional swap would transpose every output row.

    Each side's (id, text) projection is materialized once: bands and the
    verify corpus both consume it, which would otherwise re-execute the
    upstream read per consumer.

    ``max_band_postings`` is the hot-band guard (the ``max_df`` analogue
    of the n-gram pair path, and like ``max_df`` it is OPT-IN — default
    ``None`` keeps the op exactly equal to its SQL oracle, which models
    no cap): a band value held by more than that many docs on EITHER
    side is dropped before the per-bucket cross merge — without it a
    degenerate corpus where thousands of near-empty docs share one band
    value makes a single task's candidate frame |left|x|right|. All rows
    of one (band_id, band_hash) key land in the same coarse bucket, so
    the per-group count IS the global posting count and the cap is
    exact, not per-task. Recall cost: pairs whose EVERY colliding band
    is that hot are lost (at 64/4 MinHash a true near-dup pair collides
    on many bands, but a fully-duplicated boilerplate cluster is hot on
    ALL of them) — enable deliberately, at a cap sized to the corpus.

    Output: (train_id, test_id, jaccard), jaccard rounded half-even to 6.
    """
    from pdf_parser_ray.ops.dedup import (
        _global_pair_dedupe,
        minhash_band_rows,
        verify_pairs_jaccard,
    )

    def tag(side: int):
        def add(batch: pa.Table) -> pa.Table:
            return batch.append_column(
                "side", pa.array([side] * batch.num_rows, pa.int8())
            )

        return add

    def _std(ds: ray.data.Dataset) -> ray.data.Dataset:
        # normalize to the dedup family's (doc_id, text) column names so
        # generic id/text columns actually work (minhash_band_rows and the
        # verify path select those names internally), and drop null ids
        def norm(batch: pa.Table) -> pa.Table:
            t = pa.table(
                {"doc_id": batch[id_col], "text": batch[text_col]}
            )
            return t.filter(pc.is_valid(t["doc_id"]))

        return (
            ds.select_columns([id_col, text_col])
            .map_batches(norm, batch_format="pyarrow")
            .materialize()
        )

    train_std, test_std = _std(train), _std(test)

    def prep(ds: ray.data.Dataset, side: int) -> ray.data.Dataset:
        bands = minhash_band_rows(ds, num_perm, band_size, shingle_size)
        return bands.map_batches(tag(side), batch_format="pyarrow")

    bands = prep(train_std, 0).union(prep(test_std, 1))

    def add_bucket(batch: pa.Table) -> pa.Table:
        b = pc.cast(
            pc.bit_wise_and(
                batch["band_hash"], pa.scalar(_BUCKETS - 1, pa.int64())
            ),
            pa.int64(),
        )
        return batch.append_column("_b", b)

    def cross_pairs(group: pd.DataFrame) -> pd.DataFrame:
        left = group[group["side"] == 0][["band_id", "band_hash", "doc_id"]]
        right = group[group["side"] == 1][["band_id", "band_hash", "doc_id"]]
        if max_band_postings is not None and (
            len(left) > max_band_postings or len(right) > max_band_postings
        ):
            # only bother counting when a side could even contain a
            # hot key; the count is global (bucket = f(band_hash))
            keys = ["band_id", "band_hash"]
            lc = left.groupby(keys)["doc_id"].transform("size")
            rc = right.groupby(keys)["doc_id"].transform("size")
            hot = pd.concat(
                [
                    left.loc[lc > max_band_postings, keys],
                    right.loc[rc > max_band_postings, keys],
                ]
            ).drop_duplicates()
            if len(hot):
                hot["_hot"] = True
                left = left.merge(hot, on=keys, how="left")
                left = left[left["_hot"].isna()][
                    ["band_id", "band_hash", "doc_id"]
                ]
                right = right.merge(hot, on=keys, how="left")
                right = right[right["_hot"].isna()][
                    ["band_id", "band_hash", "doc_id"]
                ]
        if left.empty or right.empty:
            return pd.DataFrame(
                {
                    "doc_a": pd.Series([], dtype=str),
                    "doc_b": pd.Series([], dtype=str),
                }
            )
        m = left.merge(right, on=["band_id", "band_hash"])
        out = m.rename(columns={"doc_id_x": "doc_a", "doc_id_y": "doc_b"})[
            ["doc_a", "doc_b"]
        ]
        return out.drop_duplicates()

    candidates = _global_pair_dedupe(
        bands.map_batches(add_bucket, batch_format="pyarrow")
        .groupby("_b")
        .map_groups(cross_pairs, batch_format="pandas"),
        pa.schema([("doc_a", pa.string()), ("doc_b", pa.string())]),
    )

    corpus = train_std.union(test_std)
    verified = verify_pairs_jaccard(
        candidates, corpus, threshold=threshold, n=shingle_size
    )

    out_schema = pa.schema(
        [
            ("train_id", pa.string()),
            ("test_id", pa.string()),
            ("jaccard", pa.float64()),
        ]
    )

    def rename(batch: pa.Table) -> pa.Table:
        return pa.table(
            {
                "train_id": batch["doc_a"],
                "test_id": batch["doc_b"],
                "jaccard": batch["jaccard"],
            }
        ).cast(out_schema)

    return verified.map_batches(rename, batch_format="pyarrow")
