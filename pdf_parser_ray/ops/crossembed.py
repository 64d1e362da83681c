"""Embedding-space cross-corpus decontamination — the third member of the
contamination family (ops/crosscorpus.py holds the other two: exact
n-gram overlap catches verbatim leakage, MinHash-LSH catches lightly
edited text; this catches SEMANTIC leakage — a paraphrased test document
whose embedding stays near its source — via the same sign-LSH machinery
the single-corpus embedding dedup uses, ops/dedup.py
embedding_near_dup).

Scale shape mirrors cross_corpus_near_dups: each corpus bucketizes
independently with the SAME seed-deterministic hyperplanes (identical
bucket keys to hashing the union), tagged with a side bit; one coarse
bucket groupby finds CROSS-side collisions only; exact rounded-cosine
scores them inside the group (vectors ride the bucket shuffle — they ARE
the payload here, a few hundred bytes each, unlike document text).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import ray.data


def cross_corpus_embedding_near_dups(
    *,
    train: ray.data.Dataset,
    test: ray.data.Dataset,
    threshold: float = 0.45,
    n_planes: int = 6,
    n_tables: int = 8,
    seed: int = 11,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> ray.data.Dataset:
    """Near-duplicate vector pairs BETWEEN two corpora: rows
    (train_id, test_id, cosine) for every cross-side pair whose
    6-decimal-rounded cosine reaches ``threshold`` and that collides in
    at least one of ``n_tables`` sign-LSH tables (recall knob, the
    embedding_near_dup law: survival p = 1-(1-(1-θ/π)^n_planes)^L).

    Ids must be unique ACROSS the two corpora (the contamination-family
    contract) and the sides are keyword-only, mirroring
    cross_corpus_near_dups' swap-hazard rationale. Rows with a null id
    or null vector are dropped up front. Pairs colliding in several
    tables dedupe in one coarse pair groupby; cosine is computed from
    the same vectors under the same rounding in every table, so the
    kept row is table-independent."""

    def _std(ds: ray.data.Dataset, side: int) -> ray.data.Dataset:
        def norm(batch: pa.Table) -> pa.Table:
            t = pa.table({"vec_id": batch[id_col], "vec": batch[vec_col]})
            # drop null ids, null vectors AND empty vectors (an empty list
            # is not a point in the space; it would also make the batch
            # matrix ragged). Remaining vectors must share one dimension —
            # the embedding-table contract.
            t = t.filter(
                pc.and_(
                    pc.and_(
                        pc.is_valid(t["vec_id"]), pc.is_valid(t["vec"])
                    ),
                    pc.greater(
                        pc.coalesce(
                            pc.list_value_length(t["vec"]),
                            pa.scalar(0, pa.int32()),
                        ),
                        0,
                    ),
                )
            )
            return t.append_column(
                "side", pa.array([side] * t.num_rows, pa.int8())
            )

        return ds.select_columns([id_col, vec_col]).map_batches(
            norm, batch_format="pyarrow"
        )

    def bucketize(batch: pa.Table) -> pa.Table:
        # identical bucket law to embedding_near_dup (dedup.py): the plane
        # bank is rebuilt per task from the seed — tiny and deterministic
        vecs = np.asarray(batch["vec"].to_pylist(), dtype=np.float64)
        ids_rep, keys_out, vecs_rep, side_rep = [], [], [], []
        for t in range(n_tables):
            planes = np.random.RandomState(seed + t).standard_normal(
                (vecs.shape[1], n_planes)
            )
            signs = (vecs @ planes) > 0
            keys = (
                signs.astype(np.int64) << np.arange(n_planes, dtype=np.int64)
            ).sum(axis=1)
            ids_rep.append(batch["vec_id"])
            keys_out.append(pa.array(keys + (t << n_planes)))
            vecs_rep.append(batch["vec"])
            side_rep.append(batch["side"])

        def cat(chunks):
            return pa.concat_arrays(
                [
                    c.combine_chunks() if isinstance(c, pa.ChunkedArray) else c
                    for c in chunks
                ]
            )

        return pa.table(
            {
                "vec_id": cat(ids_rep),
                "bucket_key": pa.concat_arrays(keys_out),
                "vec": cat(vecs_rep),
                "side": cat(side_rep),
            }
        )

    def cross_pairs(group: pd.DataFrame) -> pd.DataFrame:
        left = group[group["side"] == 0]
        right = group[group["side"] == 1]
        if left.empty or right.empty:
            return pd.DataFrame({"train_id": [], "test_id": [], "cosine": []})

        def unit(frame: pd.DataFrame) -> np.ndarray:
            m = np.asarray(list(frame["vec"]), dtype=np.float64)
            n = np.linalg.norm(m, axis=1, keepdims=True)
            n[n == 0] = 1.0
            return m / n

        # rounded similarity so a SQL round_even(cos,6) >= t oracle can
        # never disagree at the cut (the embedding_near_dup convention)
        sims = np.round(unit(left) @ unit(right).T, 6)
        li, ri = np.nonzero(sims >= threshold)
        return pd.DataFrame(
            {
                "train_id": np.asarray(list(left["vec_id"]))[li],
                "test_id": np.asarray(list(right["vec_id"]))[ri],
                "cosine": sims[li, ri],
            }
        )

    bands = _std(train, 0).union(_std(test, 1))
    candidates = (
        bands.map_batches(bucketize, batch_format="pyarrow")
        .groupby("bucket_key")
        .map_groups(cross_pairs, batch_format="pandas")
    )
    try:
        id_type = train.schema().base_schema.field(id_col).type
    except Exception:
        id_type = pa.int64()
    out_schema = pa.schema(
        [("train_id", id_type), ("test_id", id_type), ("cosine", pa.float64())]
    )
    from pdf_parser_ray.ops.dedup import _global_pair_dedupe

    return _global_pair_dedupe(candidates, out_schema)
