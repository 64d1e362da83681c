"""Similarity search over an embedding column (list<float>).

* :func:`knn_bruteforce` — exact cosine top-k: the query matrix is broadcast
  once (``ray.put``), each batch computes a numpy matmul and emits only its
  local top-k, so the global merge sorts k x n_batches rows, not the corpus.
* :func:`knn_ivf` — the scale path: deterministic coarse centroids, inverted
  lists via a bucket column, search restricted to the ``n_probe`` nearest
  lists.
"""

from __future__ import annotations

from typing import Optional

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import ray
import ray.data


def _unit(v: np.ndarray) -> np.ndarray:
    n = np.linalg.norm(v, axis=-1, keepdims=True)
    n[n == 0] = 1.0
    return v / n


def _drop_invalid_vectors(
    ds: ray.data.Dataset, id_col: str, vec_col: str
) -> ray.data.Dataset:
    """The embedding-family null law (shared with ops/dedup.py and
    ops/crossembed.py): rows with a null id, null vector or EMPTY vector
    are dropped up front — they cannot be neighbors, they would make the
    per-batch matrix ragged, and an empty list crashes DuckDB's list
    kernels, so the matching oracle filter is ``WHERE id IS NOT NULL AND
    vec IS NOT NULL AND len(vec) > 0``. A separate map stage so downstream
    UDFs never see a post-filter zero-row batch (Ray skips empty blocks)."""

    def keep(batch: pa.Table) -> pa.Table:
        return batch.filter(
            pc.and_(
                pc.and_(
                    pc.is_valid(batch[id_col]), pc.is_valid(batch[vec_col])
                ),
                pc.greater(
                    pc.coalesce(
                        pc.list_value_length(batch[vec_col]),
                        pa.scalar(0, pa.int32()),
                    ),
                    0,
                ),
            )
        )

    return ds.map_batches(keep, batch_format="pyarrow")


def knn_bruteforce(
    ds: ray.data.Dataset,
    query: np.ndarray,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> ray.data.Dataset:
    """Exact top-k by cosine similarity to ``query`` (1-D float array).
    Deterministic tiebreak: (-cosine, id). Corpus rows with a null id,
    null vector or empty vector are dropped (:func:`_drop_invalid_vectors`)."""
    ds = _drop_invalid_vectors(ds, id_col, vec_col)
    q_ref = ray.put(_unit(np.asarray(query, dtype=np.float64)))

    class BatchTopK:
        def __init__(self, q_ref, k: int):
            self.q = ray.get(q_ref)
            self.k = k

        def __call__(self, batch: pa.Table) -> pa.Table:
            vecs = np.asarray(batch[vec_col].to_pylist(), dtype=np.float64)
            ids = np.asarray(batch[id_col].to_pylist())
            # prune on the ROUNDED similarity so the per-batch cut agrees
            # with the global merge's (rounded, id) ordering — near-ties at
            # the 6th decimal must break by id everywhere or the k boundary
            # can diverge from the SQL oracle
            sims = np.round(_unit(vecs) @ self.q, 6)
            order = np.lexsort((ids, -sims))[: self.k]
            return pa.table(
                {
                    id_col: pa.array(ids[order]),
                    "cosine": pa.array(sims[order]),
                }
            )

    partials = ds.map_batches(
        BatchTopK,
        fn_constructor_kwargs={"q_ref": q_ref, "k": k},
        batch_format="pyarrow",
        batch_size=4096,
        concurrency=(1, 8),
    )
    # global merge over the tiny partial set
    return partials.sort(["cosine", id_col], descending=[True, False]).limit(k)


def knn_join(
    ds: ray.data.Dataset,
    queries: np.ndarray,
    query_ids: list,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    id_type: "pa.DataType | None" = None,
) -> ray.data.Dataset:
    """Batch kNN: the exact top-k corpus neighbors for EVERY row of a
    query matrix — the brute-force multi-query baseline the single-query
    :func:`knn_bruteforce` generalizes from.

    Scale shape: the (q x d) query matrix broadcasts ONCE via ray.put
    (never re-shipped per batch); each corpus batch does one matmul and
    emits its LOCAL per-query top-k (≤ q*k rows per batch regardless of
    batch size); one groupby(query_id) merges the partials. Same
    (rounded-cosine desc, id asc) determinism contract as the other kNN
    ops, so the cross-join + ROW_NUMBER SQL oracle matches exactly.

    Returns (query_id, id_col, cosine) rows, k per query. Corpus rows with
    a null id, null vector or empty vector are dropped
    (:func:`_drop_invalid_vectors`)."""
    import pandas as pd

    ds = _drop_invalid_vectors(ds, id_col, vec_col)
    q_mat = np.asarray(queries, dtype=np.float64)
    norms = np.linalg.norm(q_mat, axis=1, keepdims=True)
    norms[norms == 0] = 1.0
    ref = ray.put((q_mat / norms, np.asarray(query_ids)))

    class LocalTopK:
        def __init__(self, ref, k: int):
            self.q, self.qids = ray.get(ref)
            self.k = k

        def __call__(self, batch: pa.Table) -> pa.Table:
            vecs = np.asarray(batch[vec_col].to_pylist(), dtype=np.float64)
            ids = np.asarray(batch[id_col].to_pylist())
            if len(ids) == 0:
                return pa.table(
                    {
                        "query_id": pa.array([], pa.int64()),
                        id_col: pa.array([], batch[id_col].type),
                        "cosine": pa.array([], pa.float64()),
                    }
                )
            sims = np.round(_unit(vecs) @ self.q.T, 6)  # (n, q)
            out_q, out_id, out_s = [], [], []
            for j in range(sims.shape[1]):
                order = np.lexsort((ids, -sims[:, j]))[: self.k]
                out_q.extend([self.qids[j]] * len(order))
                out_id.extend(ids[order])
                out_s.extend(sims[order, j])
            return pa.table(
                {
                    "query_id": pa.array(out_q),
                    id_col: pa.array(out_id),
                    "cosine": pa.array(out_s, pa.float64()),
                }
            )

    def merge(group: pd.DataFrame) -> pd.DataFrame:
        g = group.sort_values(
            ["cosine", id_col], ascending=[False, True], kind="mergesort"
        ).head(k)
        return g[["query_id", id_col, "cosine"]]

    partials = ds.select_columns([id_col, vec_col]).map_batches(
        LocalTopK,
        fn_constructor_kwargs={"ref": ref, "k": k},
        batch_format="pyarrow",
        batch_size=4096,
        concurrency=(1, 8),
    )
    from pdf_parser_ray.functions.tables import schema_pin

    if id_type is None:
        # metadata-only for file reads; pass id_type explicitly when the
        # upstream is a UDF pipeline (schema() would execute part of it)
        try:
            id_type = ds.schema().base_schema.field(id_col).type
        except Exception as exc:
            raise ValueError(
                f"could not infer the {id_col!r} column type; pass id_type="
            ) from exc
    out_schema = pa.schema(
        [("query_id", pa.int64()), (id_col, id_type), ("cosine", pa.float64())]
    )
    return (
        partials.groupby("query_id")
        .map_groups(merge, batch_format="pandas")
        .map_batches(schema_pin(out_schema), batch_format="pyarrow")
        .sort(["query_id", "cosine", id_col], descending=[False, True, False])
    )


def _min_id_rows(
    ds: ray.data.Dataset, n: int, id_col: str, vec_col: str
) -> list:
    """Rows of the ``n`` smallest ids via per-batch local min-k + a tiny
    merge — never a full-corpus sort for a dimension-sized result (shape
    mirrors knn_bruteforce's local-top-k merge). Shared deterministic
    seeding for deterministic_centroids and kmeans init."""

    def local_min_k(batch: pa.Table) -> pa.Table:
        t = batch.select([id_col, vec_col])
        order = pa.compute.sort_indices(t, sort_keys=[(id_col, "ascending")])
        return t.take(order[:n])

    return (
        ds.map_batches(local_min_k, batch_format="pyarrow", batch_size=4096)
        .sort(id_col)
        .limit(n)
        .take_all()
    )


def deterministic_centroids(
    ds: ray.data.Dataset,
    n_centroids: int,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> np.ndarray:
    """Coarse centroids without an iterative fit: the unit vectors of the
    ``n_centroids`` smallest ids (deterministic, cheap; a k-means refinement
    can swap in without changing the query path)."""
    rows = _min_id_rows(ds, n_centroids, id_col, vec_col)
    return _unit(np.asarray([r[vec_col] for r in rows], dtype=np.float64))


def knn_ivf(
    ds: ray.data.Dataset,
    query: np.ndarray,
    k: int = 10,
    n_centroids: int = 16,
    n_probe: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    centroids: Optional[np.ndarray] = None,
) -> ray.data.Dataset:
    """IVF-style ANN: assign vectors to nearest centroid (broadcast centroid
    matrix, one matmul per batch), prune to the query's ``n_probe`` nearest
    lists, exact cosine inside. Corpus rows with a null id, null vector or
    empty vector are dropped (:func:`_drop_invalid_vectors`)."""
    ds = _drop_invalid_vectors(ds, id_col, vec_col)
    if centroids is None:
        centroids = deterministic_centroids(ds, n_centroids, id_col, vec_col)
    c_ref = ray.put(centroids)
    q = _unit(np.asarray(query, dtype=np.float64))
    # probe ranking on the ROUNDED cosine with an explicit index tiebreak
    # (lexsort is stable; plain argsort is not): engine-portable, so a SQL
    # ORDER BY ROUND(cos,6) DESC, idx oracle reproduces the probe set and
    # recall@k becomes a gate-checkable number, not a test-only property
    probe_scores = np.round(centroids @ q, 6)
    probe_order = np.lexsort((np.arange(len(probe_scores)), -probe_scores))
    probe_lists = set(probe_order[:n_probe].tolist())

    class AssignAndFilter:
        def __init__(self, c_ref, probe_lists, q):
            self.centroids = ray.get(c_ref)
            self.probe = probe_lists
            self.q = q

        def __call__(self, batch: pa.Table) -> pa.Table:
            vecs = np.asarray(batch[vec_col].to_pylist(), dtype=np.float64)
            ids = np.asarray(batch[id_col].to_pylist())
            unit = _unit(vecs)
            # same rounded-cosine assignment law (argmax takes the lowest
            # index on ties, = the SQL ROW_NUMBER cidx tiebreak)
            assign = np.argmax(np.round(unit @ self.centroids.T, 6), axis=1)
            mask = np.isin(assign, list(self.probe))
            if not mask.any():
                return pa.table({id_col: pa.array([], type=batch[id_col].type), "cosine": pa.array([], pa.float64())})
            sims = unit[mask] @ self.q
            return pa.table(
                {
                    id_col: pa.array(ids[mask]),
                    "cosine": pa.array(np.round(sims, 6)),
                }
            )

    candidates = ds.map_batches(
        AssignAndFilter,
        fn_constructor_kwargs={"c_ref": c_ref, "probe_lists": probe_lists, "q": q},
        batch_format="pyarrow",
        batch_size=4096,
        concurrency=(1, 8),
    )
    return candidates.sort(["cosine", id_col], descending=[True, False]).limit(k)


# ---- persisted IVF index --------------------------------------------------


def build_ivf_index(
    ds: ray.data.Dataset,
    index_dir: str,
    n_centroids: int = 16,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    centroids: Optional[np.ndarray] = None,
) -> np.ndarray:
    """One-time IVF index build: assign every vector to its nearest centroid
    and write the corpus as ``list_id``-partitioned parquet plus the centroid
    matrix. Queries then read ONLY the probed partitions
    (:func:`knn_ivf_index`) — centroid assignment is never recomputed per
    query and query IO is corpus_size * n_probe / n_centroids.

    Returns the centroid matrix (also persisted to ``centroids.npy``).
    Corpus rows with a null id, null vector or empty vector are dropped
    (:func:`_drop_invalid_vectors`) — the persisted index holds only
    indexable rows."""
    import json
    import os

    ds = _drop_invalid_vectors(ds, id_col, vec_col)
    if centroids is None:
        centroids = deterministic_centroids(ds, n_centroids, id_col, vec_col)
    c_ref = ray.put(centroids)

    class Assign:
        def __init__(self, c_ref):
            self.centroids = ray.get(c_ref)

        def __call__(self, batch: pa.Table) -> pa.Table:
            vecs = np.asarray(batch[vec_col].to_pylist(), dtype=np.float64)
            # same rounded-cosine assignment law as knn_ivf's inline path:
            # the persisted index and the inline path must put a vector in
            # the SAME list, or partial-probe answers diverge between them
            assign = np.argmax(
                np.round(_unit(vecs) @ self.centroids.T, 6), axis=1
            )
            return batch.append_column(
                "list_id", pa.array(assign.astype(np.int32))
            )

    import shutil

    os.makedirs(index_dir, exist_ok=True)
    lists_dir = os.path.join(index_dir, "lists")
    # a rebuild must not leave stale partition files from a previous build:
    # write_parquet adds uniquely-named files, and the query path globs
    # every *.parquet in a probed partition
    if os.path.isdir(lists_dir):
        shutil.rmtree(lists_dir)
    ds.map_batches(
        Assign,
        fn_constructor_kwargs={"c_ref": c_ref},
        batch_format="pyarrow",
        batch_size=4096,
        concurrency=(1, 8),
    ).write_parquet(lists_dir, partition_cols=["list_id"])
    np.save(os.path.join(index_dir, "centroids.npy"), centroids)
    with open(os.path.join(index_dir, "meta.json"), "w") as f:
        json.dump({"n_centroids": int(centroids.shape[0]), "id_col": id_col, "vec_col": vec_col}, f)
    return centroids


def knn_ivf_index(
    index_dir: str,
    query: np.ndarray,
    k: int = 10,
    n_probe: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> ray.data.Dataset:
    """ANN query against a persisted IVF index: load the (tiny) centroid
    matrix, pick the ``n_probe`` nearest inverted lists, and read ONLY those
    parquet partitions — the pruned read is the point of the index. Exact
    cosine + (rounded-sim, id) ordering inside the probed lists, same as
    knn_bruteforce."""
    import glob
    import os

    centroids = np.load(os.path.join(index_dir, "centroids.npy"))
    q = _unit(np.asarray(query, dtype=np.float64))
    # same rounded-cosine probe law as knn_ivf (lexsort = stable index
    # tiebreak), so inline and indexed partial probes pick identical lists
    scores = np.round(centroids @ q, 6)
    probe = np.lexsort((np.arange(len(scores)), -scores))[:n_probe].tolist()
    # read_parquet accepts one directory or a list of FILES — glob each
    # probed partition (empty lists write no dir and contribute nothing)
    paths = [
        f
        for p in probe
        for f in sorted(
            glob.glob(os.path.join(index_dir, "lists", f"list_id={int(p)}", "*.parquet"))
        )
    ]
    if not paths:
        return ray.data.from_items([])
    ds = ray.data.read_parquet(paths, columns=[id_col, vec_col])
    q_ref = ray.put(q)

    class Score:
        def __init__(self, q_ref, k: int):
            self.q = ray.get(q_ref)
            self.k = k

        def __call__(self, batch: pa.Table) -> pa.Table:
            vecs = np.asarray(batch[vec_col].to_pylist(), dtype=np.float64)
            ids = np.asarray(batch[id_col].to_pylist())
            sims = np.round(_unit(vecs) @ self.q, 6)
            order = np.lexsort((ids, -sims))[: self.k]
            return pa.table(
                {id_col: pa.array(ids[order]), "cosine": pa.array(sims[order])}
            )

    partials = ds.map_batches(
        Score,
        fn_constructor_kwargs={"q_ref": q_ref, "k": k},
        batch_format="pyarrow",
        batch_size=4096,
        concurrency=(1, 8),
    )
    return partials.sort(["cosine", id_col], descending=[True, False]).limit(k)


def kmeans(
    ds: ray.data.Dataset,
    k: int = 8,
    n_iters: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> tuple[ray.data.Dataset, np.ndarray]:
    """Distributed Lloyd's k-means over an embedding column.

    Iteration shape (the map-reduce classic): centroids broadcast via
    ray.put; each batch assigns its vectors with one matmul and emits
    k x (sum-vector, count) PARTIALS — the shuffle moves k rows per batch,
    never vectors; a tiny groupby reduces them and the driver forms the
    next k x d centroid matrix. Deterministic init (vectors of the k
    smallest ids), fixed iteration count, no randomness; centroids are
    additionally rounded to 9 decimals each update (decimal formatting —
    the same correctly-rounded path as DuckDB printf('%.9f'), which is
    what lets the unrolled-Lloyd's SQL oracle reproduce the exact
    centroid doubles) so the ULP-level float-summation-order differences
    that batch boundaries introduce (different parallelism = different
    partial order) cannot normally reach the assignment. A vector lying
    within ~1e-9 of a Voronoi boundary can still flip across cluster
    configurations — exact cross-configuration invariance would need a
    fixed-order reduction. Empty clusters keep their previous centroid.

    Returns (assignments Dataset (id_col, cluster), final centroid matrix).

    CLEAN-INPUT CONTRACT (unlike the kNN/near-dup family): rows must have
    non-null ids and non-null, non-empty, same-dimension vectors — a
    filter here would silently change the fit, and the unrolled-Lloyd's
    SQL oracle is intentionally unfiltered to match. Pre-clean with the
    same predicate the other ops use (id/vec not null, len(vec) > 0) if
    the input may be dirty; :func:`semantic_dedup` does exactly that
    before delegating.
    """
    from ray.data.aggregate import Sum

    # iterative fitting re-reads the input n_iters+2 times — pin the
    # blocks once instead of re-executing the upstream pipeline per pass
    ds = ds.materialize()
    rows = _min_id_rows(ds, k, id_col, vec_col)
    if not rows:
        raise ValueError("kmeans requires a non-empty dataset")
    centroids = np.asarray([r[vec_col] for r in rows], dtype=np.float64)
    dim = centroids.shape[1]

    for _ in range(n_iters):
        c_ref = ray.put(centroids)

        def partial_sums(batch: pa.Table, *, _ref=c_ref) -> pa.Table:
            c = ray.get(_ref)
            if batch.num_rows == 0:
                # np.asarray([]) is 1-D and breaks the axis-1 reductions
                return pa.table(
                    {
                        "cluster": pa.array([], pa.int32()),
                        "n": pa.array([], pa.int64()),
                        **{f"s{j}": pa.array([], pa.float64()) for j in range(dim)},
                    }
                )
            vecs = np.asarray(batch[vec_col].to_pylist(), dtype=np.float64)
            # squared euclidean via the expansion; argmin per row
            d2 = (
                (vecs**2).sum(axis=1, keepdims=True)
                - 2.0 * vecs @ c.T
                + (c**2).sum(axis=1)[None, :]
            )
            assign = np.argmin(d2, axis=1)
            sums = np.zeros((k, dim), dtype=np.float64)
            np.add.at(sums, assign, vecs)
            counts = np.bincount(assign, minlength=k)
            return pa.table(
                {
                    "cluster": pa.array(np.arange(k, dtype=np.int32)),
                    "n": pa.array(counts.astype(np.int64)),
                    **{
                        f"s{j}": pa.array(sums[:, j]) for j in range(dim)
                    },
                }
            )

        agg = (
            ds.select_columns([vec_col])
            .map_batches(partial_sums, batch_format="pyarrow", batch_size=4096)
            .groupby("cluster")
            .aggregate(
                Sum("n", alias_name="n"),
                *[Sum(f"s{j}", alias_name=f"s{j}") for j in range(dim)],
            )
            .take_all()  # k rows x (dim+2) — the reduction result, not data
        )
        new_centroids = centroids.copy()
        for r in agg:
            c_id, n = int(r["cluster"]), int(r["n"])
            if n > 0:
                mean = np.array([r[f"s{j}"] for j in range(dim)]) / n
                new_centroids[c_id] = np.array(
                    [float(f"{x:.9f}") for x in mean], dtype=np.float64
                )
        centroids = new_centroids

    final_ref = ray.put(centroids)

    class Assign:
        def __init__(self, ref):
            self.c = ray.get(ref)

        def __call__(self, batch: pa.Table) -> pa.Table:
            if batch.num_rows == 0:
                return pa.table(
                    {
                        id_col: pa.array([], batch[id_col].type),
                        "cluster": pa.array([], pa.int32()),
                    }
                )
            vecs = np.asarray(batch[vec_col].to_pylist(), dtype=np.float64)
            d2 = (
                (vecs**2).sum(axis=1, keepdims=True)
                - 2.0 * vecs @ self.c.T
                + (self.c**2).sum(axis=1)[None, :]
            )
            return pa.table(
                {
                    id_col: batch[id_col],
                    "cluster": pa.array(np.argmin(d2, axis=1).astype(np.int32)),
                }
            )

    assignments = ds.map_batches(
        Assign,
        fn_constructor_kwargs={"ref": final_ref},
        batch_format="pyarrow",
        batch_size=4096,
        concurrency=(1, 8),
    )
    return assignments, centroids


# ---- int8 scalar quantization -------------------------------------------------


def quantize_embeddings(
    ds: ray.data.Dataset,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> ray.data.Dataset:
    """Per-dimension int8 scalar quantization — the ANN memory-compression
    step (4x smaller vectors for IVF/brute-force shortlists):
    ``code_d = min(255, floor((v_d - min_d) * 255.0 / (max_d - min_d)))``,
    degenerate dimensions (min == max) code to 0.

    Pass 1 computes per-dimension min/max (per-batch partials -> one
    dims-sized groupby — min/max are exact, no float-summation order to
    worry about); pass 2 broadcasts the dims-sized scale table and codes
    every vector with one vectorized expression. All arithmetic is the
    same double expression on both sides of the oracle — float32 inputs
    promote to float64 BEFORE the subtraction, matching SQL's
    FLOAT-to-DOUBLE promotion — so codes are bit-reproducible.

    Codes are rendered to a comma-joined STRING before leaving the stage
    (the rendering rule: list columns stringify differently across
    engines; a rendered string is the one canonical form). Rows with a
    null or empty embedding are dropped — the SQL unnest of an empty
    list yields no rows, so the oracle never sees them either. Vectors
    are assumed fixed-width (the corpus contract every similarity op
    here shares).

    Output: (id, codes). Round-trip error is bounded by scale/2 per dim
    (pinned by a dequantize test, not an oracle — reconstruction is a
    float sum).
    """
    import ray as _ray
    from ray.data.aggregate import Max, Min

    def _valid(batch: pa.Table) -> pa.Table:
        return batch.filter(
            pc.and_(
                pc.is_valid(batch[vec_col]),
                pc.greater(pc.list_value_length(batch[vec_col]), 0),
            )
        )

    def mm_partials(batch: pa.Table) -> pa.Table:
        batch = _valid(batch)
        vecs = np.asarray(batch[vec_col].to_pylist(), dtype=np.float64)
        if vecs.size == 0:
            return pa.table(
                {
                    "dim": pa.array([], pa.int64()),
                    "mn": pa.array([], pa.float64()),
                    "mx": pa.array([], pa.float64()),
                }
            )
        return pa.table(
            {
                "dim": pa.array(range(vecs.shape[1]), pa.int64()),
                "mn": pa.array(vecs.min(axis=0), pa.float64()),
                "mx": pa.array(vecs.max(axis=0), pa.float64()),
            }
        )

    mm = (
        ds.select_columns([vec_col])
        .map_batches(mm_partials, batch_format="pyarrow")
        .groupby("dim")
        .aggregate(Min("mn", alias_name="mn"), Max("mx", alias_name="mx"))
        .take_all()  # dims-sized
    )
    by_dim = {int(r["dim"]): r for r in mm}  # O(dims), not a scan per dim
    dims = sorted(by_dim)
    mn = np.array([float(by_dim[d]["mn"]) for d in dims])
    mx = np.array([float(by_dim[d]["mx"]) for d in dims])
    ref = _ray.put((mn, mx))

    class Code:
        def __init__(self, ref):
            self.mn, self.mx = _ray.get(ref)
            self.degenerate = self.mx == self.mn
            self.scale = np.where(self.degenerate, 1.0, self.mx - self.mn)

        def __call__(self, batch: pa.Table) -> pa.Table:
            batch = _valid(batch)
            vecs = np.asarray(batch[vec_col].to_pylist(), dtype=np.float64)
            if vecs.size == 0:
                return pa.table(
                    {
                        id_col: batch[id_col],
                        "codes": pa.array([], pa.string()),
                    }
                )
            codes = np.minimum(
                255, np.floor((vecs - self.mn) * 255.0 / self.scale)
            ).astype(np.int64)
            codes[:, self.degenerate] = 0
            return pa.table(
                {
                    id_col: batch[id_col],
                    "codes": pa.array(
                        [",".join(map(str, row)) for row in codes], pa.string()
                    ),
                }
            )

    return ds.select_columns([id_col, vec_col]).map_batches(
        Code,
        fn_constructor_kwargs={"ref": ref},
        batch_format="pyarrow",
        concurrency=(1, 8),
    )


def dequantize_codes(codes: str, mn: np.ndarray, mx: np.ndarray) -> np.ndarray:
    """Midpoint reconstruction for :func:`quantize_embeddings` codes —
    the test-side round-trip: v ~ mn + (code + 0.5) * (mx - mn) / 255
    (the quantizer's 255.0 divisor means bucket width (mx - mn) / 255;
    code 255 is the half-open top bucket that only v == mx reaches)."""
    if not codes:
        return np.array([], dtype=np.float64)
    c = np.array([int(x) for x in codes.split(",")], dtype=np.float64)
    scale = np.where(mx == mn, 0.0, (mx - mn) / 255.0)
    return mn + (c + 0.5) * scale
