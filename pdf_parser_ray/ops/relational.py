"""Relational pipelines over the TPC-H-ish tables — the engine's generic
filter / project / aggregate / join / sort / window surface, each with an
exact DuckDB oracle in ``__ray_entry__.oracle_sql``.

Shuffle discipline: aggregates pre-combine inside ``map_batches`` before the
small groupby; joins broadcast the small side (ray.put + per-batch pandas
merge) instead of shuffling both inputs.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import ray
import ray.data
from ray.data.aggregate import Count, Max, Mean, Min, Sum

from pdf_parser_ray.functions.hashing import md5_bucket
from pdf_parser_ray.functions.tables import schema_pin


def pricing_summary(sf_dir: str) -> ray.data.Dataset:
    """TPC-H Q1-shaped grouped aggregate with per-batch pre-aggregation."""
    ds = ray.data.read_parquet(
        f"{sf_dir}/lineitem.parquet",
        columns=[
            "l_returnflag",
            "l_linestatus",
            "l_quantity",
            "l_extendedprice",
            "l_discount",
        ],
    )

    def partial(batch: pa.Table) -> pa.Table:
        # all-Arrow partial: no pandas copy per batch (the aggregate sums
        # go through decimal formatting downstream, which absorbs
        # summation-order ULP differences)
        disc = pc.multiply(
            batch["l_extendedprice"],
            pc.subtract(pa.scalar(1.0), batch["l_discount"]),
        )
        g = (
            pa.table(
                {
                    "l_returnflag": batch["l_returnflag"],
                    "l_linestatus": batch["l_linestatus"],
                    "l_quantity": batch["l_quantity"],
                    "l_extendedprice": batch["l_extendedprice"],
                    "disc_price": disc,
                }
            )
            .group_by(["l_returnflag", "l_linestatus"])
            .aggregate(
                [
                    ("l_quantity", "sum"),
                    ("l_extendedprice", "sum"),
                    ("disc_price", "sum"),
                    ([], "count_all"),
                ]
            )
        )
        # select by GENERATED name before renaming: pyarrow versions
        # disagree on whether group keys come first or last
        return g.select(
            [
                "l_returnflag",
                "l_linestatus",
                "l_quantity_sum",
                "l_extendedprice_sum",
                "disc_price_sum",
                "count_all",
            ]
        ).rename_columns(
            [
                "l_returnflag",
                "l_linestatus",
                "sum_qty",
                "sum_base_price",
                "sum_disc_price",
                "count_order",
            ]
        )

    partials = ds.map_batches(partial, batch_format="pyarrow")
    out = partials.groupby(["l_returnflag", "l_linestatus"]).aggregate(
        Sum("sum_qty", alias_name="sum_qty"),
        Sum("sum_base_price", alias_name="sum_base_price"),
        Sum("sum_disc_price", alias_name="sum_disc_price"),
        Sum("count_order", alias_name="count_order"),
    )
    return out.sort(["l_returnflag", "l_linestatus"])


def revenue_by_nation(sf_dir: str) -> ray.data.Dataset:
    """Broadcast-join pipeline: the customer->nation lookup ships once via
    ray.put as a compact Arrow table (object-store shared, zero-copy to
    each actor), revenue aggregated from orders.

    The broadcast side is DIMENSION-SIZED (|customer| rows of two narrow
    columns) — the op's stated assumption. When the dimension outgrows a
    broadcast, use the partitioned hash-join path
    (:func:`order_priority_revenue`'s shape) instead."""
    nation = pd.read_parquet(f"{sf_dir}/nation.parquet")
    customer = pd.read_parquet(
        f"{sf_dir}/customer.parquet", columns=["c_custkey", "c_nationkey"]
    )
    cust_nation = customer.merge(
        nation[["n_nationkey", "n_name"]],
        left_on="c_nationkey",
        right_on="n_nationkey",
    )[["c_custkey", "n_name"]]
    lookup_ref = ray.put(pa.Table.from_pandas(cust_nation, preserve_index=False))

    class JoinNation:
        def __init__(self, ref):
            self.lookup = ray.get(ref).to_pandas()

        def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
            merged = batch.merge(
                self.lookup, left_on="o_custkey", right_on="c_custkey", how="left"
            )
            g = merged.groupby("n_name", as_index=False).agg(
                revenue=("o_totalprice", "sum"), n_orders=("o_orderkey", "size")
            )
            return g

    orders = ray.data.read_parquet(
        f"{sf_dir}/orders.parquet", columns=["o_orderkey", "o_custkey", "o_totalprice"]
    )
    partials = orders.map_batches(
        JoinNation,
        fn_constructor_kwargs={"ref": lookup_ref},
        batch_format="pandas",
        batch_size=32768,
        concurrency=(1, 8),
    )
    return (
        partials.groupby("n_name")
        .aggregate(Sum("revenue", alias_name="revenue"), Sum("n_orders", alias_name="n_orders"))
        .sort("n_name")
    )


def filtered_revenue(sf_dir: str) -> ray.data.Dataset:
    """Q6-shaped vectorized filter + global aggregate (Arrow kernels)."""
    ds = ray.data.read_parquet(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_quantity", "l_extendedprice", "l_discount"],
    )

    def partial(batch: pa.Table) -> pa.Table:
        mask = pc.and_(
            pc.and_(
                pc.greater_equal(batch["l_discount"], pa.scalar(0.05)),
                pc.less_equal(batch["l_discount"], pa.scalar(0.07)),
            ),
            pc.less(batch["l_quantity"], pa.scalar(24.0)),
        )
        f = batch.filter(mask)
        revenue = pc.sum(pc.multiply(f["l_extendedprice"], f["l_discount"]))
        return pa.table({"revenue": pa.array([revenue.as_py() or 0.0], pa.float64())})

    partials = ds.map_batches(partial, batch_format="pyarrow")
    out = partials.groupby(None).aggregate(Sum("revenue", alias_name="revenue"))
    return out


def top_parts_by_size(sf_dir: str) -> ray.data.Dataset:
    """Sort + limit (global top-k through per-batch pruning)."""
    ds = ray.data.read_parquet(
        f"{sf_dir}/part.parquet", columns=["p_partkey", "p_name", "p_size", "p_retailprice"]
    )
    return ds.sort(["p_size", "p_partkey"], descending=[True, False]).limit(20)


def events_window_agg(sf_dir: str) -> ray.data.Dataset:
    """Tumbling 1-hour window per event_type: the streaming-shaped groupby
    (key, floor(ts/size)) — pre-aggregated per batch."""
    ds = ray.data.read_parquet(
        f"{sf_dir}/events.parquet", columns=["ts", "event_type", "value"]
    )

    def partial(batch: pa.Table) -> pa.Table:
        df = batch.to_pandas()
        df["window_start"] = df["ts"].dt.floor("h")
        g = df.groupby(["event_type", "window_start"], as_index=False).agg(
            n_events=("value", "size"), sum_value=("value", "sum")
        )
        return pa.Table.from_pandas(g, preserve_index=False)

    partials = ds.map_batches(partial, batch_format="pyarrow")
    return (
        partials.groupby(["event_type", "window_start"])
        .aggregate(Sum("n_events", alias_name="n_events"), Sum("sum_value", alias_name="sum_value"))
        .sort(["event_type", "window_start"])
    )


def supplier_balance_stats(sf_dir: str) -> ray.data.Dataset:
    """Multi-aggregate groupby using Ray Data's built-in AggregateFns."""
    ds = ray.data.read_parquet(
        f"{sf_dir}/supplier.parquet", columns=["s_nationkey", "s_acctbal"]
    )
    return (
        ds.groupby("s_nationkey")
        .aggregate(
            Count(alias_name="n_suppliers"),
            Sum("s_acctbal", alias_name="sum_bal"),
            Min("s_acctbal", alias_name="min_bal"),
            Max("s_acctbal", alias_name="max_bal"),
            Mean("s_acctbal", alias_name="avg_bal"),
        )
        .sort("s_nationkey")
    )


def broadcast_key_filter(
    ds: ray.data.Dataset, column: str, keys: pa.Array, keep: bool
) -> ray.data.Dataset:
    """Semi-join (``keep=True``) / anti-join (``keep=False``) against a
    broadcast key set: the distinct keys ship once via ray.put, each batch
    filters with the vectorized ``pc.is_in`` kernel — no shuffle
    (ray_guide.md "Semi / anti join")."""
    keys_ref = ray.put(keys)

    class KeyFilter:
        def __init__(self, ref, keep: bool):
            self.value_set = ray.get(ref)
            self.keep = keep

        def __call__(self, batch: pa.Table) -> pa.Table:
            mask = pc.is_in(batch[column], value_set=self.value_set)
            if not self.keep:
                mask = pc.invert(mask)
            return batch.filter(mask)

    return ds.map_batches(
        KeyFilter,
        fn_constructor_kwargs={"ref": keys_ref, "keep": keep},
        batch_format="pyarrow",
        concurrency=(1, 4),
    )


def _distinct_keys(ds: ray.data.Dataset, column: str) -> pa.Array:
    """Distributed distinct over a key column: per-batch dedup -> one
    groupby to co-locate keys -> only the DISTINCT set reaches the driver.
    The semi/anti-join premise is that this distinct set fits a broadcast;
    the raw column (which can be corpus-sized) never lands on the driver."""
    from ray.data.aggregate import Count

    def local_unique(batch: pa.Table) -> pa.Table:
        return pa.table({column: pc.unique(batch[column])})

    distinct = (
        ds.select_columns([column])
        .map_batches(local_unique, batch_format="pyarrow")
        .groupby(column)
        .aggregate(Count(alias_name="_c"))
        .select_columns([column])
        .take_all()
    )
    return pa.array([r[column] for r in distinct])


def customers_without_orders(
    sf_dir: str, since: str = "1998-01-01"
) -> ray.data.Dataset:
    """Anti-join: customers with no orders on/after ``since``. Probe side =
    distinct recent o_custkey, computed distributed with the date predicate
    pushed to the parquet read (row-group pruning)."""
    import datetime

    cutoff = datetime.datetime.fromisoformat(since)
    orders = ray.data.read_parquet(
        f"{sf_dir}/orders.parquet",
        columns=["o_custkey"],
        filter=pc.field("o_orderdate") >= pa.scalar(cutoff),
    )
    keys = _distinct_keys(orders, "o_custkey")
    ds = ray.data.read_parquet(
        f"{sf_dir}/customer.parquet", columns=["c_custkey", "c_name"]
    )
    return broadcast_key_filter(ds, "c_custkey", keys, keep=False).sort("c_custkey")


def parts_in_lineitem(sf_dir: str) -> ray.data.Dataset:
    """Semi-join: parts referenced by any lineitem (distinct probe keys,
    computed distributed)."""
    li = ray.data.read_parquet(f"{sf_dir}/lineitem.parquet", columns=["l_partkey"])
    keys = _distinct_keys(li, "l_partkey")
    ds = ray.data.read_parquet(
        f"{sf_dir}/part.parquet", columns=["p_partkey", "p_name"]
    )
    return broadcast_key_filter(ds, "p_partkey", keys, keep=True).sort("p_partkey")


def _distinct_count(path: str, column: str) -> int:
    """Fully-distributed exact COUNT(DISTINCT): per-batch local dedup
    shrinks the shuffle input, one groupby co-locates keys, and only the
    final COUNT crosses to the driver — no key ever materializes there."""
    from ray.data.aggregate import Count

    ds = ray.data.read_parquet(path, columns=[column])

    def local_unique(batch: pa.Table) -> pa.Table:
        return pa.table({column: pc.unique(batch[column])})

    return (
        ds.map_batches(local_unique, batch_format="pyarrow")
        .groupby(column)
        .aggregate(Count(alias_name="_c"))
        .count()
    )


def distinct_counts(sf_dir: str) -> ray.data.Dataset:
    """Exact distinct counts, computed distributed (see _distinct_count)."""
    path = f"{sf_dir}/orders.parquet"
    return ray.data.from_items(
        [
            {
                "n_distinct_custkeys": _distinct_count(path, "o_custkey"),
                "n_distinct_priorities": _distinct_count(path, "o_orderpriority"),
            }
        ]
    )


def top_orders_per_priority(sf_dir: str, k: int = 3) -> ray.data.Dataset:
    """Top-k rows per group (orders by price within each priority):
    per-batch partial top-k prune, then one small groupby."""
    ds = ray.data.read_parquet(
        f"{sf_dir}/orders.parquet",
        columns=["o_orderkey", "o_orderpriority", "o_totalprice"],
    )

    def partial_topk(batch: pd.DataFrame) -> pd.DataFrame:
        return (
            batch.sort_values(["o_totalprice", "o_orderkey"], ascending=[False, True])
            .groupby("o_orderpriority", as_index=False)
            .head(k)
        )

    def final_topk(group: pd.DataFrame) -> pd.DataFrame:
        return group.sort_values(
            ["o_totalprice", "o_orderkey"], ascending=[False, True]
        ).head(k)

    return (
        ds.map_batches(partial_topk, batch_format="pandas")
        .groupby("o_orderpriority")
        .map_groups(final_topk, batch_format="pandas")
    )


def order_priority_revenue(sf_dir: str) -> ray.data.Dataset:
    """Large x large partitioned hash join (Ray-native ``Dataset.join``):
    lineitem ⋈ orders on the order key, then a pre-aggregated groupby.
    Complements the broadcast join — this is the path when neither side
    fits a broadcast."""
    lineitem = ray.data.read_parquet(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_orderkey", "l_extendedprice", "l_discount"],
    )

    # shrink the join's left side BEFORE the exchange: per-batch partial
    # aggregation by order key (~4 items/order -> ~4x fewer joined rows);
    # duplicate keys across batches are fine because the final aggregate
    # re-combines by priority after the join
    def pre_agg(batch: pd.DataFrame) -> pd.DataFrame:
        batch["rev"] = batch.l_extendedprice * (1 - batch.l_discount)
        return batch.groupby("l_orderkey", as_index=False).agg(
            revenue=("rev", "sum"), n_items=("rev", "size")
        )

    partials = lineitem.map_batches(pre_agg, batch_format="pandas")
    orders = ray.data.read_parquet(
        f"{sf_dir}/orders.parquet", columns=["o_orderkey", "o_orderpriority"]
    )
    # join partitions scale with the DATA (each partition must fit a
    # worker's heap), not the CPU count — hash-join aggregators have real
    # per-partition overhead, so oversizing the count slows small inputs
    # (measured 2.7s -> 15.5s at sf0.1 with cpu*2 partitions)
    import pyarrow.parquet as _pq

    n_rows = _pq.read_metadata(f"{sf_dir}/lineitem.parquet").num_rows
    n_parts = min(10_000, max(16, n_rows // 2_000_000))
    joined = partials.join(
        orders,
        join_type="inner",
        num_partitions=n_parts,
        on=("l_orderkey",),
        right_on=("o_orderkey",),
    )

    def by_priority(batch: pd.DataFrame) -> pd.DataFrame:
        return batch.groupby("o_orderpriority", as_index=False).agg(
            revenue=("revenue", "sum"), n_items=("n_items", "sum")
        )

    return (
        joined.map_batches(by_priority, batch_format="pandas")
        .groupby("o_orderpriority")
        .aggregate(
            Sum("revenue", alias_name="revenue"), Sum("n_items", alias_name="n_items")
        )
        .sort("o_orderpriority")
    )


def deterministic_sample(
    sf_dir: str, modulus: int = 10, keep_below: int = 3
) -> ray.data.Dataset:
    """Deterministic corpus sampling: keep rows where ``doc_id % modulus <
    keep_below`` — the reproducible alternative to random_sample for
    train/eval splits (same split every run, on every cluster, and
    expressible in SQL for the oracle gate). For seeded pseudo-random
    sampling use ``Dataset.random_sample(frac, seed=...)``."""
    ds = ray.data.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "lang", "n_chars"]
    )

    def keep(batch: pa.Table) -> pa.Table:
        # pure int64 arithmetic: Arrow integer divide truncates toward zero,
        # matching SQL `%` exactly at all magnitudes (a float64 round-trip
        # loses exactness above 2^53 and floors instead of truncating)
        x = pc.cast(batch["doc_id"], pa.int64())
        rem = pc.subtract(x, pc.multiply(pc.divide(x, modulus), modulus))
        return batch.filter(pc.less(rem, keep_below))

    return ds.map_batches(keep, batch_format="pyarrow").sort("doc_id")


def interval_join(
    ds: ray.data.Dataset,
    intervals: list[dict],
    value_col: str,
    lo_col: str = "lo",
    hi_col: str = "hi",
    label_col: str = "label",
) -> ray.data.Dataset:
    """Broadcast range join: attach to each row the label of the interval
    with ``lo <= value < hi``. The interval table is the classic small side
    — shipped once via ray.put as sorted numpy bounds, matched per batch
    with one vectorized searchsorted (no shuffle, no per-row Python).
    Rows matching no interval are dropped (inner semantics). Intervals
    MUST be non-overlapping (validated here — the searchsorted lookup is
    only correct for disjoint half-open [lo, hi) bands)."""
    import ray as _ray

    order = sorted(intervals, key=lambda r: r[lo_col])
    los = np.asarray([r[lo_col] for r in order], dtype=np.float64)
    his = np.asarray([r[hi_col] for r in order], dtype=np.float64)
    if np.any(his <= los):
        raise ValueError("each interval needs lo < hi")
    if np.any(his[:-1] > los[1:]):
        raise ValueError(
            "overlapping intervals: searchsorted matching requires disjoint "
            "[lo, hi) bands"
        )
    labels = np.asarray([r[label_col] for r in order], dtype=object)
    ref = _ray.put((los, his, labels))

    class Match:
        def __init__(self, ref):
            self.los, self.his, self.labels = _ray.get(ref)

        def __call__(self, batch: pa.Table) -> pa.Table:
            vals = pc.cast(batch[value_col], pa.float64()).to_numpy(
                zero_copy_only=False
            )
            idx = np.searchsorted(self.los, vals, side="right") - 1
            ok = (idx >= 0) & (vals < self.his[np.clip(idx, 0, None)])
            batch = batch.filter(pa.array(ok))
            return batch.append_column(
                label_col,
                pa.array(self.labels[idx[ok]].tolist(), pa.string()),
            )

    return ds.map_batches(Match, fn_constructor_kwargs={"ref": ref},
                          batch_format="pyarrow", concurrency=(1, 4))


PRICE_BANDS = [
    {"lo": 0.0, "hi": 50_000.0, "label": "small"},
    {"lo": 50_000.0, "hi": 150_000.0, "label": "medium"},
    {"lo": 150_000.0, "hi": 300_000.0, "label": "large"},
    {"lo": 300_000.0, "hi": 1e12, "label": "jumbo"},
]


def orders_price_bands(sf_dir: str) -> ray.data.Dataset:
    """Range-join orders into literal price bands, then count per band —
    the broadcast interval join exercised end-to-end."""
    from ray.data.aggregate import Count

    ds = ray.data.read_parquet(
        f"{sf_dir}/orders.parquet", columns=["o_orderkey", "o_totalprice"]
    )
    joined = interval_join(ds, PRICE_BANDS, value_col="o_totalprice")
    return (
        joined.groupby("label")
        .aggregate(Count(alias_name="n_orders"))
        .sort("label")
    )


def approx_distinct(
    ds: ray.data.Dataset, col: str, p: int = 12
) -> ray.data.Dataset:
    """HyperLogLog approximate distinct count as a Ray aggregate.

    Sketch shape: every batch hashes its values (md5-64) and emits its
    LOCAL register maxima — at most ``2^p`` (bucket, rho) rows per batch
    regardless of batch size; one tiny groupby merges registers by max.
    The estimator (bias-corrected harmonic mean + linear-counting
    small-range correction, Flajolet et al. 2007) runs on the 2^p-row
    register table. Deterministic end-to-end (md5, no seeds), so the SQL
    oracle reproduces the exact same estimate. Relative error ~1.04/sqrt(m)
    (~1.6% at p=12).

    The harmonic term sums as an EXACT integer (each 2^-rho is
    2^(rho0-rho)/2^rho0, so the sum is one int divided by 2^rho0 with ONE
    rounding at the float cast; SQL: SUM(1::BIGINT << (rho0 - rho)) as
    HUGEINT) — a float summation can round multiples of 2^-rho0 needing
    more than 53 significant bits, and SQL SUM order is arbitrary. The
    register law is the shared :func:`~pdf_parser_ray.functions.hashing.
    hll_register` (ops/streaming.windowed_distinct is the per-window
    sibling).

    Returns one row: (n_estimate: float rounded to 2, n_buckets_used)."""
    import math

    from ray.data.aggregate import Max

    from pdf_parser_ray.functions.hashing import hll_register

    m = 1 << p
    w_bits = 64 - p
    rho0 = w_bits + 1

    def partial(batch: pa.Table) -> pa.Table:
        regs: dict[int, int] = {}
        for v in batch[col].to_pylist():
            if v is None:
                continue  # nulls excluded, matching COUNT(DISTINCT col)
            b, rho = hll_register(v, w_bits)
            if rho > regs.get(b, 0):
                regs[b] = rho
        return pa.table(
            {
                "b": pa.array(list(regs), pa.int32()),
                "rho": pa.array(list(regs.values()), pa.int32()),
            }
        )

    registers = (
        ds.select_columns([col])
        .map_batches(partial, batch_format="pyarrow")
        .groupby("b")
        .aggregate(Max("rho", alias_name="rho"))
    )
    rows = registers.take_all()  # <= 2^p rows — the sketch, not the data
    used = {int(r["b"]): int(r["rho"]) for r in rows}
    n_used = len(used)
    zeros = m - n_used
    s_num = sum(1 << (rho0 - rho) for rho in used.values()) + (zeros << rho0)
    # float() FIRST, then the exact power-of-two division — int/int true
    # division rounds the exact rational, which can differ by one ulp
    # from SQL's cast-then-divide
    harmonic = float(s_num) / 2.0**rho0
    alpha = 0.7213 / (1.0 + 1.079 / m)
    estimate = alpha * m * m / harmonic
    if estimate <= 2.5 * m and zeros > 0:
        estimate = m * math.log(m / zeros)
    return ray.data.from_items(
        [
            {
                "n_estimate": float(f"{estimate:.2f}"),
                "n_buckets_used": n_used,
            }
        ]
    )


def _compress_centroids(
    means: np.ndarray, weights: np.ndarray, delta: int
) -> tuple[np.ndarray, np.ndarray]:
    """Merge (mean, weight) centroids sorted by mean into at most ``delta``
    equal-weight bins (weighted means combine exactly). The building block
    of the mergeable quantile sketch below."""
    order = np.argsort(means, kind="mergesort")
    means, weights = means[order], weights[order]
    if len(means) <= delta:
        return means, weights
    total = weights.sum()
    # bin edge for each centroid by its cumulative MIDPOINT — keeps bins
    # near-equal-weight even when individual weights differ
    mid = np.cumsum(weights) - weights / 2.0
    bins = np.minimum((mid / total * delta).astype(np.int64), delta - 1)
    out_w = np.zeros(delta, dtype=np.float64)
    out_s = np.zeros(delta, dtype=np.float64)
    np.add.at(out_w, bins, weights)
    np.add.at(out_s, bins, means * weights)
    keep = out_w > 0
    return out_s[keep] / out_w[keep], out_w[keep]


def approx_quantiles(
    ds: ray.data.Dataset,
    col: str,
    qs: list[float],
    delta: int = 512,
    n_merge_buckets: int = 16,
) -> ray.data.Dataset:
    """Approximate quantiles via a mergeable equal-weight-bin sketch (the
    t-digest idea with uniform bin sizing) — the unbounded-cardinality
    path :func:`exact_quantiles` documents: a truly continuous column at
    100 TB makes the distinct-value groupby corpus-sized, while this
    sketch moves at most ``delta`` (mean, weight) rows per batch, merges
    them in ``n_merge_buckets`` parallel reducers, and finishes on a
    ≤ n_merge_buckets x delta row table at the driver.

    Rank error: a centroid never exceeds ~total/delta weight per level and
    the value assigned to a rank interpolates within one centroid, so the
    reported value's true rank lies within O(levels/delta) x n of the
    target — the tests pin rank error < 4/delta (two merge levels).
    Nulls excluded, as in SQL. Returns (q, value) rows like
    exact_quantiles; NOT SQL-oracle-able (merge order follows block
    boundaries), so correctness is pinned by rank-error tests instead."""

    def partial(batch: pa.Table) -> pa.Table:
        vals = pc.cast(batch[col], pa.float64())
        vals = vals.filter(pc.is_valid(vals)).to_numpy(zero_copy_only=False)
        if len(vals) == 0:
            return pa.table(
                {
                    "mean": pa.array([], pa.float64()),
                    "weight": pa.array([], pa.float64()),
                    "_b": pa.array([], pa.int64()),
                }
            )
        means, weights = _compress_centroids(
            vals, np.ones(len(vals), dtype=np.float64), delta
        )
        # spread sketches over the merge reducers by content hash — any
        # distribution is correct, this one is deterministic per batch
        b = int(np.abs(np.float64(vals.sum())).view(np.int64)) % n_merge_buckets
        return pa.table(
            {
                "mean": pa.array(means, pa.float64()),
                "weight": pa.array(weights, pa.float64()),
                "_b": pa.array([b] * len(means), pa.int64()),
            }
        )

    def merge_bucket(group: pd.DataFrame) -> pd.DataFrame:
        means, weights = _compress_centroids(
            group["mean"].to_numpy(np.float64),
            group["weight"].to_numpy(np.float64),
            delta,
        )
        return pd.DataFrame({"mean": means, "weight": weights})

    rows = (
        ds.select_columns([col])
        .map_batches(partial, batch_format="pyarrow")
        .groupby("_b")
        .map_groups(merge_bucket, batch_format="pandas")
        .take_all()  # <= n_merge_buckets * delta centroid rows, never data
    )
    if not rows:
        return ray.data.from_items([])
    means = np.asarray([r["mean"] for r in rows], dtype=np.float64)
    weights = np.asarray([r["weight"] for r in rows], dtype=np.float64)
    order = np.argsort(means, kind="mergesort")
    means, weights = means[order], weights[order]
    cum = np.cumsum(weights)
    total = cum[-1]
    out = []
    for q in qs:
        target = q * (total - 1)
        idx = int(np.searchsorted(cum - 1, target, side="left"))
        idx = min(idx, len(means) - 1)
        out.append({"q": float(q), "value": float(f"{means[idx]:.6f}")})
    return ray.data.from_items(out)


def quantiles(
    ds: ray.data.Dataset,
    col: str,
    qs: list[float],
    max_distinct: int = 1_000_000,
    sample_rows: int = 65_536,
) -> ray.data.Dataset:
    """Quantiles with an automatic exact/approximate route. At or below
    ``max_distinct`` estimated distinct values the distinct-value groupby
    is cheap and the answer is exact (quantile_cont semantics); above it
    the t-digest sketch path bounds the shuffle regardless of cardinality.

    The census is a BOUNDED sample, not a full pass: ``limit(sample_rows)``
    reads only the first block(s) (the streaming executor short-circuits),
    so the whole routed call scans the column ONCE plus an O(sample) head
    — the earlier wiring paid a full HyperLogLog traversal *and* the
    chosen path's traversal. If the sample covers the whole dataset the
    sample distinct count is exact; otherwise a near-unique sample
    (ratio r = distinct/sample) extrapolates to ``r * n`` total rows.
    The head sample is biased on clustered/sorted layouts, in BOTH
    directions: a repeat-heavy head over a diverse tail underestimates
    (exact path runs on a high-cardinality column), a diverse head over
    a repeat-heavy tail overestimates (sketch runs where exact was
    cheap). Either mis-route costs throughput only, never correctness or
    driver memory — the sketch is rank-error bounded, and the
    histogram-cut exact path's driver load is bounded by bin-local
    distinct pairs regardless of column cardinality. An all-null head
    says nothing and routes to the sketch. ``n`` comes from
    ``ds.count()`` — metadata-free for parquet reads, one pipeline
    execution for transformed inputs."""
    head = ds.select_columns([col]).limit(sample_rows).take_all()
    sample_n = len(head)
    sample_distinct = len({r[col] for r in head if r[col] is not None})
    if sample_n < sample_rows:
        est = sample_distinct  # saw everything: exact distinct count
    elif sample_distinct == 0:
        est = max_distinct + 1  # all-null head: unknown, take the safe path
    else:
        est = max(
            sample_distinct, int(sample_distinct / sample_n * ds.count())
        )
    if est <= max_distinct:
        return exact_quantiles(ds, col, qs)
    return approx_quantiles(ds, col, qs)


def _is_scan_only(ds: ray.data.Dataset) -> bool:
    """True when the dataset's logical plan is a bare (possibly
    column-projected) parquet/file read — re-executing it is a pruned
    re-scan, not a recomputation. Version-tolerant: any introspection
    failure routes to the safe answer (False -> keep the pin)."""
    try:
        from ray.data._internal.logical.operators.read_operator import Read

        node = ds._plan._logical_plan.dag
        while not isinstance(node, Read):
            if (
                type(node).__name__ != "Project"
                or len(node.input_dependencies) != 1
            ):
                return False
            node = node.input_dependencies[0]
        return True
    except Exception:
        return False


def exact_quantiles(
    ds: ray.data.Dataset, col: str, qs: list[float], n_bins: int = 8192
) -> ray.data.Dataset:
    """Exact quantiles with linear interpolation (SQL ``quantile_cont``
    semantics: h = (n-1)*q, interpolate between the flanking order
    statistics).

    Scale shape — histogram-cut order statistics (the global_rank
    playbook), NOT a distinct-value groupby: (1) a min/max/count
    aggregate; (2) a fixed-``n_bins`` histogram whose shuffle moves at
    most ``n_bins`` (bin, count) rows per batch; (3) a pass that ships
    ONLY (value, count) pairs from the few bins containing the target
    ranks to the driver for the final order-statistic lookup. The driver
    load is bounded by min(distinct values in the needed bins,
    rows/n_bins * |needed bins|): near-unique columns give small bins,
    repeat-heavy columns give few distinct pairs — never the raw
    row-count of a hot bin (a value held by half the column contributes
    ONE pair). The earlier distinct-value groupby pulled every distinct
    value to the driver, which on a near-unique 100-TB column is the
    corpus. The single-column projection is routed on input kind: for a
    TRANSFORMED input it is materialized once so the three passes don't
    re-execute upstream stages, but for a bare (possibly projected)
    parquet read each pass re-scans instead — a pruned column read is
    cheaper than pinning a 100-TB column in the object store, where the
    pin itself can spill. Binning uses one
    shared searchsorted rule on identical float64 edges in every pass,
    so a value's bin is consistent by construction. Nulls are excluded,
    as in SQL.

    Precision domain: every pass (binning, the (value, count) pair key,
    interpolation) views the column through a float64 cast. For int64
    inputs with |v| > 2^53, distinct raw values that share a float64
    representation merge into one pair — harmless for the RESULT, because
    the cast is monotone (the float64 multiset's order statistics are the
    casts of the raw order statistics, and SQL ``quantile_cont`` returns
    DOUBLE anyway) but it means the op cannot distinguish such values; a
    caller needing exact >2^53 integer quantiles should use a DECIMAL /
    string-keyed path instead.

    Returns rows (q, value), value rounded half-even to 6."""
    from ray.data.aggregate import Count, Max, Min, Sum

    def drop_nulls(batch: pa.Table) -> pa.Table:
        return batch.filter(pc.is_valid(batch[col]))

    proj = ds.select_columns([col]).map_batches(
        drop_nulls, batch_format="pyarrow"
    )
    if not _is_scan_only(ds):
        proj = proj.materialize()
    stats = proj.aggregate(
        Min(col, alias_name="mn"), Max(col, alias_name="mx"),
        Count(alias_name="n"),
    )
    total = int(stats["n"] or 0)
    if total == 0:
        return ray.data.from_items([])
    mn, mx = float(stats["mn"]), float(stats["mx"])
    edges = np.linspace(mn, mx, n_bins + 1)

    def bin_of(v: np.ndarray) -> np.ndarray:
        idx = np.searchsorted(edges, v, side="right") - 1
        return np.clip(idx, 0, n_bins - 1)

    def hist_partial(batch: pa.Table) -> pa.Table:
        v = pc.cast(batch[col], pa.float64()).to_numpy(zero_copy_only=False)
        counts = np.bincount(bin_of(v), minlength=n_bins)
        nz = np.nonzero(counts)[0]
        return pa.table(
            {
                "bin": pa.array(nz, pa.int64()),
                "n": pa.array(counts[nz], pa.int64()),
            }
        )

    bin_rows = (
        proj.map_batches(hist_partial, batch_format="pyarrow")
        .groupby("bin")
        .aggregate(Sum("n", alias_name="n"))
        .take_all()  # <= n_bins rows, never data
    )
    bin_counts = np.zeros(n_bins, dtype=np.int64)
    for r in bin_rows:
        bin_counts[int(r["bin"])] = int(r["n"])
    cum = np.cumsum(bin_counts)
    starts = cum - bin_counts  # global rank of each bin's first value

    # ranks needed across all requested quantiles -> their bins
    ranks: set[int] = set()
    for q in qs:
        h = (total - 1) * q
        lo = int(np.floor(h))
        ranks.add(lo)
        ranks.add(min(lo + 1, total - 1))
    needed_bins = {
        int(np.searchsorted(cum, rank, side="right")) for rank in ranks
    }
    needed_arr = np.fromiter(needed_bins, dtype=np.int64)

    def pick(batch: pa.Table) -> pa.Table:
        # per-batch (value, count) partials: a hot value repeats within a
        # batch but ships as ONE pair, so the driver read below is
        # distinct-pair-sized even when one bin holds half the column
        v = pc.cast(batch[col], pa.float64()).to_numpy(zero_copy_only=False)
        idx = bin_of(v)
        mask = np.isin(idx, needed_arr)
        vals, counts = np.unique(v[mask], return_counts=True)
        # no bin column: the groupby drops it and the driver re-derives
        # the bin from the value with the same shared rule
        return pa.table(
            {
                "v": pa.array(vals, pa.float64()),
                "n": pa.array(counts, pa.int64()),
            }
        )

    pair_rows = (
        proj.map_batches(pick, batch_format="pyarrow")
        .groupby("v")
        .aggregate(Sum("n", alias_name="n"))
        .take_all()  # distinct values within the needed bins only
    )
    by_bin: dict[int, list[tuple[float, int]]] = {b: [] for b in needed_bins}
    for row in pair_rows:
        v = float(row["v"])
        by_bin[int(bin_of(np.asarray([v]))[0])].append((v, int(row["n"])))
    bin_cums: dict[int, tuple[np.ndarray, np.ndarray]] = {}
    for b, pairs_ in by_bin.items():
        pairs_.sort()
        vals = np.asarray([p[0] for p in pairs_], dtype=np.float64)
        bin_cums[b] = (vals, np.cumsum([p[1] for p in pairs_]))

    def value_at(rank: int) -> float:
        b = int(np.searchsorted(cum, rank, side="right"))
        vals, c = bin_cums[b]
        # rank within the bin -> first distinct value whose cumcount
        # exceeds it
        return float(vals[np.searchsorted(c, rank - int(starts[b]), side="right")])

    out = []
    for q in qs:
        h = (total - 1) * q
        lo = int(np.floor(h))
        lo_v = value_at(lo)
        hi_v = value_at(min(lo + 1, total - 1))
        v = lo_v + (h - lo) * (hi_v - lo_v)
        out.append({"q": float(q), "value": float(f"{v:.6f}")})
    return ray.data.from_items(out)


# ---- global ranking --------------------------------------------------------


def global_rank(
    ds: ray.data.Dataset,
    score_col: str,
    id_col: str = "doc_id",
    descending: bool = True,
    num_buckets: int = 64,
    cuts: "list[float] | None" = None,
) -> ray.data.Dataset:
    """Global ROW_NUMBER ranking by ``score_col`` (ties broken by
    ``id_col``), plus the rank/N percentile — the corpus-wide "sort
    quality scores and keep the top X%" primitive Ray Data has no
    operator for (no zip-with-index / row-number).

    Distributed shape (histogram + prefix sum): (1) bucketize every row by
    score range (equal scores ALWAYS share a bucket, so the id
    tie-break never straddles buckets); (2) tiny per-bucket count
    groupby -> driver prefix-sums ~num_buckets offsets; (3) groupby
    bucket, sort WITHIN each bucket, rank = bucket offset + local
    index. The shuffle moves only (id, score, bucket); each bucket
    (~N/num_buckets rows) must fit one worker — size ``num_buckets``
    to the corpus, or pass quantile ``cuts`` (e.g. from
    :func:`approx_quantiles`) when the score distribution is skewed;
    default cuts are equal-width between min and max. Null scores rank
    last (DuckDB's NULLS LAST), ordered by id. ``percentile`` goes
    through printf-style decimal rounding (``float(f"{x:.6f}")``) for
    oracle parity.
    """
    ds = ds.select_columns([id_col, score_col])
    if cuts is None:
        mm = ds.aggregate(Min(score_col, alias_name="lo"), Max(score_col, alias_name="hi"))
        lo, hi = mm.get("lo"), mm.get("hi")
        if lo is None or hi is None or float(lo) == float(hi):
            cuts_arr = np.array([], dtype=np.float64)
        else:
            cuts_arr = np.linspace(float(lo), float(hi), num_buckets + 1)[1:-1]
    else:
        cuts_arr = np.asarray(sorted(float(c) for c in cuts), dtype=np.float64)
    null_bucket = len(cuts_arr) + 1  # one past the highest real bucket

    def bucketize(batch: pa.Table) -> pa.Table:
        score = batch[score_col]
        isnull = pc.is_null(score).to_numpy(zero_copy_only=False)
        s = pc.fill_null(pc.cast(score, pa.float64()), 0.0).to_numpy(
            zero_copy_only=False
        )
        b = np.searchsorted(cuts_arr, s, side="left").astype(np.int32)
        b[isnull] = null_bucket
        return pa.table(
            {id_col: batch[id_col], score_col: score, "bucket": pa.array(b)}
        )

    bucketized = ds.map_batches(bucketize, batch_format="pyarrow")
    counts = bucketized.groupby("bucket").aggregate(Count(alias_name="n")).take_all()
    by_bucket = {int(r["bucket"]): int(r["n"]) for r in counts}
    real = sorted(b for b in by_bucket if b != null_bucket)
    order = (list(reversed(real)) if descending else real) + (
        [null_bucket] if null_bucket in by_bucket else []
    )
    offsets: dict[int, int] = {}
    total = 0
    for b in order:
        offsets[b] = total
        total += by_bucket[b]

    score_type = ds.schema().base_schema.field(score_col).type
    id_type = ds.schema().base_schema.field(id_col).type
    out_schema = pa.schema(
        [
            (id_col, id_type),
            (score_col, score_type),
            ("rank", pa.int64()),
            ("percentile", pa.float64()),
        ]
    )

    def rank_group(group: pa.Table) -> pa.Table:
        b = group["bucket"][0].as_py()
        if b == null_bucket:
            ordered = group.sort_by([(id_col, "ascending")])
        else:
            ordered = group.sort_by(
                [
                    (score_col, "descending" if descending else "ascending"),
                    (id_col, "ascending"),
                ]
            )
        ranks = offsets[b] + 1 + np.arange(ordered.num_rows, dtype=np.int64)
        pct = [float(f"{r / total:.6f}") for r in ranks]
        return pa.table(
            {
                id_col: ordered[id_col],
                score_col: ordered[score_col],
                "rank": pa.array(ranks),
                "percentile": pa.array(pct, pa.float64()),
            }
        )

    return (
        bucketized.groupby("bucket")
        .map_groups(rank_group, batch_format="pyarrow")
        .map_batches(schema_pin(out_schema), batch_format="pyarrow")
    )


# ---- per-group top-k (ROW_NUMBER PARTITION BY ... <= k) --------------------


def _group_runs(values: list) -> np.ndarray:
    """0-based rank of each row within consecutive runs of equal group
    values (input must already be sorted by group). Nulls are encoded as
    their own group (the SQL PARTITION BY law: one NULL partition)."""
    # dtype=object, NOT numpy unicode: a fixed-width unicode array
    # silently truncates trailing NULs, merging "a" and "a\x00" into one
    # run and corrupting the window/group law
    g = np.array(
        ["\x01" + str(v) if v is not None else "\x00" for v in values],
        dtype=object,
    )
    if len(g) == 0:
        return np.zeros(0, dtype=np.int64)
    change = np.r_[True, g[1:] != g[:-1]]
    starts = np.maximum.accumulate(
        np.where(change, np.arange(len(g), dtype=np.int64), 0)
    )
    return np.arange(len(g), dtype=np.int64) - starts


_GROUP_BUCKETS = 256


def _bucket_by_group(
    ds: ray.data.Dataset, group_col: str, cols: list[str]
) -> ray.data.Dataset:
    """Hash-bucket shuffle key over a (possibly null) group column —
    prefix-encoded, never the raw value (Ray 2.49 groupby crashes on
    null string keys), coarse so tiny groups don't each pay a task."""

    def add_bucket(batch: pa.Table) -> pa.Table:
        t = batch.select(cols)
        keys = [
            md5_bucket("\x01" + str(v), _GROUP_BUCKETS)
            if v is not None
            else md5_bucket("\x00", _GROUP_BUCKETS)
            for v in t[group_col].to_pylist()
        ]
        return t.append_column("_gb", pa.array(keys, pa.int64()))

    return ds.map_batches(add_bucket, batch_format="pyarrow")


def top_k_per_group(
    ds: ray.data.Dataset,
    group_col: str,
    order_col: str,
    k: int,
    id_col: str = "doc_id",
    descending: bool = True,
) -> ray.data.Dataset:
    """Keep the top ``k`` rows of every group by ``order_col`` (ties broken
    by ``id_col`` ascending) — SQL ``ROW_NUMBER() OVER (PARTITION BY g
    ORDER BY v DESC NULLS LAST, id ASC NULLS LAST) <= k``. The per-domain
    / per-source cap primitive of web-scale curation (RefinedWeb-style
    "at most N documents per domain").

    Scale shape: a per-batch local top-k-per-group pass bounds shuffle
    rows at k x (groups seen in the batch) BEFORE the hash-bucketed
    groupby — the corpus never moves, only each group's current top-k
    candidates. A NULL group is its own partition (prefix-encoded bucket
    key; Ray groupby cannot take null keys directly). All-Arrow: no
    pandas float round-trip can corrupt int64 ids or order values."""
    cols = [group_col, order_col, id_col]
    direction = "descending" if descending else "ascending"

    def local_topk(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return t
        idx = pc.sort_indices(
            t,
            sort_keys=[
                (group_col, "ascending"),
                (order_col, direction),
                (id_col, "ascending"),
            ],
            null_placement="at_end",
        )
        s = t.take(idx)
        keep = _group_runs(s[group_col].to_pylist()) < k
        return s.filter(pa.array(keep, pa.bool_()))

    bucketized = _bucket_by_group(
        ds.map_batches(
            lambda b: local_topk(b.select(cols)), batch_format="pyarrow"
        ),
        group_col,
        cols,
    )

    def final_topk(group: pa.Table) -> pa.Table:
        return local_topk(group.select(cols))

    schema = ds.schema().base_schema
    out_schema = pa.schema([(c, schema.field(c).type) for c in cols])
    return (
        bucketized.groupby("_gb")
        .map_groups(final_topk, batch_format="pyarrow")
        .map_batches(schema_pin(out_schema), batch_format="pyarrow")
    )


def _grouped_quantiles_census(
    ds: ray.data.Dataset, group_col: str, col: str
) -> list[tuple[object, int]]:
    """(group value, count of valid ``col`` values) per distinct group —
    one driver row per group, the same order as the op's own output, so
    the driver load is output-bounded by construction. Per-batch Arrow
    group_by partials merge in one tiny prefix-encoded-key groupby (Ray
    2.49 groupby crashes on null keys; the raw group value rides along as
    a non-key column and survives via Min)."""
    gtype = ds.schema().base_schema.field(group_col).type

    def count_partial(batch: pa.Table) -> pa.Table:
        t = batch.select([group_col, col]).filter(pc.is_valid(batch[col]))
        gvals = t[group_col].to_pylist()
        keys = pa.array(
            ["\x01" + str(v) if v is not None else "\x00" for v in gvals],
            pa.string(),
        )
        part = (
            pa.table(
                # cast: an all-null block slice types the column `null`,
                # which would diverge partial schemas across blocks
                {"_gkey": keys, "_gval": pc.cast(t[group_col], gtype)}
            )
            .group_by("_gkey")
            .aggregate([("_gval", "min"), ([], "count_all")])
        )
        # select by GENERATED name before renaming: pyarrow versions
        # disagree on whether group keys come first or last
        return part.select(["_gkey", "_gval_min", "count_all"]).rename_columns(
            ["_gkey", "_gval", "n"]
        )

    rows = (
        ds.map_batches(count_partial, batch_format="pyarrow")
        .groupby("_gkey")
        .aggregate(Sum("n", alias_name="n"), Min("_gval", alias_name="_gval"))
        .take_all()
    )
    return [(r["_gval"], int(r["n"])) for r in rows]


def grouped_quantiles(
    ds: ray.data.Dataset,
    group_col: str,
    col: str,
    qs: list[float],
    max_group_rows: "int | None" = 4_000_000,
) -> ray.data.Dataset:
    """Per-group exact quantiles with linear interpolation (SQL
    ``quantile_cont(col, q) ... GROUP BY group`` semantics): one row per
    (group, q), value decimal-rounded to 6. Null ``col`` values are
    ignored; a group with no valid values emits no rows; a NULL group is
    its own group (SQL GROUP BY law).

    Scale shape: a census pass (one driver row per group — output-bounded),
    then ONE hash-bucketed shuffle of (group, value) pairs with per-group
    sorted-array interpolation inside the bucket — group cardinality
    bounds nothing here (any number of tiny groups share the coarse
    buckets). The giant-group guard: a skewed key (one language = 40% of
    a 100-TB corpus) would otherwise sort in a single task, so any group
    whose valid-value count exceeds ``max_group_rows`` detours through
    :func:`exact_quantiles`' histogram-cut order statistics (driver load
    bounded by n_bins + the needed bins' distinct pairs, never the group's
    rows), and only the remaining small groups ride the bucketed sort.
    Giant groups are few by definition (each holds > cap rows), so the
    per-group detour count is bounded by corpus_rows / cap.
    ``max_group_rows=None`` disables the guard (and the census).

    The two routes share the interpolation law (h = (n-1)q between
    flanking order statistics, then decimal rounding) — route equality is
    pinned by the planted giant-group test. One documented divergence:
    a float column holding literal NaN values drops them here but ranks
    them in exact_quantiles; integer/decimal columns are unaffected."""
    cols = [group_col, col]

    if max_group_rows is not None:
        # the guard adds a census pass (plus per-giant-group detours) on
        # top of the main shuffle: project to the two columns ONCE so no
        # pass drags unrelated columns, and pin a TRANSFORMED upstream so
        # it isn't re-executed per pass. A bare parquet read skips the pin
        # and re-scans its pruned (Project pushes into Read) columns
        # instead — the exact_quantiles routing rationale.
        scan_only = _is_scan_only(ds)
        ds = ds.select_columns(cols)
        if not scan_only:
            ds = ds.materialize()

    giants: list[tuple[object, int]] = []
    if max_group_rows is not None:
        giants = [
            (g, n)
            for g, n in _grouped_quantiles_census(ds, group_col, col)
            if n > max_group_rows
        ]

    gtype_field = ds.schema().base_schema.field(group_col).type
    giant_tables: list[pa.Table] = []
    if giants:
        small_mask_vals = [g for g, _ in giants if g is not None]
        drop_null_group = any(g is None for g, _ in giants)

        def keep_small(batch: pa.Table) -> pa.Table:
            keep = pa.array([True] * batch.num_rows)
            if small_mask_vals:
                keep = pc.and_(
                    keep,
                    pc.coalesce(
                        pc.invert(
                            pc.is_in(
                                # an all-null block slice types the column
                                # `null` — cast to the schema type first
                                pc.cast(batch[group_col], gtype_field),
                                value_set=pa.array(small_mask_vals, gtype_field),
                            )
                        ),
                        pa.scalar(True),
                    ),
                )
            if drop_null_group:
                keep = pc.and_(keep, pc.is_valid(batch[group_col]))
            return batch.filter(keep)

        ds_small = ds.map_batches(keep_small, batch_format="pyarrow")
        for gval, _n in giants:
            if gval is None:
                pred = lambda b: b.filter(pc.is_null(b[group_col]))
            else:
                pred = lambda b, _g=gval: b.filter(
                    pc.coalesce(
                        pc.equal(
                            pc.cast(b[group_col], gtype_field),
                            pa.scalar(_g, gtype_field),
                        ),
                        pa.scalar(False),
                    )
                )
            sub = ds.map_batches(
                lambda b, _p=pred: _p(b.select(cols)), batch_format="pyarrow"
            )
            grows = exact_quantiles(sub, col, qs).take_all()  # |qs| rows
            giant_tables.append(
                pa.table(
                    {
                        group_col: pa.array([gval] * len(grows), gtype_field),
                        "q": pa.array([r["q"] for r in grows], pa.float64()),
                        "value": pa.array(
                            [r["value"] for r in grows], pa.float64()
                        ),
                    }
                )
            )
        ds = ds_small

    bucketized = _bucket_by_group(ds, group_col, cols)

    def quants(group: pa.Table) -> pa.Table:
        idx = pc.sort_indices(
            group,
            sort_keys=[(group_col, "ascending"), (col, "ascending")],
            null_placement="at_end",
        )
        s = group.take(idx)
        gvals = s[group_col].to_pylist()
        vals = pc.cast(s[col], pa.float64()).to_numpy(zero_copy_only=False)
        ranks = _group_runs(gvals)
        starts = np.flatnonzero(ranks == 0)
        ends = np.r_[starts[1:], len(gvals)] if len(starts) else starts
        out_g, out_q, out_v = [], [], []
        for st, en in zip(starts, ends):
            run = vals[st:en]
            run = run[~np.isnan(run)]
            if run.size == 0:
                continue
            for q in qs:
                h = (run.size - 1) * q
                lo = int(np.floor(h))
                hi = min(lo + 1, run.size - 1)
                v = run[lo] + (h - lo) * (run[hi] - run[lo])
                out_g.append(gvals[st])
                out_q.append(float(q))
                out_v.append(float(f"{v:.6f}"))
        gtype = group.schema.field(group_col).type
        return pa.table(
            {
                group_col: pa.array(out_g, gtype),
                "q": pa.array(out_q, pa.float64()),
                "value": pa.array(out_v, pa.float64()),
            }
        )

    out_schema = pa.schema(
        [(group_col, gtype_field), ("q", pa.float64()), ("value", pa.float64())]
    )
    small = (
        bucketized.groupby("_gb")
        .map_groups(quants, batch_format="pyarrow")
        .map_batches(schema_pin(out_schema), batch_format="pyarrow")
    )
    if giant_tables:
        giant_ds = ray.data.from_arrow(
            pa.concat_tables(giant_tables).cast(out_schema)
        ).map_batches(schema_pin(out_schema), batch_format="pyarrow")
        return small.union(giant_ds)
    return small


# ---- heavy hitters (Misra-Gries-style mergeable summary) -------------------


def heavy_hitters(
    ds: ray.data.Dataset,
    col: str,
    k: int = 10,
    capacity: int = 4096,
) -> ray.data.Dataset:
    """Approximate top-``k`` most frequent values — the heavy-hitter member
    of the mergeable-sketch family (HLL for distinct, the equal-weight-bin
    sketch for quantiles, this for frequency; Agarwal et al., "Mergeable
    Summaries", public). Each batch emits an exact counter trimmed to
    ``capacity`` survivors (counts decremented by the first dropped
    count, the Misra-Gries step), partials merge in one
    value-keyed Sum groupby, and the final top-k is a sort over the
    DISTINCT-SURVIVOR table (bounded far below the corpus; never raw
    rows). Any value with true frequency > n/capacity is guaranteed to
    survive; reported counts under-count by at most n/capacity. With
    ``capacity`` >= the column's distinct count no trim ever fires and
    the result is exact — the regime the SQL oracle pins; the
    approximate regime is pinned by a bound test instead.

    Null values are dropped (a frequency of nothing is not a hitter —
    the oracle's WHERE). Output: (value, n), ordered n DESC, value ASC,
    k rows."""
    from collections import Counter

    try:
        val_type = ds.schema().base_schema.field(col).type
    except Exception:
        val_type = pa.string()
    out_schema = pa.schema([("value", val_type), ("n", pa.int64())])

    def mg_partial(batch: pa.Table) -> pa.Table:
        counts = Counter(v for v in batch[col].to_pylist() if v is not None)
        if len(counts) > capacity:
            ranked = counts.most_common()
            cut = ranked[capacity][1]  # first dropped count
            counts = Counter(
                {v: c - cut for v, c in ranked[:capacity] if c - cut > 0}
            )
        return pa.table(
            {
                "value": pa.array(list(counts.keys()), val_type),
                "n": pa.array(
                    [int(c) for c in counts.values()], pa.int64()
                ),
            }
        )

    return (
        ds.select_columns([col])
        .map_batches(mg_partial, batch_format="pyarrow")
        .groupby("value")
        .aggregate(Sum("n", alias_name="n"))
        .sort(["n", "value"], descending=[True, False])
        .limit(k)
        .map_batches(schema_pin(out_schema), batch_format="pyarrow")
    )
