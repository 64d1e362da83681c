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
        df = batch.to_pandas()
        df["disc_price"] = df.l_extendedprice * (1 - df.l_discount)
        g = df.groupby(["l_returnflag", "l_linestatus"], as_index=False).agg(
            sum_qty=("l_quantity", "sum"),
            sum_base_price=("l_extendedprice", "sum"),
            sum_disc_price=("disc_price", "sum"),
            count_order=("l_quantity", "size"),
        )
        return pa.Table.from_pandas(g, preserve_index=False)

    partials = ds.map_batches(partial, batch_format="pyarrow")
    out = partials.groupby(["l_returnflag", "l_linestatus"]).aggregate(
        Sum("sum_qty", alias_name="sum_qty"),
        Sum("sum_base_price", alias_name="sum_base_price"),
        Sum("sum_disc_price", alias_name="sum_disc_price"),
        Sum("count_order", alias_name="count_order"),
    )
    return out.sort(["l_returnflag", "l_linestatus"])


def revenue_by_nation(sf_dir: str) -> ray.data.Dataset:
    """Broadcast-join pipeline: customer->nation lookup shipped once via
    ray.put, revenue aggregated from orders."""
    nation = pd.read_parquet(f"{sf_dir}/nation.parquet")
    customer = pd.read_parquet(
        f"{sf_dir}/customer.parquet", columns=["c_custkey", "c_nationkey"]
    )
    cust_nation = customer.merge(
        nation[["n_nationkey", "n_name"]],
        left_on="c_nationkey",
        right_on="n_nationkey",
    )[["c_custkey", "n_name"]]
    lookup_ref = ray.put(dict(zip(cust_nation.c_custkey, cust_nation.n_name)))

    class JoinNation:
        def __init__(self, ref):
            self.lookup = ray.get(ref)

        def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
            batch["n_name"] = batch["o_custkey"].map(self.lookup)
            g = batch.groupby("n_name", as_index=False).agg(
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


def customers_without_orders(
    sf_dir: str, since: str = "1998-01-01"
) -> ray.data.Dataset:
    """Anti-join: customers with no orders on/after ``since``. Probe side =
    distinct recent o_custkey (predicate pushed to the parquet read,
    deduped in Arrow before leaving the driver)."""
    import datetime

    import pyarrow.parquet as pq

    cutoff = datetime.datetime.fromisoformat(since)
    keys = pc.unique(
        pq.read_table(
            f"{sf_dir}/orders.parquet",
            columns=["o_custkey"],
            filters=[("o_orderdate", ">=", cutoff)],
        ).column("o_custkey")
    )
    ds = ray.data.read_parquet(
        f"{sf_dir}/customer.parquet", columns=["c_custkey", "c_name"]
    )
    return broadcast_key_filter(ds, "c_custkey", keys, keep=False).sort("c_custkey")


def parts_in_lineitem(sf_dir: str) -> ray.data.Dataset:
    """Semi-join: parts referenced by any lineitem (distinct probe keys)."""
    import pyarrow.parquet as pq

    keys = pc.unique(
        pq.read_table(f"{sf_dir}/lineitem.parquet", columns=["l_partkey"]).column(
            "l_partkey"
        )
    )
    ds = ray.data.read_parquet(
        f"{sf_dir}/part.parquet", columns=["p_partkey", "p_name"]
    )
    return broadcast_key_filter(ds, "p_partkey", keys, keep=True).sort("p_partkey")


def distinct_counts(sf_dir: str) -> ray.data.Dataset:
    """Exact distinct counts via per-batch set partials merged in one tiny
    reduce — the pre-aggregate pattern applied to COUNT(DISTINCT)."""
    ds = ray.data.read_parquet(
        f"{sf_dir}/orders.parquet", columns=["o_custkey", "o_orderpriority"]
    )

    def partial(batch: pa.Table) -> pa.Table:
        custs = pc.unique(batch["o_custkey"])
        prios = pc.unique(batch["o_orderpriority"])
        return pa.table(
            {
                "custkeys": pa.array([custs.to_pylist()]),
                "priorities": pa.array([prios.to_pylist()]),
            }
        )

    parts = ds.map_batches(partial, batch_format="pyarrow").take_all()
    n_cust = len({k for row in parts for k in row["custkeys"]})
    n_prio = len({p for row in parts for p in row["priorities"]})
    return ray.data.from_items(
        [{"n_distinct_custkeys": n_cust, "n_distinct_priorities": n_prio}]
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
    joined = partials.join(
        orders,
        join_type="inner",
        num_partitions=16,
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
