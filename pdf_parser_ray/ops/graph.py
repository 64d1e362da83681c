"""Link-analysis operators: co-occurrence graph derivation and a
fixed-point integer PageRank.

The reference engine has no graph surface; these are the
training-data-pipeline extensions a 100 TB curation run needs — product /
document graphs (co-purchase, shared-shingle near-dup cliques, citation
structure) ranked by stationary importance.

PageRank here is EXACT-ARITHMETIC by construction: ranks live in integer
fixed-point "mass units" (``unit`` = 10^12 per node) and every update is
an integer multiply / floor-divide / sum — order-independent, so the
driver route, the distributed co-partitioned route, and the unrolled
DuckDB oracle produce bit-identical BIGINT ranks. (Float PageRank sums
depend on reduction order; integer mass does not.) The update law, shared
verbatim by all three:

    base        = ((d_den - d_num) * unit) // d_den
    share(u)    = r_t(u) // out_deg(u)          (0 when out_deg = 0)
    r_{t+1}(v)  = base + (d_num * sum_{(u,v) in E} share(u)) // d_den

with r_0(v) = unit for every node in src(E) ∪ dst(E). All quantities are
non-negative, so floor division is identical in numpy, Python and DuckDB
``//``. The binding overflow limit is the ``d_num * msum`` multiply: a
node's incoming message sum must stay ≤ (2^63-1) // d_num ≈ 1.08e17 —
about 108k nodes' worth of fully-concentrated mass at the default unit.
Both routes CHECK the bound and raise (matching the SQL oracle, where
DuckDB's BIGINT multiply errors) instead of wrapping silently; callers
with pathological hubs lower ``unit``.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import ray.data

from pdf_parser_ray.functions.hashing import md5_bucket
from pdf_parser_ray.functions.tables import schema_pin
from pdf_parser_ray.ops.streaming import hash_bucket_column

# coarse shuffle-key cardinality, same rationale as ops.dedup._DEDUP_BUCKETS
_GRAPH_BUCKETS = 256


def _num_buckets(n_edges: int) -> int:
    """One bucket per ~64k edge rows, floor 8, rounded UP to a power of
    two (the vectorized &-mask bucketing needs it) — per-round AllToAll
    cost on this Ray build is paid PER BLOCK, so width must track data
    volume."""
    want = min(_GRAPH_BUCKETS, max(8, n_edges // 65_536 + 8))
    return 1 << (want - 1).bit_length()


def cooccurrence_edges(
    ds: ray.data.Dataset,
    group_col: str,
    item_col: str,
    max_group_items: int = 256,
    num_buckets: int = 64,
) -> ray.data.Dataset:
    """Distinct undirected co-occurrence pairs: (item_a, item_b) whenever
    both items appear in the same group (e.g. parts in the same order),
    with item_a < item_b — numerically for integer item columns, else
    lexicographically (the ops.dedup pair-order convention).

    Null groups / null items are dropped (the pair join law: SQL's
    ``a.group = b.group AND a.item < b.item`` can never match a null).
    Groups holding more than ``max_group_items`` DISTINCT items are
    skipped entirely — the hot-group guard: one degenerate group of 100k
    items would emit 5e9 pairs (same shape as the cross_pairs hot-band
    cap). Two coarse shuffles: co-locate by group to emit pairs, then by
    pair to dedup across groups.
    """
    int_items = pa.types.is_integer(ds.schema().base_schema.field(item_col).type)

    def tag_group(batch: pa.Table) -> pa.Table:
        batch = batch.select([group_col, item_col])
        mask = pc.and_(pc.is_valid(batch[group_col]), pc.is_valid(batch[item_col]))
        batch = batch.filter(mask)
        # the hash_bucket_column convention: vectorized &-mask for integer
        # keys (num_buckets is a power of two), md5 loop otherwise
        return batch.append_column(
            "_b", hash_bucket_column(batch, group_col, num_buckets)
        )

    item_t = pa.int64() if int_items else pa.string()
    pair_schema = pa.schema(
        [("item_a", item_t), ("item_b", item_t), ("_pb", pa.int64())]
    )

    def pairs_per_bucket(group: pa.Table) -> pa.Table:
        df = group.select([group_col, item_col]).to_pandas().drop_duplicates()
        out_a: list = []
        out_b: list = []
        for _, items in df.groupby(group_col)[item_col]:
            if len(items) < 2 or len(items) > max_group_items:
                continue
            vals = np.sort(items.to_numpy())
            ia, ib = np.triu_indices(len(vals), k=1)
            out_a.extend(vals[ia])
            out_b.extend(vals[ib])
        if int_items:
            a = pa.array([int(x) for x in out_a], pa.int64())
            b = pa.array([int(x) for x in out_b], pa.int64())
            pb = [int(x) % num_buckets for x in out_a]
        else:
            a = pa.array([str(x) for x in out_a], pa.string())
            b = pa.array([str(x) for x in out_b], pa.string())
            pb = [md5_bucket(str(x), num_buckets) for x in out_a]
        return pa.table(
            {"item_a": a, "item_b": b, "_pb": pa.array(pb, pa.int64())}
        )

    def distinct_pairs(group: pa.Table) -> pa.Table:
        df = group.select(["item_a", "item_b"]).to_pandas().drop_duplicates()
        if int_items:
            # a null-free int64 frame: pandas keeps int64, no float hazard
            a = pa.array(df["item_a"].to_numpy(np.int64), pa.int64())
            b = pa.array(df["item_b"].to_numpy(np.int64), pa.int64())
        else:
            a = pa.array(df["item_a"].astype(str).tolist(), pa.string())
            b = pa.array(df["item_b"].astype(str).tolist(), pa.string())
        return pa.table({"item_a": a, "item_b": b})

    return (
        ds.map_batches(tag_group, batch_format="pyarrow")
        .groupby("_b")
        .map_groups(pairs_per_bucket, batch_format="pyarrow")
        .map_batches(schema_pin(pair_schema), batch_format="pyarrow")
        .groupby("_pb")
        .map_groups(distinct_pairs, batch_format="pyarrow")
        .map_batches(
            schema_pin(pa.schema([("item_a", item_t), ("item_b", item_t)])),
            batch_format="pyarrow",
        )
    )


def _pagerank_driver(
    src: np.ndarray,
    dst: np.ndarray,
    node_vals: np.ndarray,
    iterations: int,
    d_num: int,
    d_den: int,
    unit: int,
) -> np.ndarray:
    """The update law over factorized edge arrays. int64 throughout;
    np.add.at keeps the message sum exact (bincount would route through
    float64 weights and lose ulps past 2^53)."""
    idx = {v: i for i, v in enumerate(node_vals)}
    s = np.fromiter((idx[v] for v in src), np.int64, len(src))
    t = np.fromiter((idx[v] for v in dst), np.int64, len(dst))
    n = len(node_vals)
    deg = np.bincount(s, minlength=n).astype(np.int64)
    base = ((d_den - d_num) * unit) // d_den
    r = np.full(n, unit, np.int64)
    safe_deg = np.maximum(deg, 1)
    msum_cap = (2**63 - 1) // d_num
    for _ in range(iterations):
        share = np.where(deg > 0, r // safe_deg, 0)
        msum = np.zeros(n, np.int64)
        np.add.at(msum, t, share[s])
        if msum.max(initial=0) > msum_cap:
            raise ValueError(
                "pagerank fixed-point overflow: a node's message sum "
                f"exceeds {msum_cap}; lower `unit`"
            )
        r = base + (d_num * msum) // d_den
    return r


def pagerank(
    edges: ray.data.Dataset,
    iterations: int = 8,
    d_num: int = 85,
    d_den: int = 100,
    unit: int = 10**12,
    src_col: str = "src",
    dst_col: str = "dst",
    driver_max_edges: int = 20_000_000,
    broadcast_max_nodes: int = 2_000_000,
    num_buckets: "int | None" = None,
) -> ray.data.Dataset:
    """Fixed-iteration PageRank over a DIRECTED edge table (callers wanting
    the undirected variant pass both orientations). Returns
    (node, rank_fp BIGINT, rank DOUBLE) where rank = np.round(rank_fp /
    unit, 6). Duplicate edge rows count as parallel edges — derive with
    :func:`cooccurrence_edges` (distinct) when that is not wanted. Rows
    with a null endpoint are dropped (SQL join law). Nodes appearing only
    as destinations are dangling: they receive mass but emit none.

    Scale routing, the ops.dedup convention — three regimes, identical
    integer law, bit-identical output:

    * ≤ ``driver_max_edges`` edge rows: the vectorized driver kernel (the
      edge list is bounded and already materialized for the count).
    * more edges but ≤ ``broadcast_max_nodes`` distinct nodes (the common
      web-graph shape: edges >> nodes): BROADCAST route — the rank/share
      arrays ship once per round via ray.put and the STATIC edge table is
      mapped in place (never reshuffled); each batch emits pre-aggregated
      (dst, partial-sum) rows, one small groupby-Sum per round. The
      kmeans broadcast-centroids shape.
    * otherwise: co-partitioned message passing — edges and rank rows
      bucketed on the same endpoint hash, 2 coarse shuffles of the FULL
      edge table per iteration (the connected_components_distributed
      topology). Unbounded in both dimensions, and priced accordingly;
      it exists so no graph size is uncomputable, not to be fast.

    All routes run a FIXED iteration count (no fixpoint probe) so the
    unrolled SQL oracle can replay them exactly.
    """
    schema = edges.schema()
    if schema is None:
        # a fully-empty upstream (e.g. filter-all) has no schema at all;
        # the node type is unknowable, so the empty result uses string
        return ray.data.from_arrow(
            pa.Table.from_pylist(
                [],
                schema=pa.schema(
                    [
                        ("node", pa.string()),
                        ("rank_fp", pa.int64()),
                        ("rank", pa.float64()),
                    ]
                ),
            )
        )
    node_t = schema.base_schema.field(src_col).type
    int_nodes = pa.types.is_integer(node_t)
    out_t = pa.int64() if int_nodes else pa.string()

    def clean(batch: pa.Table) -> pa.Table:
        batch = batch.select([src_col, dst_col])
        return batch.filter(
            pc.and_(pc.is_valid(batch[src_col]), pc.is_valid(batch[dst_col]))
        )

    edges = edges.map_batches(clean, batch_format="pyarrow").materialize()
    n_edges = edges.count()
    out_schema = pa.schema(
        [("node", out_t), ("rank_fp", pa.int64()), ("rank", pa.float64())]
    )
    if n_edges == 0:
        return ray.data.from_arrow(pa.Table.from_pylist([], schema=out_schema))

    if n_edges <= driver_max_edges:
        tbl = pa.concat_tables(edges.iter_batches(batch_format="pyarrow"))
        src = tbl[src_col].to_numpy(zero_copy_only=False)
        dst = tbl[dst_col].to_numpy(zero_copy_only=False)
        node_vals = np.unique(np.concatenate([src, dst]))
        r = _pagerank_driver(src, dst, node_vals, iterations, d_num, d_den, unit)
        out = pa.table(
            {
                "node": pa.array(
                    [int(v) for v in node_vals] if int_nodes else [str(v) for v in node_vals],
                    out_t,
                ),
                "rank_fp": pa.array(r, pa.int64()),
                "rank": pa.array(np.round(r / float(unit), 6), pa.float64()),
            }
        )
        return ray.data.from_arrow(out)

    if broadcast_max_nodes > 0:
        from ray.data.aggregate import Sum

        def deg_partials(batch: pa.Table) -> pa.Table:
            s = batch[src_col].to_numpy(zero_copy_only=False)
            d = batch[dst_col].to_numpy(zero_copy_only=False)
            su, sc = np.unique(s, return_counts=True)
            du = np.unique(d)
            return pa.table(
                {
                    "node": pa.array(
                        np.concatenate([su, du]), pa.int64() if int_nodes else pa.string()
                    ),
                    "deg": pa.array(
                        np.concatenate([sc, np.zeros(len(du), np.int64)]),
                        pa.int64(),
                    ),
                }
            )

        deg_table = (
            edges.map_batches(deg_partials, batch_format="pyarrow")
            .groupby("node")
            .aggregate(Sum("deg", alias_name="deg"))
            .materialize()
        )
        if deg_table.count() <= broadcast_max_nodes:
            return _pagerank_broadcast(
                edges, deg_table, iterations, d_num, d_den, unit,
                src_col, dst_col, int_nodes, out_schema,
            )

    return _pagerank_distributed(
        edges, iterations, d_num, d_den, unit, src_col, dst_col,
        int_nodes, out_schema,
        num_buckets if num_buckets is not None else _num_buckets(n_edges),
    )


def _pagerank_broadcast(
    edges: ray.data.Dataset,
    deg_table: ray.data.Dataset,
    iterations: int,
    d_num: int,
    d_den: int,
    unit: int,
    src_col: str,
    dst_col: str,
    int_nodes: bool,
    out_schema: pa.Schema,
) -> ray.data.Dataset:
    """Broadcast-ranks route: the node arrays (bounded by
    broadcast_max_nodes) live on the driver; each round ships the share
    array once via ray.put and maps the STATIC edge table in place —
    edges are never reshuffled. Every batch pre-aggregates its messages
    to distinct-destination partial sums, streamed straight into a
    driver-side vectorized merge — no per-round shuffle at all. Same integer
    law as the other routes; the overflow check runs on the merged sums
    (a graph whose TOTAL mass nears 2^63 is outside the stated domain —
    the module doc's bound)."""
    import ray as _ray

    # one-time reblock: upstream pair derivation leaves many tiny bucket
    # blocks, and this route re-maps the edge table once per ITERATION —
    # per-task launch overhead x blocks x iterations dominates otherwise.
    # ~1M edge rows per block, data-derived (never CPU-derived).
    n_edges = edges.count()
    edges = edges.repartition(max(8, n_edges // 1_000_000 + 1)).materialize()

    rows = deg_table.take_all()  # bounded: caller checked the node count
    node_pa_t = pa.int64() if int_nodes else pa.string()
    node_vals = np.array(
        [row["node"] for row in rows],
        dtype=np.int64 if int_nodes else object,
    )
    deg = np.array([int(row["deg"]) for row in rows], np.int64)
    order = np.argsort(node_vals, kind="stable")  # searchsorted law
    node_vals = node_vals[order]
    deg = deg[order]
    n = len(node_vals)
    base = ((d_den - d_num) * unit) // d_den
    safe_deg = np.maximum(deg, 1)
    msum_cap = (2**63 - 1) // d_num
    r = np.full(n, unit, np.int64)

    for _ in range(iterations):
        share = np.where(deg > 0, r // safe_deg, 0)
        ref = _ray.put((node_vals, share))

        def partials(batch: pa.Table, _ref=ref) -> pa.Table:
            nv, sh = _ray.get(_ref)
            s = batch[src_col].to_numpy(zero_copy_only=False)
            d = batch[dst_col].to_numpy(zero_copy_only=False)
            sv = sh[np.searchsorted(nv, s)]
            du, inv = np.unique(d, return_inverse=True)
            ps = np.zeros(len(du), np.int64)
            np.add.at(ps, inv, sv)
            return pa.table(
                {"node": pa.array(du, node_pa_t), "m": pa.array(ps, pa.int64())}
            )

        # stream the per-batch partials straight into a driver-side
        # vectorized merge — no groupby shuffle at all; rows streamed are
        # bounded by blocks x distinct-dst-per-block, and the int64
        # np.add.at merge is exact (Arrow's Sum would wrap silently at
        # the 2^63 boundary this route's cap check guards)
        msum = np.zeros(n, np.int64)
        for part in edges.map_batches(
            partials, batch_format="pyarrow"
        ).iter_batches(batch_format="pyarrow"):
            an = part["node"].to_numpy(zero_copy_only=False)
            am = part["m"].to_numpy(zero_copy_only=False).astype(np.int64)
            np.add.at(msum, np.searchsorted(node_vals, an), am)
        if msum.max(initial=0) > msum_cap:
            raise ValueError(
                "pagerank fixed-point overflow: a node's message sum "
                "exceeds int64 // d_num; lower `unit`"
            )
        r = base + (d_num * msum) // d_den

    out = pa.table(
        {
            "node": pa.array(
                node_vals if int_nodes else [str(v) for v in node_vals],
                out_schema.field("node").type,
            ),
            "rank_fp": pa.array(r, pa.int64()),
            "rank": pa.array(np.round(r / float(unit), 6), pa.float64()),
        }
    )
    return ray.data.from_arrow(out)


def _pagerank_distributed(
    edges: ray.data.Dataset,
    iterations: int,
    d_num: int,
    d_den: int,
    unit: int,
    src_col: str,
    dst_col: str,
    int_nodes: bool,
    out_schema: pa.Schema,
    num_buckets: int,
) -> ray.data.Dataset:
    """Co-partitioned message-passing route. Internal row kinds share one
    union schema (key, dst, deg, r, m, _b): edge rows carry dst; rank rows
    carry deg + r; message rows carry m. Node keys travel in their NATIVE
    dtype — integer graphs bucket with one vectorized &-mask kernel
    (num_buckets is a power of two) and merge on int64 keys; only string
    graphs pay the per-key md5 loop. The per-bucket merges split the
    union frame into null-free sub-frames FIRST, so int64 columns never
    float through pandas."""
    base = ((d_den - d_num) * unit) // d_den
    key_t = pa.int64() if int_nodes else pa.string()
    mask = pa.scalar(num_buckets - 1, pa.int64())

    def bucket_of(arr) -> pa.Array:
        if int_nodes:
            return pc.bit_wise_and(pc.cast(arr, pa.int64()), mask)
        return pa.array(
            [md5_bucket(str(v), num_buckets) for v in arr.to_pylist()],
            pa.int64(),
        )

    union_schema = pa.schema(
        [
            ("key", key_t),
            ("dst", key_t),
            ("deg", pa.int64()),
            ("r", pa.int64()),
            ("m", pa.int64()),
            ("_b", pa.int64()),
        ]
    )
    pin = schema_pin(union_schema)

    def to_edge_rows(batch: pa.Table) -> pa.Table:
        a = pc.cast(batch[src_col], key_t)
        n = len(a)
        return pa.table(
            {
                "key": a,
                "dst": pc.cast(batch[dst_col], key_t),
                "deg": pa.nulls(n, pa.int64()),
                "r": pa.nulls(n, pa.int64()),
                "m": pa.nulls(n, pa.int64()),
                "_b": bucket_of(a),
            }
        )

    edge_rows = edges.map_batches(to_edge_rows, batch_format="pyarrow").materialize()

    def to_node_candidates(batch: pa.Table) -> pa.Table:
        # src endpoints contribute out-degree 1, dst endpoints 0; the
        # groupby below sums them into deg and distincts the node set
        a = pc.cast(batch[src_col], key_t).combine_chunks()
        b = pc.cast(batch[dst_col], key_t).combine_chunks()
        keys = pa.concat_arrays(
            [a if isinstance(a, pa.Array) else a.combine_chunks(),
             b if isinstance(b, pa.Array) else b.combine_chunks()]
        )
        n = len(keys)
        return pa.table(
            {
                "key": keys,
                "dst": pa.nulls(n, key_t),
                "deg": pa.array([1] * len(a) + [0] * len(b), pa.int64()),
                "r": pa.nulls(n, pa.int64()),
                "m": pa.nulls(n, pa.int64()),
                "_b": bucket_of(keys),
            }
        )

    def init_ranks(group: pa.Table) -> pa.Table:
        df = group.select(["key", "deg"]).to_pandas()
        agg = df.groupby("key", as_index=False)["deg"].sum()
        n = len(agg)
        keys = pa.array(agg["key"].tolist(), key_t)
        return pa.table(
            {
                "key": keys,
                "dst": pa.nulls(n, key_t),
                "deg": pa.array(agg["deg"].to_numpy(np.int64), pa.int64()),
                "r": pa.array([unit] * n, pa.int64()),
                "m": pa.nulls(n, pa.int64()),
                "_b": bucket_of(keys),
            }
        )

    ranks = (
        edges.map_batches(to_node_candidates, batch_format="pyarrow")
        .groupby("_b")
        .map_groups(init_ranks, batch_format="pyarrow")
        .map_batches(pin, batch_format="pyarrow")
    )

    def emit(group: pa.Table) -> pa.Table:
        is_rank = pc.is_valid(group["r"])
        rank_rows = group.filter(is_rank)
        edge_part = group.filter(pc.is_valid(group["dst"]))
        rk = rank_rows.select(["key", "deg", "r"]).to_pandas()  # null-free
        shares = pd.DataFrame(
            {
                "key": rk["key"],
                "share": np.where(
                    rk["deg"].to_numpy(np.int64) > 0,
                    rk["r"].to_numpy(np.int64)
                    // np.maximum(rk["deg"].to_numpy(np.int64), 1),
                    0,
                ),
            }
        )
        ed = edge_part.select(["key", "dst"]).to_pandas()  # null-free
        msgs = ed.merge(shares, on="key")
        n_m = len(msgs)
        dsts = pa.array(msgs["dst"].tolist(), key_t)
        msg_tbl = pa.table(
            {
                "key": dsts,
                "dst": pa.nulls(n_m, key_t),
                "deg": pa.nulls(n_m, pa.int64()),
                "r": pa.nulls(n_m, pa.int64()),
                "m": pa.array(msgs["share"].to_numpy(np.int64), pa.int64()),
                "_b": bucket_of(dsts),
            }
        )
        return pa.concat_tables([rank_rows.select(union_schema.names), msg_tbl])

    def absorb(group: pa.Table) -> pa.Table:
        is_rank = pc.is_valid(group["r"])
        rank_rows = group.filter(is_rank)
        msg = group.filter(pc.is_valid(group["m"]))
        rk = rank_rows.select(["key", "deg", "_b"]).to_pandas()
        if msg.num_rows:
            ms = msg.select(["key", "m"]).to_pandas()
            # dict lookup, not a left-merge: merge would float the int64
            # sums through the unmatched rows' NaNs and lose ulps past
            # 2^53 (mass sums reach N * unit)
            sums = ms.groupby("key")["m"].sum()
            lut = sums.to_dict()
            msum = np.fromiter(
                (lut.get(k, 0) for k in rk["key"]), np.int64, len(rk)
            )
        else:
            msum = np.zeros(len(rk), np.int64)
        if msum.max(initial=0) > (2**63 - 1) // d_num:
            # same bound (and same outcome: an error, not a silent wrap)
            # as the driver kernel and the oracle's BIGINT multiply
            raise ValueError(
                "pagerank fixed-point overflow: a node's message sum "
                "exceeds int64 // d_num; lower `unit`"
            )
        new_r = base + (d_num * msum) // d_den
        n = len(rk)
        return pa.table(
            {
                "key": pa.array(rk["key"].tolist(), key_t),
                "dst": pa.nulls(n, key_t),
                "deg": pa.array(rk["deg"].to_numpy(np.int64), pa.int64()),
                "r": pa.array(new_r, pa.int64()),
                "m": pa.nulls(n, pa.int64()),
                "_b": pa.array(rk["_b"].to_numpy(np.int64), pa.int64()),
            }
        )

    for _ in range(iterations):
        ranks = (
            edge_rows.union(ranks)
            .groupby("_b")
            .map_groups(emit, batch_format="pyarrow")
            .map_batches(pin, batch_format="pyarrow")
            .groupby("_b")
            .map_groups(absorb, batch_format="pyarrow")
            .map_batches(pin, batch_format="pyarrow")
            .materialize()
        )

    # rank derives from rank_fp with the SAME expression as the driver route
    def finalize(batch: pa.Table, _unit: int = unit) -> pa.Table:
        r = batch["r"].to_numpy(zero_copy_only=False).astype(np.int64)
        return pa.table(
            {
                "node": pc.cast(batch["key"], out_schema.field("node").type),
                "rank_fp": pa.array(r, pa.int64()),
                "rank": pa.array(np.round(r / float(_unit), 6), pa.float64()),
            }
        )

    return ranks.map_batches(finalize, batch_format="pyarrow").map_batches(
        schema_pin(out_schema), batch_format="pyarrow"
    )
