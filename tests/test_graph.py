"""Graph operators: co-occurrence edge derivation + fixed-point PageRank.

The integer update law makes every route bit-comparable: driver kernel,
distributed message passing, and the unrolled DuckDB oracle must agree on
exact BIGINT ranks (see ops/graph.py module doc)."""

from __future__ import annotations

import duckdb
import numpy as np
import pandas as pd
import pyarrow as pa
import pytest

import ray.data

from pdf_parser_ray.ops.graph import cooccurrence_edges, pagerank

UNIT = 10**12
BASE = ((100 - 85) * UNIT) // 100


def _pairs_table(rows, types=("int64", "int64")):
    return pa.table(
        {
            "g": pa.array([r[0] for r in rows], getattr(pa, types[0])()),
            "i": pa.array([r[1] for r in rows], getattr(pa, types[1])()),
        }
    )


def test_cooccurrence_matches_sql(ray_session):
    rows = [
        (1, 10), (1, 20), (1, 30),          # triangle of pairs
        (2, 10), (2, 20),                    # repeats the (10,20) pair
        (3, 40),                             # singleton group: no pairs
        (None, 50), (4, None),               # null group / null item dropped
        (5, 60), (5, 60),                    # duplicate membership: one item
    ]
    t = _pairs_table(rows)
    ds = ray.data.from_arrow(t)
    got = (
        cooccurrence_edges(ds, "g", "i")
        .to_pandas()
        .sort_values(["item_a", "item_b"])
        .reset_index(drop=True)
    )
    con = duckdb.connect()
    con.register("t", t)
    want = con.execute(
        "WITH li AS (SELECT DISTINCT g, i FROM t WHERE g IS NOT NULL AND i IS NOT NULL), "
        "gsz AS (SELECT g FROM li GROUP BY g HAVING COUNT(*) BETWEEN 2 AND 256) "
        "SELECT DISTINCT a.i AS item_a, b.i AS item_b FROM li a "
        "JOIN li b ON a.g = b.g AND a.i < b.i JOIN gsz s ON s.g = a.g "
        "ORDER BY item_a, item_b"
    ).df()
    pd.testing.assert_frame_equal(got, want)


def test_cooccurrence_hot_group_cap(ray_session):
    rows = [(1, i) for i in range(10)] + [(2, 100), (2, 101)]
    ds = ray.data.from_arrow(_pairs_table(rows))
    got = cooccurrence_edges(ds, "g", "i", max_group_items=5).to_pandas()
    # group 1 (10 distinct items > cap 5) is skipped entirely
    assert sorted(map(tuple, got.values.tolist())) == [(100, 101)]


def test_cooccurrence_string_items(ray_session):
    # lexicographic pair order for string item columns: '10' < '9'
    rows = [(1, "9"), (1, "10")]
    ds = ray.data.from_arrow(_pairs_table(rows, types=("int64", "string")))
    got = cooccurrence_edges(ds, "g", "i").to_pandas()
    assert got.values.tolist() == [["10", "9"]]


def _edges_ds(rows):
    return ray.data.from_arrow(
        pa.table(
            {
                "src": pa.array([r[0] for r in rows], pa.int64()),
                "dst": pa.array([r[1] for r in rows], pa.int64()),
            }
        )
    )


def test_pagerank_hand_computed(ray_session):
    # 1 -> 2 (dangling 2): r1(1) = base, r1(2) = base + 85*unit // 100
    got = (
        pagerank(_edges_ds([(1, 2)]), iterations=1)
        .to_pandas()
        .sort_values("node")
        .reset_index(drop=True)
    )
    assert got["rank_fp"].tolist() == [BASE, BASE + (85 * UNIT) // 100]
    assert got["rank"].tolist() == [
        float(np.round(BASE / float(UNIT), 6)),
        float(np.round((BASE + (85 * UNIT) // 100) / float(UNIT), 6)),
    ]


def test_pagerank_null_edges_dropped_and_empty(ray_session):
    rows = [(1, 2), (None, 3), (4, None)]
    got = pagerank(_edges_ds(rows), iterations=1).to_pandas()
    assert sorted(got["node"].tolist()) == [1, 2]
    # zero-row to_pandas drops columns on this Ray build; assert on the
    # declared Dataset schema instead
    empty = pagerank(_edges_ds([]).filter(lambda r: False), iterations=1)
    assert empty.schema().names == ["node", "rank_fp", "rank"]
    assert empty.count() == 0
    # an empty-but-typed edge table keeps its int64 node type
    typed_empty = pagerank(_edges_ds([]), iterations=1)
    assert typed_empty.schema().base_schema.field("node").type == pa.int64()


def test_pagerank_parallel_edges_count_twice(ray_session):
    # duplicate edge rows are parallel edges: 1 -> 2 twice means deg(1)=2
    # and two shares arrive at 2
    got = (
        pagerank(_edges_ds([(1, 2), (1, 2)]), iterations=1)
        .to_pandas()
        .sort_values("node")
        .reset_index(drop=True)
    )
    share = UNIT // 2
    assert got["rank_fp"].tolist() == [BASE, BASE + (85 * (2 * share)) // 100]


def test_pagerank_routes_bit_identical(ray_session):
    """Driver kernel vs distributed message passing on the sf0.001
    co-purchase graph — exact BIGINT equality, the route-equality law."""
    li = ray.data.read_parquet(
        "/root/testdata/sf0.001/lineitem.parquet",
        columns=["l_orderkey", "l_partkey"],
    )
    pairs = cooccurrence_edges(li, "l_orderkey", "l_partkey").materialize()

    def sym(batch: pa.Table) -> pa.Table:
        a = batch["item_a"].combine_chunks()
        b = batch["item_b"].combine_chunks()
        return pa.table(
            {"src": pa.concat_arrays([a, b]), "dst": pa.concat_arrays([b, a])}
        )

    edges = pairs.map_batches(sym, batch_format="pyarrow").materialize()
    drv = (
        pagerank(edges, iterations=4)
        .to_pandas()
        .sort_values("node")
        .reset_index(drop=True)
    )
    bcast = (
        pagerank(edges, iterations=4, driver_max_edges=0)
        .to_pandas()
        .sort_values("node")
        .reset_index(drop=True)
    )
    copart = (
        pagerank(
            edges, iterations=4, driver_max_edges=0, broadcast_max_nodes=0
        )
        .to_pandas()
        .sort_values("node")
        .reset_index(drop=True)
    )
    assert len(drv) and drv.equals(bcast) and drv.equals(copart)


def test_pagerank_string_nodes(ray_session):
    ds = ray.data.from_arrow(
        pa.table(
            {
                "src": pa.array(["a", "b"], pa.string()),
                "dst": pa.array(["b", "a"], pa.string()),
            }
        )
    )
    # symmetric 2-cycle: all mass conserved, both nodes keep unit —
    # across driver, broadcast, and co-partitioned routes
    for route_kw in (
        {},
        {"driver_max_edges": 0},
        {"driver_max_edges": 0, "broadcast_max_nodes": 0},
    ):
        got = pagerank(ds, iterations=3, **route_kw).to_pandas()
        assert sorted(got["node"].tolist()) == ["a", "b"]
        assert got["rank_fp"].tolist() == [UNIT, UNIT]


def test_pagerank_overflow_raises(ray_session):
    # unit chosen so one node's message sum exceeds (2^63-1) // 85
    big_unit = (2**63 - 1) // 85 + 1
    with pytest.raises(ValueError, match="overflow"):
        pagerank(_edges_ds([(1, 2)]), iterations=1, unit=big_unit)


def test_pagerank_three_routes_fuzz_skewed_digraph(ray_session):
    """Random skewed digraph (hub + dangling chain): driver, broadcast
    and co-partitioned routes must agree on exact BIGINT ranks."""
    import random

    rng = random.Random(11)
    edges = [(rng.randint(0, 200), 0) for _ in range(1500)]
    edges += [(rng.randint(0, 200), rng.randint(0, 200)) for _ in range(2000)]
    edges += [(999, 1000)]  # 1000 is dangling
    ds = _edges_ds(edges)
    frames = [
        pagerank(ds, iterations=5, **kw)
        .to_pandas()
        .sort_values("node")
        .reset_index(drop=True)
        for kw in (
            {},
            {"driver_max_edges": 0},
            {"driver_max_edges": 0, "broadcast_max_nodes": 0},
        )
    ]
    assert len(frames[0]) > 200
    assert frames[0].equals(frames[1]) and frames[0].equals(frames[2])
