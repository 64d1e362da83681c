"""Driver-contract tests: entry() / queries() / oracle_sql() shape checks
at sf0.001 (the smoke scale the driver uses)."""

import sys

import duckdb
import pandas as pd
import pytest

sys.path.insert(0, "/root/repo")
import __ray_entry__ as entrymod  # noqa: E402

SF = "/root/testdata/sf0.001"
TABLES = (
    "region nation customer supplier part orders lineitem events documents embeddings"
).split()


def _to_pandas(res):
    return res if isinstance(res, pd.DataFrame) else res.to_pandas()


def test_entry_smoke(ray_session):
    res = entrymod.entry()
    df = _to_pandas(res)
    assert len(df) > 0
    assert {"doc_id", "spans", "total_pages"} <= set(df.columns)


def test_every_oracle_key_has_query():
    qs = entrymod.queries()
    for name in entrymod.oracle_sql():
        assert name in qs, name


@pytest.mark.parametrize("name", ["doc_stats", "exact_dedup", "pricing_summary"])
def test_sampled_queries_match_oracle_sf0001(ray_session, name):
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF}/{t}.parquet')")
    got = _to_pandas(entrymod.queries()[name](SF))
    want = con.execute(entrymod.oracle_sql()[name]).df()
    assert len(got) == len(want)
    assert sorted(got.columns) == sorted(want.columns)
    g = got[sorted(got.columns)].astype(str)
    w = want[sorted(want.columns)].astype(str)
    g_rows = sorted(g.apply("|".join, axis=1))
    w_rows = sorted(w.apply("|".join, axis=1))
    assert g_rows == w_rows
