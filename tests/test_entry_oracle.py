"""Mirror of the driver's correctness gate: run every queries() entry at
sf0.01 and compare against oracle_sql() via DuckDB — row count, schema
(column names), and order-insensitive values."""

import math
import os
import sys

import duckdb
import pandas as pd
import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __spark_entry__ as entrymod

SF_DIR = "/root/testdata/sf0.01"
TABLES = ("region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings")


@pytest.fixture(scope="module")
def duck():
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{SF_DIR}/{t}.parquet'"
        )
    return con


def _normalize(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    for c in df.columns:
        if df[c].dtype == object:
            df[c] = df[c].astype(str)
        elif "float" in str(df[c].dtype):
            df[c] = df[c].round(6)
        elif "datetime" in str(df[c].dtype):
            df[c] = df[c].astype("datetime64[us]").astype(str)
    return df.sort_values(list(df.columns)).reset_index(drop=True)


def test_entry_smoke(spark):
    out = entrymod.entry(spark)
    rows = out.collect()
    assert len(rows) > 0
    assert all(r["within_bound"] for r in rows)


@pytest.mark.parametrize("name", sorted(entrymod.oracle_sql()))
def test_query_matches_oracle(spark, duck, name):
    q = entrymod.queries()[name]
    spark_pdf = q(spark, SF_DIR).toPandas()
    oracle_pdf = duck.execute(entrymod.oracle_sql()[name]).fetchdf()
    a, b = _normalize(spark_pdf), _normalize(oracle_pdf)
    assert list(a.columns) == list(b.columns), (list(a.columns), list(b.columns))
    assert len(a) == len(b), (name, len(a), len(b))
    for c in a.columns:
        av, bv = a[c].tolist(), b[c].tolist()
        if "float" in str(a[c].dtype) or "float" in str(b[c].dtype):
            assert all(
                (isinstance(x, float) and isinstance(y, float)
                 and (math.isnan(x) and math.isnan(y) or x == pytest.approx(y, abs=2e-6)))
                or x == y
                for x, y in zip(av, bv)
            ), (name, c)
        else:
            assert av == bv, (name, c, av[:5], bv[:5])


@pytest.mark.parametrize("name", sorted(set(entrymod.queries()) - set(entrymod.oracle_sql())))
def test_rows_only_queries_run(spark, name):
    q = entrymod.queries()[name]
    df = q(spark, SF_DIR)
    assert df.count() >= 0  # runs, stable schema
    assert len(df.schema.fields) >= 2


def test_registry_and_oracles_fully_aligned():
    """Every query has an oracle and vice versa (the driver's strong gate
    covers the whole registry — nothing silently rides the weaker
    rows-only check), and names are unique non-empty SQL."""
    q, o = entrymod.queries(), entrymod.oracle_sql()
    assert set(q) == set(o), (set(q) ^ set(o))
    assert all(isinstance(s, str) and "SELECT" in s.upper() for s in o.values())
    assert all(callable(f) for f in q.values())
