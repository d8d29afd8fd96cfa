"""Driver-contract harness: every oracle-backed query in
__spark_entry__.py must agree with its DuckDB oracle at sf0.01 —
the local mirror of the driver's CORRECTNESS gate."""

import math
import os
import sys

import duckdb
import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __spark_entry__ as entrymod

SF_DIR = "/root/testdata/sf0.01"
TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


@pytest.fixture(scope="module")
def ddb():
    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * "
                f"FROM '{SF_DIR}/{t}.parquet'")
    return con


def _canon(rows, colnames):
    """Order-insensitive multiset of rows with name-sorted columns and
    normalized scalars (mirrors the driver's sorted-column value hash)."""
    order = sorted(range(len(colnames)), key=lambda i: colnames[i])

    def norm(v):
        if v is None:
            return None
        if isinstance(v, bool):
            return bool(v)
        if isinstance(v, float):
            if math.isnan(v):
                return "nan"
            return round(v, 6)
        if isinstance(v, int):
            return int(v)
        return str(v)

    return sorted(tuple(norm(r[i]) for i in order) for r in rows)


def test_entry_smoke(spark):
    df = entrymod.entry(spark)
    rows = df.collect()
    assert len(rows) >= 0
    assert set(df.columns) == {"keyword", "json_path", "n"}


@pytest.mark.parametrize("name", sorted(entrymod.oracle_sql()))
def test_query_vs_oracle(spark, ddb, name):
    q = entrymod.queries()[name]
    sdf = q(spark, SF_DIR)
    srows = sdf.collect()
    scols = sdf.columns
    ores = ddb.sql(entrymod.oracle_sql()[name])
    orows = ores.fetchall()
    ocols = [d[0] for d in ores.description]
    assert sorted(scols) == sorted(ocols), (
        f"{name}: column mismatch {scols} vs {ocols}")
    assert len(srows) == len(orows), (
        f"{name}: rowcount {len(srows)} vs oracle {len(orows)}")
    assert _canon(srows, scols) == _canon(orows, ocols), (
        f"{name}: value mismatch")


@pytest.mark.parametrize("name", sorted(set(entrymod.queries())
                                        - set(entrymod.oracle_sql())))
def test_rows_only_queries_run(spark, name):
    df = entrymod.queries()[name](spark, SF_DIR)
    rows = df.collect()
    assert len(rows) >= 0
    assert len(df.columns) > 0
