"""Mimics the driver's correctness gate: for every entry in
``__spark_entry__.queries()`` that has an ``oracle_sql()`` twin, run the
Spark query and the DuckDB SQL on the same parquet tables at sf0.01 and
compare row count, column names, and order-insensitive values. Entries
without oracle SQL get the weaker runs-and-returns-rows check."""

import math
import os
import sys

import duckdb
import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __spark_entry__ as entrymod

SF_DIR = os.environ.get("SPARK_GRAFT_TEST_SF", "/root/testdata/sf0.01")
TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
]


@pytest.fixture(scope="module")
def ddb():
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{SF_DIR}/{t}.parquet'"
        )
    return con


def _canon(val):
    if val is None:
        return "∅"
    if isinstance(val, float):
        if math.isnan(val):
            return "nan"
        return repr(round(val, 9))
    if isinstance(val, bool):
        return str(bool(val))
    return str(val)


def _row_set(cols, rows):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    return sorted("|".join(_canon(r[i]) for i in order) for r in rows)


ORACLES = entrymod.oracle_sql()
QUERIES = entrymod.queries()


def test_oracle_keys_subset_of_queries():
    assert set(ORACLES) <= set(QUERIES)


def _dtype_kind(dtype) -> str:
    """Collapse a pandas dtype to the kind class the driver's hash is
    sensitive to: int/float/bool/datetime/object."""
    k = getattr(dtype, "kind", "O")
    return {
        "i": "int", "u": "int", "f": "float", "b": "bool",
        "M": "datetime", "m": "timedelta",
    }.get(k, "object")


def _assert_dtype_parity(name, df, pdf, wdf):
    """The round-6 lesson: the external driver hashes BOTH result sets
    through a pandas-shaped path, where DuckDB HUGEINT/DECIMAL output
    columns silently degrade to float64 and lose exactness past 2^53 —
    while this replica's ``fetchall()`` values stayed exact, so 392
    green tests missed 4 red driver rows. Gate the class here:

    1. every output column must arrive with the SAME dtype kind from
       Spark ``toPandas()`` and DuckDB ``fetchdf()``;
    2. a column whose Spark schema type is NOT float/double (i.e. the
       declared intent is integer / decimal / string / bool) must not
       arrive as float64 from either engine's pandas path.
    """
    spark_types = {f.name: f.dataType.simpleString() for f in df.schema.fields}
    for col in pdf.columns:
        sk, ok_ = _dtype_kind(pdf[col].dtype), _dtype_kind(wdf[col].dtype)
        assert sk == ok_, (
            f"{name}.{col}: pandas-path dtype kind differs — "
            f"spark {pdf[col].dtype} vs oracle {wdf[col].dtype} "
            f"(HUGEINT/DECIMAL leak in the SQL twin?)"
        )
        if not spark_types[col].startswith(("float", "double")):
            assert sk != "float", (
                f"{name}.{col}: declared {spark_types[col]} but arrives "
                f"float64 via pandas (spark {pdf[col].dtype} / oracle "
                f"{wdf[col].dtype}) — exactness dies at 2^53 in the "
                f"driver's hash"
            )


@pytest.mark.parametrize("name", sorted(QUERIES))
def test_query_vs_oracle(spark, ddb, name):
    df = QUERIES[name](spark, SF_DIR)
    pdf = df.toPandas()
    assert len(pdf) >= 0  # ran
    if name not in ORACLES:
        assert len(pdf) > 0 or name in ("dedup_exact_groups",)
        return
    want = ddb.execute(ORACLES[name])
    want_cols = [d[0] for d in want.description]
    want_rows = want.fetchall()
    wdf = ddb.execute(ORACLES[name]).fetchdf()
    _assert_dtype_parity(name, df, pdf, wdf)
    got_cols = list(pdf.columns)
    assert sorted(got_cols) == sorted(want_cols), f"{name}: column names differ"
    got_rows = [tuple(r) for r in pdf.itertuples(index=False, name=None)]
    gs = _row_set(got_cols, got_rows)
    ws = _row_set(want_cols, want_rows)
    assert len(gs) == len(ws), f"{name}: row count {len(gs)} != {len(ws)}"
    if gs != ws:
        diff_g = [r for r in gs if r not in set(ws)][:5]
        diff_w = [r for r in ws if r not in set(gs)][:5]
        raise AssertionError(
            f"{name}: value mismatch\n spark-only: {diff_g}\n oracle-only: {diff_w}"
        )


def test_entry_smoke(spark):
    df = entrymod.entry(spark)
    assert df.count() > 0
    assert "extracted_text" in df.columns
