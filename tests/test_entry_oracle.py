"""Local replica of the driver's correctness gate: run every queries()
entry at sf0.001 and compare against oracle_sql() via DuckDB
(row count + column names + order-insensitive values)."""

from __future__ import annotations

import math
import os

import duckdb
import pandas as pd
import pytest

SF_DIR = "/root/testdata/sf0.001"
# derived oracle relations must be built for the SAME sf this harness
# queries (the driver leaves this unset and gets sf0.01)
os.environ["SPARK_GRAFT_ORACLE_SF"] = SF_DIR

import __spark_entry__ as entry_mod  # noqa: E402
TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
]


@pytest.fixture(scope="module")
def duck():
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF_DIR}/{t}.parquet')"
        )
    return con


def _canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if pd.api.types.is_datetime64_any_dtype(df[c]):
            df[c] = df[c].astype("datetime64[us]")
        elif pd.api.types.is_float_dtype(df[c]):
            df[c] = df[c].round(6)
        elif pd.api.types.is_integer_dtype(df[c]):
            df[c] = df[c].astype("int64")
    return df.sort_values(list(df.columns), kind="mergesort").reset_index(drop=True)


def _values_equal(a, b) -> bool:
    if isinstance(a, float) and isinstance(b, float):
        if math.isnan(a) and math.isnan(b):
            return True
        return math.isclose(a, b, rel_tol=1e-9, abs_tol=1e-9)
    return a == b


# the pytest gate covers the driver window AND the rotated/pre-merge
# queries — coverage identical to round 3, only the driver artifact is
# capped at 50
ALL_QUERIES = {**entry_mod.extra_queries(), **entry_mod.queries()}
ALL_ORACLES = {**entry_mod.extra_oracle_sql(), **entry_mod.oracle_sql()}
ORACLE_NAMES = sorted(ALL_ORACLES)
ROWS_ONLY = sorted(set(ALL_QUERIES) - set(ALL_ORACLES))


def test_driver_query_window():
    # CORRECTNESS_r03 recorded exactly the first 50 of 61 registered
    # queries: anything past 50 silently loses its driver correctness row
    assert len(entry_mod.queries()) <= 50
    # every driver query with an oracle must expose it under the same key
    assert set(entry_mod.oracle_sql()) <= set(entry_mod.queries())
    # rotated queries must not shadow driver-window names
    assert not set(entry_mod.extra_queries()) & set(entry_mod.queries())


@pytest.mark.parametrize("name", ORACLE_NAMES)
def test_query_matches_oracle(spark, duck, name):
    q = ALL_QUERIES[name]
    got = _canon(q(spark, SF_DIR).toPandas())
    exp = _canon(duck.execute(ALL_ORACLES[name]).df())
    assert list(got.columns) == list(exp.columns), (
        f"{name}: columns {list(got.columns)} != {list(exp.columns)}"
    )
    assert len(got) == len(exp), f"{name}: {len(got)} rows != {len(exp)}"
    # the DRIVER compares via a dtype-sensitive value hash (int64 1 and
    # float64 1.0 serialize differently): a DuckDB HUGEINT output column
    # (e.g. an un-CAST `// SUM(...)`) lands in pandas as float64 and
    # fails the driver even when every value is integral and equal — so
    # pin the dtype CLASS here, not just value equality (caught live:
    # role_diversity at sf0.01, round 5 session 9)
    def _kind(dt) -> str:
        if pd.api.types.is_datetime64_any_dtype(dt):
            return "datetime"
        if pd.api.types.is_bool_dtype(dt):
            return "bool"
        if pd.api.types.is_integer_dtype(dt):
            return "int"
        if pd.api.types.is_float_dtype(dt):
            return "float"
        return "object"

    kind_bad = [
        (c, str(got[c].dtype), str(exp[c].dtype))
        for c in got.columns
        if _kind(got[c].dtype) != _kind(exp[c].dtype)
    ]
    assert not kind_bad, f"{name}: dtype-class mismatches {kind_bad}"
    for c in got.columns:
        ga, ea = got[c].tolist(), exp[c].tolist()
        bad = [
            (i, x, y) for i, (x, y) in enumerate(zip(ga, ea)) if not _values_equal(x, y)
        ]
        assert not bad, f"{name}.{c}: first mismatches {bad[:5]}"


@pytest.mark.parametrize("name", ROWS_ONLY)
def test_rows_only_queries_run(spark, name):
    q = ALL_QUERIES[name]
    df = q(spark, SF_DIR)
    assert df.count() >= 0
    assert len(df.schema) > 0


def test_entry_smoke(spark):
    df = entry_mod.entry(spark)
    assert df.count() > 0
