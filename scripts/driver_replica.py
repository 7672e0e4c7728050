"""Replica of the driver's correctness gate at sf0.01: run queries() on
Spark and oracle_sql() on DuckDB, compare rows / schema / order-insensitive
value hash per query, print one JSON object (same shape as
CORRECTNESS_r{N}.json).

Usage: python scripts/driver_replica.py [query ...]   # default: all
Env:   SPARK_GRAFT_REPLICA_SF (default /root/testdata/sf0.01)
"""

from __future__ import annotations

import hashlib
import json
import os
import sys

import duckdb
import pandas as pd

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

SF_DIR = os.environ.get("SPARK_GRAFT_REPLICA_SF", "/root/testdata/sf0.01")
os.environ["SPARK_GRAFT_ORACLE_SF"] = SF_DIR

TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
]


def _canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if pd.api.types.is_datetime64_any_dtype(df[c]):
            df[c] = df[c].astype("datetime64[us]")
        elif pd.api.types.is_float_dtype(df[c]):
            df[c] = df[c].round(6)
        elif pd.api.types.is_integer_dtype(df[c]):
            df[c] = df[c].astype("int64")
    return df.sort_values(list(df.columns), kind="mergesort").reset_index(
        drop=True
    )


def _hash(df: pd.DataFrame) -> str:
    return hashlib.sha256(
        df.to_csv(index=False, float_format="%.6f").encode()
    ).hexdigest()


def main() -> None:
    import __spark_entry__ as e
    from feast_spark.session import get_spark

    only = set(sys.argv[1:])
    spark = get_spark("replica", cpus=8)
    duck = duckdb.connect()
    for t in TABLES:
        duck.execute(
            f"CREATE VIEW {t} AS SELECT * FROM "
            f"read_parquet('{SF_DIR}/{t}.parquet')"
        )
    qs = e.queries()
    oq = e.oracle_sql()
    out: dict[str, dict] = {}
    for name, fn in qs.items():
        if only and name not in only:
            continue
        rec: dict = {
            "rows_match": False, "schema_match": False, "hash_match": False,
            "spark_rows": None, "oracle_rows": None, "err": None,
        }
        try:
            got = _canon(fn(spark, SF_DIR).toPandas())
            rec["spark_rows"] = len(got)
            if name in oq:
                exp = _canon(duck.execute(oq[name]).df())
                rec["oracle_rows"] = len(exp)
                rec["rows_match"] = len(got) == len(exp)
                rec["schema_match"] = list(got.columns) == list(exp.columns)
                rec["hash_match"] = _hash(got) == _hash(exp)
                if not rec["hash_match"] and rec["rows_match"]:
                    # aid: dtype diff is the classic silent killer
                    rec["dtypes"] = [
                        str(got.dtypes.to_dict()), str(exp.dtypes.to_dict())
                    ]
            else:
                rec["rows_match"] = rec["spark_rows"] >= 0
                rec["schema_match"] = True
                rec["hash_match"] = None  # rows-only query
        except Exception as ex:  # noqa: BLE001
            rec["err"] = f"{type(ex).__name__}: {ex}"[:400]
        out[name] = rec
        status = "OK" if rec["hash_match"] else rec
        print(f"{name}: {status}", file=sys.stderr)
    print(json.dumps(out, indent=1))
    bad = [
        n for n, r in out.items()
        if r["err"] or r["hash_match"] is False or not r["rows_match"]
    ]
    print(f"FAILING: {bad}" if bad else "ALL GREEN", file=sys.stderr)


if __name__ == "__main__":
    main()
