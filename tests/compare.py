"""Local replica of the driver's Spark-vs-DuckDB correctness gate.

For each entry in ``__spark_entry__.queries()`` with a matching
``oracle_sql()`` string, run both at a given sf dir and compare:
row count, column names, and an order-insensitive value hash (columns
sorted by name, values canonicalized, rows sorted).
"""

from __future__ import annotations

import hashlib
import math

import duckdb
import pandas as pd

TABLES = [
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
]


def duckdb_conn(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )
    return con


def _canon(v) -> str:
    if v is None or (isinstance(v, float) and math.isnan(v)):
        return "NULL"
    if isinstance(v, bool):
        return "true" if v else "false"
    if isinstance(v, float):
        if v == int(v) and abs(v) < 1e15:
            return str(int(v))
        return repr(round(v, 9))
    if isinstance(v, pd.Timestamp):
        return v.isoformat()
    return str(v)


def frame_hash(pdf: pd.DataFrame) -> str:
    cols = sorted(pdf.columns)
    rows = [
        "\x1f".join(_canon(row[c]) for c in cols)
        for _, row in pdf[cols].iterrows()
    ]
    rows.sort()
    return hashlib.sha256("\x1e".join(rows).encode()).hexdigest()[:16]


def compare_query(spark, con, query_fn, sql: str, sf_dir: str) -> dict:
    spark_pdf = query_fn(spark, sf_dir).toPandas()
    duck_pdf = con.execute(sql).df()
    res = {
        "spark_rows": len(spark_pdf),
        "duck_rows": len(duck_pdf),
        "spark_cols": sorted(spark_pdf.columns),
        "duck_cols": sorted(duck_pdf.columns),
    }
    res["rows_match"] = res["spark_rows"] == res["duck_rows"]
    res["cols_match"] = res["spark_cols"] == res["duck_cols"]
    if res["rows_match"] and res["cols_match"]:
        res["hash_match"] = frame_hash(spark_pdf) == frame_hash(duck_pdf)
    else:
        res["hash_match"] = False
    res["ok"] = res["rows_match"] and res["cols_match"] and res["hash_match"]
    return res
