"""Local replica of the driver's Spark-vs-DuckDB correctness gate.

For each entry in ``__spark_entry__.queries()`` with a matching
``oracle_sql()`` string, run both at a given sf dir and compare:
row count, column names, column TYPE KINDS (from the Arrow schemas, so
engine-level type drift like DuckDB's HUGEINT integer sums is caught even
when pandas would silently coerce it to float64), and an order-insensitive
value hash (columns sorted by name, values canonicalized, rows sorted).

Round-1 lesson: the driver's gate failed three queries whose oracle emitted
DuckDB HUGEINT (int128) ``sum()`` columns while Spark emitted BIGINT. The
pandas path hid it (HUGEINT -> float64 -> integral-float collapse in
``_canon``); comparing Arrow type kinds reproduces the driver's strictness.
"""

from __future__ import annotations

import decimal
import hashlib
import math

import duckdb
import pandas as pd
import pyarrow as pa

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


def _type_kind(t: pa.DataType) -> str:
    """Collapse an Arrow type to the cross-engine kind that must agree."""
    if pa.types.is_boolean(t):
        return "bool"
    if pa.types.is_integer(t):
        return "int"
    if pa.types.is_floating(t):
        return "float"
    if pa.types.is_decimal(t):
        return "decimal"  # deliberately NOT merged with int/float: DuckDB
        # HUGEINT sums surface here and must be CAST in the oracle SQL
    if pa.types.is_string(t) or pa.types.is_large_string(t):
        return "str"
    if pa.types.is_timestamp(t):
        return "timestamp"
    if pa.types.is_date(t):
        return "date"
    if pa.types.is_list(t) or pa.types.is_large_list(t):
        return "list"
    return str(t)


def _kinds(schema: pa.Schema) -> dict[str, str]:
    return {f.name: _type_kind(f.type) for f in schema}


def _canon(v) -> str:
    if v is None or (isinstance(v, float) and math.isnan(v)):
        return "NULL"
    if isinstance(v, bool):
        return "true" if v else "false"
    if isinstance(v, decimal.Decimal):
        if v == v.to_integral_value():
            return str(int(v))
        return repr(round(float(v), 9))
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


def _reject_list_columns(kinds: dict[str, str], side: str) -> None:
    """The DRIVER's canonicalizer pandas-sorts result columns and throws
    ``TypeError: unhashable type: 'list'`` on array-typed cells (the r2
    ``array_agg_ordered`` lesson, mirroring the r1 HUGEINT one). Fail here,
    locally, with the fix spelled out."""
    bad = [c for c, k in kinds.items() if k == "list"]
    if bad:
        raise TypeError(
            f"{side} result has array-typed column(s) {bad}: the driver "
            "canonicalizer cannot hash lists — stringify the array, e.g. "
            "Spark array_join(sort_array(...), ',') vs DuckDB "
            "array_to_string(list_sort(...), ',')"
        )


def compare_query(spark, con, query_fn, sql: str, sf_dir: str) -> dict:
    sdf = query_fn(spark, sf_dir)
    try:
        spark_tbl = sdf.toArrow()
    except Exception:  # pre-Arrow fallback: schema strictness degrades only
        spark_tbl = pa.Table.from_pandas(sdf.toPandas())
    duck_tbl = con.execute(sql).arrow()
    _reject_list_columns(_kinds(spark_tbl.schema), "Spark")
    _reject_list_columns(_kinds(duck_tbl.schema), "oracle")
    spark_pdf = spark_tbl.to_pandas()
    duck_pdf = duck_tbl.to_pandas()
    spark_kinds = _kinds(spark_tbl.schema)
    duck_kinds = _kinds(duck_tbl.schema)
    res = {
        "spark_rows": len(spark_pdf),
        "duck_rows": len(duck_pdf),
        "spark_cols": sorted(spark_pdf.columns),
        "duck_cols": sorted(duck_pdf.columns),
        "spark_kinds": spark_kinds,
        "duck_kinds": duck_kinds,
    }
    res["rows_match"] = res["spark_rows"] == res["duck_rows"]
    res["cols_match"] = res["spark_cols"] == res["duck_cols"]
    res["kinds_match"] = res["cols_match"] and all(
        spark_kinds[c] == duck_kinds[c] for c in res["spark_cols"]
    )
    if res["rows_match"] and res["cols_match"]:
        res["hash_match"] = frame_hash(spark_pdf) == frame_hash(duck_pdf)
    else:
        res["hash_match"] = False
    res["ok"] = (
        res["rows_match"] and res["cols_match"] and res["kinds_match"]
        and res["hash_match"]
    )
    return res
