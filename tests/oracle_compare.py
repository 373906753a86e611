"""Local replica of the driver's Spark-vs-DuckDB correctness comparison.

For each queries() entry with an oracle_sql(): run both on the same sf dir,
sort columns by name, compare row count, schema-ish (column names), and an
order-insensitive value hash (rows stringified, rounded floats).
"""

from __future__ import annotations

import math

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def duck_con(sf_dir: str):
    import os

    import duckdb
    con = duckdb.connect()
    for t in TABLES:
        path = f"{sf_dir}/{t}.parquet"
        if not os.path.exists(path):
            continue  # partial corpus (e.g. generated documents-only dir)
        if os.path.isdir(path):
            path = f"{path}/*.parquet"
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{path}'")
    return con


def _canon_cell(v):
    if v is None:
        return "NULL"
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return f"{v:.4f}"
    if hasattr(v, "isoformat"):          # datetime/date
        s = v.isoformat(sep=" ") if hasattr(v, "hour") else v.isoformat()
        return s.replace("+00:00", "")
    if isinstance(v, (list, tuple)):
        return "[" + ",".join(_canon_cell(x) for x in v) + "]"
    return str(v)


def canon_rows(pdf) -> tuple[list[str], list[str]]:
    """(sorted column names, sorted canonical row strings)."""
    import decimal
    cols = sorted(pdf.columns)
    rows = []
    for _, row in pdf[cols].iterrows():
        rows.append("|".join(
            _canon_cell(float(v) if isinstance(v, decimal.Decimal) else v)
            for v in row))
    return cols, sorted(rows)


def compare(spark, sf_dir: str, name: str, spark_fn, sql: str) -> dict:
    sdf = spark_fn(spark, sf_dir).toPandas()
    con = duck_con(sf_dir)
    ddf = con.execute(sql).df()
    con.close()
    s_cols, s_rows = canon_rows(sdf)
    d_cols, d_rows = canon_rows(ddf)
    return {
        "name": name,
        "rows_match": len(s_rows) == len(d_rows),
        "cols_match": s_cols == d_cols,
        "values_match": s_rows == d_rows,
        "n_spark": len(s_rows), "n_duck": len(d_rows),
        "spark_cols": s_cols, "duck_cols": d_cols,
        "first_diff": next(
            ((a, b) for a, b in zip(s_rows, d_rows) if a != b), None),
    }
