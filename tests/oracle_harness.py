"""Local replica of the driver's DuckDB-oracle correctness gate.

Runs each ``queries()`` entry through Spark and its ``oracle_sql()``
twin through DuckDB on the same sf dir, then compares row count, schema
arity, and an order-insensitive value multiset (columns sorted by name,
floats rounded to 6 significant-ish decimals to absorb representation
noise the driver may or may not tolerate — we aim for exact anyway).
"""

from __future__ import annotations

import math
from typing import Any

import duckdb

from gcp_dbt_data_engineering_spark.sources import TABLES, table_path


def _norm(v: Any) -> Any:
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return round(v, 6)
    if isinstance(v, list):
        return tuple(_norm(x) for x in v)
    return str(v) if not isinstance(v, (int, float, bool, type(None))) else v


def duck_run(sql: str, sf_dir: str) -> tuple[list[str], list[tuple]]:
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{table_path(sf_dir, t)}')"
        )
    cur = con.execute(sql)
    cols = [d[0] for d in cur.description]
    rows = cur.fetchall()
    con.close()
    return cols, rows


def compare(spark_df, oracle: str, sf_dir: str) -> dict:
    s_cols = spark_df.columns
    s_rows = [tuple(r) for r in spark_df.collect()]
    d_cols, d_rows = duck_run(oracle, sf_dir)

    def canon(cols, rows):
        order = sorted(range(len(cols)), key=lambda i: cols[i])
        return sorted(
            (tuple(_norm(row[i]) for i in order) for row in rows), key=repr
        )

    s_canon = canon(s_cols, s_rows)
    d_canon = canon(d_cols, d_rows)
    ok = s_canon == d_canon
    diag = {}
    if not ok:
        diag = {
            "spark_cols": sorted(s_cols),
            "duck_cols": sorted(d_cols),
            "spark_n": len(s_rows),
            "duck_n": len(d_rows),
            "first_diff": next(
                (
                    {"spark": a, "duck": b}
                    for a, b in zip(s_canon, d_canon)
                    if a != b
                ),
                {"spark": s_canon[:2], "duck": d_canon[:2]}
                if len(s_canon) != len(d_canon)
                else None,
            ),
        }
    return {"match": ok, **diag}
