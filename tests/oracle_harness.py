"""Local mirror of the driver's DuckDB-oracle comparison.

Runs a declared query on Spark and its oracle SQL on DuckDB over the
same parquet tables, then compares row count, column names, and an
order-insensitive canonical value multiset — a strictly-not-weaker
stand-in for the driver's value-hash so parity failures surface before
a round ends.
"""

from __future__ import annotations

import datetime as _dt
import math

import duckdb

from prueba_tecnica_analista_etl_spark.sources.tables import TABLES


def duckdb_con(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM "
            f"read_parquet('{sf_dir}/{t}.parquet')"
        )
    return con


def _canon(v):
    if v is None:
        return "∅"
    if isinstance(v, bool):
        return str(v)
    if isinstance(v, float):
        if math.isnan(v):
            return "nan"
        # 12 significant digits: collapses last-bit noise, far tighter
        # than the 2dp the queries themselves guarantee.
        return f"{v:.12g}"
    if isinstance(v, _dt.datetime):
        return v.strftime("%Y-%m-%d %H:%M:%S.%f")
    if isinstance(v, _dt.date):
        return v.isoformat()
    if isinstance(v, (list, tuple)):
        return "[" + ",".join(_canon(x) for x in v) + "]"
    return str(v)


def _canon_rows(cols: list[str], rows: list[tuple]) -> list[tuple]:
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    return sorted(
        tuple(_canon(r[i]) for i in order) for r in rows
    )


def compare(spark_df, con: duckdb.DuckDBPyConnection, sql: str) -> dict:
    s_rows = [tuple(r) for r in spark_df.collect()]
    s_cols = list(spark_df.columns)
    rel = con.execute(sql)
    d_cols = [c[0] for c in rel.description]
    d_rows = rel.fetchall()
    report = {
        "rowcount": (len(s_rows), len(d_rows)),
        "cols": (sorted(s_cols), sorted(d_cols)),
    }
    report["rowcount_ok"] = len(s_rows) == len(d_rows)
    report["cols_ok"] = sorted(s_cols) == sorted(d_cols)
    if report["cols_ok"]:
        cs, cd = _canon_rows(s_cols, s_rows), _canon_rows(d_cols, d_rows)
        report["values_ok"] = cs == cd
        if not report["values_ok"]:
            diff_s = [r for r in cs if r not in set(cd)][:5]
            diff_d = [r for r in cd if r not in set(cs)][:5]
            report["spark_only"] = diff_s
            report["duckdb_only"] = diff_d
    else:
        report["values_ok"] = False
    report["ok"] = (
        report["rowcount_ok"] and report["cols_ok"] and report["values_ok"]
    )
    return report
