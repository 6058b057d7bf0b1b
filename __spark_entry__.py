"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs
each ``queries()[name]`` at sf=0.01 and compares it against the
matching ``oracle_sql()[name]`` via DuckDB (row-count + schema +
order-insensitive value-hash → CORRECTNESS_r{N}.json).

Implementation lives in ``prueba_tecnica_analista_etl_spark/`` —
see SURVEY.md §2 for the operator inventory each query proves.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from prueba_tecnica_analista_etl_spark.plans import queries as _queries
from prueba_tecnica_analista_etl_spark.plans import oracle_sql as _oracle_sql

SMOKE_SF_DIR = "/root/testdata/sf0.001"


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on sf0.001: revenue per region (4-table star join
    + exact-decimal aggregation) — scan/join/broadcast/agg in one plan."""
    return _queries()["q_inner_join"](spark, SMOKE_SF_DIR)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator query from SURVEY.md §2.11."""
    return _queries()


def oracle_sql() -> dict[str, str]:
    """DuckDB-equivalent SQL per query; keys absent here are rows-only
    (non-SQL-expressible: streaming/ML-backed operators)."""
    return _oracle_sql()
