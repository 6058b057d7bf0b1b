"""Declared query plans (SURVEY.md §2.11) — the engine's contract."""

from prueba_tecnica_analista_etl_spark.plans.queries import (
    REGISTRY,
    QuerySpec,
    oracle_sql,
    queries,
)

__all__ = ["REGISTRY", "QuerySpec", "queries", "oracle_sql"]
