"""Declared query plans (SURVEY.md §2.11) — the engine's contract."""

from prueba_tecnica_analista_etl_spark.plans.queries import (
    REGISTRY,
    QuerySpec,
    oracle_sql,
    queries,
)

# Importing extension modules registers their queries (decorator
# side-effect on the shared REGISTRY).
from prueba_tecnica_analista_etl_spark.plans import extensions_text  # noqa: E402,F401
from prueba_tecnica_analista_etl_spark.plans import extensions_scale  # noqa: E402,F401

__all__ = ["REGISTRY", "QuerySpec", "queries", "oracle_sql"]
