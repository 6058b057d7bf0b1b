"""PySpark-native analytics/ETL engine.

A brand-new, Spark-first re-expression of the query and data-processing
capabilities of the reference workload ``JhonECastellanos/
Prueba-Tecnica-Analista-ETL`` (a pandas/PostgreSQL/Excel ETL technical
test — see SURVEY.md), generalized to TPC-H-ish tables and extended with
large-scale training-data pipeline operators (dedup families, similarity
search, text analysis, multimodal plumbing).

Design principles (SURVEY.md §7):
- DataFrame/SQL API only; no RDDs; no custom Catalyst rules.
- Native ``pyspark.sql.functions`` expressions before UDFs; Pandas UDFs
  (Arrow) where Python is unavoidable; never row-at-a-time Python UDFs.
- Every public operator is a small composable ``f(df, ...) -> DataFrame``.
- Shuffle-conscious for the 100 TB north star: broadcast small dims,
  no ``collect()`` in transforms, documented partitioning keys.
"""

from prueba_tecnica_analista_etl_spark.session import get_spark

__all__ = ["get_spark"]
__version__ = "0.1.0"
