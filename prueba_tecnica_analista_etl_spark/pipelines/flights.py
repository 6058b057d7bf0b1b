"""The reference's pandas notebook pipeline (EP1, SURVEY.md §3)
re-expressed as one lazy Spark DAG:

    read 2 dirty CSVs → union (order-tagged) → keep-first dedup by
    Col_1 → email validation → phone clean+classification → cleaned
    export of the PRE-dedup union

Semantic subtleties preserved from the reference
(``Seccion_2_Python/ETL_Prueba_Tecnica.ipynb``):
- the 10000-file is concatenated FIRST, so its rows win keep-first
  dedup (load cell: ``pd.concat([df_10000, df_5000])``);
- validation columns are computed on the *deduped* frame;
- the export cleans ``Col_8``/``Col_11`` on the *original union*
  (15k rows), not the deduped frame — the dedup was "un ejercicio
  analitico aparte" (export cell comment).

Where pandas is eager and single-threaded, this DAG is one Catalyst
plan: the two file scans parallelize, the dedup is one shuffle on
Col_1, validations are codegen'd expressions, and nothing passes
through Python.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from prueba_tecnica_analista_etl_spark.functions.cleanse import (
    strip_phone_chars,
)
from prueba_tecnica_analista_etl_spark.functions.validate import (
    email_valid,
    phone_status,
)
from prueba_tecnica_analista_etl_spark.operators.dedupe import (
    keep_first,
    tag_source_order,
    SRC_COL,
    ROW_COL,
)
from prueba_tecnica_analista_etl_spark.sources.csv import (
    flights_schema,
    read_csv_repaired,
)


def validate_emails(df: DataFrame, col: str = "Col_8") -> DataFrame:
    """Email step (``nb:79``): trim the padded column, anchored-regex
    validity flag."""
    return df.withColumn("Email_Valido", email_valid(F.col(col)))


def validate_phones(df: DataFrame, col: str = "Col_11") -> DataFrame:
    """Phone step (``nb:100``): strip ``+ - space``, classify
    Celular/Fijo/No Apto with the native when-chain."""
    cleaned = strip_phone_chars(F.trim(F.col(col)))
    return df.withColumn("Col_11_Limpio", cleaned).withColumn(
        "Telefono_Estado", phone_status(F.col("Col_11_Limpio"))
    )


def clean_for_export(df: DataFrame) -> DataFrame:
    """Export cleaning (``nb:116``): trim padded Col_8, strip phone
    chars in Col_11 — in place, on the full union."""
    return df.withColumn("Col_8", F.trim(F.col("Col_8"))).withColumn(
        "Col_11", strip_phone_chars(F.trim(F.col("Col_11")))
    )


def flights_pipeline(
    spark: SparkSession,
    primary_csv: str,
    secondary_csv: str,
    sep: str = ";",
) -> dict[str, DataFrame]:
    """Run the full EP1 chain; returns every intermediate frame keyed
    like the notebook's variables (union / deduped / validated /
    export)."""
    schema = flights_schema()
    df_primary = read_csv_repaired(spark, primary_csv, schema, sep=sep)
    df_secondary = read_csv_repaired(spark, secondary_csv, schema, sep=sep)

    tagged = tag_source_order([df_primary, df_secondary])
    union = tagged.drop(SRC_COL, ROW_COL)
    deduped = keep_first(
        tagged, ["Col_1"], [F.asc(SRC_COL), F.asc(ROW_COL)]
    )
    validated = validate_phones(validate_emails(deduped))
    export = clean_for_export(union)
    return {
        "union": union,
        "deduped": deduped,
        "validated": validated,
        "export": export,
    }
