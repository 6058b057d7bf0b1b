"""JSON-lines and ORC sources/sinks — interchange-format completions
of the source matrix (SURVEY.md §2.1; the reference's formats are CSV /
Excel / Postgres, covered by S1-S9 — these are the beyond-reference
formats a Spark deployment actually meets).

Format guidance encoded here, verified by the plan tests:

- **JSON lines** is the interchange SLOW path: row-oriented parse, no
  column pruning at the reader, no predicate pushdown, ~5-10× the bytes
  of parquet for numeric data. Reading with an explicit schema avoids
  the schema-inference EXTRA full scan — mandatory at 100 TB. Dates and
  timestamps round-trip through ISO-8601 strings.
- **ORC** is a full columnar citizen in Spark: predicate pushdown,
  column pruning, splittable stripes — `read_orc` plans show
  `PushedFilters` exactly like parquet. Pick it when the lakehouse
  standard is ORC (Hive lineage); behavior parity with the parquet path
  is asserted in tests.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T


def write_json(df: DataFrame, path: str) -> None:
    """JSON-lines sink (one object per line, ISO-8601 temporals)."""
    df.write.mode("overwrite").json(path)


def read_json(
    spark: SparkSession, path: str, schema: T.StructType
) -> DataFrame:
    """JSON-lines scan with a REQUIRED explicit schema.

    Schema inference on JSON triggers a full extra pass over the data
    before the real scan — a 100 TB anti-pattern, so this API does not
    offer it. ``mode=PERMISSIVE`` nulls malformed fields instead of
    failing, matching the CSV reader's tolerance.
    """
    return (
        spark.read.schema(schema)
        .option("mode", "PERMISSIVE")
        .json(path)
    )


def write_orc(df: DataFrame, path: str) -> None:
    """ORC sink (zlib default; splittable columnar stripes)."""
    df.write.mode("overwrite").orc(path)


def read_orc(spark: SparkSession, path: str) -> DataFrame:
    """ORC scan — columnar, prunable, filter-pushing (asserted in
    tests/test_sources.py by grepping the physical plan for
    ``PushedFilters`` on a filtered read)."""
    return spark.read.orc(path)
