"""JDBC source/sink thin wrappers (S7/S8).

The reference documents (markdown-only) a pyodbc/``pd.read_sql`` path
and a ``to_sql(if_exists='replace')`` sink. Spark's built-in JDBC
format covers both; no pyodbc shim is built (SURVEY.md §7 "what NOT to
build"). No database SERVER exists in the harness, but Spark ships
embedded Apache Derby (its metastore dependency), so the full
write → read → partitioned-parallel-read path is proven end to end
against a real database in ``tests/test_sources.py`` — the builder
contract is additionally unit-tested for server-style URLs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def read_jdbc(
    spark: SparkSession,
    url: str,
    table: str,
    user: str | None = None,
    password: str | None = None,
    partition_column: str | None = None,
    num_partitions: int = 8,
    lower_bound: int | None = None,
    upper_bound: int | None = None,
    driver: str | None = None,
):
    """JDBC scan (S7). For scale, always pass ``partition_column`` +
    bounds so the read is split into ``num_partitions`` parallel range
    queries instead of one serial cursor. ``driver`` pins the JDBC
    driver class when the URL scheme alone can't resolve it."""
    reader = (
        spark.read.format("jdbc").option("url", url).option("dbtable", table)
    )
    if driver is not None:
        reader = reader.option("driver", driver)
    if user is not None:
        reader = reader.option("user", user).option("password", password or "")
    if partition_column is not None:
        if lower_bound is None or upper_bound is None:
            # str(None) would reach Spark as the literal 'None' and die
            # in a NumberFormatException deep inside the JDBC relation
            raise ValueError(
                "read_jdbc: partition_column requires lower_bound and "
                "upper_bound (the range Spark splits into "
                f"{num_partitions} parallel queries)"
            )
        reader = (
            reader.option("partitionColumn", partition_column)
            .option("numPartitions", str(num_partitions))
            .option("lowerBound", str(lower_bound))
            .option("upperBound", str(upper_bound))
        )
    return reader


def write_jdbc(
    df: DataFrame,
    url: str,
    table: str,
    mode: str = "overwrite",
    user: str | None = None,
    password: str | None = None,
    driver: str | None = None,
):
    """JDBC sink (S8); ``mode='overwrite'`` is the reference's
    ``if_exists='replace'`` semantic."""
    writer = (
        df.write.format("jdbc").option("url", url).option("dbtable", table).mode(mode)
    )
    if driver is not None:
        writer = writer.option("driver", driver)
    if user is not None:
        writer = writer.option("user", user).option("password", password or "")
    return writer
