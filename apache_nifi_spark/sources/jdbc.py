"""GenerateTableFetch planning — SURVEY.md §2.1.

The execution half of NiFi's JDBC trio already lives in
:func:`apache_nifi_spark.sources.formats.jdbc_read` (ExecuteSQL /
QueryDatabaseTable / partitioned range fetch).  This module supplies the
*planning* half: ``GenerateTableFetch`` turns (table, partition column,
N) into N range predicates that downstream fetch tasks run in parallel.

Scale design: the bounds come from one partial+final min/max aggregate
(no collect); the ranges are generated with ``sequence``+``explode`` on
that one-row frame, so the plan stays fully declarative and the same
code path works whether N is 8 or 8,192 fetch partitions.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["generate_table_fetch", "incremental_fetch"]


def generate_table_fetch(
    df: DataFrame, column: str, num_partitions: int, table_name: str
) -> DataFrame:
    """GenerateTableFetch: emit one row per fetch partition with inclusive
    integer bounds and the WHERE predicate NiFi would hand to ExecuteSQL.

    Mirrors Spark's own JDBC stride logic (lowerBound/upperBound/
    numPartitions): stride = ceil((max - min + 1) / N); the final
    partition is clamped to the true max.
    """
    bounds = df.agg(
        F.min(F.col(column)).cast("bigint").alias("lo"),
        F.max(F.col(column)).cast("bigint").alias("hi"),
    )
    n = F.lit(num_partitions)
    stride = F.ceil((F.col("hi") - F.col("lo") + 1) / n).cast("bigint")
    parts = bounds.select(
        "lo",
        "hi",
        stride.alias("stride"),
        F.explode(F.sequence(F.lit(0), n - 1)).alias("partition_id"),
    )
    p_lo = F.col("lo") + F.col("partition_id") * F.col("stride")
    p_hi = F.least(p_lo + F.col("stride") - 1, F.col("hi"))
    return parts.select(
        F.col("partition_id").cast("int").alias("partition_id"),
        p_lo.alias("lower_bound"),
        p_hi.alias("upper_bound"),
        F.concat(
            F.lit(f"SELECT * FROM {table_name} WHERE {column} >= "),
            p_lo.cast("string"),
            F.lit(f" AND {column} <= "),
            p_hi.cast("string"),
        ).alias("fetch_sql"),
    ).filter(F.col("lower_bound") <= F.col("hi"))


def incremental_fetch(
    spark,
    url: str,
    table: str,
    max_value_column: str,
    last_max: int | None,
    options=None,
) -> "DataFrame":
    """QueryDatabaseTable's incremental contract (SURVEY.md §2.1): fetch
    only rows whose ``max_value_column`` exceeds the last observed
    maximum; the caller persists the new maximum as state (NiFi keeps it
    in its state manager; a Spark pipeline keeps it in the checkpoint /
    a control table).

    The predicate runs IN the database (JDBC pushdown), so each poll
    reads only the delta — the pattern that turns a JDBC table into an
    incremental source without CDC infrastructure.
    """
    from apache_nifi_spark.sources.formats import jdbc_read

    where = f' WHERE {max_value_column} > {int(last_max)}' if last_max is not None else ""
    return jdbc_read(
        spark, url, f"SELECT * FROM {table}{where}", options=options
    )
