"""Bucketed tables: shuffle-free co-located joins (SURVEY.md §2.11
"cluster-distributed queue partitioning" and the §4 scale rules).

NiFi's partition-by-attribute load balancing pins a key's FlowFiles to
one node so downstream correlation needs no re-shuffle; Spark's
equivalent persistent layout is bucketing — both sides of a recurring
join written with ``bucketBy(n, keys)`` hash-place rows identically, so
the join compiles with zero Exchange.  At 100 TB this converts every
repeated fact-fact join on the same key from a full network rewrite into
a local zip — the single biggest recurring-shuffle saving available.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, SparkSession

__all__ = ["write_bucketed", "bucketed_table"]


def write_bucketed(
    df: DataFrame,
    table: str,
    keys: Sequence[str],
    num_buckets: int = 32,
    path: str | None = None,
    sort: bool = True,
) -> None:
    """Persist ``df`` as a bucketed (and bucket-sorted) table.

    ``num_buckets`` must match on every table that wants shuffle-free
    joins against this one; sorting within buckets additionally removes
    the join's Sort step (sort-merge join reads pre-sorted runs).
    """
    writer = df.write.mode("overwrite").bucketBy(num_buckets, *keys)
    if sort:
        writer = writer.sortBy(*keys)
    if path is not None:
        writer = writer.option("path", path)
    writer.saveAsTable(table)


def bucketed_table(spark: SparkSession, table: str) -> DataFrame:
    """Read a bucketed table with its bucket spec intact (plain
    ``spark.table`` — the catalog carries the layout)."""
    return spark.table(table)
