"""Sampling & rate limiting (SURVEY.md §2.3: SampleRecord, ControlRate).

``sample_interval`` is deterministic (every Nth by a key) — the
oracle-checkable strategy.  Probabilistic and reservoir strategies match
NiFi's other SampleRecord modes; they are seeded but partition-layout
dependent, so they get rows-only correctness checks.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = [
    "sample_interval",
    "sample_probabilistic",
    "sample_reservoir",
    "control_rate_limit",
]


def sample_interval(df: DataFrame, key: Column, n: int) -> DataFrame:
    """Every Nth record by a stable key (SampleRecord interval strategy).
    Deterministic under any partitioning — safe for oracle checks."""
    return df.filter(key % n == 0)


def sample_probabilistic(df: DataFrame, fraction: float, seed: int = 42) -> DataFrame:
    """SampleRecord probabilistic strategy — Bernoulli per row."""
    return df.sample(withReplacement=False, fraction=fraction, seed=seed)


def sample_reservoir(df: DataFrame, k: int, order_key: Column | None = None, seed: int = 42) -> DataFrame:
    """SampleRecord reservoir strategy: uniform-without-replacement K rows.

    Implemented as top-K by a per-row hash of a stable key (deterministic
    when ``order_key`` given — md5 hex, identical ordering in any engine)
    or by rand(seed).  Spark plans this as TakeOrderedAndProject — no
    global sort materialization.
    """
    score = F.md5(order_key.cast("string")) if order_key is not None else F.rand(seed)
    return df.orderBy(score).limit(k)


def control_rate_limit(df: DataFrame, group: Column, order: Column, per_group: int) -> DataFrame:
    """ControlRate with a grouping attribute: at most N records per group
    (per trigger in streaming; per batch here) — window row_number filter."""
    from pyspark.sql import Window

    w = Window.partitionBy(group).orderBy(order)
    return (
        df.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") <= per_group)
        .drop("__rn")
    )
