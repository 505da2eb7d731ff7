"""Hypertable continuous-aggregate rollup (the TimescaleDB/Druid-style
time-hierarchy materialization; a custom operator Spark lacks,
expressed as a composition of built-in ops per the Spark-first rules).

The property that matters at 100 TB: each coarser grain derives from
the NEXT-FINER ROLLUP, never from the raw table — the day tier re-
aggregates hour rows (24× fewer), the hour tier re-aggregates minute
rows (60× fewer), so the raw scan happens exactly once regardless of
how many grains materialize.  That only works for re-aggregable
aggregates, so the tier carries the standard decomposable set — count,
sum, min, max — and derives avg at read time as sum/count (exact).

Plan shape: one raw scan → minute agg (map-side combine, shuffle
bounded by distinct (grain-bucket, key) — calendar-bounded, not
corpus-bounded) → each finer frame localCheckpoint-pinned because TWO
consumers read it (its own output branch and the next-coarser agg);
without the pin every tier re-runs the raw scan.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["hypertable_rollup"]

#: supported grains, finest first; each derives from its predecessor
_GRAINS = ["minute", "hour", "day", "week", "month"]


def hypertable_rollup(
    df: DataFrame,
    ts_col: str,
    value_col: str,
    key_cols: list[str] | None = None,
    grains: list[str] | None = None,
) -> DataFrame:
    """Materialize the time-hierarchy rollup of ``value_col`` (count /
    sum / min / max, avg derived) per ``key_cols`` at every grain in
    ``grains`` (must be a contiguous run of minute<hour<day<week<month,
    finest first).  Returns one unioned frame with ``grain`` and
    ``bucket_ts`` columns; sums are decimal-exact (addition-order
    independent), so every tier value-oracles."""
    grains = grains or ["minute", "hour", "day"]
    order = [g for g in _GRAINS if g in grains]
    if order != grains:
        raise ValueError(f"grains must be finest-first from {_GRAINS}")
    keys = key_cols or []

    finest = grains[0]
    tier = (
        df.groupBy(
            F.date_trunc(finest, F.col(ts_col)).alias("bucket_ts"), *keys
        )
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.col(value_col).cast("decimal(30,6)")).alias("_sum"),
            F.min(value_col).alias("min_value"),
            F.max(value_col).alias("max_value"),
        )
    )
    tiers: list[DataFrame] = []
    for i, grain in enumerate(grains):
        if i > 0:
            # re-aggregate the FINER tier — never the raw table
            tier = (
                tier.groupBy(
                    F.date_trunc(grain, F.col("bucket_ts")).alias("bucket_ts"),
                    *keys,
                )
                .agg(
                    F.sum("n").alias("n"),
                    F.sum("_sum").alias("_sum"),
                    F.min("min_value").alias("min_value"),
                    F.max("max_value").alias("max_value"),
                )
            )
        if i < len(grains) - 1:
            # pinned: this tier feeds BOTH its output branch and the
            # next-coarser aggregation
            tier = tier.localCheckpoint(eager=False)
        tiers.append(tier.select(F.lit(grain).alias("grain"), "*"))

    out = tiers[0]
    for t in tiers[1:]:
        out = out.unionByName(t)
    return out.select(
        "grain",
        "bucket_ts",
        *keys,
        "n",
        F.col("_sum").cast("double").alias("total_value"),
        # IEEE double divide of the exact decimal sum — one correctly-
        # rounded op, bit-identical cross-engine (decimal DIVISION
        # precision rules differ between engines; double division not)
        (F.col("_sum").cast("double") / F.col("n").cast("double")).alias(
            "avg_value"
        ),
        "min_value",
        "max_value",
    )
