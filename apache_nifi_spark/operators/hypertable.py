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

__all__ = ["hypertable_rollup", "gapfill_locf"]

#: supported grains, finest first; each derives from its predecessor
_GRAINS = ["minute", "hour", "day", "week", "month"]

#: seconds per supported gapfill stride
_STRIDE_S = {"minute": 60, "hour": 3600, "day": 86400}


def gapfill_locf(
    rolled: DataFrame,
    grain: str,
    key_cols: list[str],
    value_cols: list[str],
) -> DataFrame:
    """``time_bucket_gapfill`` + LOCF (the TimescaleDB read-time pair):
    materialize EVERY calendar bucket between each key's first and last
    observed bucket, then carry the last observation forward into the
    gaps (``filled`` marks synthesized rows).

    Spark shape: per-key min/max bounds (one map-side-combined agg) →
    ``sequence()`` + ``explode`` generates the calendar spine WITHOUT a
    join against a numbers table → left join back to the rollup on
    (key, bucket) → one ``last(ignorenulls)`` window per value column,
    partitioned BY KEY (bounded sort per key, never corpus-global).
    The spine is calendar-bounded — at 100 TB it is still
    (keys × buckets-in-range), independent of row count."""
    if grain not in _STRIDE_S:
        raise ValueError(f"gapfill grain must be one of {list(_STRIDE_S)}")
    from pyspark.sql import Window

    stride = _STRIDE_S[grain]
    bounds = rolled.groupBy(*key_cols).agg(
        F.min("bucket_ts").alias("_lo"), F.max("bucket_ts").alias("_hi")
    )
    spine = bounds.select(
        *key_cols,
        F.explode(
            F.sequence(
                F.col("_lo").cast("timestamp"),
                F.col("_hi").cast("timestamp"),
                F.expr(f"INTERVAL {stride} SECOND"),
            )
        ).alias("bucket_ts"),
    ).select(
        *key_cols,
        F.col("bucket_ts").cast(dict(rolled.dtypes)["bucket_ts"])
        .alias("bucket_ts"),
    )
    joined = spine.join(rolled, [*key_cols, "bucket_ts"], "left")
    w = (
        Window.partitionBy(*key_cols)
        .orderBy("bucket_ts")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    filled = F.col(value_cols[0]).isNull()
    out = joined.select(
        *key_cols,
        "bucket_ts",
        *[
            F.last(c, ignorenulls=True).over(w).alias(c)
            for c in value_cols
        ],
        filled.alias("filled"),
    )
    return out


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
