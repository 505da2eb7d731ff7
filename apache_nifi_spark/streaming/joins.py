"""Stream-stream correlation — NiFi ``Wait``/``Notify`` (SURVEY.md §2.6).

NiFi holds a FlowFile at a Wait processor until a matching release signal
(by release-signal id) lands in the distributed map cache, with an
expiration.  The Spark-native equivalent is a watermarked stream-stream
join: the waiting stream joins the signal stream on the correlation key
with a time-range bound; join state is buffered per key and evicted once
the watermark passes the bound (= signal expiration) — bounded state at
any input rate, no external cache service.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["correlate_streams", "correlate_streams_with_expiry"]


def correlate_streams(
    waiting: DataFrame,
    signal: DataFrame,
    key_cols: Sequence[str],
    ts_col: str,
    within: str = "24 hours",
    watermark: str = "1 hour",
    prefixes: tuple[str, str] = ("w_", "s_"),
) -> DataFrame:
    """Join ``waiting`` rows to ``signal`` rows with the same key(s) where
    the signal arrived in ``[waiting.ts, waiting.ts + within]``.

    Works on both streaming (watermarked, state-evicting) and batch
    DataFrames (plain range join) — the batch-parity property the oracle
    gate relies on.  Output columns carry ``prefixes`` to disambiguate.
    """
    wp, sp = prefixes
    w = waiting.select([F.col(c).alias(f"{wp}{c}") for c in waiting.columns])
    s = signal.select([F.col(c).alias(f"{sp}{c}") for c in signal.columns])
    if waiting.isStreaming:
        w = w.withWatermark(f"{wp}{ts_col}", watermark)
    if signal.isStreaming:
        s = s.withWatermark(f"{sp}{ts_col}", watermark)
    keys = [F.col(f"{wp}{k}") == F.col(f"{sp}{k}") for k in key_cols]
    time_bound = (F.col(f"{sp}{ts_col}") >= F.col(f"{wp}{ts_col}")) & (
        F.col(f"{sp}{ts_col}") <= F.col(f"{wp}{ts_col}") + F.expr(f"INTERVAL {within}")
    )
    cond = time_bound
    for k in keys:
        cond = k & cond
    return w.join(s, cond, "inner")


def correlate_streams_with_expiry(
    waiting: DataFrame,
    signal: DataFrame,
    key_cols: Sequence[str],
    ts_col: str,
    within: str = "24 hours",
    watermark: str = "1 hour",
    prefixes: tuple[str, str] = ("w_", "s_"),
) -> DataFrame:
    """Wait/Notify WITH the expiration relationship: a LEFT OUTER
    watermarked stream-stream join — matched rows release immediately
    (``relationship='released'``), and a waiting row whose window closes
    unmatched is emitted with null signal columns once the watermark
    passes its bound (``'expired'``, NiFi's Wait expiration route).

    Determinism note for finite drains (availableNow): the final
    watermark is ``max(event time) − watermark delay``, so waiting rows
    whose bound hasn't been passed by then are still parked in state
    when the drain ends and appear in NEITHER relationship — exactly
    the rows a longer-running stream hasn't decided yet.  The
    batch-parity oracle applies the same cutoff.
    """
    wp, sp = prefixes
    w = waiting.select([F.col(c).alias(f"{wp}{c}") for c in waiting.columns])
    s = signal.select([F.col(c).alias(f"{sp}{c}") for c in signal.columns])
    if waiting.isStreaming:
        w = w.withWatermark(f"{wp}{ts_col}", watermark)
    if signal.isStreaming:
        s = s.withWatermark(f"{sp}{ts_col}", watermark)
    cond = (F.col(f"{sp}{ts_col}") >= F.col(f"{wp}{ts_col}")) & (
        F.col(f"{sp}{ts_col}") <= F.col(f"{wp}{ts_col}") + F.expr(f"INTERVAL {within}")
    )
    for k in key_cols:
        cond = (F.col(f"{wp}{k}") == F.col(f"{sp}{k}")) & cond
    joined = w.join(s, cond, "left_outer")
    return joined.withColumn(
        "relationship",
        F.when(F.col(f"{sp}{ts_col}").isNotNull(), "released").otherwise("expired"),
    )
