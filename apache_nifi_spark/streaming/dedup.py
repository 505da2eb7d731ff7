"""Cross-batch duplicate detection — NiFi ``DetectDuplicate`` with its
distributed-map-cache age-off (SURVEY.md §2.6 / §2.11).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame


def dedup_within_watermark(
    df: DataFrame, keys: Sequence[str], ts_col: str, delay: str = "1 hour"
) -> DataFrame:
    """Keep the first occurrence of each key; duplicate state expires once
    the watermark passes (= DetectDuplicate's cache age-off).  On a batch
    DataFrame this degrades to plain dropDuplicates — the batch-parity
    identity the oracle uses."""
    if df.isStreaming:
        return df.withWatermark(ts_col, delay).dropDuplicatesWithinWatermark(list(keys))
    return df.dropDuplicates(list(keys))
