"""Custom stateful streaming — NiFi ``Wait``/``Notify`` and stateful
``UpdateAttribute`` counters (SURVEY.md §2.6, §2.11), via
``applyInPandasWithState``.

The state layout is the NiFi distributed-map-cache analog: one entry per
key, carried across micro-batches, expirable by timeout (= signal
expiration / cache age-off).  Python is unavoidable here (the API is
PySpark-only); batches arrive Arrow-encoded per group.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    DoubleType,
    LongType,
    StructField,
    StructType,
)

__all__ = ["running_totals_per_key", "RUNNING_TOTALS_SCHEMA"]

RUNNING_TOTALS_SCHEMA = StructType(
    [
        StructField("user_id", LongType()),
        StructField("event_id", LongType()),
        StructField("seen_so_far", LongType()),
        StructField("cents_so_far", LongType()),
    ]
)

_STATE_SCHEMA = StructType(
    [StructField("n", LongType()), StructField("cents", LongType())]
)


def _update(key, pdfs: Iterator[pd.DataFrame], state: GroupState) -> Iterator[pd.DataFrame]:
    """Per-key accumulator: emits, for every event, the running count and
    running value-in-cents INCLUDING that event.

    Rows inside a micro-batch are sorted by (ts, event_id) before folding
    so results are deterministic regardless of partition arrival order —
    integer cents keep the fold exact (and oracle-comparable).
    """
    import numpy as np

    (n, cents) = state.get if state.exists else (0, 0)
    # A group's rows may arrive as several Arrow chunks with no global
    # order; concat then sort once (state groups are bounded by contract —
    # per-key correlation sets, not whole partitions).
    chunks = [pdf for pdf in pdfs if len(pdf)]
    if chunks:
        pdf = pd.concat(chunks, ignore_index=True).sort_values(
            ["ts", "event_id"], kind="mergesort"
        )
        # floor(v*100 + 0.5): half-up in pure float ops, matching the SQL
        # oracle expression exactly (numpy round would be half-even)
        c = np.floor(pdf["value"].to_numpy() * 100.0 + 0.5).astype("int64")
        run_c = cents + c.cumsum()
        run_n = n + np.arange(1, len(pdf) + 1, dtype="int64")
        n = int(run_n[-1])
        cents = int(run_c[-1])
        yield pd.DataFrame(
            {
                "user_id": pdf["user_id"].to_numpy(),
                "event_id": pdf["event_id"].to_numpy(),
                "seen_so_far": run_n,
                "cents_so_far": run_c,
            }
        )
    state.update((n, cents))


def running_totals_per_key(events: DataFrame, timeout: str = "NoTimeout") -> DataFrame:
    """Wait/Notify-style keyed state machine: per-user running totals
    across micro-batches.  ``timeout`` maps NiFi's signal expiration
    (ProcessingTimeTimeout would age keys out)."""
    return (
        events.select("user_id", "event_id", "ts", "value")
        .groupBy("user_id")
        .applyInPandasWithState(
            _update,
            outputStructType=RUNNING_TOTALS_SCHEMA,
            stateStructType=_STATE_SCHEMA,
            outputMode="append",
            timeoutConf=getattr(GroupStateTimeout, timeout),
        )
    )
