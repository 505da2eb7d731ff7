"""Skew handling (SURVEY.md §2.11 load-balanced connections, §4.2):
salting for hot keys in joins and aggregations.

NiFi's load-balanced connections hash-partition a queue across nodes; a
hot correlation key saturates one node, and NiFi has no answer beyond
back pressure.  At 100 TB a hot join/group key does the same to one
executor.  AQE's skew-join split handles most cases at runtime
(``spark.sql.adaptive.skewJoin.enabled``, on in session.py); explicit
salting below is the deterministic fallback for pathological keys and
for aggregations (AQE only splits joins).

Salting trades a bounded replication of the small side (×salt) for an
even spread of the hot side — the standard cure when broadcast is too big
and one key dominates.
"""

from __future__ import annotations

from collections.abc import Mapping, Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = ["salted_join", "salted_aggregate", "detect_join_skew", "salted_join_auto"]

_SALT = "__salt"

#: Above this estimated input size the auto-join probe defaults to a 1%
#: sample rather than a full key scan.
_PROBE_FULL_SCAN_BYTES = 1 << 30


def _is_large(df: DataFrame) -> bool:
    """Catalyst size estimate ≥ 1 GiB → sample the skew probe."""
    try:
        plan = df._jdf.queryExecution().optimizedPlan()
        return plan.stats().sizeInBytes().longValue() >= _PROBE_FULL_SCAN_BYTES
    except Exception:
        return False


def salted_join(
    skewed: DataFrame,
    other: DataFrame,
    on: Sequence[str],
    how: str = "inner",
    salt: int = 16,
) -> DataFrame:
    """Equi-join where ``skewed``'s key distribution is pathological:
    spread the hot side over ``salt`` sub-keys, replicate ``other``
    (the bounded side) once per sub-key, join on (keys + salt).

    Each (skewed row, other row) pair matches exactly one salt value, so
    the result equals the plain join for ``inner`` and ``left`` — the
    only hows accepted (an outer ``other`` side would surface its
    replicas).  Shuffle volume: skewed side unchanged, other side ×salt —
    pick ``salt`` ≈ executor-count / hot-key-count.
    """
    if how not in ("inner", "left"):
        raise ValueError("salted_join supports how='inner'|'left' only")
    keys = list(on)
    hot = skewed.withColumn(_SALT, (F.rand(42) * salt).cast("int"))
    replicated = other.withColumn(
        _SALT, F.explode(F.sequence(F.lit(0), F.lit(salt - 1)))
    )
    return hot.join(replicated, keys + [_SALT], how).drop(_SALT)


def detect_join_skew(
    df: DataFrame,
    on: Sequence[str],
    skew_factor: float = 4.0,
    sample_fraction: float | None = None,
    seed: int = 42,
) -> bool:
    """Cheap key-histogram probe: True iff the hottest join key's
    frequency exceeds ``skew_factor`` × the mean key frequency.

    One aggregate returning a single row — at 100 TB run it on a sample
    (``sample_fraction``) or, better, off the table's stored statistics;
    the probe's cost is noise next to a mis-planned shuffle of the
    full fact table.

    NOTE: this is an EAGER Spark action (a full groupBy-count job) fired
    at plan-construction time — not lazy like the rest of the operator
    surface.  Streaming DataFrames don't support ``first()``; callers
    (``salted_join_auto``) skip the probe for them.
    """
    if df.isStreaming:
        return False
    probe = df.select(*on)
    if sample_fraction is not None:
        probe = probe.sample(fraction=sample_fraction, seed=seed)
    row = (
        probe.groupBy(*on)
        .count()
        .agg(F.max("count").alias("mx"), F.avg("count").alias("mean"))
        .first()
    )
    if row is None or row["mean"] is None or row["mean"] <= 0:
        return False
    return row["mx"] / row["mean"] >= skew_factor


def salted_join_auto(
    skewed: DataFrame,
    other: DataFrame,
    on: Sequence[str],
    how: str = "inner",
    salt: int = 16,
    skew_factor: float = 4.0,
    sample_fraction: float | None = None,
) -> DataFrame:
    """Salt only when the key histogram says so; otherwise emit the plain
    join and let AQE's runtime skew split handle residual hotspots.

    Unconditional salting multiplies the dim side ``salt``× for nothing
    on evenly-keyed data — the probe makes the cure conditional on the
    disease.  Results are identical either way.

    COST: the probe is an eager groupBy-count job at DataFrame-BUILD
    time (see ``detect_join_skew``) — one extra scan of the join keys.
    On large inputs pass ``sample_fraction`` (e.g. 0.01) to bound it;
    streaming inputs skip the probe and fall through to the plain join
    (AQE / watermark state handles them).
    """
    if skewed.isStreaming:
        return skewed.join(other, list(on), how)
    if sample_fraction is None and _is_large(skewed):
        sample_fraction = 0.01
    if detect_join_skew(skewed, on, skew_factor, sample_fraction):
        return salted_join(skewed, other, on, how=how, salt=salt)
    return skewed.join(other, list(on), how)


def salted_aggregate(
    df: DataFrame,
    keys: Sequence[str],
    aggs: Mapping[str, tuple[Column, str]],
    salt: int = 16,
) -> DataFrame:
    """Two-phase aggregation for hot group keys: partial agg on
    (keys + salt), final agg on keys.  ``aggs`` maps output alias →
    (column, fn) with fn in sum/count/min/max (the decomposable set).

    Catalyst already does map-side partial aggregation; explicit salting
    additionally spreads the *reduce* of a hot key over ``salt`` tasks —
    for when one key's partial states still swamp a single reducer.
    """
    partial_fns = {"sum": F.sum, "count": F.count, "min": F.min, "max": F.max}
    final_fns = {"sum": F.sum, "count": F.sum, "min": F.min, "max": F.max}
    for alias, (_, fn) in aggs.items():
        if fn not in partial_fns:
            raise ValueError(f"{alias}: {fn!r} is not decomposable (sum/count/min/max)")

    salted = df.withColumn(_SALT, (F.rand(7) * salt).cast("int"))
    partial = salted.groupBy(*keys, _SALT).agg(
        *[partial_fns[fn](col).alias(alias) for alias, (col, fn) in aggs.items()]
    )
    return partial.groupBy(*keys).agg(
        *[final_fns[fn](alias).alias(alias) for alias, (_, fn) in aggs.items()]
    )
