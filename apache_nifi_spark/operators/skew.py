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

#: Probe-verdict memo keyed by (analyzed-plan semanticHash, join keys) —
#: a skew verdict is a property of the INPUT, so re-planning the same
#: join (bench iterations, retried stages, fan-out of the same pipeline)
#: must not re-fire the eager key-scan job.  semanticHash covers the
#: source relation (including its file listing), so a changed input
#: yields a fresh probe.  Unbounded but tiny: one bool per distinct
#: (plan, keys, params) tuple per driver process.
_PROBE_CACHE: dict[tuple, bool] = {}


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
    hot_share: float | None = None,
    sample_fraction: float | None = None,
    seed: int = 42,
    min_hot_rows: int = 8,
) -> bool:
    """Key-histogram probe: True iff the hottest join key's SHARE of the
    input (``max_count / total_rows``) reaches ``hot_share`` — by default
    ``4 / spark.sql.shuffle.partitions``, i.e. the hottest key alone
    carries at least four average reduce partitions' worth of rows.

    Share, not max/mean: the old ``max/mean ≥ k`` statistic false-fired on
    healthy high-cardinality keys — with many singleton keys the mean
    collapses toward 1 (and row-sampling thins it further, flipping the
    verdict as SF grows), while the max is just the largest group.  A key
    whose share is small cannot overload one reduce task no matter what
    the mean is; a key whose share is large always will.  The share is
    also sample-invariant by construction — numerator and denominator
    shrink by the same fraction, so no sample-rate correction is needed.

    ``min_hot_rows`` guards the underpowered-sample corner: with very few
    sampled rows every count is ~1 and ``1/total`` can exceed the
    threshold by accident; a genuinely hot key at any realistic sample
    rate appears many times.  Below the guard the probe answers False and
    AQE's runtime skew split stays the backstop.

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
    cache_key = None
    try:
        cache_key = (
            df._jdf.queryExecution().analyzed().semanticHash(),
            tuple(on),
            hot_share,
            sample_fraction,
            min_hot_rows,
        )
    except Exception:
        pass
    if cache_key is not None and cache_key in _PROBE_CACHE:
        return _PROBE_CACHE[cache_key]
    probe = df.select(*on)
    if sample_fraction is not None:
        probe = probe.sample(fraction=sample_fraction, seed=seed)
    row = (
        probe.groupBy(*on)
        .count()
        .agg(F.max("count").alias("mx"), F.sum("count").alias("total"))
        .first()
    )
    if row is None or not row["total"] or row["mx"] < min_hot_rows:
        verdict = False
    else:
        if hot_share is None:
            parallelism = int(
                df.sparkSession.conf.get("spark.sql.shuffle.partitions", "200")
            )
            hot_share = 4.0 / max(parallelism, 1)
        verdict = row["mx"] / row["total"] >= hot_share
    if cache_key is not None:
        _PROBE_CACHE[cache_key] = verdict
    return verdict


def salted_join_auto(
    skewed: DataFrame,
    other: DataFrame,
    on: Sequence[str],
    how: str = "inner",
    salt: int = 16,
    hot_share: float | None = None,
    sample_fraction: float | None = None,
) -> DataFrame:
    """Salt only when the key histogram says so; otherwise emit the plain
    join and let AQE's runtime skew split handle residual hotspots.

    Unconditional salting multiplies the dim side ``salt``× for nothing
    on evenly-keyed data — the probe makes the cure conditional on the
    disease (and the share-based probe never salts when the hottest key
    is below ``hot_share`` of the rows — default 4/shuffle-parallelism).
    Results are identical either way.

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
    if detect_join_skew(skewed, on, hot_share, sample_fraction):
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
