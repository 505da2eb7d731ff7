"""Hand-computed unit tests for the round-13 rank-statistics tier —
independent of the DuckDB differential (which checks engine parity,
not textbook correctness): KS D and the Mann-Whitney tie-corrected z
are verified against values derived by hand / a reference formula on
tiny constructed frames, and the registry's duplicate-name guard is
pinned (the text_char_entropy shadowing incident)."""

from __future__ import annotations

import math

import pytest

from apache_nifi_spark.registry import QUERIES, register


def test_register_rejects_duplicate_names():
    name = next(iter(QUERIES))
    with pytest.raises(ValueError, match="duplicate registry query name"):
        register(name)(lambda spark, sf_dir: None)


def _two_level_rows(spark, vals1, vals2, query):
    """Run a registry rank-stat query against a swapped-in orders frame
    by mimicking its input contract (o_totalprice, o_orderstatus).
    The satellite binds ``_t`` by name at import, so the patch targets
    ``registry_analytics._t`` (not the registry's)."""
    import apache_nifi_spark.registry_analytics as ra

    df = spark.createDataFrame(
        [(float(v), "F") for v in vals1] + [(float(v), "O") for v in vals2],
        "o_totalprice double, o_orderstatus string",
    )
    orig = ra._t
    try:
        ra._t = lambda s, d, t: df
        return QUERIES[query](spark, "unused").collect()
    finally:
        ra._t = orig


def test_ks_drift_matches_hand_computed_d(spark):
    # sample1 = {1,2,3,4}, sample2 = {3,4,5,6}: ECDFs diverge most at
    # v=2 (F1=0.5, F2=0.0) and symmetrically at v=4 → D = 0.5 exactly.
    [row] = _two_level_rows(spark, [1, 2, 3, 4], [3, 4, 5, 6], "stats_ks_drift")
    assert row["n1"] == 4 and row["n2"] == 4
    assert row["d_stat"] == pytest.approx(0.5, abs=1e-9)
    # critical value at alpha=.05: 1.358099 * sqrt(8/16) = 0.9603214...
    assert row["d_crit_05"] == pytest.approx(0.960321, abs=1e-6)
    assert bool(row["drifted"]) is False


def test_ks_drift_identical_samples_gives_zero(spark):
    [row] = _two_level_rows(spark, [1, 2, 2, 9], [1, 2, 2, 9], "stats_ks_drift")
    assert row["d_stat"] == 0.0
    assert bool(row["drifted"]) is False


def test_mann_whitney_matches_reference_formula(spark):
    # Samples with a tie across groups: s1={1,2,5}, s2={2,3,4}.
    # Pooled sorted: 1(r1), 2,2(avg rank 2.5), 3(r4), 4(r5), 5(r6).
    # R1 = 1 + 2.5 + 6 = 9.5 → U1 = 9.5 - 3*4/2 = 3.5; mu = 4.5.
    # ties: one group of 2 → sum(t^3-t) = 6; n = 6.
    # sigma = sqrt(3*3/12 * (7 - 6/(6*5))) = sqrt(0.75*6.8) = sqrt(5.1)
    [row] = _two_level_rows(spark, [1, 2, 5], [2, 3, 4], "stats_mann_whitney_u")
    assert row["n1"] == 3 and row["n2"] == 3
    assert row["u1"] == pytest.approx(3.5, abs=1e-9)
    assert row["z"] == pytest.approx((3.5 - 4.5) / math.sqrt(5.1), abs=1e-6)


def test_mann_whitney_shifted_sample_sign(spark):
    # Every s1 value below every s2 value → U1 = 0, z strongly negative.
    [row] = _two_level_rows(spark, [1, 2, 3], [10, 11, 12], "stats_mann_whitney_u")
    assert row["u1"] == 0.0
    assert row["z"] < -1.9


def test_gini_uniform_is_zero_and_extreme_is_high(spark):
    import apache_nifi_spark.registry_analytics as reg

    def run(revenues):
        orders = spark.createDataFrame(
            [(i, float(r)) for i, r in enumerate(revenues)],
            "o_custkey long, o_totalprice double",
        )
        customer = spark.createDataFrame(
            [(i, "SEG") for i in range(len(revenues))],
            "c_custkey long, c_mktsegment string",
        )
        orig = reg._t
        try:
            reg._t = lambda s, d, t: orders if t == "orders" else customer
            [row] = QUERIES["stats_gini_concentration"](spark, "x").collect()
            return row
        finally:
            reg._t = orig

    assert run([5, 5, 5, 5])["gini"] == pytest.approx(0.0, abs=1e-9)
    # one customer holds everything: G -> (n-1)/n = 0.75 for n=4
    row = run([0.000001, 0.000001, 0.000001, 1000000])
    assert row["gini"] == pytest.approx(0.75, abs=1e-4)
