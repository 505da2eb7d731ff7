"""Analytics / time-series / statistics query tier (round-13 satellite
— keeps `registry.py` and `registry_llm.py` under the 8 k-line
maintainability bar the round-12 verdict set).  Same ``@register``
decorator and ``QUERIES``/``ORACLES`` dicts as the other satellites;
``apache_nifi_spark.registry`` imports this module at the end of its
body, so every query name resolves through the registry unchanged.
Determinism rules per the registry module docstring.
"""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from apache_nifi_spark.registry import (
    ORACLES,  # noqa: F401  (registration side effects)
    QUERIES,  # noqa: F401
    _davg,  # noqa: F401
    _dsum,  # noqa: F401
    _t,
    register,
)

@register(
    "unpivot_measures",
    oracle="""
    SELECT l_orderkey, l_linenumber, measure, CAST(value AS DOUBLE) AS value
    FROM (
      SELECT l_orderkey, l_linenumber, 'quantity' AS measure,
             l_quantity AS value
      FROM lineitem WHERE l_orderkey < 1000
      UNION ALL
      SELECT l_orderkey, l_linenumber, 'extendedprice', l_extendedprice
      FROM lineitem WHERE l_orderkey < 1000
      UNION ALL
      SELECT l_orderkey, l_linenumber, 'discount', l_discount
      FROM lineitem WHERE l_orderkey < 1000
    )
    """,
)
def unpivot_measures_q(spark, sf_dir):
    """UNPIVOT / melt (the wide→long reshape dual of the pivot query —
    QueryRecord's SQL surface covers both): three measure columns
    unfold to (measure, value) rows via the ``stack`` table generator,
    a pure PROJECTION — one scan, no shuffle, no join; output is 3×
    the filtered rows with values passed through untouched (bit-exact
    doubles).  At scale this is the standard prep for measure-generic
    downstream operators (one quality gate over any metric)."""
    li = (
        _t(spark, sf_dir, "lineitem")
        .filter(F.col("l_orderkey") < 1000)
        .select("l_orderkey", "l_linenumber", "l_quantity",
                "l_extendedprice", "l_discount")
    )
    return li.selectExpr(
        "l_orderkey",
        "l_linenumber",
        "stack(3, 'quantity', CAST(l_quantity AS DOUBLE),"
        " 'extendedprice', CAST(l_extendedprice AS DOUBLE),"
        " 'discount', CAST(l_discount AS DOUBLE)) AS (measure, value)",
    )


@register(
    "orders_rfm_segmentation",
    oracle="""
    WITH base AS (
      SELECT o_custkey,
             max(o_orderdate) AS last_order,
             CAST(count(*) AS BIGINT) AS frequency,
             CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE)
               AS monetary
      FROM orders GROUP BY o_custkey
    ), scored AS (
      SELECT *,
             ntile(4) OVER (ORDER BY last_order, o_custkey) AS r_q,
             ntile(4) OVER (ORDER BY frequency, o_custkey)  AS f_q,
             ntile(4) OVER (ORDER BY monetary, o_custkey)   AS m_q
      FROM base
    )
    SELECT o_custkey AS custkey, frequency, monetary,
           CAST(r_q AS INT) AS r_q, CAST(f_q AS INT) AS f_q,
           CAST(m_q AS INT) AS m_q,
           CAST(r_q * 100 + f_q * 10 + m_q AS INT) AS rfm
    FROM scored
    """,
)
def orders_rfm_segmentation_q(spark, sf_dir):
    """RFM segmentation (the classic customer-value model): per
    customer recency (last order date), frequency and exact-decimal
    monetary total, each quartiled with ``ntile(4)`` under a FULLY
    DETERMINISTIC order (metric, custkey tiebreak — ntile is only
    portable when the order is total), composed into the 111–444 RFM
    code.  One aggregation + three rank passes over the
    customer-grain frame (already thousands× smaller than orders).

    Scale note: ntile needs a global order — at 100 TB grain you'd
    swap it for the histogram-quantile cut (quantile_histogram_sketch)
    and a range join; at customer grain (≤ tens of millions) Spark's
    single-pass window over a range-partitioned sort is the standard
    shape and stays in one exchange per metric."""
    o = _t(spark, sf_dir, "orders")
    base = o.groupBy(F.col("o_custkey").alias("custkey")).agg(
        F.max("o_orderdate").alias("last_order"),
        F.count(F.lit(1)).alias("frequency"),
        F.sum(F.col("o_totalprice").cast("decimal(18,2)"))
        .cast("double")
        .alias("monetary"),
    )
    r_q = F.ntile(4).over(Window.orderBy("last_order", "custkey"))
    f_q = F.ntile(4).over(Window.orderBy("frequency", "custkey"))
    m_q = F.ntile(4).over(Window.orderBy("monetary", "custkey"))
    scored = base.select(
        "custkey", "frequency", "monetary",
        r_q.alias("r_q"), f_q.alias("f_q"), m_q.alias("m_q"),
    )
    return scored.withColumn(
        "rfm",
        (F.col("r_q") * 100 + F.col("f_q") * 10 + F.col("m_q")).cast("int"),
    )


@register(
    "scd2_intervals",
    oracle="""
    WITH seq AS (
      SELECT user_id, event_type AS state, ts, event_id,
             lag(event_type) OVER (PARTITION BY user_id
                                   ORDER BY ts, event_id) AS prev
      FROM events WHERE user_id < 200
    ), changes AS (
      SELECT user_id, state, ts, event_id FROM seq
      WHERE prev IS NULL OR state <> prev
    )
    SELECT user_id, state,
           CAST(epoch_us(ts) AS BIGINT) AS valid_from_us,
           CAST(epoch_us(lead(ts) OVER (PARTITION BY user_id
                                        ORDER BY ts, event_id))
                AS BIGINT) AS valid_to_us,
           lead(ts) OVER (PARTITION BY user_id
                          ORDER BY ts, event_id) IS NULL AS is_current
    FROM changes
    """,
)
def scd2_intervals_q(spark, sf_dir):
    """SCD Type-2 interval reconstruction (the warehouse dimension-
    history build): per key, collapse consecutive equal states
    (``lag`` change detection), then ``lead`` closes each surviving
    row's validity interval — half-open [valid_from, valid_to), null
    end + ``is_current`` on the live row.  Both window passes sort
    within user-sized groups under ONE hash partitioning (Catalyst
    reuses the exchange); timestamps surface as epoch micros so the
    two engines hash identical integers.  This is the batch
    reconstruction dual of the CDC stream query's apply-side."""
    ev = (
        _t(spark, sf_dir, "events")
        .filter(F.col("user_id") < 200)
        .select("user_id", F.col("event_type").alias("state"), "ts",
                "event_id")
    )
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    changes = (
        ev.withColumn("prev", F.lag("state").over(w))
        .filter(F.col("prev").isNull() | (F.col("state") != F.col("prev")))
        .drop("prev")
    )
    nxt = F.lead("ts").over(w)
    return changes.select(
        "user_id",
        "state",
        F.unix_micros(F.col("ts").cast("timestamp")).alias("valid_from_us"),
        F.unix_micros(nxt.cast("timestamp")).alias("valid_to_us"),
        nxt.isNull().alias("is_current"),
    )


@register(
    "basket_association_rules",
    oracle="""
    WITH items AS (
      SELECT DISTINCT l_orderkey AS basket, l_partkey AS item
      FROM lineitem
    ), n AS (
      SELECT CAST(count(DISTINCT basket) AS BIGINT) AS n_baskets FROM items
    ), item_n AS (
      SELECT item, CAST(count(*) AS BIGINT) AS cnt FROM items GROUP BY item
    ), pairs AS (
      SELECT a.item AS item_a, b.item AS item_b,
             CAST(count(*) AS BIGINT) AS pair_n
      FROM items a JOIN items b
        ON a.basket = b.basket AND a.item < b.item
      GROUP BY 1, 2 HAVING count(*) >= 3
    )
    SELECT item_a, item_b, pair_n,
           round(CAST(pair_n AS DOUBLE) / ia.cnt, 6) AS confidence,
           round(CAST(pair_n AS DOUBLE) * n.n_baskets
                 / (CAST(ia.cnt AS DOUBLE) * ib.cnt), 6) AS lift
    FROM pairs
    JOIN item_n ia ON ia.item = item_a
    JOIN item_n ib ON ib.item = item_b
    CROSS JOIN n
    """,
)
def basket_association_rules_q(spark, sf_dir):
    """Market-basket association rules (Agrawal-Srikant support/
    confidence/lift — the co-occurrence recommender primitive): basket
    items pair via a KEYED self-equi-join on the basket id (pair volume
    is Σ sᵢ² over basket sizes — baskets are small and bounded, never
    table-grain), pair counts filter at min-support 3, and
    confidence/lift derive from the pair and item counts by single
    float divisions (6 dp).  Item-grain joins stay plain equi-joins
    (AQE broadcasts if genuinely small — no forced hint on an
    unbounded item vocabulary).  The 1-row basket-count frame is the
    same bounded keyless cross as the LM type-total class."""
    items = (
        _t(spark, sf_dir, "lineitem")
        .select(F.col("l_orderkey").alias("basket"),
                F.col("l_partkey").alias("item"))
        .distinct()
    )
    n_baskets = items.select(
        F.countDistinct("basket").alias("n_baskets")
    )
    item_n = items.groupBy("item").agg(F.count(F.lit(1)).alias("cnt"))
    a = items.alias("a")
    b = items.alias("b")
    pairs = (
        a.join(b, (F.col("a.basket") == F.col("b.basket"))
               & (F.col("a.item") < F.col("b.item")))
        .groupBy(F.col("a.item").alias("item_a"),
                 F.col("b.item").alias("item_b"))
        .agg(F.count(F.lit(1)).alias("pair_n"))
        .filter(F.col("pair_n") >= 3)
    )
    ia = item_n.select(F.col("item").alias("item_a"),
                       F.col("cnt").alias("cnt_a"))
    ib = item_n.select(F.col("item").alias("item_b"),
                       F.col("cnt").alias("cnt_b"))
    return (
        pairs.join(ia, "item_a").join(ib, "item_b")
        .crossJoin(n_baskets)  # 1-row total: bounded by construction
        .select(
            "item_a", "item_b", "pair_n",
            F.round(F.col("pair_n").cast("double") / F.col("cnt_a"), 6)
            .alias("confidence"),
            F.round(
                F.col("pair_n").cast("double") * F.col("n_baskets")
                / (F.col("cnt_a").cast("double") * F.col("cnt_b")),
                6,
            ).alias("lift"),
        )
    )


@register(
    "forecast_seasonal_naive_backtest",
    oracle="""
    WITH daily AS (
      SELECT CAST(epoch_us(ts) // 86400000000 AS BIGINT) AS day,
             SUM(CAST(value AS DECIMAL(18,6))) AS rev
      FROM events WHERE event_type = 'purchase' GROUP BY 1
    )
    SELECT d.day,
           CAST(d.rev AS DOUBLE) AS rev,
           CAST(f.rev AS DOUBLE) AS forecast,
           CAST(abs(d.rev - f.rev) AS DOUBLE) AS abs_err
    FROM daily d JOIN daily f ON f.day = d.day - 7
    """,
)
def forecast_seasonal_naive_backtest_q(spark, sf_dir):
    """Seasonal-naive forecast backtest (the baseline every forecast
    model must beat; M-competition protocol): daily revenue in EXACT
    decimals, forecast(d) = actual(d−7) realized as a keyed SELF-JOIN
    on the day bucket (never lag-7-rows — row offsets lie when days
    gap), absolute errors still decimal-exact.  Day-grain frames are
    O(days) — the join, whatever the table size, runs on chart-sized
    inputs after one map-side-combinable aggregation."""
    daily = (
        _t(spark, sf_dir, "events")
        .filter(F.col("event_type") == "purchase")
        .groupBy(
            F.expr(
                "CAST(unix_micros(CAST(ts AS TIMESTAMP)) DIV 86400000000"
                " AS BIGINT)"
            ).alias("day")
        )
        .agg(F.sum(F.col("value").cast("decimal(18,6)")).alias("rev"))
    )
    d = daily.alias("d")
    f = daily.alias("f")
    return d.join(
        f, F.col("f.day") == F.col("d.day") - 7
    ).select(
        F.col("d.day").alias("day"),
        F.col("d.rev").cast("double").alias("rev"),
        F.col("f.rev").cast("double").alias("forecast"),
        F.abs(F.col("d.rev") - F.col("f.rev")).cast("double")
        .alias("abs_err"),
    )


@register(
    "stats_ab_test_ztest",
    oracle="""
    WITH u AS (
      SELECT user_id, CAST(user_id % 2 AS INT) AS variant,
             max(CASE WHEN event_type = 'purchase' AND value > 95 THEN 1 ELSE 0 END)
               AS converted
      FROM events GROUP BY user_id
    ), v AS (
      SELECT variant, CAST(count(*) AS BIGINT) AS n,
             CAST(sum(converted) AS BIGINT) AS k
      FROM u GROUP BY variant
    ), w AS (
      SELECT
        max(CASE WHEN variant = 0 THEN n END) AS n0,
        max(CASE WHEN variant = 0 THEN k END) AS k0,
        max(CASE WHEN variant = 1 THEN n END) AS n1,
        max(CASE WHEN variant = 1 THEN k END) AS k1
      FROM v
    )
    SELECT n0, k0, n1, k1,
           round((CAST(k0 AS DOUBLE) / n0 - CAST(k1 AS DOUBLE) / n1)
                 / sqrt((CAST(k0 + k1 AS DOUBLE) / (n0 + n1))
                        * (1 - CAST(k0 + k1 AS DOUBLE) / (n0 + n1))
                        * (CAST(1 AS DOUBLE) / n0 + CAST(1 AS DOUBLE) / n1)),
                 6) AS z,
           abs((CAST(k0 AS DOUBLE) / n0 - CAST(k1 AS DOUBLE) / n1)
               / sqrt((CAST(k0 + k1 AS DOUBLE) / (n0 + n1))
                      * (1 - CAST(k0 + k1 AS DOUBLE) / (n0 + n1))
                      * (CAST(1 AS DOUBLE) / n0 + CAST(1 AS DOUBLE) / n1)))
             > 1.959964 AS significant
    FROM w
    """,
)
def stats_ab_test_ztest_q(spark, sf_dir):
    """Two-proportion z-test (the experimentation readout): variants by
    user-id parity, per-user conversion (any high-value purchase), pooled-variance
    z statistic and the α=0.05 two-sided significance call.  Counts are
    exact integers; the z formula is ONE shared float expression in
    both engines (identical IEEE op sequence), rounded 6 dp.  Two
    map-side-combinable aggregations → a 1-row report; at any scale the
    data-plane work is the user-grain conversion rollup."""
    u = (
        _t(spark, sf_dir, "events")
        .groupBy("user_id")
        .agg(
            F.max(
                F.when((F.col("event_type") == "purchase") & (F.col("value") > 95), 1).otherwise(0)
            ).alias("converted")
        )
        .withColumn("variant", (F.col("user_id") % 2).cast("int"))
    )
    v = u.groupBy("variant").agg(
        F.count(F.lit(1)).alias("n"), F.sum("converted").alias("k")
    )
    w = v.agg(
        F.max(F.when(F.col("variant") == 0, F.col("n"))).alias("n0"),
        F.max(F.when(F.col("variant") == 0, F.col("k"))).alias("k0"),
        F.max(F.when(F.col("variant") == 1, F.col("n"))).alias("n1"),
        F.max(F.when(F.col("variant") == 1, F.col("k"))).alias("k1"),
    )
    p0 = F.col("k0").cast("double") / F.col("n0")
    p1 = F.col("k1").cast("double") / F.col("n1")
    pool = (F.col("k0") + F.col("k1")).cast("double") / (
        F.col("n0") + F.col("n1")
    )
    se = F.sqrt(
        pool * (1 - pool)
        * (F.lit(1.0) / F.col("n0") + F.lit(1.0) / F.col("n1"))
    )
    z = (p0 - p1) / se
    return w.select(
        "n0", "k0", "n1", "k1",
        F.round(z, 6).alias("z"),
        (F.abs(z) > 1.959964).alias("significant"),
    )
