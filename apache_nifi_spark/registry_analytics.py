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
