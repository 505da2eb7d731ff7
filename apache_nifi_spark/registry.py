"""Query registry: the oracle-checked capability surface.

Each entry pairs a Spark implementation (built from the operator layer)
with an ANSI-SQL oracle that DuckDB runs on the same parquet fixtures —
SURVEY.md §5.2's differential gate.  ``__spark_entry__.py`` re-exports
``QUERIES`` / ``ORACLES`` to the driver.

Determinism rules (so order-insensitive value hashes match bit-for-bit):
- Float aggregates go through exact decimal accumulation on BOTH engines:
  ``SUM(CAST(x AS DECIMAL(30,6)))`` then cast back to double.  Decimal sums
  are exact, the final double cast is the same IEEE value on both sides,
  and double→decimal casts only diverge at exact midpoints, which cannot
  occur for fractional scales (non-dyadic rationals).
- Averages are computed as exact-sum / count (double division of identical
  operands), never the engines' own AVG over doubles.
- Every LIMIT carries a total order (tie-broken by a key column).
- collect_list-style aggregation is always sorted (defragment) and
  serialized to a string, never exposed as a raw array.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import Column, DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from apache_nifi_spark import io
from apache_nifi_spark.operators import (
    asof_join,
    calculate_record_stats,
    deduplicate_record,
    defragment,
    join_enrichment_sql,
    lookup_record,
    query_record,
    range_join,
    route_on_attribute,
    sample_interval,
    top_k_per_group,
    validate_record,
)

QueryFn = Callable[[SparkSession, str], DataFrame]

QUERIES: dict[str, QueryFn] = {}
ORACLES: dict[str, str] = {}


def register(name: str, oracle: str | None = None):
    def deco(fn: QueryFn) -> QueryFn:
        QUERIES[name] = fn
        if oracle is not None:
            ORACLES[name] = oracle
        return fn

    return deco


def _dsum(c: Column, alias: str, scale: int = 6) -> Column:
    """Exact decimal-accumulated sum, returned as double (see module doc)."""
    return F.sum(c.cast(f"decimal(30,{scale})")).cast("double").alias(alias)


def _davg(c: Column, alias: str, scale: int = 6) -> Column:
    return (
        F.sum(c.cast(f"decimal(30,{scale})")).cast("double") / F.count(c)
    ).alias(alias)


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return io.load_table(spark, sf_dir, name)


# =====================================================================
# Flagship (SURVEY.md §7 step 1): scan → filter → join⁺ → agg → sort/limit
# =====================================================================

@register(
    "flagship_revenue",
    oracle="""
    SELECT n.n_name,
           CAST(year(o.o_orderdate) AS INT)  AS order_year,
           CAST(month(o.o_orderdate) AS INT) AS order_month,
           CAST(SUM(CAST(l.l_extendedprice * (1 - l.l_discount) AS DECIMAL(30,6))) AS DOUBLE) AS revenue,
           COUNT(*) AS n_items
    FROM lineitem l
    JOIN orders o   ON l.l_orderkey = o.o_orderkey
    JOIN customer c ON o.o_custkey  = c.c_custkey
    JOIN nation n   ON c.c_nationkey = n.n_nationkey
    WHERE l.l_shipdate >= TIMESTAMP '1998-01-01' AND l.l_shipdate < TIMESTAMP '2000-01-01'
    GROUP BY 1, 2, 3
    ORDER BY revenue DESC, n_name, order_year, order_month
    LIMIT 20
    """,
)
def flagship_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Route (filter) → LookupRecord/JoinEnrichment (joins) → QueryRecord
    GROUP BY (agg) → prioritizer+rate-limit (sort/limit), one NiFi-shaped
    flow.  Physical plan: pushed-down parquet filter, shuffle joins for the
    two fact-fact edges, broadcast for nation, partial+final hash agg,
    TakeOrderedAndProject for the limit.
    """
    li = _t(spark, sf_dir, "lineitem")
    o = _t(spark, sf_dir, "orders")
    c = _t(spark, sf_dir, "customer")
    n = _t(spark, sf_dir, "nation")
    return (
        li.filter(
            (F.col("l_shipdate") >= F.lit("1998-01-01").cast("timestamp_ntz"))
            & (F.col("l_shipdate") < F.lit("2000-01-01").cast("timestamp_ntz"))
        )
        .join(o, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(c, F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(n), F.col("c_nationkey") == F.col("n_nationkey"))
        .groupBy(
            "n_name",
            F.year("o_orderdate").alias("order_year"),
            F.month("o_orderdate").alias("order_month"),
        )
        .agg(
            _dsum(F.col("l_extendedprice") * (1 - F.col("l_discount")), "revenue"),
            F.count(F.lit(1)).alias("n_items"),
        )
        .orderBy(F.desc("revenue"), "n_name", "order_year", "order_month")
        .limit(20)
    )


# =====================================================================
# QueryRecord GROUP BY surface (§2.5): TPC-H Q1 shape
# =====================================================================

@register(
    "q1_pricing_summary",
    oracle="""
    SELECT l_returnflag, l_linestatus,
           CAST(SUM(CAST(l_quantity AS DECIMAL(30,6))) AS DOUBLE)      AS sum_qty,
           CAST(SUM(CAST(l_extendedprice AS DECIMAL(30,6))) AS DOUBLE) AS sum_base_price,
           CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(30,6))) AS DOUBLE) AS sum_disc_price,
           CAST(SUM(CAST(l_extendedprice * (1 - l_discount) * (1 + l_tax) AS DECIMAL(30,6))) AS DOUBLE) AS sum_charge,
           CAST(SUM(CAST(l_quantity AS DECIMAL(30,6))) AS DOUBLE) / COUNT(l_quantity)      AS avg_qty,
           CAST(SUM(CAST(l_extendedprice AS DECIMAL(30,6))) AS DOUBLE) / COUNT(l_extendedprice) AS avg_price,
           CAST(SUM(CAST(l_discount AS DECIMAL(30,6))) AS DOUBLE) / COUNT(l_discount)      AS avg_disc,
           COUNT(*) AS count_order
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '2001-09-01'
    GROUP BY l_returnflag, l_linestatus
    """,
)
def q1_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """QueryRecord with GROUP BY (NiFi runs this per-FlowFile in Calcite;
    here it is one distributed hash aggregate with map-side partials)."""
    li = _t(spark, sf_dir, "lineitem")
    return (
        li.filter(F.col("l_shipdate") <= F.lit("2001-09-01").cast("timestamp_ntz"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            _dsum(F.col("l_quantity"), "sum_qty"),
            _dsum(F.col("l_extendedprice"), "sum_base_price"),
            _dsum(F.col("l_extendedprice") * (1 - F.col("l_discount")), "sum_disc_price"),
            _dsum(
                F.col("l_extendedprice") * (1 - F.col("l_discount")) * (1 + F.col("l_tax")),
                "sum_charge",
            ),
            _davg(F.col("l_quantity"), "avg_qty"),
            _davg(F.col("l_extendedprice"), "avg_price"),
            _davg(F.col("l_discount"), "avg_disc"),
            F.count(F.lit(1)).alias("count_order"),
        )
    )


# =====================================================================
# Routing (§2.3)
# =====================================================================

@register(
    "route_first_matching",
    oracle="""
    SELECT event_id, user_id, event_type, value
    FROM events
    WHERE event_type = 'purchase' AND NOT (value > 150)
    """,
)
def route_first_matching_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RouteOnAttribute, Route-to-Property-Name (first-match-wins): a
    purchase with value>150 goes to the high_value route, so the purchase
    route sees only the remainder."""
    ev = _t(spark, sf_dir, "events")
    routes = route_on_attribute(
        ev,
        {
            "high_value": F.col("value") > 150,
            "purchase": F.col("event_type") == "purchase",
        },
        strategy="route_first_matching",
    )
    return routes["purchase"].select("event_id", "user_id", "event_type", "value")


@register(
    "route_unmatched",
    oracle="""
    SELECT event_id, event_type, value
    FROM events
    WHERE NOT (value > 150) AND NOT (event_type = 'purchase')
    """,
)
def route_unmatched_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RouteOnAttribute's ``unmatched`` relationship."""
    ev = _t(spark, sf_dir, "events")
    routes = route_on_attribute(
        ev,
        {
            "high_value": F.col("value") > 150,
            "purchase": F.col("event_type") == "purchase",
        },
    )
    return routes["unmatched"].select("event_id", "event_type", "value")


@register(
    "query_record_sql",
    oracle="""
    SELECT event_type,
           COUNT(*) AS n_events,
           COUNT(DISTINCT user_id) AS n_users,
           CAST(SUM(CAST(value AS DECIMAL(30,6))) AS DOUBLE) AS total_value
    FROM events
    GROUP BY event_type
    """,
)
def query_record_sql_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """QueryRecord: user SQL against the FLOWFILE view."""
    ev = _t(spark, sf_dir, "events")
    out = query_record(
        spark,
        ev,
        {
            "per_type": """
                SELECT event_type,
                       COUNT(*) AS n_events,
                       COUNT(DISTINCT user_id) AS n_users,
                       CAST(SUM(CAST(value AS DECIMAL(30,6))) AS DOUBLE) AS total_value
                FROM FLOWFILE
                GROUP BY event_type
            """
        },
    )
    return out["per_type"]


@register(
    "route_text_regex",
    oracle="""
    SELECT doc_id, lang, n_chars
    FROM documents
    WHERE regexp_matches(text, 'join.*filter|filter.*join')
    """,
)
def route_text_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RouteText/RouteOnContent: regex content routing."""
    from apache_nifi_spark.operators import route_text

    docs = _t(spark, sf_dir, "documents")
    return route_text(docs, "text", "join.*filter|filter.*join")["matched"].select(
        "doc_id", "lang", "n_chars"
    )


@register(
    "scan_attribute_dict",
    oracle="""
    SELECT event_id, event_type, user_id
    FROM events
    WHERE event_type IN ('error', 'signup')
    """,
)
def scan_attribute_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ScanAttribute: dictionary membership."""
    from apache_nifi_spark.operators import scan_attribute

    ev = _t(spark, sf_dir, "events")
    return scan_attribute(ev, "event_type", ["error", "signup"]).select(
        "event_id", "event_type", "user_id"
    )


@register(
    "validate_record_split",
    oracle="""
    SELECT l_orderkey, l_linenumber,
           concat_ws(',',
             CASE WHEN NOT (l_quantity <= 45)  THEN 'qty_le_45' END,
             CASE WHEN NOT (l_discount <= 0.08) THEN 'disc_le_8pct' END
           ) AS violation_list
    FROM lineitem
    WHERE NOT (l_quantity <= 45) OR NOT (l_discount <= 0.08)
    """,
)
def validate_record_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ValidateRecord: the ``invalid`` relationship with violation names."""
    li = _t(spark, sf_dir, "lineitem")
    out = validate_record(
        li,
        {
            "qty_le_45": F.col("l_quantity") <= 45,
            "disc_le_8pct": F.col("l_discount") <= 0.08,
        },
    )
    return out["invalid"].select(
        "l_orderkey",
        "l_linenumber",
        F.array_join("violations", ",").alias("violation_list"),
    )


# =====================================================================
# Joins & enrichment (§2.6)
# =====================================================================

@register(
    "lookup_customer_nation",
    oracle="""
    SELECT c.c_custkey, c.c_name, n.n_name, r.r_name
    FROM customer c
    JOIN nation n ON c.c_nationkey = n.n_nationkey
    JOIN region r ON n.n_regionkey = r.r_regionkey
    """,
)
def lookup_customer_nation_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LookupRecord chain: two bounded lookup services → two broadcast hash
    joins; the customer side never shuffles."""
    c = _t(spark, sf_dir, "customer")
    n = _t(spark, sf_dir, "nation")
    r = _t(spark, sf_dir, "region")
    enriched = lookup_record(c, n, on=c.c_nationkey == n.n_nationkey, how="inner")
    enriched = lookup_record(
        enriched, r, on=F.col("n_regionkey") == F.col("r_regionkey"), how="inner"
    )
    return enriched.select("c_custkey", "c_name", "n_name", "r_name")


@register(
    "lookup_unmatched",
    oracle="""
    SELECT c_custkey, c_name, c_acctbal
    FROM customer c
    WHERE NOT EXISTS (SELECT 1 FROM orders o
                      WHERE o.o_custkey = c.c_custkey AND o.o_orderstatus = 'P')
    """,
)
def lookup_unmatched_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LookupRecord ``unmatched`` relationship → broadcast left-anti join:
    customers with no pending ('P') order."""
    from apache_nifi_spark.operators import lookup_split

    c = _t(spark, sf_dir, "customer")
    o = (
        _t(spark, sf_dir, "orders")
        .filter(F.col("o_orderstatus") == "P")
        .select(F.col("o_custkey").alias("c_custkey"))
    )
    return lookup_split(c, o, on="c_custkey")["unmatched"].select(
        "c_custkey", "c_name", "c_acctbal"
    )


@register(
    "join_enrichment_sql",
    oracle="""
    SELECT o.o_orderkey, o.o_totalprice, c.c_name, c.c_mktsegment
    FROM orders o
    LEFT OUTER JOIN customer c ON o.o_custkey = c.c_custkey
    WHERE o.o_orderstatus = 'F'
    """,
)
def join_enrichment_sql_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ForkEnrichment→JoinEnrichment, SQL strategy: user SQL over views
    ``original`` and ``enrichment`` (exactly NiFi's table names)."""
    o = _t(spark, sf_dir, "orders").filter(F.col("o_orderstatus") == "F")
    c = _t(spark, sf_dir, "customer")
    return join_enrichment_sql(
        spark,
        o,
        c,
        """
        SELECT o.o_orderkey, o.o_totalprice, c.c_name, c.c_mktsegment
        FROM original o
        LEFT OUTER JOIN enrichment c ON o.o_custkey = c.c_custkey
        """,
    )


@register(
    "range_join_price_bands",
    oracle="""
    WITH bands(band, lo, hi) AS (
        VALUES ('budget', 900.0, 935.0), ('mid', 935.0, 970.0), ('premium', 970.0, 1000.0)
    )
    SELECT b.band,
           COUNT(*) AS n_parts,
           CAST(SUM(CAST(p.p_retailprice AS DECIMAL(30,6))) AS DOUBLE) AS total_price
    FROM part p
    JOIN bands b ON p.p_retailprice >= b.lo AND p.p_retailprice < b.hi
    GROUP BY b.band
    """,
)
def range_join_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """GeoEnrichIP-style range join: point-in-interval against a bounded
    range table → broadcast nested-loop join (the right plan when one side
    is tiny; two big sides would bucketize first)."""
    p = _t(spark, sf_dir, "part")
    bands = spark.createDataFrame(
        [("budget", 900.0, 935.0), ("mid", 935.0, 970.0), ("premium", 970.0, 1000.0)],
        "band string, lo double, hi double",
    )
    joined = range_join(p, bands, F.col("p_retailprice"), F.col("lo"), F.col("hi"))
    return joined.groupBy("band").agg(
        F.count(F.lit(1)).alias("n_parts"),
        _dsum(F.col("p_retailprice"), "total_price"),
    )


@register(
    "asof_signup_before_purchase",
    oracle="""
    SELECT p.event_id, p.user_id, p.value AS purchase_value, s.value AS signup_value
    FROM (SELECT * FROM events WHERE event_type = 'purchase') p
    ASOF LEFT JOIN (SELECT * FROM events WHERE event_type = 'signup') s
      ON p.user_id = s.user_id AND p.ts >= s.ts
    """,
)
def asof_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """As-of join (beyond-reference): latest signup at-or-before each
    purchase, per user.  Union + partitioned window — one shuffle on the
    key, no range cross-product; survives 100× scale-up."""
    ev = _t(spark, sf_dir, "events")
    purchases = ev.filter(F.col("event_type") == "purchase")
    signups = ev.filter(F.col("event_type") == "signup").select(
        "user_id", F.col("ts"), F.col("value").alias("signup_value")
    )
    out = asof_join(
        purchases,
        signups,
        on="user_id",
        left_ts="ts",
        right_ts="ts",
        right_cols=["signup_value"],
    )
    return out.select(
        "event_id", "user_id", F.col("value").alias("purchase_value"), "signup_value"
    )


# =====================================================================
# Merge / split / stats / dedup (§2.5)
# =====================================================================

@register(
    "defragment_user_timeline",
    oracle="""
    SELECT user_id,
           string_agg(event_type, ',' ORDER BY ts, event_id) AS timeline,
           COUNT(*) AS fragment_count
    FROM events
    GROUP BY user_id
    """,
)
def defragment_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MergeContent Defragment: reassemble per-key fragments in order.
    sort_array(collect_list(struct(...))) — deterministic, single shuffle."""
    ev = _t(spark, sf_dir, "events").withColumn(
        "idx", F.struct(F.col("ts"), F.col("event_id"))
    )
    out = defragment(ev, "user_id", "idx", F.col("event_type"))
    return out.select(
        "user_id",
        F.array_join("fragments", ",").alias("timeline"),
        "fragment_count",
    )


@register(
    "record_stats_events",
    oracle="""
    SELECT '<total>' AS category, '<total>' AS value, COUNT(*) AS record_count FROM events
    UNION ALL
    SELECT 'event_type' AS category, event_type AS value, COUNT(*) AS record_count
    FROM events GROUP BY event_type
    """,
)
def record_stats_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CalculateRecordStats: overall + per-category counts in one union."""
    return calculate_record_stats(_t(spark, sf_dir, "events"), ["event_type"])


@register(
    "dedup_first_order_per_customer",
    oracle="""
    SELECT o_custkey, o_orderkey, o_totalprice
    FROM orders
    QUALIFY row_number() OVER (PARTITION BY o_custkey ORDER BY o_orderkey) = 1
    """,
)
def dedup_orders_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DeduplicateRecord with a deterministic winner (lowest orderkey)."""
    o = _t(spark, sf_dir, "orders")
    return deduplicate_record(o, ["o_custkey"], keep_order_col="o_orderkey").select(
        "o_custkey", "o_orderkey", "o_totalprice"
    )


@register(
    "split_record_explode",
    oracle="""
    SELECT doc_id, lang, unnest(string_split(text, ' ')) AS token
    FROM documents
    WHERE doc_id < 10
    """,
)
def split_record_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SplitRecord/SplitText: one row per element (token-per-row here)."""
    docs = _t(spark, sf_dir, "documents").filter(F.col("doc_id") < 10)
    return docs.select(
        "doc_id", "lang", F.explode(F.split("text", " ", -1)).alias("token")
    )


# =====================================================================
# Windows (§2.7)
# =====================================================================

@register(
    "top3_orders_per_segment",
    oracle="""
    SELECT c.c_mktsegment, o.o_orderkey, o.o_totalprice,
           CAST(row_number() OVER (PARTITION BY c.c_mktsegment
                                   ORDER BY o.o_totalprice DESC, o.o_orderkey) AS INT) AS rn
    FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
    QUALIFY rn <= 3
    """,
)
def top3_per_segment_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-K per group (PriorityAttributePrioritizer idiom)."""
    o = _t(spark, sf_dir, "orders")
    c = _t(spark, sf_dir, "customer")
    joined = o.join(F.broadcast(c), o.o_custkey == c.c_custkey)
    return top_k_per_group(
        joined.select("c_mktsegment", "o_orderkey", "o_totalprice"),
        ["c_mktsegment"],
        [F.desc("o_totalprice"), F.asc("o_orderkey")],
        3,
    )


@register(
    "rolling_user_value",
    oracle="""
    SELECT event_id, user_id,
           CAST(SUM(CAST(value AS DECIMAL(18,2))) OVER w AS DOUBLE) AS rolling_sum,
           CAST(COUNT(value) OVER w AS BIGINT) AS rolling_count
    FROM events
    WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
                 ROWS BETWEEN 2 PRECEDING AND CURRENT ROW)
    """,
)
def rolling_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """AttributeRollingWindow: last-3-rows rolling stats per key (decimal
    accumulation for cross-engine exactness)."""
    ev = _t(spark, sf_dir, "events")
    w = (
        Window.partitionBy("user_id")
        .orderBy(F.col("ts").asc(), F.col("event_id").asc())
        .rowsBetween(-2, Window.currentRow)
    )
    return ev.select(
        "event_id",
        "user_id",
        F.sum(F.col("value").cast("decimal(18,2)")).over(w).cast("double").alias("rolling_sum"),
        F.count("value").over(w).alias("rolling_count"),
    )


@register(
    "enforce_order_seq",
    oracle="""
    SELECT event_id, user_id,
           CAST(row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS INT) AS seq
    FROM events
    """,
)
def enforce_order_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EnforceOrder: dense per-group sequence by event time."""
    ev = _t(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy(F.col("ts").asc(), F.col("event_id").asc())
    return ev.select("event_id", "user_id", F.row_number().over(w).alias("seq"))


@register(
    "lag_lead_value",
    oracle="""
    SELECT event_id, user_id, value,
           lag(value)  OVER w AS prev_value,
           lead(value) OVER w AS next_value
    FROM events
    WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    """,
)
def lag_lead_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Analytic lag/lead (superset of NiFi's ordering idioms)."""
    ev = _t(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy(F.col("ts").asc(), F.col("event_id").asc())
    return ev.select(
        "event_id",
        "user_id",
        "value",
        F.lag("value").over(w).alias("prev_value"),
        F.lead("value").over(w).alias("next_value"),
    )


# =====================================================================
# Set ops / sorts / limits (§2.8)
# =====================================================================

@register(
    "setop_intersect_custkeys",
    oracle="""
    SELECT o_custkey FROM orders WHERE o_orderstatus = 'F'
    INTERSECT
    SELECT o_custkey FROM orders WHERE o_orderstatus = 'O'
    """,
)
def setop_intersect_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    from apache_nifi_spark.operators import intersect_records

    o = _t(spark, sf_dir, "orders")
    f = o.filter(F.col("o_orderstatus") == "F").select("o_custkey")
    op = o.filter(F.col("o_orderstatus") == "O").select("o_custkey")
    return intersect_records(f, op)


@register(
    "setop_except_custkeys",
    oracle="""
    SELECT o_custkey FROM orders WHERE o_orderstatus = 'P'
    EXCEPT
    SELECT o_custkey FROM orders WHERE o_orderstatus = 'F'
    """,
)
def setop_except_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    from apache_nifi_spark.operators import except_records

    o = _t(spark, sf_dir, "orders")
    p = o.filter(F.col("o_orderstatus") == "P").select("o_custkey")
    f = o.filter(F.col("o_orderstatus") == "F").select("o_custkey")
    return except_records(p, f)


@register(
    "funnel_union_all",
    oracle="""
    SELECT event_id, event_type FROM events WHERE event_type = 'error'
    UNION ALL
    SELECT event_id, event_type FROM events WHERE event_type = 'signup'
    """,
)
def funnel_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Funnel: N edges → 1 (UNION ALL)."""
    from apache_nifi_spark.operators import funnel

    ev = _t(spark, sf_dir, "events")
    a = ev.filter(F.col("event_type") == "error").select("event_id", "event_type")
    b = ev.filter(F.col("event_type") == "signup").select("event_id", "event_type")
    return funnel(a, b)


@register(
    "topk_orders_global",
    oracle="""
    SELECT o_orderkey, o_custkey, o_totalprice
    FROM orders
    ORDER BY o_totalprice DESC, o_orderkey
    LIMIT 10
    """,
)
def topk_global_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Global top-K — Spark plans TakeOrderedAndProject (no full sort)."""
    o = _t(spark, sf_dir, "orders")
    return (
        o.select("o_orderkey", "o_custkey", "o_totalprice")
        .orderBy(F.desc("o_totalprice"), F.asc("o_orderkey"))
        .limit(10)
    )


@register(
    "sample_every_10th",
    oracle="""
    SELECT event_id, user_id, event_type FROM events WHERE event_id % 10 = 0
    """,
)
def sample_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SampleRecord, interval strategy (deterministic)."""
    ev = _t(spark, sf_dir, "events")
    return sample_interval(ev, F.col("event_id"), 10).select(
        "event_id", "user_id", "event_type"
    )


@register(
    "rollup_status_priority",
    oracle="""
    SELECT o_orderstatus, o_orderpriority,
           COUNT(*) AS n_orders,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(30,6))) AS DOUBLE) AS total
    FROM orders
    GROUP BY ROLLUP (o_orderstatus, o_orderpriority)
    """,
)
def rollup_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hierarchical totals — superset of QueryRecord's flat GROUP BY."""
    o = _t(spark, sf_dir, "orders")
    return o.rollup("o_orderstatus", "o_orderpriority").agg(
        F.count(F.lit(1)).alias("n_orders"),
        _dsum(F.col("o_totalprice"), "total"),
    )
