"""Physical-plan shape tests (SURVEY.md §4): pin the properties the
100 TB design depends on — pushdown, broadcast choice, bounded shuffle
count, codegen coverage — so plan regressions fail here, not on a
cluster."""

from __future__ import annotations

from pyspark.sql import functions as F

from apache_nifi_spark import io
from apache_nifi_spark.plans import (
    ProvenanceTrail,
    count_codegen_spans,
    count_exchanges,
    formatted_explain,
    has_broadcast_join,
    pushed_filters,
)
from apache_nifi_spark.registry import QUERIES


def test_filter_pushdown_reaches_parquet_scan(spark, sf_dir):
    orders = io.load_table(spark, sf_dir, "orders")
    q = orders.filter(F.col("o_orderstatus") == "F").select("o_orderkey")
    pf = pushed_filters(q)
    assert any("o_orderstatus" in f for f in pf), pf
    # column pruning: the scan reads only the two referenced columns
    assert "o_totalprice" not in formatted_explain(q).split("PushedFilters")[0].split("ReadSchema")[-1]


def test_flagship_plan_shape(spark, sf_dir):
    df = QUERIES["flagship_revenue"](spark, sf_dir)
    # the dim join must be broadcast, the date filter pushed to the scan
    assert has_broadcast_join(df)
    assert any("l_shipdate" in f for f in pushed_filters(df))
    # scan ×4 + 2 shuffle joins + agg + sort/limit stays under a tight
    # exchange budget; a regression here = an extra full-data shuffle
    assert count_exchanges(df) <= 6, count_exchanges(df)
    df.collect()  # finalize the adaptive plan so codegen spans are visible
    assert count_codegen_spans(df) >= 2


def test_lookup_is_broadcast_not_shuffle(spark, sf_dir):
    df = QUERIES["lookup_customer_nation"](spark, sf_dir)
    assert has_broadcast_join(df)


def test_provenance_trail_counts(spark, sf_dir):
    ev = io.load_table(spark, sf_dir, "events")
    trail = ProvenanceTrail()
    src = trail.stage(ev, "CREATE")
    routed = trail.stage(src.filter(F.col("event_type") == "purchase"), "ROUTE")
    routed.count()
    events = dict((s, n) for _, s, n in trail.events())
    assert events["CREATE"] == ev.count()
    assert events["ROUTE"] == ev.filter(F.col("event_type") == "purchase").count()
    snap = trail.snapshot(spark)
    assert [r["stage"] for r in snap.orderBy("hop").collect()] == ["CREATE", "ROUTE"]
