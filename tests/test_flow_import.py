"""flow.json import tests: golden fixture, graph validation, plan quality."""

from __future__ import annotations

import json
import os

import pytest
from pyspark.sql import functions as F

from apache_nifi_spark.plans.flow_import import (
    FlowImportError,
    run_flow,
    run_flow_json,
)

GOLDEN = os.path.join(os.path.dirname(__file__), "fixtures", "golden_flow.json")


@pytest.fixture(scope="module")
def golden_outputs(spark, sf_dir):
    with open(GOLDEN) as f:
        return run_flow_json(spark, sf_dir, f.read()), f


def test_golden_flow_outputs(golden_outputs):
    outs, _ = golden_outputs
    assert set(outs) == {
        "DailyAgg.daily",
        "EnrichBig.matched",
        "EnrichBig.unmatched",
        "RouteClicks.unmatched",
    }


def test_golden_flow_matches_handbuilt(spark, sf_dir, golden_outputs):
    from apache_nifi_spark import io

    outs, _ = golden_outputs
    ev = io.load_table(spark, sf_dir, "events")
    hand = (
        ev.filter(F.col("event_type") == "click")
        .groupBy(F.date_format("ts", "yyyy-MM-dd").alias("day"))
        .agg(
            F.count("*").alias("n_clicks"),
            F.sum((F.col("value") * 2).cast("decimal(18,6)"))
            .cast("double")
            .alias("sum_value2"),
        )
    )
    got = {r.day: (r.n_clicks, r.sum_value2) for r in outs["DailyAgg.daily"].collect()}
    want = {r.day: (r.n_clicks, r.sum_value2) for r in hand.collect()}
    assert got == want


def test_route_filter_pushes_into_scan(golden_outputs):
    """The imported flow compiles to ONE Catalyst plan — the route's EL
    predicate must reach the parquet scan as a pushed filter, which NiFi's
    per-processor execution model cannot do."""
    outs, _ = golden_outputs
    plan = outs["EnrichBig.matched"]._jdf.queryExecution().executedPlan().toString()
    assert "PushedFilters" in plan
    assert "user_id" in plan.split("PushedFilters")[1][:300] or "value" in plan.split(
        "PushedFilters"
    )[1][:300]


def test_lookup_is_broadcast(golden_outputs):
    outs, _ = golden_outputs
    plan = outs["EnrichBig.matched"]._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan


def test_funnel_union_semantics(spark, sf_dir):
    flow = {
        "flowContents": {
            "processors": [
                {"identifier": "a", "name": "A",
                 "type": "x.GetFile", "properties": {"Input Directory": "events"}},
                {"identifier": "b", "name": "B",
                 "type": "x.GetFile", "properties": {"Input Directory": "events"}},
                {"identifier": "r", "name": "R",
                 "type": "x.RouteOnAttribute",
                 "properties": {"clicks": "${event_type:equals('click')}"}},
            ],
            "connections": [
                {"source": {"id": "a"}, "destination": {"id": "r"},
                 "selectedRelationships": ["success"]},
                {"source": {"id": "b"}, "destination": {"id": "r"},
                 "selectedRelationships": ["success"]},
            ],
        }
    }
    outs = run_flow(spark, sf_dir, flow)
    from apache_nifi_spark import io

    n_clicks = (
        io.load_table(spark, sf_dir, "events")
        .filter(F.col("event_type") == "click")
        .count()
    )
    assert outs["R.clicks"].count() == 2 * n_clicks  # UNION ALL, not distinct


def test_cycle_detection(spark, sf_dir):
    flow = {
        "flowContents": {
            "processors": [
                {"identifier": "a", "name": "A", "type": "x.UpdateAttribute",
                 "properties": {"z": "${event_type}"}},
                {"identifier": "b", "name": "B", "type": "x.UpdateAttribute",
                 "properties": {"z": "${event_type}"}},
            ],
            "connections": [
                {"source": {"id": "a"}, "destination": {"id": "b"}},
                {"source": {"id": "b"}, "destination": {"id": "a"}},
            ],
        }
    }
    with pytest.raises(FlowImportError, match="cycle"):
        run_flow(spark, sf_dir, flow)


def test_unsupported_processor_raises(spark, sf_dir):
    flow = {
        "flowContents": {
            "processors": [
                {"identifier": "a", "name": "A", "type": "x.GetFile",
                 "properties": {"Input Directory": "events"}},
                {"identifier": "z", "name": "Z", "type": "x.ConsumeJMS",
                 "properties": {}},
            ],
            "connections": [
                {"source": {"id": "a"}, "destination": {"id": "z"},
                 "selectedRelationships": ["success"]},
            ],
        }
    }
    with pytest.raises(FlowImportError, match="unsupported processor"):
        run_flow(spark, sf_dir, flow)


def test_bad_source_table_raises(spark, sf_dir):
    flow = {
        "flowContents": {
            "processors": [
                {"identifier": "a", "name": "A", "type": "x.GetFile",
                 "properties": {"Input Directory": "/etc/passwd"}},
            ],
            "connections": [],
        }
    }
    with pytest.raises(FlowImportError, match="fixture table"):
        run_flow(spark, sf_dir, flow)
