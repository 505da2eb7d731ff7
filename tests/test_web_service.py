"""Synchronous HandleHttpRequest→HandleHttpResponse cycle semantics.

Pins the NiFi contract carried by streaming/web_service.py: request
attributes land as columns, the pipeline's answer returns on the held
connection, http_status_code drives the response status, a pipeline
failure answers 500 (failure relationship), and the context map expires
overrunning requests with 503.
"""

import json
import time
import urllib.error
import urllib.request

import pytest
from pyspark.sql import functions as F

from apache_nifi_spark.streaming.web_service import (
    HttpContextMap,
    HttpRequestResponseService,
)

SCHEMA = "id bigint, kind string, value double"


def _post(url, lines, timeout=60):
    data = ("\n".join(json.dumps(x) for x in lines) + "\n").encode()
    req = urllib.request.Request(url, data=data, method="POST")
    with urllib.request.urlopen(req, timeout=timeout) as resp:
        return resp.status, [json.loads(ln) for ln in resp.read().decode().splitlines() if ln]


def test_round_trip_aggregation(spark):
    def pipeline(df):
        return df.groupBy("kind").agg(
            F.count("*").alias("n"), F.sum("value").alias("total")
        )

    with HttpRequestResponseService(spark, pipeline, SCHEMA) as svc:
        status, rows = _post(
            svc.url,
            [
                {"id": 1, "kind": "a", "value": 1.5},
                {"id": 2, "kind": "a", "value": 2.5},
                {"id": 3, "kind": "b", "value": 10.0},
            ],
        )
    assert status == 200
    by_kind = {r["kind"]: r for r in rows}
    assert by_kind["a"]["n"] == 2 and by_kind["a"]["total"] == 4.0
    assert by_kind["b"]["n"] == 1 and by_kind["b"]["total"] == 10.0


def test_request_attributes_present_as_columns(spark):
    def pipeline(df):
        return df.select("id", "http_method", "http_request_uri", "http_context_identifier")

    with HttpRequestResponseService(spark, pipeline, SCHEMA) as svc:
        status, rows = _post(svc.url + "ingest/events", [{"id": 7, "kind": "x", "value": 0.0}])
    assert status == 200
    (row,) = rows
    assert row["http_method"] == "POST"
    assert row["http_request_uri"] == "/ingest/events"
    assert len(row["http_context_identifier"]) == 32  # uuid hex


def test_status_code_attribute_controls_response(spark):
    def pipeline(df):
        return df.select("id").withColumn("http_status_code", F.lit(201))

    with HttpRequestResponseService(spark, pipeline, SCHEMA) as svc:
        status, rows = _post(svc.url, [{"id": 1, "kind": "a", "value": 0.0}])
    assert status == 201
    assert rows == [{"id": 1}]  # attribute stripped from payload


def test_pipeline_failure_answers_500(spark):
    def pipeline(df):
        raise RuntimeError("boom in flow")

    with HttpRequestResponseService(spark, pipeline, SCHEMA) as svc:
        with pytest.raises(urllib.error.HTTPError) as exc:
            _post(svc.url, [{"id": 1, "kind": "a", "value": 0.0}])
    assert exc.value.code == 500
    body = json.loads(exc.value.read().decode().strip())
    assert body["error"] == "RuntimeError"


def test_context_map_expiration_answers_503(spark):
    def pipeline(df):
        time.sleep(3.0)  # overrun the 0.5 s expiration
        return df.select("id")

    with HttpRequestResponseService(
        spark, pipeline, SCHEMA, request_expiration_sec=0.5
    ) as svc:
        with pytest.raises(urllib.error.HTTPError) as exc:
            _post(svc.url, [{"id": 1, "kind": "a", "value": 0.0}])
    assert exc.value.code == 503


def test_context_map_register_complete_expire():
    m = HttpContextMap(request_expiration_sec=0.05)
    m.register("a")
    assert len(m) == 1 and not m.expired("a")
    time.sleep(0.08)
    assert m.expired("a")
    assert m.complete("a") is True  # first completion wins
    assert m.complete("a") is False  # already gone
    assert len(m) == 0


def test_concurrent_requests_isolated_contexts(spark):
    import concurrent.futures

    def pipeline(df):
        return df.groupBy().agg(
            F.sum("id").alias("sum_id"),
            F.first("http_context_identifier").alias("ctx"),
        )

    with HttpRequestResponseService(spark, pipeline, SCHEMA, max_concurrent=4) as svc:
        with concurrent.futures.ThreadPoolExecutor(4) as pool:
            futs = [
                pool.submit(_post, svc.url, [{"id": i, "kind": "k", "value": 0.0}])
                for i in range(1, 5)
            ]
            results = [f.result() for f in futs]
    sums = sorted(r[1][0]["sum_id"] for r in results)
    ctxs = {r[1][0]["ctx"] for r in results}
    assert sums == [1, 2, 3, 4]
    assert len(ctxs) == 4  # one context id per held connection
