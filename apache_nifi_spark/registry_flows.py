"""Flow-import query tier: the mega-flow fixtures (44 + 15 distinct
processor types through ``plans/flow_import.py``) and the cyclic
retry-flow import — the migration path for a real NiFi user's
flow.json, every terminal value-oracled.

Split out of ``registry.py`` (round-12 verdict item 8).  Same
``@register`` decorator and ``QUERIES``/``ORACLES`` dicts; imported by
``apache_nifi_spark.registry`` at the end of its body.
"""

from __future__ import annotations

import os

from pyspark.sql import Column, DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from apache_nifi_spark import io
from apache_nifi_spark.registry import (
    ORACLES,
    QUERIES,
    _davg,
    _dsum,
    _t,
    register,
)

# =====================================================================
# Mega flow import (round-6 item #1): tests/fixtures/mega_flow.json
# exercises 44 DISTINCT processor types (63 processors) through the
# widened plans/flow_import.py — every terminal output below is
# value-oracled against DuckDB recreating the full chain in SQL.
# Reference anchor: the reference deployment exists to run authored
# flows (nifi-registry/deployement.yaml:14-16); this is the migration
# path for a real NiFi user's flow.json.
# =====================================================================

_MEGA_FLOW_PATH = __file__.rsplit("/", 2)[0] + "/tests/fixtures/mega_flow.json"
_MEGA_CACHE: dict = {}


def _mega(spark, sf_dir, output):
    """Compile the mega flow once per (session, sf_dir) — compilation is
    driver-side plan building only (lazy DataFrames), so the cache just
    avoids re-running the importer's eager SQL analysis 13×.  Keyed on
    applicationId, not ``id(spark)`` — a GC'd session's id can be reused
    by a new session, which would serve stale plans."""
    key = (spark.sparkContext.applicationId, sf_dir)
    if key not in _MEGA_CACHE:
        from apache_nifi_spark.plans.flow_import import run_flow_json

        with open(_MEGA_FLOW_PATH) as f:
            _MEGA_CACHE[key] = run_flow_json(spark, sf_dir, f.read())
    return _MEGA_CACHE[key][output]


@register(
    "mega_flow_orders_pipeline",
    oracle="""
    WITH sampled AS (SELECT * FROM orders WHERE o_orderkey % 3 = 0),
    seqd AS (SELECT *, ROW_NUMBER() OVER (PARTITION BY o_orderstatus ORDER BY o_orderkey) AS seq FROM sampled),
    lim AS (SELECT * FROM seqd WHERE seq <= 50),
    ded AS (SELECT * FROM (SELECT *, ROW_NUMBER() OVER (PARTITION BY o_custkey ORDER BY o_orderkey) AS rn FROM lim) WHERE rn = 1)
    SELECT o_orderstatus AS status, CAST(COUNT(*) AS BIGINT) AS n,
           CAST(SUM(seq) AS BIGINT) AS sum_seq,
           CAST(SUM(o_orderkey * 2) AS BIGINT) AS sum_key2,
           MIN(md5(concat_ws(',', CAST(o_orderkey AS VARCHAR), o_orderstatus))) AS min_md5
    FROM ded GROUP BY o_orderstatus
    """,
)
def mega_flow_orders_q(spark, sf_dir):
    """Mega-flow S1: GetFile → SampleRecord(interval) → EnforceOrder →
    ControlRate → DeduplicateRecord → RenameRecordField →
    RemoveRecordField → UpdateRecord(EL) → AttributesToCSV →
    CryptographicHashContent(MD5) → QueryRecord — ten processor types
    composed into ONE Catalyst plan by the importer."""
    return _mega(spark, sf_dir, "OrdersAgg.byStatus")


@register(
    "mega_flow_docs_content",
    oracle=r"""
    WITH trimmed AS (
      SELECT doc_id, lang, substr(text, 6, greatest(length(text) - 10, 0)) AS text
      FROM documents
    ),
    counted AS (
      SELECT *, len(list_filter(regexp_split_to_array(text, '\s+'), x -> x != '')) AS wc
      FROM trimmed
    ),
    scanned AS (SELECT * FROM counted WHERE contains(text, 'data') OR contains(text, 'the')),
    hashed AS (
      SELECT lang, wc,
             sha256(to_base64(encode(regexp_replace(text, '[aeiou]', '', 'g')))) AS th
      FROM scanned
    )
    SELECT lang, CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(wc) AS BIGINT) AS sum_words, MIN(th) AS min_hash
    FROM hashed GROUP BY lang
    """,
)
def mega_flow_docs_q(spark, sf_dir):
    """Mega-flow S2: ModifyBytes → CountText → ScanContent → ReplaceText →
    EncodeContent(base64) → CryptographicHashContent(SHA-256) →
    QueryRecord over the documents corpus."""
    return _mega(spark, sf_dir, "DocsAgg.byLang")


@register(
    "mega_flow_json_validate",
    oracle="""
    SELECT event_type AS kind, CAST(COUNT(*) AS BIGINT) AS n,
           CAST(SUM(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT) AS sumk
    FROM events GROUP BY event_type
    """,
)
def mega_flow_json_q(spark, sf_dir):
    """Mega-flow S3: FlattenJson → EvaluateJsonPath → JoltTransformJSON →
    ValidateJson(schema) → QueryRecord; the schema admits every rendered
    document, so the valid branch is the whole stream."""
    return _mega(spark, sf_dir, "JsonAgg.agg")


@register(
    "mega_flow_grok_generate",
    oracle="""
    WITH g AS (
      SELECT CAST(i AS BIGINT) AS rec_id,
             CAST(('0x' || substr(md5('gr:' || CAST(i AS VARCHAR)), 1, 8))::UBIGINT % 10000 AS BIGINT) AS amount
      FROM range(500) t(i)
    )
    SELECT CAST(COUNT(*) AS BIGINT) AS n, CAST(SUM(rec_id) AS BIGINT) AS sum_rid,
           CAST(SUM(amount) AS BIGINT) AS sum_amt
    FROM g
    """,
)
def mega_flow_grok_q(spark, sf_dir):
    """Mega-flow S4: GenerateRecord → UpdateAttribute(EL string build) →
    ExtractGrok(%{INT}/%{WORD} compiled to regex captures) → QueryRecord."""
    return _mega(spark, sf_dir, "GrokAgg.agg")


@register(
    "rest_flow_author_run",
    oracle="""
    WITH sampled AS (SELECT * FROM orders WHERE o_orderkey % 3 = 0),
    seqd AS (SELECT *, ROW_NUMBER() OVER (PARTITION BY o_orderstatus ORDER BY o_orderkey) AS seq FROM sampled),
    lim AS (SELECT * FROM seqd WHERE seq <= 50),
    ded AS (SELECT * FROM (SELECT *, ROW_NUMBER() OVER (PARTITION BY o_custkey ORDER BY o_orderkey) AS rn FROM lim) WHERE rn = 1)
    SELECT o_orderstatus AS status, CAST(COUNT(*) AS BIGINT) AS n,
           CAST(SUM(seq) AS BIGINT) AS sum_seq,
           CAST(SUM(o_orderkey * 2) AS BIGINT) AS sum_key2,
           MIN(md5(concat_ws(',', CAST(o_orderkey AS VARCHAR), o_orderstatus))) AS min_md5
    FROM ded GROUP BY o_orderstatus
    """,
)
def rest_flow_author_q(spark, sf_dir):
    """REST flow-authoring control plane (§3.1 [2.7.2-surface]; the
    reference's primary entry point — its deploy scripts drive flows
    entirely through POST /nifi-api/... calls, scripts.sh:89-98): the
    63-processor mega flow is authored component-by-component over live
    HTTP (create group → 63 processor creates → 59 connection creates,
    each revision-checked), scheduled RUNNING (compile-on-start through
    plans/flow_import), committed to the FlowRegistry, and its
    OrdersAgg output returned.  Same oracle as the direct-import
    mega_flow_orders_pipeline — authoring over the API must be
    semantically invisible.  Control-plane only: the compiled Catalyst
    plan reads parquet directly; no data crosses the HTTP surface."""
    import json as _json

    from apache_nifi_spark.plans.rest_api import (
        NiFiApiServer,
        author_flow_via_api,
        start_group_via_api,
    )

    # Author once per (session, sf_dir) — same policy as _MEGA_CACHE for
    # the direct import: authoring + compile-on-start is control-plane
    # setup; the returned plan stays lazy either way.
    cache_key = (spark.sparkContext.applicationId, sf_dir, "rest_author")
    if cache_key in _MEGA_CACHE:
        return _MEGA_CACHE[cache_key]
    server = NiFiApiServer(spark, sf_dir)
    try:
        with open(_MEGA_FLOW_PATH) as f:
            contents = _json.load(f)["flowContents"]
        gid = author_flow_via_api(server.url, contents)
        start_group_via_api(server.url, gid)
        import http.client
        import urllib.parse

        u = urllib.parse.urlsplit(server.url)
        conn = http.client.HTTPConnection(u.hostname, u.port, timeout=30)
        try:  # snapshot the authored group into the version registry
            conn.request(
                "POST",
                f"/nifi-api/versions/process-groups/{gid}",
                body=b"{}",
                headers={"Content-Type": "application/json"},
            )
            assert conn.getresponse().status == 201
        finally:
            conn.close()
        # lazy plan; safe to serve after server.stop() — the data path
        # never touches the control plane
        _MEGA_CACHE[cache_key] = server.outputs(gid)["OrdersAgg.byStatus"]
        return _MEGA_CACHE[cache_key]
    finally:
        server.stop()


@register(
    "rest_ports_service_flow",
    oracle="""
    SELECT c.c_custkey, c.c_name, c.c_nationkey, n.n_name
    FROM customer c JOIN nation n ON c.c_nationkey = n.n_nationkey
    """,
)
def rest_ports_service_flow_q(spark, sf_dir):
    """Ports + controller services over the REST control plane
    (§3.1 [2.7.2-surface]; S2S input ports implied by reference
    scripts.sh:89-98): a flow with a CONTROLLER SERVICE carrying the
    shared lookup config (NiFi service indirection — the LookupRecord
    processor names the service, the compiler pulls its properties in),
    enabled via /run-status, and an OUTPUT PORT exposing the group's
    result, authored entirely over /nifi-api and scheduled RUNNING.
    Oracle: the customer×nation broadcast-lookup join the flow
    declares.  Control-plane only — the compiled plan scans parquet
    directly."""
    from apache_nifi_spark.plans.rest_api import (
        NiFiApiServer,
        author_flow_via_api,
        start_group_via_api,
    )

    cache_key = (spark.sparkContext.applicationId, sf_dir, "rest_ports_svc")
    if cache_key in _MEGA_CACHE:
        return _MEGA_CACHE[cache_key]
    contents = {
        "name": "ports-svc",
        "controllerServices": [{
            "identifier": "svc-lookup",
            "name": "nation-lookup",
            "type": "x.CSVRecordLookupService",
            "properties": {"Lookup Table": "nation", "Lookup Columns": "n_name"},
        }],
        "outputPorts": [{"identifier": "out", "name": "enriched"}],
        "processors": [
            {"identifier": "src", "name": "Customers", "type": "x.GetFile",
             "properties": {"Input Directory": "customer"}},
            {"identifier": "lk", "name": "NationLookup", "type": "x.LookupRecord",
             "properties": {"Lookup Service": "svc-lookup",
                            "Lookup Key": "c_nationkey",
                            "Lookup Field": "n_nationkey"}},
        ],
        "connections": [
            {"source": {"id": "src"}, "destination": {"id": "lk"},
             "selectedRelationships": ["success"]},
            {"source": {"id": "lk"}, "destination": {"id": "out"},
             "selectedRelationships": ["matched"]},
        ],
    }
    server = NiFiApiServer(spark, sf_dir)
    try:
        gid = author_flow_via_api(server.url, contents)
        start_group_via_api(server.url, gid)
        out = server.outputs(gid)["enriched.success"].select(
            "c_custkey", "c_name", "c_nationkey", "n_name"
        )
        _MEGA_CACHE[cache_key] = out
        return out
    finally:
        server.stop()


@register(
    "rest_secured_token_flow",
    oracle="""
    SELECT o_orderpriority,
           CAST(COUNT(*) AS BIGINT) AS n,
           CAST(SUM(o_orderkey) AS BIGINT) AS sum_key
    FROM orders WHERE o_orderstatus = 'F' GROUP BY o_orderpriority
    """,
)
def rest_secured_token_q(spark, sf_dir):
    """Single-user token auth on the REST control plane (§3.1
    [2.7.2-surface]; the reference deploys the stock image SECURED —
    its nifi-auth Secret sets SINGLE_USER_CREDENTIALS_USERNAME/PASSWORD,
    nifi-secret-volume/nifi-auth.yaml:8-9, and scripts.sh curls the API
    over https): POST /nifi-api/access/token exchanges the credentials
    for an HS256 JWT, an unauthenticated call is REFUSED 401 (asserted
    live), and the full author→run cycle executes over Bearer auth.
    Oracle: the authored flow's aggregation."""
    import http.client
    import json as _json
    import urllib.parse

    from apache_nifi_spark.plans.rest_api import (
        NiFiApiServer,
        fetch_token,
        start_group_via_api,
    )

    cache_key = (spark.sparkContext.applicationId, sf_dir, "rest_secured")
    if cache_key in _MEGA_CACHE:
        return _MEGA_CACHE[cache_key]
    server = NiFiApiServer(
        spark, sf_dir, credentials=("admin", "admin123456!")
    )
    try:
        u = urllib.parse.urlsplit(server.url)
        conn = http.client.HTTPConnection(u.hostname, u.port, timeout=30)
        try:
            # enforcement: no token → 401 before anything else happens
            conn.request("GET", "/nifi-api/flow/about")
            resp = conn.getresponse()
            assert resp.status == 401, resp.status
            resp.read()
            token = fetch_token(server.url, "admin", "admin123456!")

            def call(method, path, body=None):
                payload = (
                    _json.dumps(body).encode() if body is not None else None
                )
                headers = {"Authorization": f"Bearer {token}"}
                if payload:
                    headers["Content-Type"] = "application/json"
                conn.request(method, path, body=payload, headers=headers)
                r = conn.getresponse()
                out = _json.loads(r.read() or b"{}")
                assert r.status < 300, (r.status, out)
                return out

            g = call(
                "POST",
                "/nifi-api/process-groups/root/process-groups",
                {"revision": {"version": 0}, "component": {"name": "sec"}},
            )
            gid = g["id"]
            call(
                "POST",
                f"/nifi-api/process-groups/{gid}/processors",
                {"revision": {"version": 0},
                 "component": {"id": "src", "type": "x.GetFile",
                               "config": {"properties": {
                                   "Input Directory": "orders"}}}},
            )
            call(
                "POST",
                f"/nifi-api/process-groups/{gid}/processors",
                {"revision": {"version": 0},
                 "component": {"id": "agg", "type": "x.QueryRecord",
                               "config": {"properties": {
                                   "by_priority":
                                   "SELECT o_orderpriority,"
                                   " CAST(COUNT(*) AS BIGINT) AS n,"
                                   " CAST(SUM(o_orderkey) AS BIGINT) AS sum_key"
                                   " FROM FLOWFILE"
                                   " WHERE o_orderstatus = 'F'"
                                   " GROUP BY o_orderpriority"}}}},
            )
            call(
                "POST",
                f"/nifi-api/process-groups/{gid}/connections",
                {"revision": {"version": 0},
                 "component": {"source": {"id": "src"},
                               "destination": {"id": "agg"},
                               "selectedRelationships": ["success"]}},
            )
        finally:
            conn.close()
        outs = start_group_via_api(server.url, gid, token=token)
        assert "agg.by_priority" in outs, outs
        _MEGA_CACHE[cache_key] = server.outputs(gid)["agg.by_priority"]
        return _MEGA_CACHE[cache_key]
    finally:
        server.stop()


@register(
    "rest_parameter_context_flow",
    oracle="""
    SELECT c_mktsegment,
           CAST(COUNT(*) AS BIGINT) AS n,
           CAST(SUM(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE) AS total_bal
    FROM customer WHERE c_acctbal > 5000 GROUP BY c_mktsegment
    """,
)
def rest_parameter_context_q(spark, sf_dir):
    """Parameter contexts over the REST control plane (§2.13/§3.1
    [2.7.2-surface]): the flow's table name and filter threshold live in
    a parameter context — ``#{src.table}`` / ``#{min.balance}``
    placeholders in the processor properties bind through the group's
    bound context at compile-on-start (NiFi's flow/config separation;
    snapshots carry placeholders, values never enter version control).
    Oracle: the parameter-resolved aggregation itself."""
    import http.client
    import json as _json
    import urllib.parse

    from apache_nifi_spark.plans.rest_api import NiFiApiServer

    cache_key = (spark.sparkContext.applicationId, sf_dir, "rest_param_ctx")
    if cache_key in _MEGA_CACHE:
        return _MEGA_CACHE[cache_key]
    server = NiFiApiServer(spark, sf_dir)
    try:
        u = urllib.parse.urlsplit(server.url)
        conn = http.client.HTTPConnection(u.hostname, u.port, timeout=30)

        def call(method, path, body=None):
            payload = _json.dumps(body).encode() if body is not None else None
            conn.request(
                method, path, body=payload,
                headers={"Content-Type": "application/json"} if payload else {},
            )
            resp = conn.getresponse()
            out = _json.loads(resp.read() or b"{}")
            assert resp.status < 300, (resp.status, out)
            return out

        try:
            pc = call("POST", "/nifi-api/parameter-contexts",
                      {"revision": {"version": 0},
                       "component": {"name": "bench-env", "parameters": [
                           {"parameter": {"name": "src.table",
                                          "value": "customer"}},
                           {"parameter": {"name": "min.balance",
                                          "value": "5000"}},
                       ]}})
            g = call("POST", "/nifi-api/process-groups/root/process-groups",
                     {"revision": {"version": 0}, "component": {"name": "pctx"}})
            gid = g["id"]
            call("PUT", f"/nifi-api/process-groups/{gid}",
                 {"revision": {"version": 0},
                  "component": {"parameterContext": {"id": pc["id"]}}})
            call("POST", f"/nifi-api/process-groups/{gid}/processors",
                 {"revision": {"version": 0},
                  "component": {"id": "src", "type": "x.GetFile",
                                "config": {"properties": {
                                    "Input Directory": "#{src.table}"}}}})
            call("POST", f"/nifi-api/process-groups/{gid}/processors",
                 {"revision": {"version": 0},
                  "component": {"id": "agg", "type": "x.QueryRecord",
                                "config": {"properties": {
                                    "by_segment":
                                    "SELECT c_mktsegment,"
                                    " CAST(COUNT(*) AS BIGINT) AS n,"
                                    " CAST(SUM(CAST(c_acctbal AS DECIMAL(18,2)))"
                                    "  AS DOUBLE) AS total_bal"
                                    " FROM FLOWFILE"
                                    " WHERE c_acctbal > #{min.balance}"
                                    " GROUP BY c_mktsegment"}}}})
            call("POST", f"/nifi-api/process-groups/{gid}/connections",
                 {"revision": {"version": 0},
                  "component": {"source": {"id": "src"},
                                "destination": {"id": "agg"},
                                "selectedRelationships": ["success"]}})
            call("PUT", f"/nifi-api/flow/process-groups/{gid}",
                 {"state": "RUNNING"})
        finally:
            conn.close()
        _MEGA_CACHE[cache_key] = server.outputs(gid)["agg.by_segment"]
        return _MEGA_CACHE[cache_key]
    finally:
        server.stop()


@register(
    "flow_update_counter",
    oracle="""
    SELECT 'orders.seen' AS counter,
           CAST(2 * (SELECT COUNT(*) FROM orders) AS BIGINT) AS value
    UNION ALL
    SELECT 'orders.open',
           CAST((SELECT COUNT(*) FROM orders WHERE o_orderstatus = 'O') AS BIGINT)
    ORDER BY counter
    """,
)
def flow_update_counter_q(spark, sf_dir):
    """UpdateCounter (§2.10 ops surface [2.7.2-surface]): two counter
    hops in one imported flow — delta-2 on the full orders scan, delta-1
    on the open-status route — tick Observation aggregates that ride the
    plan's single materializing action (zero extra passes/shuffles; see
    plans/flow_import.py's UpdateCounter handler).  The counter table
    itself is O(counters) control-plane rows; the oracle recomputes both
    totals from the data."""
    from apache_nifi_spark.plans.flow_import import run_flow

    flow = {
        "flowContents": {
            "name": "counters",
            "processors": [
                {"identifier": "src", "name": "Orders", "type": "x.GetFile",
                 "properties": {"Input Directory": "orders"}},
                {"identifier": "seen", "name": "Seen", "type": "x.UpdateCounter",
                 "properties": {"Counter Name": "orders.seen", "Delta": "2"}},
                {"identifier": "route", "name": "OpenOnly",
                 "type": "x.RouteOnAttribute",
                 "properties": {"open": "${o_orderstatus:equals('O')}"}},
                {"identifier": "open", "name": "Open", "type": "x.UpdateCounter",
                 "properties": {"Counter Name": "orders.open"}},
            ],
            "connections": [
                {"source": {"id": "src"}, "destination": {"id": "seen"},
                 "selectedRelationships": ["success"]},
                {"source": {"id": "seen"}, "destination": {"id": "route"},
                 "selectedRelationships": ["success"]},
                {"source": {"id": "route"}, "destination": {"id": "open"},
                 "selectedRelationships": ["open"]},
            ],
        }
    }
    counters: dict[str, list] = {}
    outs = run_flow(spark, sf_dir, flow, counters=counters)
    # one action materializes the whole graph; every observation ticks
    outs["Open.success"].write.mode("overwrite").format("noop").save()
    rows = sorted(
        (cname, sum(int(o.get["value"]) for o in obs_list))  # control-plane: O(counters)
        for cname, obs_list in counters.items()
    )
    return spark.createDataFrame(rows, "counter string, value bigint")


@register(
    "mega_flow_fork_join",
    oracle="""
    SELECT c_mktsegment AS seg, CAST(COUNT(*) AS BIGINT) AS n,
           CAST(SUM(CAST(c_acctbal * 2 AS DECIMAL(18,6))) AS DOUBLE) AS sum_bal2
    FROM customer GROUP BY c_mktsegment
    """,
)
def mega_flow_fork_join_q(spark, sf_dir):
    """Mega-flow S5: ForkEnrichment → (enrichment: QueryRecord calc) →
    JoinEnrichment SQL strategy rejoining original+enrichment views →
    QueryRecord aggregate."""
    return _mega(spark, sf_dir, "JoinAgg.agg")


@register(
    "mega_flow_merge_split",
    oracle="""
    WITH m AS (SELECT o_custkey, COUNT(*) AS cnt, SUM(o_orderkey) AS sk FROM orders GROUP BY o_custkey)
    SELECT CAST(SUM(cnt) AS BIGINT) AS n, CAST(SUM(sk) AS BIGINT) AS sum_keys,
           CAST(SUM(cnt * (cnt - 1) / 2) AS BIGINT) AS sum_idx
    FROM m
    """,
)
def mega_flow_merge_split_q(spark, sf_dir):
    """Mega-flow S6: MergeRecord(bin by o_custkey) → SplitRecord(explode
    back with fragment_index) → QueryRecord; sum of fragment indexes per
    bin is n(n-1)/2 — deterministic despite unordered bins."""
    return _mega(spark, sf_dir, "MergeSplitAgg.agg")


@register(
    "mega_flow_record_stats",
    oracle="""
    SELECT '<total>' AS category, '<total>' AS value,
           CAST(COUNT(*) AS BIGINT) AS record_count FROM customer
    UNION ALL
    SELECT 'c_mktsegment' AS category, c_mktsegment AS value,
           CAST(COUNT(*) AS BIGINT) AS record_count
    FROM customer GROUP BY c_mktsegment
    """,
)
def mega_flow_record_stats_q(spark, sf_dir):
    """Mega-flow S7: PartitionRecord(hash co-locate) →
    CalculateRecordStats(per-category counts + total)."""
    return _mega(spark, sf_dir, "CustStats.success")


@register(
    "mega_flow_scan_funnel",
    oracle="""
    WITH mtch AS (SELECT n_nationkey FROM nation WHERE n_name IN ('NATION_3','NATION_7','NATION_11')),
    dup AS (SELECT n_nationkey FROM mtch, range(3)),
    unioned AS (
      SELECT n_nationkey FROM dup
      UNION ALL
      SELECT n_nationkey FROM nation WHERE n_name NOT IN ('NATION_3','NATION_7','NATION_11')
    )
    SELECT CAST(COUNT(*) AS BIGINT) AS n, CAST(SUM(n_nationkey) AS BIGINT) AS s FROM unioned
    """,
)
def mega_flow_scan_funnel_q(spark, sf_dir):
    """Mega-flow S8: ScanAttribute(dictionary route) →
    DuplicateFlowFile(×3) → RemoveRecordField → Funnel(union with the
    unmatched branch) → LogAttribute → QueryRecord."""
    return _mega(spark, sf_dir, "NationAgg.agg")


@register(
    "mega_flow_merge_digest",
    oracle="""
    SELECT source, CAST(COUNT(*) AS BIGINT) AS n_docs,
           md5(string_agg(text, '' ORDER BY doc_id)) AS digest
    FROM documents GROUP BY source
    """,
)
def mega_flow_merge_digest_q(spark, sf_dir):
    """Mega-flow S9a: MergeContent(bin-pack by source, doc_id order,
    empty demarcator) → QueryRecord digesting each merged payload —
    byte-exact reassembly proof."""
    return _mega(spark, sf_dir, "SrcDigest.agg")


@register(
    "mega_flow_line_split",
    oracle="""
    WITH l AS (
      SELECT unnest(string_split(regexp_replace(text, ' ', chr(10), 'g'), chr(10))) AS line
      FROM documents
    )
    SELECT CAST(COUNT(*) AS BIGINT) AS n_lines, CAST(SUM(length(line)) AS BIGINT) AS sum_len FROM l
    """,
)
def mega_flow_line_split_q(spark, sf_dir):
    """Mega-flow S9b: ReplaceText(space→newline) → SplitText(posexplode
    lines) → QueryRecord."""
    return _mega(spark, sf_dir, "LineAgg.agg")


@register(
    "mega_flow_segments",
    oracle="""
    SELECT CAST(SUM(greatest(CAST(ceil(length(text) / 200.0) AS BIGINT), 1)) AS BIGINT) AS n_seg,
           CAST(SUM(length(text)) AS BIGINT) AS sum_seg_len
    FROM documents
    """,
)
def mega_flow_segments_q(spark, sf_dir):
    """Mega-flow S9c: SegmentContent(200-char windows, explode inside the
    generate node) → QueryRecord; segment lengths must re-sum to the
    source lengths exactly."""
    return _mega(spark, sf_dir, "SegAgg.agg")


@register(
    "mega_flow_csv_frags",
    oracle="""
    WITH c AS (
      SELECT concat_ws(',', CAST(n_nationkey AS VARCHAR), n_name, CAST(n_regionkey AS VARCHAR)) AS content
      FROM nation
    )
    SELECT CAST(SUM(length(content) - length(replace(content, ',', '')) + 1) AS BIGINT) AS n_frags,
           CAST(SUM(length(replace(content, ',', ''))) AS BIGINT) AS sum_flen,
           'application/octet-stream' AS mime
    FROM c
    """,
)
def mega_flow_csv_frags_q(spark, sf_dir):
    """Mega-flow S9d: ConvertCharacterSet(noop roundtrip) →
    ConvertRecord(csv writer) → IdentifyMimeType → SplitContent(split on
    the byte sequence) → QueryRecord."""
    return _mega(spark, sf_dir, "CsvAgg.agg")


@register(
    "mega_flow_route_distribute",
    oracle=r"""
    WITH m AS (SELECT doc_id, text FROM documents WHERE regexp_matches(text, 'data')),
    e AS (SELECT doc_id, regexp_extract(text, '^(\w+)', 1) AS firstword FROM m),
    r AS (SELECT *, ROW_NUMBER() OVER (ORDER BY doc_id) AS rn FROM e),
    a AS (SELECT doc_id, firstword FROM r WHERE (rn - 1) % 3 < 2)
    SELECT CAST(COUNT(*) AS BIGINT) AS n, CAST(SUM(doc_id) AS BIGINT) AS s,
           MIN(to_json(struct_pack(doc_id := doc_id, firstword := firstword))) AS mj
    FROM a
    """,
)
def mega_flow_route_distribute_q(spark, sf_dir):
    """Mega-flow S10: RouteText(matched) → ExtractText(capture) →
    DistributeLoad(2:1 round-robin on doc_id order) → AttributesToJSON →
    QueryRecord on the 'a' relationship."""
    return _mega(spark, sf_dir, "RouteAgg.agg")


# =====================================================================
# Mega flow 2 (round-7 item #2): tests/fixtures/mega_flow2.json widens
# the importable surface by 15+ processor types that the engine already
# implemented but the importer could not compile — LookupAttribute,
# EvaluateXPath/XQuery, Encrypt/DecryptContent, ExtractHL7Attributes,
# Modify/GetHTMLElement, ExtractEmailHeaders, AttributeRollingWindow,
# MonitorActivity, GeoEnrichIP, and a ListenSyslog landing-dir source.
# Reference anchor: flows are the unit the reference versions and
# deploys (nifi-registry/deployement.yaml:14-16).
# =====================================================================

_MEGA2_FLOW_PATH = __file__.rsplit("/", 2)[0] + "/tests/fixtures/mega_flow2.json"
_MEGA2_SYSLOG_DIR = "/tmp/anspark_mega2_syslog"
_MEGA2_CACHE: dict = {}


def _mega2(spark, sf_dir, output):
    """Compile mega flow 2 once per (session, sf_dir).  The ListenSyslog
    segment starts from a landing directory, so deterministic RFC 3164
    lines are landed first (the listener tier's output contract) — the
    flow then drains them like any landed stream."""
    key = (spark.sparkContext.applicationId, sf_dir)
    if key not in _MEGA2_CACHE:
        from apache_nifi_spark.operators import render_syslog_3164
        from apache_nifi_spark.plans.flow_import import run_flow_json

        ev = _t(spark, sf_dir, "events").filter(F.col("event_id") % 33 == 0)
        lines = ev.select(
            render_syslog_3164(
                F.lit(134),
                F.col("ts"),
                F.concat(F.lit("h"), (F.col("user_id") % 5).cast("string")),
                F.lit("engine"),
                F.col("event_id"),
                F.col("event_type"),
            ).alias("value")
        )
        lines.coalesce(1).write.mode("overwrite").text(_MEGA2_SYSLOG_DIR)
        with open(_MEGA2_FLOW_PATH) as f:
            _MEGA2_CACHE[key] = run_flow_json(spark, sf_dir, f.read())
    return _MEGA2_CACHE[key][output]


@register(
    "mega2_lookup_xpath_xquery",
    oracle="""
    SELECT CAST(COUNT(*) AS BIGINT) AS n,
           CAST(SUM(c_custkey) AS BIGINT) AS sum_id,
           CAST(SUM(c_nationkey + 7) AS DOUBLE) AS sum_x,
           CAST(2 * COUNT(*) AS BIGINT) AS sum_cnt,
           MIN(n_name) AS min_n
    FROM customer JOIN nation ON c_nationkey = n_nationkey
    """,
)
def mega2_lookup_q(spark, sf_dir):
    """Mega-flow-2 S1: LookupAttribute(broadcast nation) → UpdateAttribute
    (EL XML build) → EvaluateXPath → EvaluateXQuery(sum/count) →
    QueryRecord."""
    return _mega2(spark, sf_dir, "LookupAgg.agg")


@register(
    "mega2_crypto_roundtrip",
    oracle="""
    SELECT CAST(COUNT(*) AS BIGINT) AS n,
           MIN(s_name) AS min_name, MAX(s_name) AS max_name
    FROM supplier
    """,
)
def mega2_crypto_q(spark, sf_dir):
    """Mega-flow-2 S2: EncryptContent(AES-GCM) → DecryptContent →
    QueryRecord — the round-trip proves ciphertext integrity end-to-end
    (GCM IVs are random, so only the round-trip is value-stable)."""
    return _mega2(spark, sf_dir, "CryptoAgg.agg")


@register(
    "mega2_hl7_extract",
    oracle="""
    SELECT CAST(COUNT(*) AS BIGINT) AS n,
           MIN('CTRL' || CAST(event_id AS VARCHAR)) AS min_ctrl,
           MIN('K' || CAST(user_id AS VARCHAR)) AS min_given,
           MAX('P' || CAST(user_id AS VARCHAR)) AS max_pid
    FROM events WHERE event_id % 12 = 0
    """,
)
def mega2_hl7_q(spark, sf_dir):
    """Mega-flow-2 S3: QueryRecord(filter) → UpdateAttribute(EL HL7 v2
    message build) → ExtractHL7Attributes → QueryRecord."""
    return _mega2(spark, sf_dir, "Hl7Agg.agg")


@register(
    "mega2_html_modify_extract",
    oracle="""
    SELECT lang, CAST(COUNT(*) AS BIGINT) AS n,
           CAST(SUM(doc_id) AS BIGINT) AS sum_id
    FROM documents GROUP BY lang
    """,
)
def mega2_html_q(spark, sf_dir):
    """Mega-flow-2 S4: UpdateAttribute(EL HTML build) →
    ModifyHTMLElement(retag class) → GetHTMLElement(select by the NEW
    class — proves the modify ran) → QueryRecord."""
    return _mega2(spark, sf_dir, "HtmlAgg.agg")


@register(
    "mega2_email_headers",
    oracle="""
    SELECT CAST(COUNT(*) AS BIGINT) AS n,
           MIN('S' || CAST(c_custkey AS VARCHAR)) AS min_subj,
           'eng@example.com' AS from_a,
           TIMESTAMP '2026-01-01 00:00:00' AS min_dt
    FROM customer WHERE c_custkey % 10 = 0
    """,
)
def mega2_email_q(spark, sf_dir):
    """Mega-flow-2 S5: QueryRecord(filter) → UpdateAttribute(EL MIME
    build) → ExtractEmailHeaders(stdlib parser in mapInPandas) →
    QueryRecord."""
    return _mega2(spark, sf_dir, "MailAgg.agg")


@register(
    "mega2_rolling_window",
    oracle="""
    WITH r AS (
      SELECT SUM(event_id) OVER w AS rs, COUNT(event_id) OVER w AS rc
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY event_id
                   ROWS BETWEEN 4 PRECEDING AND CURRENT ROW)
    )
    SELECT CAST(COUNT(*) AS BIGINT) AS n, CAST(SUM(rs) AS BIGINT) AS s,
           CAST(SUM(rc) AS BIGINT) AS c
    FROM r
    """,
)
def mega2_rolling_q(spark, sf_dir):
    """Mega-flow-2 S6: AttributeRollingWindow(last-5 per user) →
    QueryRecord — the ROWS-frame batch analog of NiFi's stateful rolling
    window."""
    return _mega2(spark, sf_dir, "RollAgg.agg")


@register(
    "mega2_monitor_gaps",
    oracle="""
    WITH g AS (
      SELECT user_id,
             (epoch_us(ts) - epoch_us(lag(ts) OVER
                 (PARTITION BY user_id ORDER BY ts))) / 1000000.0 AS gap
      FROM events
    )
    SELECT CAST(COUNT(*) AS BIGINT) AS n,
           CAST(SUM(CAST(gap AS DECIMAL(20,6))) AS DOUBLE) AS total_gap
    FROM g WHERE gap > 3600
    """,
)
def mega2_monitor_q(spark, sf_dir):
    """Mega-flow-2 S7: MonitorActivity(1 h threshold) → QueryRecord over
    the inactivity gaps."""
    return _mega2(spark, sf_dir, "GapAgg.agg")


@register(
    "mega2_geoenrich_bands",
    oracle="""
    SELECT n_name, CAST(COUNT(*) AS BIGINT) AS n,
           CAST(SUM(o_orderkey) AS BIGINT) AS s
    FROM orders JOIN nation
      ON o_custkey >= n_nationkey * 1000 AND o_custkey < (n_nationkey + 1) * 1000
    WHERE o_orderkey % 15 = 0
    GROUP BY n_name
    """,
)
def mega2_geoenrich_q(spark, sf_dir):
    """Mega-flow-2 S8: GeoEnrichIP-style broadcast range join (point ∈
    [lo, hi) bands over the nation fixture) → QueryRecord."""
    return _mega2(spark, sf_dir, "BandAgg.agg")


@register(
    "mega2_syslog_source",
    oracle="""
    SELECT CAST(COUNT(*) AS BIGINT) AS n,
           CAST(SUM(event_id) AS BIGINT) AS s,
           MIN('h' || CAST(user_id % 5 AS VARCHAR)) AS min_host
    FROM events WHERE event_id % 33 = 0
    """,
)
def mega2_syslog_q(spark, sf_dir):
    """Mega-flow-2 S9: a flow that STARTS from a listener landing
    directory — ListenSyslog(drain + RFC 3164 parse) → QueryRecord.
    The lines are landed by the listener-tier contract before import."""
    return _mega2(spark, sf_dir, "SyslogAgg.agg")


# =====================================================================
# Cyclic-flow import (round-7 item #3): tests/fixtures/retry_flow.json
# contains a real back-edge — ValidateJson --invalid--> RetryFlowFile
# --retry--> ValidateJson — which the importer unrolls into one acyclic
# Catalyst plan (plans/flow_import._unroll_retry_cycles).  NiFi flows
# routinely carry such loops; pre-unroll the importer rejected them.
# =====================================================================

_RETRY_FLOW_PATH = __file__.rsplit("/", 2)[0] + "/tests/fixtures/retry_flow.json"
_RETRY_CACHE: dict = {}


def _retry_flow(spark, sf_dir, output):
    key = (spark.sparkContext.applicationId, sf_dir)
    if key not in _RETRY_CACHE:
        from apache_nifi_spark.plans.flow_import import run_flow_json

        with open(_RETRY_FLOW_PATH) as f:
            _RETRY_CACHE[key] = run_flow_json(spark, sf_dir, f.read())
    return _RETRY_CACHE[key][output]


@register(
    "retry_loop_flow_valid",
    oracle="""
    SELECT CAST(COUNT(*) AS BIGINT) AS n, CAST(SUM(event_id) AS BIGINT) AS s
    FROM events
    WHERE CAST(json_extract_string(props, '$.k') AS BIGINT) <= 60
    """,
)
def retry_loop_valid_q(spark, sf_dir):
    """Imported retry loop, success path: records passing ValidateJson on
    any attempt reach the OkAgg consumer (deterministic validation passes
    on attempt 1; the attempt-2/3 copies contribute empty legs that the
    union null-fills)."""
    return _retry_flow(spark, sf_dir, "OkAgg.agg")


@register(
    "retry_loop_flow_exhausted",
    oracle="""
    SELECT CAST(COUNT(*) AS BIGINT) AS n, CAST(SUM(event_id) AS BIGINT) AS s,
           CAST(3 AS INT) AS attempts
    FROM events
    WHERE CAST(json_extract_string(props, '$.k') AS BIGINT) > 60
    """,
)
def retry_loop_exhausted_q(spark, sf_dir):
    """Imported retry loop, dead-letter path: records failing ValidateJson
    on every attempt exhaust Maximum Retries=2 (3 attempts total) and exit
    retries_exceeded carrying flowfile.retries=3 — the unrolled graph's
    final RetryFlowFile copy."""
    return _retry_flow(spark, sf_dir, "DeadLetter.agg")


