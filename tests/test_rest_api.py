"""REST flow-authoring control plane: author-over-HTTP ≡ direct import,
revision protocol, compile-on-start validation, version control."""

from __future__ import annotations

import http.client
import json
import os
import urllib.parse

import pytest

from apache_nifi_spark.plans.flow_import import run_flow_json
from apache_nifi_spark.plans.rest_api import (
    NiFiApiServer,
    author_flow_via_api,
    start_group_via_api,
)

FIXTURES = os.path.join(os.path.dirname(__file__), "fixtures")


def _conn(server):
    u = urllib.parse.urlsplit(server.url)
    return http.client.HTTPConnection(u.hostname, u.port, timeout=30)


def _call(conn, method, path, body=None):
    payload = json.dumps(body).encode() if body is not None else None
    conn.request(
        method, path, body=payload,
        headers={"Content-Type": "application/json"} if payload else {},
    )
    resp = conn.getresponse()
    return resp.status, json.loads(resp.read() or b"{}")


@pytest.fixture
def server(spark, sf_dir):
    s = NiFiApiServer(spark, sf_dir)
    yield s
    s.stop()


def test_author_mega_flow_matches_direct_import(spark, sf_dir, server):
    """Authoring the 63-processor mega flow through /nifi-api and
    scheduling it RUNNING must compile to the SAME results as the direct
    flow.json import."""
    with open(os.path.join(FIXTURES, "mega_flow.json")) as f:
        text = f.read()
    contents = json.loads(text)["flowContents"]
    gid = author_flow_via_api(server.url, contents)
    outs = start_group_via_api(server.url, gid)
    direct = run_flow_json(spark, sf_dir, text)
    assert set(outs) == set(direct)
    via_api = server.outputs(gid)
    got = sorted(map(tuple, via_api["OrdersAgg.byStatus"].collect()))
    want = sorted(map(tuple, direct["OrdersAgg.byStatus"].collect()))
    assert got == want and got


def test_revision_protocol(server):
    conn = _conn(server)
    try:
        # create requires version 0
        status, _ = _call(conn, "POST", "/nifi-api/process-groups/root/processors",
                          {"revision": {"version": 3},
                           "component": {"type": "x.UpdateAttribute"}})
        assert status == 400
        status, ent = _call(conn, "POST", "/nifi-api/process-groups/root/processors",
                            {"revision": {"version": 0},
                             "component": {"name": "A", "type": "x.UpdateAttribute",
                                           "config": {"properties": {"z": "1"}}}})
        assert status == 201 and ent["revision"]["version"] == 0
        pid = ent["id"]
        # good update bumps the revision
        status, ent = _call(conn, "PUT", f"/nifi-api/processors/{pid}",
                            {"revision": {"version": 0},
                             "component": {"config": {"properties": {"z": "2"}}}})
        assert status == 200 and ent["revision"]["version"] == 1
        assert ent["component"]["config"]["properties"]["z"] == "2"
        # stale update → 409 Conflict
        status, _ = _call(conn, "PUT", f"/nifi-api/processors/{pid}",
                          {"revision": {"version": 0},
                           "component": {"name": "B"}})
        assert status == 409
        # delete with wrong version → 409; with current → 200
        status, _ = _call(conn, "DELETE", f"/nifi-api/processors/{pid}?version=0")
        assert status == 409
        status, _ = _call(conn, "DELETE", f"/nifi-api/processors/{pid}?version=1")
        assert status == 200
        status, _ = _call(conn, "GET", f"/nifi-api/processors/{pid}")
        assert status == 404
    finally:
        conn.close()


def test_connected_processor_delete_refused(server):
    conn = _conn(server)
    try:
        ids = []
        for name in ("A", "B"):
            _, ent = _call(conn, "POST", "/nifi-api/process-groups/root/processors",
                           {"revision": {"version": 0},
                            "component": {"name": name, "type": "x.UpdateAttribute",
                                          "config": {"properties": {"z": "1"}}}})
            ids.append(ent["id"])
        status, cent = _call(conn, "POST", "/nifi-api/process-groups/root/connections",
                             {"revision": {"version": 0},
                              "component": {"source": {"id": ids[0]},
                                            "destination": {"id": ids[1]},
                                            "selectedRelationships": ["success"]}})
        assert status == 201
        status, _ = _call(conn, "DELETE", f"/nifi-api/processors/{ids[0]}?version=0")
        assert status == 409  # still connected
        status, _ = _call(conn, "DELETE", f"/nifi-api/connections/{cent['id']}?version=0")
        assert status == 200
        status, _ = _call(conn, "DELETE", f"/nifi-api/processors/{ids[0]}?version=0")
        assert status == 200
    finally:
        conn.close()


def test_compile_on_start_rejects_bad_graph(server):
    """An unsupported cycle must answer 400 with the compiler diagnostic
    at schedule time — NiFi's validation-at-start contract."""
    conn = _conn(server)
    try:
        _, g = _call(conn, "POST", "/nifi-api/process-groups/root/process-groups",
                     {"revision": {"version": 0}, "component": {"name": "bad"}})
        gid = g["id"]
        for pid in ("a", "b"):
            _call(conn, "POST", f"/nifi-api/process-groups/{gid}/processors",
                  {"revision": {"version": 0},
                   "component": {"id": pid, "type": "x.UpdateAttribute",
                                 "config": {"properties": {"z": "${event_type}"}}}})
        for s, d in (("a", "b"), ("b", "a")):
            _call(conn, "POST", f"/nifi-api/process-groups/{gid}/connections",
                  {"revision": {"version": 0},
                   "component": {"source": {"id": s}, "destination": {"id": d}}})
        status, payload = _call(conn, "PUT", f"/nifi-api/flow/process-groups/{gid}",
                                {"id": gid, "state": "RUNNING"})
        assert status == 400 and "cycle" in payload["error"]
    finally:
        conn.close()


def test_version_control_commit_history(spark, sf_dir, server):
    conn = _conn(server)
    try:
        _, g = _call(conn, "POST", "/nifi-api/process-groups/root/process-groups",
                     {"revision": {"version": 0}, "component": {"name": "vc"}})
        gid = g["id"]
        _call(conn, "POST", f"/nifi-api/process-groups/{gid}/processors",
              {"revision": {"version": 0},
               "component": {"id": "src", "type": "x.GetFile",
                             "config": {"properties": {"Input Directory": "region"}}}})
        status, v1 = _call(conn, "POST", f"/nifi-api/versions/process-groups/{gid}", {})
        assert (status, v1["version"]) == (201, 1)
        status, v2 = _call(conn, "POST", f"/nifi-api/versions/process-groups/{gid}",
                           {"comment": "second"})
        assert (status, v2["version"]) == (201, 2)
        status, hist = _call(conn, "GET", f"/nifi-api/versions/process-groups/{gid}")
        assert [h["version"] for h in hist["versions"]] == [1, 2]
        # a committed snapshot replays through the direct importer
        text = server.registry.get("default", "vc", 1)
        outs = run_flow_json(spark, sf_dir, text)
        assert outs["src.success"].count() == 5  # region table
        # committing to a NON-default bucket must still show up in the
        # group's version history (round-8 advice: history hardcoded
        # 'default')
        status, v3 = _call(conn, "POST", f"/nifi-api/versions/process-groups/{gid}",
                           {"bucket": "prod", "comment": "promoted"})
        assert (status, v3["version"]) == (201, 1)  # first version IN prod
        status, hist = _call(conn, "GET", f"/nifi-api/versions/process-groups/{gid}")
        assert status == 200
        assert [(h["version"], h["comment"]) for h in hist["versions"]] == [
            (1, "promoted")
        ]
        assert server.registry.history("prod", "vc")[0][0] == 1
    finally:
        conn.close()
