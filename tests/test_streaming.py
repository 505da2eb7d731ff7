"""Streaming semantics tests (SURVEY.md §2.11): batch/stream parity of
the correlation join, multi-batch rate capping (ControlRate), and the
back-pressure monitor."""

from __future__ import annotations

import os
import tempfile
import time

from pyspark.sql import functions as F

from apache_nifi_spark import io
from apache_nifi_spark.streaming import (
    BackpressureMonitor,
    correlate_streams,
    run_to_memory,
    stream_events,
)


def test_correlate_streams_batch_parity(spark, sf_dir):
    ev = io.load_table(spark, sf_dir, "events")
    signups = ev.filter(F.col("event_type") == "signup")
    purchases = ev.filter(F.col("event_type") == "purchase")
    batch = correlate_streams(signups, purchases, ["user_id"], "ts", within="24 hours")

    s_sign = stream_events(spark, sf_dir).filter(F.col("event_type") == "signup")
    s_purch = stream_events(spark, sf_dir).filter(F.col("event_type") == "purchase")
    streamed = run_to_memory(
        correlate_streams(s_sign, s_purch, ["user_id"], "ts", within="24 hours").select(
            "w_event_id", "s_event_id"
        )
    )
    assert sorted(map(tuple, streamed.collect())) == sorted(
        map(tuple, batch.select("w_event_id", "s_event_id").collect())
    )


def test_max_files_per_trigger_multi_batch_and_backpressure(spark, sf_dir):
    # stage the same fixture as three files → three micro-batches at cap 1
    src = f"{sf_dir}/events.parquet"
    landing = tempfile.mkdtemp(prefix="t_landing_")
    for i in range(3):
        os.symlink(src, os.path.join(landing, f"events_{i}.parquet"))

    monitor = BackpressureMonitor()
    spark.streams.addListener(monitor)
    try:
        sdf = stream_events(spark, sf_dir, path=landing, max_files_per_trigger=1)
        total = run_to_memory(sdf.select("event_id"), query_name="t_rate_cap")
        n_one = spark.read.parquet(src).count()
        assert total.count() == 3 * n_one
        # listener saw one progress event per micro-batch
        deadline = time.time() + 10
        while len(monitor.history) < 3 and time.time() < deadline:
            time.sleep(0.2)
        assert len(monitor.history) >= 3
        assert isinstance(monitor.pressure_slope(), float)
        assert isinstance(monitor.backlog_pressure(), float)
    finally:
        spark.streams.removeListener(monitor)


def test_listen_http_landing_zone(spark, sf_dir):
    """E2E ListenHTTP analog (the reference's curl-POST entry point):
    POST JSON events to a live local HTTP listener → landing files →
    streaming drain → aggregate matches what was sent."""
    import json
    import urllib.request

    from apache_nifi_spark.streaming import HttpLandingListener, stream_json_landing

    landing = tempfile.mkdtemp(prefix="t_http_landing_")
    events = [
        {"event_id": i, "event_type": "purchase" if i % 2 else "error", "value": float(i)}
        for i in range(10)
    ]
    with HttpLandingListener(landing) as listener:
        for ev in events:
            req = urllib.request.Request(
                listener.url, data=json.dumps(ev).encode(), method="POST"
            )
            with urllib.request.urlopen(req, timeout=10) as resp:
                assert resp.status == 200
    sdf = stream_json_landing(
        spark, landing, "event_id BIGINT, event_type STRING, value DOUBLE"
    )
    out = run_to_memory(
        sdf.groupBy("event_type").agg(
            F.count(F.lit(1)).alias("n"), F.sum("value").alias("total")
        ),
        output_mode="complete",
    )
    got = {r["event_type"]: (r["n"], r["total"]) for r in out.collect()}
    assert got == {
        "purchase": (5, float(sum(i for i in range(10) if i % 2))),
        "error": (5, float(sum(i for i in range(10) if not i % 2))),
    }


def test_site_to_site_relay_lossless(spark, sf_dir):
    from apache_nifi_spark.streaming import run_to_memory, s2s_pull, s2s_push, stream_events

    producer = stream_events(spark, sf_dir)
    bus = s2s_push(producer)
    relayed = run_to_memory(s2s_pull(spark, bus).groupBy().count(), output_mode="complete")
    direct = io.load_table(spark, sf_dir, "events").count()
    assert relayed.collect()[0]["count"] == direct


def test_listen_tcp_landing_zone_e2e(spark, tmp_path):
    """ListenTCP transport → landing dir → text-stream drain → syslog
    parse: the full wire-to-columns path."""
    import socket

    from apache_nifi_spark.operators import parse_syslog
    from apache_nifi_spark.streaming import TcpLandingListener

    landing = str(tmp_path / "tcp_landing")
    listener = TcpLandingListener(landing)
    try:
        lines = [
            f"<{8 + (3 if i % 2 else 6)}>Jan 0{i + 1} 01:02:0{i} host{i} app[{i}]: msg {i}"
            for i in range(4)
        ]
        for chunk in (lines[:2], lines[2:]):  # two connections → two files
            with socket.create_connection(("127.0.0.1", listener.port)) as s:
                s.sendall(("\n".join(chunk) + "\n").encode())
        import time

        for _ in range(50):  # wait for both landed files
            if len([f for f in os.listdir(landing) if not f.startswith(".")]) >= 2:
                break
            time.sleep(0.1)
        sdf = (
            spark.readStream.format("text")
            .schema("value string")
            .load(landing)
        )
        cp = str(tmp_path / "cp")
        q = (
            sdf.writeStream.format("memory")
            .queryName("tcp_syslog")
            .option("checkpointLocation", cp)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
        parsed = parse_syslog(spark.table("tcp_syslog"), "value").collect()
        assert len(parsed) == 4
        by_pid = {r["pid"]: r for r in parsed}
        assert by_pid[2]["severity"] == 6 and by_pid[1]["severity"] == 3
        assert by_pid[3]["message"] == "msg 3" and by_pid[0]["host"] == "host0"
    finally:
        listener.stop()


def test_udp_listener_lands_datagrams_e2e(spark, tmp_path):
    """ListenUDP e2e: datagrams → batched landing files → streaming drain.

    batch_size=3 over 7 datagrams → two full batch files + one flushed
    partial, all drained exactly-once by the file source."""
    import socket
    import time

    from apache_nifi_spark.streaming import UdpLandingListener

    landing = str(tmp_path / "udp_landing")
    listener = UdpLandingListener(landing, batch_size=3)
    try:
        sock = socket.socket(socket.AF_INET, socket.SOCK_DGRAM)
        msgs = [f"dgram-{i}|value={i * 10}" for i in range(7)]
        for m in msgs:
            sock.sendto(m.encode(), ("127.0.0.1", listener.port))
        for _ in range(50):  # two full batches land async
            if len([f for f in os.listdir(landing) if not f.startswith(".")]) >= 2:
                break
            time.sleep(0.1)
    finally:
        listener.stop()  # flushes the partial third batch
    files = [f for f in os.listdir(landing) if not f.startswith(".")]
    assert len(files) == 3

    sdf = spark.readStream.format("text").schema("value string").load(landing)
    cp = str(tmp_path / "udp_cp")
    q = (
        sdf.writeStream.format("memory")
        .queryName("udp_drain")
        .option("checkpointLocation", cp)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    got = sorted(r.value for r in spark.table("udp_drain").collect())
    assert got == sorted(msgs)


def test_put_tcp_udp_socket_delivery(spark, tmp_path):
    """PutTCP/PutUDP against the landing listeners: every record arrives
    byte-identical; a dead endpoint yields sent=false rows, not task
    death; UDP delivers one datagram per record."""
    import glob
    import time

    from apache_nifi_spark.sinks import put_tcp, put_udp
    from apache_nifi_spark.streaming.listen import TcpLandingListener, UdpLandingListener

    df = spark.createDataFrame(
        [(i, f"rec-{i}") for i in range(20)], "id long, content string"
    ).repartition(3)

    tcp_dir = str(tmp_path / "tcp")
    tl = TcpLandingListener(tcp_dir)
    out = put_tcp(df, "127.0.0.1", tl.port, "content").collect()
    assert all(r["sent"] for r in out)

    def landed_lines(d):
        return sorted(
            ln.decode()
            for p in glob.glob(f"{d}/*")
            for ln in open(p, "rb").read().splitlines()
            if ln.strip()
        )

    deadline = time.monotonic() + 10
    while time.monotonic() < deadline and len(landed_lines(tcp_dir)) < 20:
        time.sleep(0.05)
    assert landed_lines(tcp_dir) == sorted(f"rec-{i}" for i in range(20))

    udp_dir = str(tmp_path / "udp")
    ul = UdpLandingListener(udp_dir, batch_size=1)
    out = put_udp(df, "127.0.0.1", ul.port, "content").collect()
    assert all(r["sent"] for r in out)
    deadline = time.monotonic() + 10
    while time.monotonic() < deadline and len(landed_lines(udp_dir)) < 20:
        time.sleep(0.05)
    assert landed_lines(udp_dir) == sorted(f"rec-{i}" for i in range(20))

    # dead endpoint: routed, not raised
    dead = put_tcp(df, "127.0.0.1", 1, "content").collect()  # port 1: refused
    assert all(not r["sent"] for r in dead)


def test_distribute_load_weighted_cycle(spark):
    from apache_nifi_spark.operators import distribute_load, duplicate_flowfile

    df = spark.range(10).withColumnRenamed("id", "k")
    out = distribute_load(df, {"a": 2, "b": 1}, "k").orderBy("k").collect()
    # cycle of 3: slots 0,1 -> a; 2 -> b
    assert [r["relationship"] for r in out] == ["a", "a", "b"] * 3 + ["a"]
    import pytest as _p

    with _p.raises(ValueError):
        distribute_load(df, {"a": 0}, "k")

    dup = duplicate_flowfile(df.limit(2), 3).collect()
    assert len(dup) == 8  # 2 rows x (1 original + 3 copies)
    assert sorted({r["copy_index"] for r in dup}) == [0, 1, 2, 3]


def test_map_cache_protocol_ops():
    """Wire-level invariants of the DataStream-framed cache protocol:
    put/get/containsKey/remove/keySet round-trip, misses signal cleanly,
    and a wrong protocol version is refused at handshake."""
    import socket
    import struct

    from apache_nifi_spark.streaming.map_cache import MapCacheClient, MapCacheServer

    srv = MapCacheServer()
    try:
        c = MapCacheClient("127.0.0.1", srv.port)
        assert c.get(b"missing") is None
        c.put(b"k1", b"v1")
        c.put(b"k2", b"x" * 70000)  # > 64 KiB value: 4-byte length framing
        assert c.get(b"k1") == b"v1"
        assert c.get(b"k2") == b"x" * 70000
        assert c.contains_key(b"k1") and not c.contains_key(b"zz")
        assert c.key_set() == [b"k1", b"k2"]
        assert c.remove(b"k1") and not c.remove(b"k1")
        assert c.get(b"k1") is None
        c.close()

        # a second client sees the first's state (shared tier)
        c2 = MapCacheClient("127.0.0.1", srv.port)
        assert c2.get(b"k2") == b"x" * 70000
        c2.close()

        # version handshake rejection
        s = socket.create_connection(("127.0.0.1", srv.port), timeout=5)
        s.sendall(struct.pack(">I", 99))
        assert s.recv(1) == b"\x00"
        s.close()
    finally:
        srv.stop()


def test_octet_counted_framing_carries_embedded_newlines(spark):
    """RFC 6587 octet-counting must deliver messages containing raw
    newlines intact (escaped in the landing file), which the newline
    framing cannot do."""
    import glob
    import tempfile
    import time

    from apache_nifi_spark.sinks import put_tcp_octet_counted
    from apache_nifi_spark.streaming.listen import TcpLandingListener

    landing = tempfile.mkdtemp(prefix="octet_test_")
    lst = TcpLandingListener(landing, framing="octet")
    try:
        df = spark.createDataFrame(
            [("one line",), ("two\nlines",), ("",)], "content string"
        ).coalesce(1)
        sent = put_tcp_octet_counted(df, "127.0.0.1", lst.port, "content")
        assert sent.filter("sent").count() == 3
        deadline = time.monotonic() + 10
        body = b""
        while time.monotonic() < deadline:
            files = glob.glob(f"{landing}/*")
            if files:
                body = b"".join(open(p, "rb").read() for p in sorted(files))
                if body.count(b"\n") >= 2:
                    break
            time.sleep(0.05)
        lines = [ln for ln in body.split(b"\n") if ln != b""]
        assert lines == [b"one line", b"two\\nlines"]
    finally:
        lst.stop()


def test_octet_truncated_frame_and_unescape_roundtrip():
    """A final frame whose declared length runs past the received bytes
    must be dropped, not landed partially; and the landing escape must
    be injective (round-trips payloads with backslashes AND newlines)."""
    import glob
    import socket
    import tempfile
    import time

    from apache_nifi_spark.streaming.listen import (
        TcpLandingListener,
        unescape_landed,
    )

    # unescape inverts the escape for adversarial payloads
    for payload in ["a\\nb", "a\nb", "a\\\nb", "\\\\", "\\n\n\\"]:
        escaped = payload.replace("\\", "\\\\").replace("\n", "\\n")
        assert unescape_landed(escaped) == payload, payload

    landing = tempfile.mkdtemp(prefix="octet_trunc_")
    lst = TcpLandingListener(landing, framing="octet")
    try:
        with socket.create_connection(("127.0.0.1", lst.port)) as s:
            # one good frame, then a frame declaring 50 bytes but sending 4
            s.sendall(b"4 good" + b"50 oops")
        deadline = time.monotonic() + 10
        body = b""
        while time.monotonic() < deadline:
            files = glob.glob(f"{landing}/*")
            if files:
                body = b"".join(open(p, "rb").read() for p in sorted(files))
                break
            time.sleep(0.05)
        assert body == b"good\n"  # partial 'oops' frame never landed
    finally:
        lst.stop()


def test_prometheus_endpoint_scrape(spark):
    """The /metrics endpoint serves the rendered exposition with the
    standard content type; label escaping survives a real HTTP scrape."""
    import urllib.request

    from pyspark.sql import functions as F

    from apache_nifi_spark.plans.prometheus import (
        CONTENT_TYPE,
        MetricsEndpoint,
        render_exposition,
    )

    df = spark.createDataFrame(
        [('path "a"\nweird', 3), ("plain", 5)], "proc string, n long"
    )
    expo = render_exposition(
        df, "flow_items_total", "counter", "Items per processor",
        labels={"processor": F.col("proc")}, value=F.col("n").cast("string"),
    )
    ep = MetricsEndpoint()
    try:
        ep.publish(expo)
        with urllib.request.urlopen(ep.url, timeout=5) as resp:
            assert resp.headers["Content-Type"] == CONTENT_TYPE
            body = resp.read().decode()
        lines = body.strip().split("\n")
        assert lines[0] == "# HELP flow_items_total Items per processor"
        assert lines[1] == "# TYPE flow_items_total counter"
        assert 'flow_items_total{processor="plain"} 5' in lines
        assert 'flow_items_total{processor="path \\"a\\"\\nweird"} 3' in lines
        # non-metrics path 404s
        import urllib.error

        try:
            urllib.request.urlopen(ep.url.replace("/metrics", "/other"), timeout=5)
            raise AssertionError("expected 404")
        except urllib.error.HTTPError as e:
            assert e.code == 404
    finally:
        ep.stop()


def test_smtp_dot_transparency_and_envelope(spark):
    """A body line starting with '.' must survive dot-stuffing (smtplib
    stuffs, the server unstuffs) and the envelope must land as
    X-Envelope headers distinct from the message headers."""
    import glob
    import smtplib
    import tempfile
    import time

    from apache_nifi_spark.streaming.smtp import MiniSmtpServer

    landing = tempfile.mkdtemp(prefix="smtp_test_")
    srv = MiniSmtpServer(landing)
    try:
        msg = (
            b"From: header-from@x\r\nSubject: t\r\n\r\n"
            b"line one\r\n"
            b".starts with a dot\r\n"
            b"..two dots\r\n"
        )
        c = smtplib.SMTP("127.0.0.1", srv.port, timeout=5)
        c.sendmail("env-from@x", ["env-to@y"], msg)
        c.quit()
        deadline = time.monotonic() + 5
        files = []
        while time.monotonic() < deadline and not files:
            files = glob.glob(f"{landing}/*.eml")
            time.sleep(0.02)
        body = open(files[0], "rb").read()
        assert body.startswith(b"X-Envelope-From: env-from@x\r\n"
                               b"X-Envelope-To: env-to@y\r\n")
        assert b"\r\n.starts with a dot\r\n" in body
        assert b"\r\n..two dots\r\n" in body
        assert b"...two dots" not in body
    finally:
        srv.stop()


def test_relp_frame_acks_and_newline_escape(spark):
    """Every syslog txnr must be individually ACKed (200), embedded
    newlines survive escaped, and the partial batch flushes on close."""
    import glob
    import tempfile
    import time

    from pyspark.sql import functions as F

    from apache_nifi_spark.streaming.relp import RelpLandingListener, put_relp

    landing = tempfile.mkdtemp(prefix="relp_test_")
    lst = RelpLandingListener(landing, batch_size=100)  # > n: close must flush
    try:
        df = spark.createDataFrame(
            [("plain msg",), ("multi\nline msg",)], "content string"
        ).coalesce(1)
        out = put_relp(df, "127.0.0.1", lst.port, "content")
        assert out.filter("sent").count() == 2  # sent == ACKed, not written
        deadline = time.monotonic() + 10
        body = b""
        while time.monotonic() < deadline:
            files = glob.glob(f"{landing}/*")
            if files:
                body = b"".join(open(p, "rb").read() for p in sorted(files))
                if body.count(b"\n") >= 2:
                    break
            time.sleep(0.05)
        lines = [ln for ln in body.split(b"\n") if ln]
        assert lines == [b"plain msg", b"multi\\nline msg"]
    finally:
        lst.stop()


def test_mini_elastic_bulk_protocol():
    """MiniElasticServer speaks the _bulk contract: per-item results,
    malformed pairs flagged without poisoning the batch, _count and
    _search answer the standard shapes, and every accepted document
    lands durably."""
    import glob
    import json
    import tempfile
    import urllib.request

    from apache_nifi_spark.streaming.elastic_store import MiniElasticServer

    landing = tempfile.mkdtemp(prefix="es_proto_")
    srv = MiniElasticServer(landing)
    try:
        body = "\n".join([
            '{"index":{"_index":"t","_id":"1"}}', '{"k":1}',
            '{"create":{"_index":"t","_id":"2"}}', '{"k":2}',
            "not json", '{"k":3}',
            '{"delete":{"_index":"t","_id":"9"}}',
            '{"index":{"_index":"u"}}', '{"k":4}',
        ])
        req = urllib.request.Request(
            srv.url + "/_bulk", data=body.encode(), method="POST",
            headers={"Content-Type": "application/x-ndjson"},
        )
        with urllib.request.urlopen(req, timeout=10) as r:
            resp = json.load(r)
        assert resp["errors"] is True
        ok = [i for i in resp["items"]
              for v in i.values() if v.get("status") == 201]
        assert len(ok) == 3  # two into t, auto-id into u

        with urllib.request.urlopen(srv.url + "/t/_count", timeout=10) as r:
            assert json.load(r)["count"] == 2
        with urllib.request.urlopen(srv.url + "/t/_search", timeout=10) as r:
            hits = json.load(r)["hits"]
        assert hits["total"]["value"] == 2
        assert {h["_source"]["k"] for h in hits["hits"]} == {1, 2}

        landed = [json.load(open(p)) for p in glob.glob(f"{landing}/*.json")]
        assert {(d["_index"], d["k"]) for d in landed} == {
            ("t", 1), ("t", 2), ("u", 4)
        }
    finally:
        srv.stop()


def test_skip_final_no_data_batch_is_output_neutral(spark, sf_dir):
    """final_no_data_batch=False must not change what an eligible drain
    emits — the trailing empty micro-batch only evicts state for an
    append-mode INNER stream-stream join and for arrival-time dedup —
    and must restore the session conf afterwards (r17)."""
    from apache_nifi_spark.streaming import dedup_within_watermark

    key = "spark.sql.streaming.noDataMicroBatches.enabled"
    before = spark.conf.get(key, "true")

    def join_rows(skip):
        s = stream_events(spark, sf_dir).filter(F.col("event_type") == "signup")
        p = stream_events(spark, sf_dir).filter(F.col("event_type") == "purchase")
        j = correlate_streams(s, p, ["user_id"], "ts", within="24 hours")
        out = run_to_memory(
            j.select("w_event_id", "s_event_id"),
            final_no_data_batch=not skip,
        )
        return sorted(map(tuple, out.collect()))

    assert join_rows(skip=True) == join_rows(skip=False)
    assert spark.conf.get(key, "true") == before

    def dedup_rows(skip):
        sdf = stream_events(spark, sf_dir)
        doubled = sdf.union(stream_events(spark, sf_dir))
        out = run_to_memory(
            dedup_within_watermark(doubled, ["event_id"], "ts", delay="1 hour").select(
                "event_id", "event_type"
            ),
            final_no_data_batch=not skip,
        )
        return sorted(map(tuple, out.collect()))

    assert dedup_rows(skip=True) == dedup_rows(skip=False)
    assert spark.conf.get(key, "true") == before
