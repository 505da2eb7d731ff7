"""Confluent-style schema registry + wire format (the NiFi
``ConfluentSchemaRegistry`` controller service and the
Confluent-encoded record reader/writer path; reference ships stock
NiFi 2.7.2 [2.7.2-surface]).

Everything from the PUBLIC formats:

- **wire format**: one magic byte ``0x00`` + int32 BE schema id + the
  Avro binary body — the framing every Confluent-encoded Kafka topic
  uses.
- **registry REST subset** (the documented Confluent API):
  ``POST /subjects/{subject}/versions`` registers a schema (idempotent
  by Avro canonical form, returns ``{"id": n}``),
  ``GET /schemas/ids/{id}`` returns ``{"schema": "<json>"}``,
  ``GET /subjects/{subject}/versions/latest`` returns id + schema.

Spark-first shape: registration is one driver-side control-plane HTTP
call; encoding is Arrow-batched ``mapInPandas`` with the compiled
encoder closure (zero per-row Python dispatch into the schema walk);
decoding fetches the WRITER schema by each frame's embedded id over
HTTP once per executor (cached), resolves it against the reader schema
with the full Avro schema-resolution rules
(``avro_codec.resolve_decoder``), so old-schema frames decode under the
evolved subject exactly as the spec prescribes.
"""

from __future__ import annotations

import http.client
import io as _io
import json
import socket
import struct
import threading
from collections.abc import Iterator
from typing import Any

from pyspark.sql import DataFrame

from apache_nifi_spark.sources.avro_codec import (
    _compile_encoder,
    _pdf_rows,
    _Reader,
    avro_to_spark_schema,
    canonical_form,
    resolve_decoder,
    spark_to_avro_schema,
)

__all__ = [
    "MiniSchemaRegistry",
    "register_schema",
    "encode_confluent",
    "decode_confluent",
]

_MAGIC = 0


class MiniSchemaRegistry:
    """In-process schema registry speaking the public REST subset over
    real HTTP (ThreadingHTTPServer) — swap the URL for a real Confluent
    deployment; the protocol seam is this module."""

    def __init__(self, host: str = "127.0.0.1", port: int = 0):
        import http.server

        self._lock = threading.Lock()
        self._by_canonical: dict[str, int] = {}
        self._by_id: dict[int, str] = {}
        self._subjects: dict[str, list[int]] = {}
        reg = self

        class Handler(http.server.BaseHTTPRequestHandler):
            # keep-alive (see streaming/listen.py): every response goes
            # through _json, which always sends Content-Length (r17)
            protocol_version = "HTTP/1.1"
            disable_nagle_algorithm = True

            def _json(self, code: int, obj: Any) -> None:
                body = json.dumps(obj).encode()
                self.send_response(code)
                self.send_header("Content-Type",
                                 "application/vnd.schemaregistry.v1+json")
                self.send_header("Content-Length", str(len(body)))
                self.end_headers()
                self.wfile.write(body)

            def do_POST(self) -> None:
                parts = self.path.strip("/").split("/")
                if (
                    len(parts) == 3
                    and parts[0] == "subjects"
                    and parts[2] == "versions"
                ):
                    n = int(self.headers.get("Content-Length", "0"))
                    payload = json.loads(self.rfile.read(n) or b"{}")
                    schema = json.loads(payload["schema"])
                    sid = reg._register(parts[1], schema)
                    self._json(200, {"id": sid})
                else:
                    self._json(404, {"error_code": 40401,
                                     "message": "not found"})

            def do_GET(self) -> None:
                parts = self.path.strip("/").split("/")
                with reg._lock:
                    if (
                        len(parts) == 3
                        and parts[:2] == ["schemas", "ids"]
                        and int(parts[2]) in reg._by_id
                    ):
                        self._json(200, {"schema": reg._by_id[int(parts[2])]})
                        return
                    if (
                        len(parts) == 4
                        and parts[0] == "subjects"
                        and parts[2] == "versions"
                        and parts[3] == "latest"
                        and reg._subjects.get(parts[1])
                    ):
                        sid = reg._subjects[parts[1]][-1]
                        self._json(200, {
                            "subject": parts[1],
                            "version": len(reg._subjects[parts[1]]),
                            "id": sid,
                            "schema": reg._by_id[sid],
                        })
                        return
                self._json(404, {"error_code": 40401, "message": "not found"})

            def log_message(self, *a: Any) -> None:
                pass

        import http.server as _hs

        self._httpd = _hs.ThreadingHTTPServer((host, port), Handler)
        self._thread = threading.Thread(
            target=self._httpd.serve_forever, daemon=True
        )
        self._thread.start()

    def _register(self, subject: str, schema: Any) -> int:
        canon = canonical_form(schema)
        with self._lock:
            sid = self._by_canonical.get(canon)
            if sid is None:
                sid = len(self._by_id) + 1
                self._by_canonical[canon] = sid
                self._by_id[sid] = json.dumps(schema)
            versions = self._subjects.setdefault(subject, [])
            if sid not in versions:
                versions.append(sid)
            return sid

    @property
    def url(self) -> str:
        host, port = self._httpd.server_address[:2]
        return f"http://{host}:{port}"

    def stop(self) -> None:
        self._httpd.shutdown()
        self._httpd.server_close()


def _http_json(url: str, path: str, payload: Any | None = None) -> Any:
    from urllib.parse import urlsplit

    u = urlsplit(url)
    conn = http.client.HTTPConnection(u.hostname, u.port or 80, timeout=10)
    try:
        if payload is None:
            conn.request("GET", path)
        else:
            body = json.dumps(payload).encode()
            conn.request(
                "POST", path, body,
                {"Content-Type": "application/vnd.schemaregistry.v1+json"},
            )
        resp = conn.getresponse()
        data = json.loads(resp.read())
        if resp.status != 200:
            raise ConnectionError(f"registry {path}: {data}")
        return data
    finally:
        conn.close()


def register_schema(url: str, subject: str, schema: Any) -> int:
    """POST the schema under ``subject``; returns the registry id
    (idempotent — re-registering the same canonical form returns the
    existing id, per the Confluent contract)."""
    return _http_json(
        url, f"/subjects/{subject}/versions", {"schema": json.dumps(schema)}
    )["id"]


def encode_confluent(
    df: DataFrame,
    registry_url: str,
    subject: str,
    id_col: str,
) -> DataFrame:
    """Encode every row as a Confluent-framed Avro message: the row's
    schema (minus ``id_col``) registers ONCE driver-side (control-plane
    HTTP), executors write ``0x00 + int32 id + avro binary`` per row.
    Returns (id_col, content binary)."""
    import pandas as pd

    value_schema = df.drop(id_col).schema
    avro_schema = spark_to_avro_schema(value_schema)
    sid = register_schema(registry_url, subject, avro_schema)
    header = struct.pack(">bI", _MAGIC, sid)
    field_names = [f.name for f in value_schema.fields]

    def encode(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        enc = _compile_encoder(avro_schema)
        for pdf in batches:
            frames = []
            for row in _pdf_rows(pdf[field_names], value_schema):
                buf = _io.BytesIO()
                buf.write(header)
                enc(buf, row)
                frames.append(buf.getvalue())
            yield pd.DataFrame({id_col: pdf[id_col], "content": frames})

    return df.mapInPandas(encode, f"{id_col} long, content binary")


def decode_confluent(
    df: DataFrame,
    registry_url: str,
    subject: str,
    id_col: str,
    content_col: str = "content",
) -> DataFrame:
    """Decode Confluent-framed Avro messages under the subject's LATEST
    schema (the reader), resolving each frame's embedded WRITER id
    through the registry with full Avro schema resolution — evolved
    subjects decode old frames exactly as the spec prescribes.  The
    writer-schema fetch is one HTTP GET per (executor, schema id),
    cached."""
    import pandas as pd

    latest = _http_json(
        registry_url, f"/subjects/{subject}/versions/latest"
    )
    reader_schema = json.loads(latest["schema"])
    reader_sid = latest["id"]
    spark_type, _ = avro_to_spark_schema(reader_schema)
    out_fields = ", ".join(
        f"{f.name} {f.dataType.simpleString()}" for f in spark_type.fields
    )

    def decode(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        decoders: dict[int, Any] = {}
        for pdf in batches:
            rows = []
            ids = []
            for rid, blob in zip(pdf[id_col], pdf[content_col]):
                data = bytes(blob)
                if not data or data[0] != _MAGIC:
                    raise ValueError("bad Confluent magic byte")
                (sid,) = struct.unpack(">I", data[1:5])
                dec = decoders.get(sid)
                if dec is None:
                    if sid == reader_sid:
                        writer = reader_schema
                    else:
                        writer = json.loads(
                            _http_json(
                                registry_url, f"/schemas/ids/{sid}"
                            )["schema"]
                        )
                    dec = resolve_decoder(writer, reader_schema)
                    decoders[sid] = dec
                r = _Reader(data[5:])
                rows.append(dec(r))
                ids.append(rid)
            cols = {id_col: ids}
            for i, f in enumerate(spark_type.fields):
                cols[f.name] = [row[i] for row in rows]
            yield pd.DataFrame(cols)

    return df.mapInPandas(decode, f"{id_col} long, {out_fields}")
