"""Wire-format renderers for document-store / notification sinks.

NiFi 2.7.2 surface [SURVEY.md §2.2]: ``PutElasticsearchRecord`` encodes a
record set as an Elasticsearch ``_bulk`` NDJSON body, ``PutMongoRecord``
as BSON documents (Extended JSON here — the lossless text form),
``PutEmail`` as an RFC 5322 message, ``PutSlack`` as a
``chat.postMessage`` JSON payload.  In every case the *encoding* is the
record-level work; delivery is a commodity client call.

Everything below is built from explicit ``concat``/``replace`` column
expressions — NOT ``to_json`` — for two reasons:

- **Determinism / oracle parity.** Key order, spacing, and numeric
  formatting are pinned by construction, so a DuckDB oracle can produce
  byte-identical payloads and the whole render is value-checked.
- **Scale.** Pure string expressions stay inside whole-stage codegen; a
  100 TB render is a map-only stage with zero shuffle and zero Python.

Numeric fields go through an explicit ``decimal(p,s)`` cast before
stringification: decimal→string renders identically across engines,
where double→string shortest-round-trip formatting does not (exponent
thresholds differ).  Callers declare each field's scale — the same
contract a RecordSetWriter schema carries in NiFi.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

__all__ = [
    "json_escape",
    "json_string",
    "json_number",
    "es_bulk",
    "mongo_extended_json",
    "email_mime",
    "slack_post_payload",
    "splunk_hec_payload",
]


def json_escape(c: Column) -> Column:
    """Escape a string for a JSON string context.

    Backslash first (so later escapes aren't double-escaped), then the
    quote and the whitespace control characters; any REMAINING C0
    control is stripped (ADVICE r4 #5 — a stray control byte previously
    passed through and produced invalid JSON).  Stripping, not \\u
    escaping: these bytes are noise in text columns, and the strip keeps
    the renderer a pure column expression.
    """
    c = F.replace(c, F.lit("\\"), F.lit("\\\\"))
    c = F.replace(c, F.lit('"'), F.lit('\\"'))
    c = F.replace(c, F.lit("\n"), F.lit("\\n"))
    c = F.replace(c, F.lit("\r"), F.lit("\\r"))
    c = F.replace(c, F.lit("\t"), F.lit("\\t"))
    c = F.regexp_replace(c, "[\\x00-\\x08\\x0b\\x0c\\x0e-\\x1f]", "")
    return c


def json_string(c: Column) -> Column:
    """``"escaped"`` — a JSON string literal, NULL-propagating."""
    return F.concat(F.lit('"'), json_escape(c), F.lit('"'))


def json_number(c: Column, scale: int | None = None) -> Column:
    """Engine-portable JSON number rendering.

    ``scale=None`` → integer field (cast bigint); otherwise fixed-point
    ``decimal(27,scale)`` — both render identically in Spark and DuckDB,
    unlike raw double→string.
    """
    if scale is None:
        return c.cast("bigint").cast("string")
    return c.cast(f"decimal(27,{scale})").cast("string")


def _json_object(pairs: list[tuple[str, Column]]) -> Column:
    parts: list[Column] = [F.lit("{")]
    for i, (k, v) in enumerate(pairs):
        if i:
            parts.append(F.lit(","))
        parts.append(F.lit(f'"{k}":'))
        parts.append(v)
    parts.append(F.lit("}"))
    return F.concat(*parts)


def es_bulk(
    index: str,
    id_col: Column,
    fields: list[tuple[str, Column]],
) -> Column:
    """One ``_bulk`` entry per record: the action-and-metadata line plus
    the source line, newline-separated (the exact bytes POSTed to
    ``/_bulk``; the request body is these entries concatenated + final
    newline).

    ``fields`` are (name, rendered-value-column) pairs — pre-render with
    :func:`json_string` / :func:`json_number` so the source line is
    byte-deterministic.
    """
    action = F.concat(
        F.lit('{"index":{"_index":"' + index + '","_id":"'),
        id_col.cast("string"),
        F.lit('"}}'),
    )
    return F.concat(action, F.lit("\n"), _json_object(fields))


def mongo_extended_json(
    id_col: Column,
    fields: list[tuple[str, str, Column, int | None]],
) -> Column:
    """Canonical MongoDB Extended JSON v2 document per record.

    ``fields``: (name, bson_type, column, scale) with bson_type one of
    ``long`` (→ ``{"$numberLong":"…"}``), ``double``
    (→ ``{"$numberDouble":"…"}``, fixed-point via ``scale``), ``string``,
    ``date`` (→ ``{"$date":{"$numberLong":"<epoch-ms>"}}``).  Canonical
    mode is the lossless BSON text form (MongoDB Extended JSON spec);
    relaxed mode is a trivial unwrapping of the same columns.
    """
    rendered: list[tuple[str, Column]] = [
        ("_id", F.concat(F.lit('{"$numberLong":"'), id_col.cast("bigint").cast("string"), F.lit('"}')))
    ]
    for name, btype, col, scale in fields:
        if btype == "long":
            v = F.concat(F.lit('{"$numberLong":"'), col.cast("bigint").cast("string"), F.lit('"}'))
        elif btype == "double":
            v = F.concat(
                F.lit('{"$numberDouble":"'),
                json_number(col, 6 if scale is None else scale),
                F.lit('"}'),
            )
        elif btype == "string":
            v = json_string(col)
        elif btype == "date":
            ms = (col.cast("timestamp").cast("double") * 1000).cast("bigint")
            v = F.concat(F.lit('{"$date":{"$numberLong":"'), ms.cast("string"), F.lit('"}}'))
        else:
            raise ValueError(f"unsupported bson type {btype!r}")
        rendered.append((name, v))
    return _json_object(rendered)


def email_mime(
    from_addr: str,
    to_col: Column,
    subject_col: Column,
    date_col: Column,
    body_col: Column,
) -> Column:
    """RFC 5322 message: fixed header block + base64
    content-transfer-encoded UTF-8 body (what PutEmail hands the SMTP
    client).  ``date_col`` is a timestamp column rendered as an RFC 5322
    date (UTC, English day/month names — both engines' formatters agree).

    Spark's ``base64`` emits MIME 76-char chunked lines (CRLF-joined),
    which is exactly the RFC 2045 form a mail body wants.
    """
    date_hdr = F.date_format(date_col.cast("timestamp"), "EEE, d MMM yyyy HH:mm:ss +0000")
    return F.concat(
        F.lit(f"From: {from_addr}\r\nTo: "),
        to_col,
        F.lit("\r\nSubject: "),
        subject_col,
        F.lit("\r\nDate: "),
        date_hdr,
        F.lit(
            "\r\nMIME-Version: 1.0"
            "\r\nContent-Type: text/plain; charset=utf-8"
            "\r\nContent-Transfer-Encoding: base64"
            "\r\n\r\n"
        ),
        F.base64(body_col.cast("binary")),
        F.lit("\r\n"),
    )


def slack_post_payload(
    channel: str,
    text_col: Column,
    context_col: Column | None = None,
) -> Column:
    """``chat.postMessage`` JSON body: channel + mrkdwn section block
    (+ optional context block) — the Slack Block Kit shape PutSlack posts.
    """
    blocks = [
        F.lit('[{"type":"section","text":{"type":"mrkdwn","text":'),
        json_string(text_col),
        F.lit("}}"),
    ]
    if context_col is not None:
        blocks += [
            F.lit(',{"type":"context","elements":[{"type":"plain_text","text":'),
            json_string(context_col),
            F.lit("}]}"),
        ]
    blocks.append(F.lit("]"))
    return _json_object(
        [
            ("channel", F.lit(f'"{channel}"')),
            ("text", json_string(text_col)),
            ("blocks", F.concat(*blocks)),
        ]
    )


def splunk_hec_payload(
    time_col: Column,
    host_col: Column,
    source: str,
    sourcetype: str,
    event_fields: list[tuple[str, Column]],
    index: str | None = None,
) -> Column:
    """Splunk HTTP Event Collector envelope (PutSplunkHTTP): the
    ``/services/collector/event`` JSON body — epoch time with millisecond
    precision, host/source/sourcetype routing metadata, and the event as
    a nested JSON object.  Same byte-exact columnar rendering contract
    as the other wire sinks; POST = ``operators/http``.
    """
    # epoch.millis as a fixed-point decimal string (Splunk accepts
    # fractional epoch).  Millis are TRUNCATED from micros (floor), not
    # rounded — DuckDB's epoch_ms truncates, and a direct
    # timestamp→decimal(.,3) cast in Spark rounds HALF_UP, which
    # diverged on ~half the rows; the exact-decimal division renders
    # identically in both engines.
    ms = F.floor(F.unix_micros(time_col.cast("timestamp")) / 1000)
    t = (ms.cast("decimal(20,0)") / 1000).cast("decimal(20,3)").cast("string")
    fields: list[tuple[str, Column]] = [
        ("time", t),
        ("host", json_string(host_col)),
        ("source", F.lit(f'"{source}"')),
        ("sourcetype", F.lit(f'"{sourcetype}"')),
    ]
    if index is not None:
        fields.append(("index", F.lit(f'"{index}"')))
    fields.append(("event", _json_object(event_fields)))
    return _json_object(fields)
