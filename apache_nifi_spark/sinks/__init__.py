"""Record-oriented sink payload renderers (SURVEY.md §2.2).

NiFi's document-store and notification sinks (PutElasticsearchRecord,
PutMongoRecord, PutEmail, PutSlack) pair a RecordReader with a
service-specific wire encoding; the encoding is the data-path work, the
socket is commodity I/O.  Here the encodings are pure columnar
expressions (`sinks.wire`) producing the exact bytes the service would
receive — distributed render, then any sink (`df.write`, foreachBatch →
HTTP/SMTP client) ships them.
"""

from apache_nifi_spark.sinks.socket import (  # noqa: F401
    put_tcp,
    put_tcp_octet_counted,
    put_udp,
)
from apache_nifi_spark.sinks.wire import (
    email_mime,
    es_bulk,
    json_escape,
    json_number,
    json_string,
    mongo_extended_json,
    slack_post_payload,
    splunk_hec_payload,
)

__all__ = [
    "json_escape",
    "json_string",
    "json_number",
    "es_bulk",
    "mongo_extended_json",
    "email_mime",
    "slack_post_payload",
]
