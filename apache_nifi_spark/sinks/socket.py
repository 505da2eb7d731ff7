"""PutTCP / PutUDP (SURVEY.md §2.2): per-record socket delivery.

NiFi writes each FlowFile's content to a TCP endpoint (newline-framed)
or as one UDP datagram.  Spark-first shape: ``mapInPandas`` with ONE
socket per PARTITION — connection setup amortizes across the batch,
partitions fan out across executors (the InvokeHTTP/FetchFTP pattern),
and the transform appends a ``sent`` status column instead of failing
the task, so delivery failures route like any other relationship.

The receiving half already exists: ``streaming/listen.TcpLandingListener``
and ``UdpLandingListener`` land payloads durably for the streaming drain
— together they close the loop the registry query proves end-to-end.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame

__all__ = ["put_tcp", "put_udp", "put_tcp_octet_counted"]


def _with_sent(df: DataFrame, run) -> DataFrame:
    from pyspark.sql.types import BooleanType, StructType

    schema = StructType(list(df.schema.fields)).add("sent", BooleanType())
    return df.mapInPandas(run, schema)


def put_tcp(
    df: DataFrame,
    host: str,
    port: int,
    content_col: str = "content",
    timeout: float = 10.0,
    tls_cert: str | None = None,
) -> DataFrame:
    """Newline-framed TCP delivery: one connection per partition, every
    row's content + ``\\n``.  The whole partition's batch ships on one
    stream — the framing NiFi's PutTCP uses with the default delimiter.

    ``tls_cert``: path to a PEM the executor trusts (truststore
    semantics — ONLY this cert, hostname verified); the connection then
    completes a real TLS handshake before any byte ships, mirroring the
    reference's secured listeners (streaming/tls.py).  On a multi-node
    cluster distribute the PEM via ``spark.files``."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import socket
        import ssl

        ctx = None
        if tls_cert is not None:
            ctx = ssl.SSLContext(ssl.PROTOCOL_TLS_CLIENT)
            ctx.load_verify_locations(tls_cert)
        for pdf in batches:
            try:
                s = socket.create_connection((host, port), timeout=timeout)
                s.setsockopt(socket.IPPROTO_TCP, socket.TCP_NODELAY, 1)  # r17
                try:
                    if ctx is not None:
                        # wrap_socket DETACHES the raw socket — the
                        # SSLSocket must be closed explicitly (closing
                        # the detached original is a no-op; relying on
                        # GC leaves the server's EOF-read hanging)
                        s = ctx.wrap_socket(s, server_hostname=host)
                    payload = b"".join(
                        (v if isinstance(v, bytes) else str(v).encode()) + b"\n"
                        for v in pdf[content_col]
                        if v is not None
                    )
                    s.sendall(payload)
                    # no unwrap(): the landing server reads to EOF and
                    # closes without answering close_notify; its
                    # wrap_socket keeps suppress_ragged_eofs, so a plain
                    # close after sendall is the clean shutdown here
                finally:
                    s.close()
                ok = True
            except (OSError, ssl.SSLError):
                ok = False
            pdf["sent"] = [ok and v is not None for v in pdf[content_col]]
            yield pdf

    return _with_sent(df, run)


def put_udp(
    df: DataFrame, host: str, port: int, content_col: str = "content"
) -> DataFrame:
    """One datagram per record (UDP has no framing to share), one socket
    per partition.  Delivery is fire-and-forget — ``sent`` reflects the
    local send() only, exactly UDP's contract."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import socket

        sock = socket.socket(socket.AF_INET, socket.SOCK_DGRAM)
        try:
            for pdf in batches:
                sent = []
                for v in pdf[content_col]:
                    if v is None:
                        sent.append(False)
                        continue
                    try:
                        sock.sendto(
                            v if isinstance(v, bytes) else str(v).encode(),
                            (host, port),
                        )
                        sent.append(True)
                    except OSError:
                        sent.append(False)
                pdf["sent"] = sent
                yield pdf
        finally:
            sock.close()

    return _with_sent(df, run)


def put_tcp_octet_counted(
    df: DataFrame,
    host: str,
    port: int,
    content_col: str = "content",
    timeout: float = 10.0,
) -> DataFrame:
    """Syslog-over-TCP octet-counting transport (RFC 6587 §3.4.1): each
    record ships as ``"<len> <msg>"`` on one connection per partition —
    the framing that lets messages carry embedded newlines, which
    non-transparent (newline) framing cannot."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import socket

        for pdf in batches:
            try:
                with socket.create_connection((host, port), timeout=timeout) as s:
                    s.setsockopt(
                        socket.IPPROTO_TCP, socket.TCP_NODELAY, 1
                    )  # r17
                    frames = []
                    sent = []
                    for v in pdf[content_col]:
                        if v is None:
                            sent.append(False)
                            continue
                        b = v if isinstance(v, bytes) else str(v).encode()
                        frames.append(str(len(b)).encode() + b" " + b)
                        sent.append(True)
                    s.sendall(b"".join(frames))
                ok = True
            except OSError:
                ok = False
                sent = [False] * len(pdf)
            pdf["sent"] = [a and ok for a in sent]
            yield pdf

    return _with_sent(df, run)
