"""Site-to-site WIRE protocol: peer list + two-phase transactions on TLS.

The reference deployment exchanges FlowFiles between two clusters with
NiFi's site-to-site protocol on TLS port 10000
(/root/reference/scripts.sh:72-98; SURVEY.md §3.3).  The shared-bus
mapping (``site_to_site.py``) carries the SEMANTICS (lossless hand-off,
independent checkpoints); this module carries the TRANSPORT — a real
socket protocol modeled on the public NiFi raw site-to-site exchange:

- **magic + version negotiation**: the client opens with ``NiFi`` magic
  and its protocol version; the server answers RESOLUTION_OK or counters
  with the highest version it speaks (the client may retry lower).
- **peer list**: clients ask the bootstrap peer for the cluster's peer
  set ``(host, port, secure, flowFileCount)`` and pick the
  least-loaded peer — NiFi's site-to-site load-balancing contract.
- **two-phase transaction** (the part that makes the hop exactly-once
  in effect): the sender streams FlowFiles (attributes + content,
  length-framed), then the RECEIVER announces the CRC-32 of everything
  it read (CONFIRM_TRANSACTION); the sender compares against its own
  running CRC and either confirms — the receiver then atomically
  commits the staged batch and answers TRANSACTION_FINISHED — or
  replies BAD_CHECKSUM, which discards the stage (nothing lands) so the
  sender can redeliver.  Commit is a single ``os.rename``, so a crash
  anywhere before TRANSACTION_FINISHED leaves no partial batch.

Spark-first shape: the sender is a per-partition ``mapInPandas`` client
(one TLS connection + ONE transaction per partition — connection and
confirmation cost amortize across the batch; partitions fan out across
executors, exactly how a 1000-executor cluster would feed a peer
cluster's input ports in parallel).  Landed transactions are JSON-lines
files — splittable input for the receiving cluster's distributed scan.
"""

from __future__ import annotations

import json
import os
import socket
import ssl
import struct
import threading
import uuid
import zlib

__all__ = ["SiteToSiteServer", "s2s_peers", "s2s_send", "PROTOCOL_VERSION"]

_MAGIC = b"NiFi"
PROTOCOL_VERSION = 1

# request codes
_REQ_PEER_LIST = 0x01
_REQ_SEND_FLOWFILES = 0x02
# response / phase codes (two-phase confirm)
_RESOLUTION_OK = 0x01
_DIFFERENT_VERSION = 0x02
_MORE_DATA = 0x01
_END_OF_DATA = 0x00
_CONFIRM_TRANSACTION = 0x12
_TRANSACTION_FINISHED = 0x13
_TRANSACTION_CANCELED = 0x15
_BAD_CHECKSUM = 0x19


def _write_utf(f, s: str) -> bytes:
    b = s.encode("utf-8")
    data = struct.pack(">H", len(b)) + b
    f.write(data)
    return data


def _read_exact(f, n: int) -> bytes:
    buf = b""
    while len(buf) < n:
        chunk = f.read(n - len(buf))
        if not chunk:
            raise ConnectionError("short read")
        buf += chunk
    return buf


def _read_utf(f) -> tuple[str, bytes]:
    raw = _read_exact(f, 2)
    (n,) = struct.unpack(">H", raw)
    body = _read_exact(f, n)
    return body.decode("utf-8"), raw + body


class _ChunkReader:
    """Buffered transaction reader: pulls 64 KiB network chunks, CRCs
    each chunk once, and serves field-sized slices from the buffer —
    O(chunks) CRC/syscall cost instead of O(fields)."""

    __slots__ = ("f", "buf", "pos", "crc")

    def __init__(self, f):
        self.f = f
        self.buf = b""
        self.pos = 0
        self.crc = 0

    def take(self, n: int) -> bytes:
        while len(self.buf) - self.pos < n:
            chunk = self.f.read1(1 << 16)
            if not chunk:
                raise ConnectionError("short read in transaction")
            self.crc = zlib.crc32(chunk, self.crc)
            self.buf = (self.buf[self.pos:] if self.pos else self.buf) + chunk
            self.pos = 0
        out = self.buf[self.pos : self.pos + n]
        self.pos += n
        return out

    def remaining(self) -> int:
        return len(self.buf) - self.pos


class SiteToSiteServer:
    """The peer cluster's input-port endpoint (TLS 'port 10000' analog).

    Committed transactions land as JSON-lines files (one object per
    FlowFile: ``{"attributes": {...}, "content": "..."}``) under
    ``landing_dir`` — the receiving flow's distributed source.
    """

    def __init__(
        self,
        landing_dir: str,
        cert_path: str,
        key_path: str,
        host: str = "127.0.0.1",
        port: int = 0,
        peers: list[tuple[str, int]] | None = None,
    ):
        from apache_nifi_spark.streaming.tls import server_context

        self.landing_dir = landing_dir
        os.makedirs(landing_dir, exist_ok=True)
        self._ctx = server_context(cert_path, key_path)
        self._extra_peers = list(peers or [])
        self._committed = 0
        self._aborted = 0
        self._lock = threading.Lock()
        self._stop = threading.Event()
        self._srv = socket.socket(socket.AF_INET, socket.SOCK_STREAM)
        self._srv.setsockopt(socket.SOL_SOCKET, socket.SO_REUSEADDR, 1)
        self._srv.bind((host, port))
        self._srv.listen(128)
        self._srv.settimeout(0.2)
        self._thread = threading.Thread(target=self._accept_loop, daemon=True)
        self._thread.start()

    @property
    def port(self) -> int:
        return self._srv.getsockname()[1]

    @property
    def stats(self) -> tuple[int, int]:
        """(committed transactions, aborted transactions)."""
        with self._lock:
            return self._committed, self._aborted

    def _accept_loop(self) -> None:
        while not self._stop.is_set():
            try:
                conn, _ = self._srv.accept()
            except socket.timeout:
                continue
            except OSError:
                break
            threading.Thread(target=self._serve, args=(conn,), daemon=True).start()

    def _serve(self, raw: socket.socket) -> None:
        # two-phase transactions are small alternating writes; Nagle +
        # delayed ACK would stall each phase (see streaming/listen.py;
        # r17)
        raw.setsockopt(socket.IPPROTO_TCP, socket.TCP_NODELAY, 1)
        try:
            conn = self._ctx.wrap_socket(raw, server_side=True)
        except (ssl.SSLError, OSError):
            raw.close()
            return
        f = conn.makefile("rwb")
        try:
            if _read_exact(f, 4) != _MAGIC:
                return
            (version,) = struct.unpack(">H", _read_exact(f, 2))
            if version != PROTOCOL_VERSION:
                f.write(bytes([_DIFFERENT_VERSION]))
                f.write(struct.pack(">H", PROTOCOL_VERSION))
                f.flush()
                return
            f.write(bytes([_RESOLUTION_OK]))
            f.flush()
            (req,) = _read_exact(f, 1)
            if req == _REQ_PEER_LIST:
                self._answer_peer_list(f)
            elif req == _REQ_SEND_FLOWFILES:
                self._receive_transaction(f)
        except (ConnectionError, ValueError, OSError, ssl.SSLError):
            pass
        finally:
            try:
                f.close()
            except OSError:
                pass
            conn.close()

    def _answer_peer_list(self, f) -> None:
        """Self + configured peers, each with its queued-FlowFile count
        (clients send to the least-loaded peer — NiFi's S2S balancing)."""
        host, port = self._srv.getsockname()[:2]
        own_count = len(os.listdir(self.landing_dir))
        peers = [(host, port, own_count)] + [
            (h, p, 0) for (h, p) in self._extra_peers
        ]
        f.write(struct.pack(">I", len(peers)))
        for h, p, n in peers:
            _write_utf(f, h)
            f.write(struct.pack(">H", p))
            f.write(bytes([1]))  # secure=true: this endpoint IS TLS
            f.write(struct.pack(">I", n))
        f.flush()

    def _receive_transaction(self, f) -> None:
        port_name, _ = _read_utf(f)
        # Chunked parse: CRC-32 is computed per NETWORK chunk, not per
        # field (the sender is silent between END_OF_DATA and our
        # confirmation, so every byte that arrives during the streaming
        # phase is part of the checksummed transaction).
        reader = _ChunkReader(f)
        records: list[bytes] = []
        while True:
            marker = reader.take(1)[0]
            if marker == _END_OF_DATA:
                break
            if marker != _MORE_DATA:
                raise ValueError(f"bad frame marker {marker:#x}")
            (n_attrs,) = struct.unpack(">I", reader.take(4))
            attrs: dict[str, str] = {}
            for _ in range(n_attrs):
                (klen,) = struct.unpack(">H", reader.take(2))
                k = reader.take(klen).decode("utf-8")
                (vlen,) = struct.unpack(">H", reader.take(2))
                attrs[k] = reader.take(vlen).decode("utf-8")
            (clen,) = struct.unpack(">Q", reader.take(8))
            content = reader.take(clen)
            records.append(
                json.dumps(
                    {"attributes": attrs, "content": content.decode("utf-8")},
                    sort_keys=True,
                ).encode("utf-8")
            )
        if reader.remaining():
            raise ValueError("bytes after END_OF_DATA inside transaction")
        crc = reader.crc
        # phase 1: receiver announces its checksum of everything read
        f.write(bytes([_CONFIRM_TRANSACTION]))
        _write_utf(f, str(crc & 0xFFFFFFFF))
        f.flush()
        # phase 2: sender verdict
        (verdict,) = _read_exact(f, 1)
        if verdict == _CONFIRM_TRANSACTION:
            self._commit(port_name, records)
            f.write(bytes([_TRANSACTION_FINISHED]))
            f.flush()
        else:  # BAD_CHECKSUM or anything else: discard the stage
            with self._lock:
                self._aborted += 1
            f.write(bytes([_TRANSACTION_CANCELED]))
            f.flush()

    def _commit(self, port_name: str, records: list[bytes]) -> None:
        with self._lock:
            self._committed += 1
            seq = self._committed
        if not records:
            return
        name = f"{port_name or 'input'}_{seq:08d}_{uuid.uuid4().hex[:8]}.jsonl"
        tmp = os.path.join(self.landing_dir, f".tmp_{name}")
        with open(tmp, "wb") as fh:
            fh.write(b"\n".join(records) + b"\n")
        os.rename(tmp, os.path.join(self.landing_dir, name))  # atomic commit

    def stop(self) -> None:
        self._stop.set()
        self._thread.join(timeout=2)
        self._srv.close()


# --------------------------------------------------------------- client ---


def _open(host: str, port: int, cert_path: str, timeout: float):
    from apache_nifi_spark.streaming.tls import client_context

    ctx = client_context(cert_path)
    raw = socket.create_connection((host, port), timeout=timeout)
    raw.setsockopt(socket.IPPROTO_TCP, socket.TCP_NODELAY, 1)  # r17
    conn = ctx.wrap_socket(raw, server_hostname="localhost")
    f = conn.makefile("rwb")
    f.write(_MAGIC)
    f.write(struct.pack(">H", PROTOCOL_VERSION))
    f.flush()
    (resolution,) = _read_exact(f, 1)
    if resolution != _RESOLUTION_OK:
        (theirs,) = struct.unpack(">H", _read_exact(f, 2))
        conn.close()
        raise ConnectionError(
            f"peer speaks protocol version {theirs}, not {PROTOCOL_VERSION}"
        )
    return conn, f


def s2s_peers(
    host: str, port: int, cert_path: str, timeout: float = 10.0
) -> list[dict]:
    """Fetch the peer list from a bootstrap peer."""
    conn, f = _open(host, port, cert_path, timeout)
    try:
        f.write(bytes([_REQ_PEER_LIST]))
        f.flush()
        (n,) = struct.unpack(">I", _read_exact(f, 4))
        peers = []
        for _ in range(n):
            h, _raw = _read_utf(f)
            (p,) = struct.unpack(">H", _read_exact(f, 2))
            (secure,) = _read_exact(f, 1)
            (count,) = struct.unpack(">I", _read_exact(f, 4))
            peers.append(
                {"host": h, "port": p, "secure": bool(secure), "flowFileCount": count}
            )
        return peers
    finally:
        f.close()
        conn.close()


class _TransactionAborted(ConnectionError):
    """Receiver-announced checksum mismatched — batch was discarded."""


def _send_transaction(
    host: str,
    port: int,
    cert_path: str,
    port_name: str,
    flowfiles: list[tuple[dict, bytes]],
    timeout: float,
    _corrupt_crc: bool = False,
) -> None:
    """One two-phase transaction.  ``_corrupt_crc`` is a test hook that
    deliberately rejects the receiver's checksum, proving the abort path
    lands nothing."""
    conn, f = _open(host, port, cert_path, timeout)
    try:
        f.write(bytes([_REQ_SEND_FLOWFILES]))
        _write_utf(f, port_name)
        crc = 0
        buf = bytearray()

        def flush_buf() -> None:
            nonlocal crc
            crc = zlib.crc32(buf, crc)  # one CRC + one write per ~64 KiB
            f.write(buf)
            buf.clear()

        pack_i, pack_h, pack_q = struct.Struct(">I"), struct.Struct(">H"), struct.Struct(">Q")
        for attrs, content in flowfiles:
            buf += b"\x01"  # MORE_DATA
            buf += pack_i.pack(len(attrs))
            for k, v in attrs.items():
                kb = str(k).encode("utf-8")
                vb = str(v).encode("utf-8")
                buf += pack_h.pack(len(kb))
                buf += kb
                buf += pack_h.pack(len(vb))
                buf += vb
            buf += pack_q.pack(len(content))
            buf += content
            if len(buf) >= 1 << 16:
                flush_buf()
        buf += b"\x00"  # END_OF_DATA
        flush_buf()
        f.flush()
        (code,) = _read_exact(f, 1)
        if code != _CONFIRM_TRANSACTION:
            raise ConnectionError(f"expected CONFIRM_TRANSACTION, got {code:#x}")
        theirs, _ = _read_utf(f)
        ok = (not _corrupt_crc) and theirs == str(crc & 0xFFFFFFFF)
        f.write(bytes([_CONFIRM_TRANSACTION if ok else _BAD_CHECKSUM]))
        f.flush()
        (final,) = _read_exact(f, 1)
        if not ok:
            raise _TransactionAborted(
                f"checksum mismatch (ours {crc & 0xFFFFFFFF}, theirs {theirs})"
            )
        if final != _TRANSACTION_FINISHED:
            raise ConnectionError(f"expected TRANSACTION_FINISHED, got {final:#x}")
    finally:
        f.close()
        conn.close()


def s2s_send(
    df,
    host: str,
    port: int,
    cert_path: str,
    port_name: str,
    attr_cols: list[str],
    content_col: str,
    timeout: float = 30.0,
    summary: bool = False,
    _corrupt_crc: bool = False,
):
    """Push a DataFrame to a peer's input port: ONE TLS connection and
    ONE two-phase transaction per partition (confirmation amortizes over
    the batch); appends ``delivered``.  An aborted transaction marks its
    whole partition undelivered — the redelivery unit, exactly NiFi's
    transaction granularity.

    ``summary=True`` returns one ``(n_rows, delivered)`` row per
    partition instead of echoing the data — the cheap Arrow return path
    when the caller only audits delivery (the data never needs to come
    back from the executors).
    """
    from collections.abc import Iterator

    import pandas as pd
    from pyspark.sql.types import BooleanType, LongType, StructField, StructType

    schema = (
        StructType(
            [StructField("n_rows", LongType()), StructField("delivered", BooleanType())]
        )
        if summary
        else StructType(
            list(df.schema.fields) + [StructField("delivered", BooleanType())]
        )
    )

    def run(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        pdfs = [p for p in batches if len(p)]
        flowfiles: list[tuple[dict, bytes]] = []
        for pdf in pdfs:
            content_list = pdf[content_col].tolist()
            attr_lists = [pdf[c].tolist() for c in attr_cols]
            for i, content in enumerate(content_list):
                attrs = {c: vals[i] for c, vals in zip(attr_cols, attr_lists)}
                flowfiles.append((attrs, str(content).encode("utf-8")))
        ok = False
        if flowfiles:
            try:
                _send_transaction(
                    host, port, cert_path, port_name, flowfiles, timeout,
                    _corrupt_crc=_corrupt_crc,
                )
                ok = True
            except (ConnectionError, OSError):
                ok = False
        if summary:
            if flowfiles:
                yield pd.DataFrame({"n_rows": [len(flowfiles)], "delivered": [ok]})
            return
        for pdf in pdfs:
            pdf["delivered"] = ok
            yield pdf

    return df.mapInPandas(run, schema)
