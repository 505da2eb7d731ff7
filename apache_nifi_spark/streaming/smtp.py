"""ListenSMTP (§2.1 [2.7.2-surface, nifi-email bundle]): an SMTP
ingestion endpoint whose delivered messages land durably for the
streaming drain — the mail half of the landing-zone pattern.

The CLIENT side is stdlib ``smtplib`` (real RFC 5321 dialogue); the
environment has no MTA, so ``MiniSmtpServer`` implements the server
subset a delivery needs: greeting, EHLO/HELO (capability list), MAIL
FROM / RCPT TO envelope, DATA with dot-stuffing termination and
transparency decoding, RSET/NOOP/QUIT.  Each completed DATA lands as
one file (atomic temp + rename) with an ``X-Envelope-From`` /
``X-Envelope-To`` prefix so the envelope survives alongside the
headers, as the NiFi processor exposes it.

Spark shape: ``put_smtp`` delivers each partition's rendered messages
over one smtplib connection (the PutEmail delivery seam); the landing
dir is the interface the drain consumes, exactly like the HTTP/TCP
listeners.
"""

from __future__ import annotations

import os
import socket
import threading
import uuid
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame

__all__ = ["MiniSmtpServer", "put_smtp"]


class MiniSmtpServer:
    """Threaded RFC 5321 subset server landing one file per message."""

    def __init__(self, landing_dir: str, host: str = "127.0.0.1", port: int = 0):
        self.landing_dir = landing_dir
        os.makedirs(landing_dir, exist_ok=True)
        self._seq = 0
        self._lock = threading.Lock()
        self._stop = threading.Event()
        self._srv = socket.socket(socket.AF_INET, socket.SOCK_STREAM)
        self._srv.setsockopt(socket.SOL_SOCKET, socket.SO_REUSEADDR, 1)
        self._srv.bind((host, port))
        self._srv.listen(32)
        self._srv.settimeout(0.2)
        self._thread = threading.Thread(target=self._accept_loop, daemon=True)
        self._thread.start()

    @property
    def port(self) -> int:
        return self._srv.getsockname()[1]

    def _accept_loop(self) -> None:
        while not self._stop.is_set():
            try:
                conn, _ = self._srv.accept()
            except socket.timeout:
                continue
            except OSError:
                break
            conn.setsockopt(socket.IPPROTO_TCP, socket.TCP_NODELAY, 1)
            threading.Thread(target=self._serve, args=(conn,), daemon=True).start()

    def _serve(self, conn: socket.socket) -> None:
        f = conn.makefile("rwb")

        def send(code: int, text: str) -> None:
            f.write(f"{code} {text}\r\n".encode())
            f.flush()

        mail_from, rcpt_to = None, []
        try:
            send(220, "MiniSmtpServer ESMTP ready")
            while True:
                line = f.readline()
                if not line:
                    return
                cmd = line.rstrip(b"\r\n").decode("utf-8", "replace")
                verb = cmd.split(" ", 1)[0].upper()
                if verb in ("EHLO", "HELO"):
                    if verb == "EHLO":
                        f.write(b"250-MiniSmtpServer\r\n250 8BITMIME\r\n")
                        f.flush()
                    else:
                        send(250, "MiniSmtpServer")
                elif verb == "MAIL":
                    mail_from = cmd.split(":", 1)[1].strip().strip("<>")
                    rcpt_to = []
                    send(250, "OK")
                elif verb == "RCPT":
                    rcpt_to.append(cmd.split(":", 1)[1].strip().strip("<>"))
                    send(250, "OK")
                elif verb == "DATA":
                    if mail_from is None or not rcpt_to:
                        send(503, "need MAIL FROM and RCPT TO first")
                        continue
                    send(354, "End data with <CR><LF>.<CR><LF>")
                    body: list[bytes] = []
                    while True:
                        dl = f.readline()
                        if not dl:
                            return
                        if dl == b".\r\n":
                            break
                        if dl.startswith(b".."):
                            dl = dl[1:]  # dot-stuffing transparency
                        body.append(dl)
                    self._land(mail_from, rcpt_to, b"".join(body))
                    mail_from, rcpt_to = None, []
                    send(250, "OK message accepted")
                elif verb == "RSET":
                    mail_from, rcpt_to = None, []
                    send(250, "OK")
                elif verb == "NOOP":
                    send(250, "OK")
                elif verb == "QUIT":
                    send(221, "bye")
                    return
                else:
                    send(502, f"command not implemented: {verb}")
        except (ConnectionError, OSError):
            return
        finally:
            try:
                f.close()
            except OSError:
                pass
            conn.close()

    def _land(self, mail_from: str, rcpt_to: list[str], body: bytes) -> None:
        with self._lock:
            self._seq += 1
            seq = self._seq
        envelope = (
            f"X-Envelope-From: {mail_from}\r\n"
            f"X-Envelope-To: {', '.join(rcpt_to)}\r\n"
        ).encode()
        name = f"{seq:08d}_{uuid.uuid4().hex[:8]}.eml"
        tmp = os.path.join(self.landing_dir, f".tmp_{name}")
        with open(tmp, "wb") as fh:
            fh.write(envelope + body)
        os.rename(tmp, os.path.join(self.landing_dir, name))

    def stop(self) -> None:
        self._stop.set()
        self._thread.join(timeout=2)
        self._srv.close()


def put_smtp(
    df: DataFrame,
    host: str,
    port: int,
    from_col: str = "from_addr",
    to_col: str = "to_addr",
    content_col: str = "message",
) -> DataFrame:
    """PutEmail's delivery half over real SMTP: one smtplib connection
    per partition, one transaction per record; appends ``delivered``."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import smtplib

        client = smtplib.SMTP(host, port, timeout=10)
        client.sock.setsockopt(socket.IPPROTO_TCP, socket.TCP_NODELAY, 1)
        try:
            for pdf in batches:
                ok = []
                for frm, to, raw in zip(
                    pdf[from_col], pdf[to_col], pdf[content_col]
                ):
                    if raw is None:
                        ok.append(False)
                        continue
                    msg = raw if isinstance(raw, bytes) else str(raw).encode()
                    try:
                        client.sendmail(str(frm), [str(to)], bytes(msg))
                        ok.append(True)
                    except smtplib.SMTPException:
                        ok.append(False)
                pdf["delivered"] = ok
                yield pdf
        finally:
            try:
                client.quit()
            except smtplib.SMTPException:
                pass

    from pyspark.sql.types import BooleanType, StructType

    schema = StructType(list(df.schema.fields)).add("delivered", BooleanType())
    return df.mapInPandas(run, schema)
