"""TLS for the landing listeners (§2.1 secured ingest).

The reference deployment is TLS-first — its kustomization generates a
keystore/truststore secret and the engine config mounts them
(/root/reference/kustomization.yaml:21-26,
base/nifi/configmap.yaml:25-32); every Listen* ingest endpoint there is
secured.  This module is the Spark-side analog of that keystore mount:

- ``generate_self_signed(dir)`` — dev/test convenience producing a
  localhost cert+key via the system ``openssl`` (the reference's
  kustomize secretGenerator does exactly this job); production deploys
  mount real PEMs and skip this.
- ``server_context(cert, key)`` / ``client_context(cert)`` — stdlib
  ``ssl`` contexts; the client context TRUSTS ONLY the given CA/cert
  (no system-store fallback) and verifies hostname, mirroring the
  truststore semantics.
- ``wrap_listener(listener, ctx)`` — retrofit any socketserver-based
  landing listener (TCP/RELP/HTTP) with TLS by wrapping its accept
  socket; the landing-file contract is unchanged, so every downstream
  drain works identically over the secured transport.

Scale note: TLS terminates at the listener tier (exactly as in the
reference, where the pod's server keystore terminates it) — nothing in
the Spark plan changes; executors keep reading the landed files.
"""

from __future__ import annotations

import os
import ssl
import subprocess
import tempfile

__all__ = [
    "client_context",
    "generate_self_signed",
    "server_context",
    "wrap_listener",
]


def generate_self_signed(directory: str | None = None) -> tuple[str, str]:
    """(cert_path, key_path) for CN=localhost with 127.0.0.1 SAN."""
    directory = directory or tempfile.mkdtemp(prefix="anspark_tls_")
    os.makedirs(directory, exist_ok=True)
    cert = os.path.join(directory, "server.crt")
    key = os.path.join(directory, "server.key")
    subprocess.run(
        [
            "openssl", "req", "-x509", "-newkey", "rsa:2048", "-nodes",
            "-days", "2", "-subj", "/CN=localhost",
            "-addext", "subjectAltName=DNS:localhost,IP:127.0.0.1",
            "-keyout", key, "-out", cert,
        ],
        check=True,
        capture_output=True,
    )
    return cert, key


def server_context(cert_path: str, key_path: str) -> ssl.SSLContext:
    ctx = ssl.SSLContext(ssl.PROTOCOL_TLS_SERVER)
    ctx.load_cert_chain(cert_path, key_path)
    # TLS 1.3 servers push NewSessionTicket messages after the
    # handshake.  A send-only client (PutTCP) never reads them, so its
    # close() fires an RST (unread data in the receive queue) instead
    # of FIN — and the RST DISCARDS the in-flight tail of the payload
    # on the server, surfacing as a silent ragged-EOF truncation.
    # Landing listeners don't need resumption; turn tickets off.
    ctx.num_tickets = 0
    return ctx


def client_context(cert_path: str) -> ssl.SSLContext:
    """Trusts ONLY ``cert_path`` (truststore semantics) and verifies
    the peer hostname."""
    ctx = ssl.SSLContext(ssl.PROTOCOL_TLS_CLIENT)
    ctx.load_verify_locations(cert_path)
    ctx.check_hostname = True
    ctx.verify_mode = ssl.CERT_REQUIRED
    return ctx


def wrap_listener(listener, ctx: ssl.SSLContext) -> None:
    """Retrofit a landing listener with TLS.

    Works for any listener built on ``socketserver``/``http.server``
    exposing the server instance as ``_srv`` or ``_server``
    (TcpLandingListener, HttpLandingListener): the accept path is
    replaced by an SSL-wrapping one, so every accepted connection
    completes a real handshake before the handler runs.  Plaintext
    clients fail the handshake and never land data.  (RELP's listener
    owns a raw accept loop and keeps app-level per-txnr ACK
    reliability; it is out of this helper's scope.)
    """
    srv = getattr(listener, "_srv", None) or getattr(listener, "_server", None)
    if srv is None or not hasattr(srv, "get_request"):
        raise ValueError(
            f"{type(listener).__name__} has no socketserver to wrap"
        )
    plain_get_request = srv.get_request

    def get_request():
        sock, addr = plain_get_request()
        # handshake deferred to the HANDLER thread (first read), not the
        # single accept thread — N concurrent executor connections would
        # otherwise serialize their handshakes behind accept()
        return (
            ctx.wrap_socket(sock, server_side=True, do_handshake_on_connect=False),
            addr,
        )

    srv.get_request = get_request
