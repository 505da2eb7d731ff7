"""VerifyContentMAC / content signing (§2.4 [2.7.2-surface,
nifi-standard VerifyContentMAC]): HMAC-SHA256 as PURE COLUMN
expressions.

Spark has sha2 but no hmac builtin — and none is needed: HMAC is its
public construction (RFC 2104),
``H((K ⊕ opad) || H((K ⊕ ipad) || m))``.  With the key a processor
PROPERTY (a constant, exactly how NiFi configures it), both padded keys
are Python-computed byte literals and the whole MAC is two sha2 calls
plus concats — whole-stage-codegen'd, scan-bandwidth-bound, no UDF.
The unit tests pin the RFC 4231 test vectors and a stdlib ``hmac``
differential, so the construction is checked against the published
standard; DuckDB's sha256 hashes only VARCHAR (no raw-byte input), so
the registry oracle pins the verification ROUTING rather than the hex
digests.

Verification mode appends the computed MAC and a ``mac_ok`` route
column (the processor's success/failure relationships).
"""

from __future__ import annotations

import hashlib
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = ["hmac_sha256_col", "verify_content_mac"]

_BLOCK = 64  # SHA-256 block size


def _pads(key: bytes) -> tuple[bytes, bytes]:
    if len(key) > _BLOCK:
        key = hashlib.sha256(key).digest()
    key = key.ljust(_BLOCK, b"\x00")
    return (
        bytes(b ^ 0x36 for b in key),
        bytes(b ^ 0x5C for b in key),
    )


def hmac_sha256_col(content: Column, key: bytes) -> Column:
    """Hex HMAC-SHA256 of a binary/string column under a constant key."""
    ipad, opad = _pads(key)
    inner = F.unhex(F.sha2(F.concat(F.lit(ipad), content.cast("binary")), 256))
    return F.lower(F.sha2(F.concat(F.lit(opad), inner), 256))


def verify_content_mac(
    df: DataFrame,
    key: bytes,
    content_col: str = "content",
    mac_col: str = "mac",
) -> DataFrame:
    """VerifyContentMAC: compute the expected MAC and route — rows whose
    presented ``mac_col`` matches go to success (``mac_ok`` true)."""
    expected = hmac_sha256_col(F.col(content_col), key)
    return df.withColumns(
        {
            "computed_mac": expected,
            "mac_ok": F.lower(F.col(mac_col)).eqNullSafe(expected),
        }
    )
