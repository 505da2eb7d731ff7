"""ParseNetflowv5 (§2.4 [2.7.2-surface, nifi-network bundle]): NetFlow
v5 export packets — a 24-byte big-endian header (version, count,
uptime, timestamps, sequence) followed by ``count`` fixed 48-byte flow
records (RFC-less but fully published Cisco format).

Both directions are PURE COLUMN ARITHMETIC — no UDF, no Python on the
data path:

- **encode**: each field renders to zero-padded hex (``lpad(hex(x))``),
  the record is one ``concat``, and ``unhex`` yields the packet bytes.
- **parse**: the header's ``count`` field drives an ``explode(sequence)``
  over record offsets, and every field is
  ``conv(hex(substring(bytes, off, len)), 16, 10)`` — the columnar
  big-endian integer read, which DuckDB mirrors with blob ``substring``
  + hex→int.  IPv4 addresses render dotted-quad from the four octets.

Scale: encode and parse are map-only (scan-bandwidth-bound); the
per-packet record explode is bounded by the format's 30-flow packet
cap.  A collector front end (the UDP listener in streaming/listen)
lands packets; this module turns them into relational flows.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = ["netflow5_packet", "parse_netflow5", "HEADER_LEN", "RECORD_LEN"]

HEADER_LEN = 24
RECORD_LEN = 48

#: (name, byte offset in record, byte length) — the published v5 layout.
_FIELDS = [
    ("srcaddr", 0, 4),
    ("dstaddr", 4, 4),
    ("nexthop", 8, 4),
    ("input_if", 12, 2),
    ("output_if", 14, 2),
    ("d_pkts", 16, 4),
    ("d_octets", 20, 4),
    ("first_ms", 24, 4),
    ("last_ms", 28, 4),
    ("srcport", 32, 2),
    ("dstport", 34, 2),
    # byte 36 pad
    ("tcp_flags", 37, 1),
    ("proto", 38, 1),
    ("tos", 39, 1),
    ("src_as", 40, 2),
    ("dst_as", 42, 2),
    ("src_mask", 44, 1),
    ("dst_mask", 45, 1),
    # bytes 46-47 pad
]


def _hex_field(value: Column, nbytes: int) -> Column:
    """Zero-padded big-endian hex of an unsigned integer column."""
    return F.lpad(F.lower(F.hex(value.cast("bigint"))), nbytes * 2, "0")


def netflow5_packet(fields: dict[str, Column], sys_uptime: Column, unix_secs: Column,
                    flow_sequence: Column) -> Column:
    """One single-flow v5 packet from field columns (count=1; a packet
    builder for testing/replay — exporters batch up to 30)."""
    header = F.concat(
        F.lit("0005"),  # version
        F.lit("0001"),  # count
        _hex_field(sys_uptime, 4),
        _hex_field(unix_secs, 4),
        F.lit("00000000"),  # unix_nsecs
        _hex_field(flow_sequence, 4),
        F.lit("0000"),  # engine type/id
        F.lit("0000"),  # sampling
    )
    parts = [header]
    pos = 0
    for name, off, nbytes in _FIELDS:
        if off > pos:
            parts.append(F.lit("00" * (off - pos)))
        parts.append(_hex_field(fields[name], nbytes))
        pos = off + nbytes
    if pos < RECORD_LEN:
        parts.append(F.lit("00" * (RECORD_LEN - pos)))
    return F.unhex(F.concat(*parts))


def _read_int(data: Column, offset: Column, nbytes: int) -> Column:
    """Columnar big-endian unsigned read: conv(hex(substring), 16, 10).
    ``offset`` is 1-based (Spark substring convention)."""
    return F.conv(F.hex(F.substring(data, offset, nbytes)), 16, 10).cast("bigint")


def _dotted_quad(data: Column, offset: Column) -> Column:
    return F.concat_ws(
        ".",
        *[_read_int(data, offset + i, 1).cast("string") for i in range(4)],
    )


def parse_netflow5(df: DataFrame, content_col: str = "packet") -> DataFrame:
    """Packets → one row per flow record.  The header count drives the
    record explode; malformed versions filter out (v5 only)."""
    c = F.col(content_col)
    version = _read_int(c, F.lit(1), 2)
    count = _read_int(c, F.lit(3), 2)
    # count > 0 guard: sequence(0, -1) in Spark steps backwards, so a
    # zero-record packet would explode two phantom rows of garbage offsets.
    base = df.filter((version == 5) & (count > 0)).select(
        "*",
        _read_int(c, F.lit(5), 4).alias("sys_uptime"),
        _read_int(c, F.lit(9), 4).alias("unix_secs"),
        _read_int(c, F.lit(17), 4).alias("flow_sequence"),
        F.explode(F.sequence(F.lit(0), count.cast("int") - 1)).alias("_rec"),
    )
    off = (F.lit(HEADER_LEN + 1) + F.col("_rec") * RECORD_LEN).cast("int")
    cols = {
        "src_ip": _dotted_quad(c, off + 0),
        "dst_ip": _dotted_quad(c, off + 4),
    }
    for name, foff, nbytes in _FIELDS:
        if name in ("srcaddr", "dstaddr"):
            continue
        cols[name] = _read_int(c, off + foff, nbytes)
    return base.withColumns(cols).drop("_rec", content_col)
