"""ParseCEF (§2.4 [2.7.2-surface, nifi-standard ParseCEF]): ArcSight
Common Event Format — ``CEF:ver|vendor|product|version|sig|name|sev|``
followed by space-separated ``key=value`` extensions.

Pure column regex (RE2-compatible: no lookarounds, so the same pattern
strings drive Spark's regexp_extract and DuckDB's regexp_extract — the
oracle shares THESE constants, one semantic source).  Header fields
honor the CEF escape rules (``\\|`` and ``\\\\``), unescaped after
extraction; extension values are token-valued except ``msg``, which by
CEF convention is last and takes the rest of the line (the standard
lookahead-free simplification).

Scale: map-only, whole-stage codegen, scan-bandwidth-bound.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = ["CEF_HEADER_PATTERN", "CEF_EXT_TOKEN", "CEF_EXT_MSG", "parse_cef"]

#: One header field: escaped chars or anything but pipe/backslash.
_FIELD = r"((?:\\.|[^|\\])*)"
#: Groups 1..7: version, vendor, product, device_version, signature, name, severity.
CEF_HEADER_PATTERN = (
    r"^CEF:(\d+)\|" + r"\|".join([_FIELD] * 6) + r"\|(.*)$"
)
#: A token-valued extension (no spaces in the value).
CEF_EXT_TOKEN = r"(?:^|\s){key}=(\S+)"
#: The trailing free-text extension (CEF convention: msg last).
CEF_EXT_MSG = r"(?:^|\s)msg=(.*)$"


def _unescape(c: Column) -> Column:
    return F.replace(
        F.replace(c, F.lit("\\|"), F.lit("|")), F.lit("\\\\"), F.lit("\\")
    )


def parse_cef(
    df: DataFrame,
    content_col: str = "content",
    ext_keys: tuple[str, ...] = ("src", "dst", "spt", "act"),
) -> DataFrame:
    """Parse the header block plus the named token extensions and the
    trailing ``msg``; non-CEF lines yield NULL fields (header regex
    group 1 empty → cef_version null)."""
    c = F.col(content_col)

    def header(group: int) -> Column:
        return F.regexp_extract(c, CEF_HEADER_PATTERN, group)

    ver = header(1)
    out = df.withColumns(
        {
            "cef_version": F.when(ver != "", ver.cast("int")),
            "vendor": _unescape(header(2)),
            "product": _unescape(header(3)),
            "device_version": _unescape(header(4)),
            "signature_id": _unescape(header(5)),
            "event_name": _unescape(header(6)),
            "severity": _unescape(header(7)),
        }
    )
    ext = F.regexp_extract(c, CEF_HEADER_PATTERN, 8)
    for k in ext_keys:
        got = F.regexp_extract(ext, CEF_EXT_TOKEN.format(key=k), 1)
        out = out.withColumn(k, F.when(got != "", got))
    msg = F.regexp_extract(ext, CEF_EXT_MSG, 1)
    return out.withColumn("msg", F.when(msg != "", msg))


def cef_oracle_exprs(
    content: str, ext_keys: tuple[str, ...] = ("src", "dst", "spt", "act")
) -> str:
    """The identical extraction as DuckDB select-list SQL (shares the
    pattern constants above)."""

    def unescape(e: str) -> str:
        return (
            f"replace(replace({e}, '\\|', '|'), chr(92) || chr(92), chr(92))"
        )

    def header(g: int) -> str:
        return f"regexp_extract({content}, '{CEF_HEADER_PATTERN}', {g})"

    parts = [
        f"CASE WHEN {header(1)} <> '' THEN CAST({header(1)} AS INT) END AS cef_version",
        f"{unescape(header(2))} AS vendor",
        f"{unescape(header(3))} AS product",
        f"{unescape(header(4))} AS device_version",
        f"{unescape(header(5))} AS signature_id",
        f"{unescape(header(6))} AS event_name",
        f"{unescape(header(7))} AS severity",
    ]
    ext = header(8)
    for k in ext_keys:
        pat = CEF_EXT_TOKEN.format(key=k)
        e = f"regexp_extract({ext}, '{pat}', 1)"
        parts.append(f"CASE WHEN {e} <> '' THEN {e} END AS {k}")
    m = f"regexp_extract({ext}, '{CEF_EXT_MSG}', 1)"
    parts.append(f"CASE WHEN {m} <> '' THEN {m} END AS msg")
    return ",\n           ".join(parts)
