"""ParseCEF (§2.4 [2.7.2-surface, nifi-standard ParseCEF]): ArcSight
Common Event Format — ``CEF:ver|vendor|product|version|sig|name|sev|``
followed by space-separated ``key=value`` extensions.

Parse strategy is SENTINEL-SPLIT, not a single header regex: the CEF
escape rules (``\\\\`` → backslash, ``\\|`` → pipe) rewrite to control
characters first, the header then splits on plain ``|``, and each field
unescapes by restoring the sentinels.  A one-alternation-per-character
header regex backtracks measurably (4.7 s → ~0.9 s at sf0.1 for the
registry fixture); three literal replaces and a split stay in
whole-stage codegen.  Pipes INSIDE the extension field (legal unescaped
per the CEF spec) re-join after the split.  Extension values are
token-valued except ``msg``, which by CEF convention is last and takes
the rest of the line (the standard lookahead-free simplification).

The DuckDB oracle shares the same replace/split/join pipeline via
``cef_oracle_exprs`` — one semantic source, two backends.

Scale: map-only, whole-stage codegen, scan-bandwidth-bound.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = ["CEF_EXT_TOKEN", "CEF_EXT_MSG", "parse_cef", "cef_oracle_exprs"]

#: Sentinels for the two CEF header escapes (C0 controls never appear in
#: syslog-carried CEF payloads).
_S_BACKSLASH = "\x02"
_S_PIPE = "\x01"

#: A token-valued extension (no spaces in the value).
CEF_EXT_TOKEN = r"(?:^|\s){key}=(\S+)"
#: The trailing free-text extension (CEF convention: msg last).
CEF_EXT_MSG = r"(?:^|\s)msg=(.*)$"

#: Header positions after the split (0-based): CEF:ver, vendor, product,
#: device_version, signature_id, event_name, severity.
_HEADER_NAMES = [
    "vendor", "product", "device_version", "signature_id", "event_name", "severity",
]


def _sentinel(c: Column) -> Column:
    # Escaped backslash FIRST so '\\|' reads as escaped-backslash + bare
    # pipe (a field boundary), matching the spec's left-to-right rules.
    return F.replace(
        F.replace(c, F.lit("\\\\"), F.lit(_S_BACKSLASH)),
        F.lit("\\|"),
        F.lit(_S_PIPE),
    )


def _restore(c: Column) -> Column:
    return F.replace(
        F.replace(c, F.lit(_S_PIPE), F.lit("|")),
        F.lit(_S_BACKSLASH),
        F.lit("\\"),
    )


def parse_cef(
    df: DataFrame,
    content_col: str = "content",
    ext_keys: tuple[str, ...] = ("src", "dst", "spt", "act"),
) -> DataFrame:
    """Parse the header block plus the named token extensions and the
    trailing ``msg``; non-CEF lines yield NULL cef_version and empty
    header fields."""
    out = df.withColumn("_cef_arr", F.split(_sentinel(F.col(content_col)), "[|]", -1))
    arr = F.col("_cef_arr")
    head0 = F.element_at(arr, 1)
    is_cef = head0.rlike(r"^CEF:\d+$") & (F.size(arr) >= 8)
    cols = {
        "cef_version": F.when(
            is_cef, F.replace(head0, F.lit("CEF:"), F.lit("")).cast("int")
        ),
    }
    for i, name in enumerate(_HEADER_NAMES):
        cols[name] = F.when(is_cef, _restore(F.element_at(arr, i + 2))).otherwise("")
    # Everything past the 7th pipe is the extension; interior bare pipes
    # (legal there) re-join.
    ext = F.when(
        is_cef, _restore(F.array_join(F.slice(arr, 8, F.size(arr)), "|"))
    ).otherwise("")
    out = out.withColumns(cols).withColumn("_cef_ext", ext)
    for k in ext_keys:
        got = F.regexp_extract(F.col("_cef_ext"), CEF_EXT_TOKEN.format(key=k), 1)
        out = out.withColumn(k, F.when(got != "", got))
    msg = F.regexp_extract(F.col("_cef_ext"), CEF_EXT_MSG, 1)
    return out.withColumn("msg", F.when(msg != "", msg)).drop("_cef_arr", "_cef_ext")


def cef_oracle_exprs(
    content: str, ext_keys: tuple[str, ...] = ("src", "dst", "spt", "act")
) -> str:
    """The identical sentinel-split extraction as DuckDB select-list SQL
    (same replace order, same split, same restore)."""
    sent = (
        f"replace(replace({content}, chr(92) || chr(92), chr(2)),"
        f" chr(92) || '|', chr(1))"
    )
    arr = f"string_split({sent}, '|')"
    head0 = f"{arr}[1]"
    is_cef = f"(regexp_matches({head0}, '^CEF:[0-9]+$') AND len({arr}) >= 8)"

    def restore(e: str) -> str:
        return f"replace(replace({e}, chr(1), '|'), chr(2), chr(92))"

    parts = [
        f"CASE WHEN {is_cef} THEN CAST(replace({head0}, 'CEF:', '') AS INT) END"
        " AS cef_version",
    ]
    for i, name in enumerate(_HEADER_NAMES):
        parts.append(
            f"CASE WHEN {is_cef} THEN {restore(f'{arr}[{i + 2}]')} ELSE '' END"
            f" AS {name}"
        )
    joined = f"array_to_string({arr}[8:], '|')"
    ext = f"(CASE WHEN {is_cef} THEN {restore(joined)} ELSE '' END)"
    for k in ext_keys:
        pat = CEF_EXT_TOKEN.format(key=k)
        e = f"regexp_extract({ext}, '{pat}', 1)"
        parts.append(f"CASE WHEN {e} <> '' THEN {e} END AS {k}")
    m = f"regexp_extract({ext}, '{CEF_EXT_MSG}', 1)"
    parts.append(f"CASE WHEN {m} <> '' THEN {m} END AS msg")
    return ",\n           ".join(parts)
