"""NiFi Expression Language scalar functions, Spark-native.

NiFi EL (``${attr:func(...)}``) is the scalar library of the 2.7.2 engine
[2.7.2-surface; SURVEY.md §2.9].  Each wrapper below keeps the EL name and
semantics but compiles to a built-in Spark SQL expression, so the whole
layer stays inside whole-stage codegen — zero Python in the data path.

EL's signature quirk: attributes are untyped strings and EL coerces on
demand.  We mimic that with explicit ``try_cast``-style helpers
(``to_number``/``to_decimal``) rather than implicit coercion, per
SURVEY.md §4.2 item 2.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

__all__ = [
    # string
    "to_upper", "to_lower", "trim", "substring", "substring_before",
    "substring_after", "substring_before_last", "substring_after_last",
    "index_of", "last_index_of", "replace", "replace_all", "replace_null",
    "replace_empty", "append", "prepend", "length", "starts_with",
    "ends_with", "contains", "matches", "find", "pad_left", "pad_right",
    "repeat", "join_strings",
    # encode / decode / hash
    "url_encode", "url_decode", "base64_encode", "base64_decode",
    "hex_encode", "hex_decode", "hash_content", "hash_md5", "hash_sha1",
    "hash_sha256", "hash_xx64", "hash_crc32",
    # math
    "plus", "minus", "multiply", "divide", "mod", "abs_val", "ceil_val",
    "floor_val", "round_val", "pow_val", "sqrt_val", "ln_val", "log10_val",
    "random_value", "from_radix", "to_radix",
    # date/time
    "now", "format_ts", "to_date_el", "to_timestamp_el", "to_number_ts",
    "from_epoch_millis", "date_plus_days", "date_minus_days",
    # boolean / conditional
    "is_null", "not_null", "is_empty", "equals", "equals_ignore_case",
    "gt", "ge", "lt", "le", "and_", "or_", "not_", "if_else",
    # coercion
    "to_number", "to_decimal", "to_string",
    # JSON
    "json_path", "json_tuple_el",
    # ids
    "new_uuid", "deterministic_id",
]


# ---------------------------------------------------------------- string ---

def to_upper(c: Column) -> Column:
    return F.upper(c)


def to_lower(c: Column) -> Column:
    return F.lower(c)


def trim(c: Column) -> Column:
    return F.trim(c)


def substring(c: Column, start: int, length: int | None = None) -> Column:
    """EL substring(start, end) is 0-based [start, end); Spark's is 1-based
    (start, len).  Keep EL's 0-based start."""
    if length is None:
        return F.substring(c, start + 1, 2**31 - 1)
    return F.substring(c, start + 1, length)


def substring_before(c: Column, sep: str) -> Column:
    return F.substring_index(c, sep, 1)


def substring_after(c: Column, sep: str) -> Column:
    """Everything after the FIRST occurrence of ``sep``; the original value
    when ``sep`` is absent (NiFi EL semantics)."""
    return F.when(
        F.instr(c, sep) > 0,
        F.substring(c, F.instr(c, sep) + len(sep), F.lit(2**31 - 1)),
    ).otherwise(c)


def substring_before_last(c: Column, sep: str) -> Column:
    """Everything before the LAST occurrence of ``sep``; original otherwise."""
    return F.when(
        F.instr(c, sep) > 0,
        F.substring(
            c, 1, F.length(c) - F.length(F.substring_index(c, sep, -1)) - len(sep)
        ),
    ).otherwise(c)


def substring_after_last(c: Column, sep: str) -> Column:
    return F.substring_index(c, sep, -1)


def index_of(c: Column, sub: str) -> Column:
    return F.instr(c, sub) - 1  # EL is 0-based, -1 when missing


def last_index_of(c: Column, sub: str) -> Column:
    return F.length(c) - F.locate(sub[::-1], F.reverse(c)) - F.lit(len(sub) - 1)


def replace(c: Column, search: str, repl: str) -> Column:
    return F.replace(c, F.lit(search), F.lit(repl))


def replace_all(c: Column, pattern: str, repl: str) -> Column:
    return F.regexp_replace(c, pattern, repl)


def replace_null(c: Column, default) -> Column:
    return F.coalesce(c, F.lit(default))


def replace_empty(c: Column, default) -> Column:
    return F.when(F.trim(c) == "", F.lit(default)).otherwise(c)


def append(c: Column, suffix: str) -> Column:
    return F.concat(c, F.lit(suffix))


def prepend(c: Column, prefix: str) -> Column:
    return F.concat(F.lit(prefix), c)


def length(c: Column) -> Column:
    return F.length(c)


def starts_with(c: Column, prefix: str) -> Column:
    return F.startswith(c, F.lit(prefix))


def ends_with(c: Column, suffix: str) -> Column:
    return F.endswith(c, F.lit(suffix))


def contains(c: Column, sub: str) -> Column:
    return F.contains(c, F.lit(sub))


def matches(c: Column, pattern: str) -> Column:
    """EL matches() anchors the whole string."""
    return F.rlike(c, F.lit(f"^(?:{pattern})$"))


def find(c: Column, pattern: str) -> Column:
    """EL find() is true when the regex matches anywhere."""
    return F.rlike(c, F.lit(pattern))


def pad_left(c: Column, size: int, pad: str = "_") -> Column:
    return F.lpad(c, size, pad)


def pad_right(c: Column, size: int, pad: str = "_") -> Column:
    return F.rpad(c, size, pad)


def repeat(c: Column, n: int) -> Column:
    return F.repeat(c, n)


def join_strings(sep: str, *cols: Column) -> Column:
    return F.concat_ws(sep, *cols)


# ------------------------------------------------- encode / decode / hash ---

def url_encode(c: Column) -> Column:
    return F.url_encode(c)


def url_decode(c: Column) -> Column:
    return F.url_decode(c)


def base64_encode(c: Column) -> Column:
    # Spark's base64 MIME-chunks output ≥ 76 chars with CRLF (Java
    # Base64.getMimeEncoder heritage); NiFi's EL (and RFC 4648) is
    # unchunked — strip the line breaks so round-trips are identity.
    return F.regexp_replace(F.base64(c.cast("binary")), "\r\n", "")


def base64_decode(c: Column) -> Column:
    return F.unbase64(c).cast("string")


def hex_encode(c: Column) -> Column:
    return F.hex(c)


def hex_decode(c: Column) -> Column:
    return F.unhex(c)


def hash_content(c: Column, algorithm: str = "SHA-256") -> Column:
    """CryptographicHashContent/HashAttribute analog (SURVEY.md §2.4)."""
    alg = algorithm.upper().replace("-", "")
    if alg == "MD5":
        return F.md5(c.cast("binary"))
    if alg == "SHA1":
        return F.sha1(c.cast("binary"))
    if alg in {"SHA256", "SHA512", "SHA224", "SHA384"}:
        return F.sha2(c.cast("binary"), int(alg[3:]))
    raise ValueError(f"unsupported hash algorithm: {algorithm}")


def hash_md5(c: Column) -> Column:
    return F.md5(c.cast("binary"))


def hash_sha1(c: Column) -> Column:
    return F.sha1(c.cast("binary"))


def hash_sha256(c: Column) -> Column:
    return F.sha2(c.cast("binary"), 256)


def hash_xx64(c: Column) -> Column:
    return F.xxhash64(c)


def hash_crc32(c: Column) -> Column:
    return F.crc32(c.cast("binary"))


# ------------------------------------------------------------------ math ---

def plus(a: Column, b) -> Column:
    return a + b


def minus(a: Column, b) -> Column:
    return a - b


def multiply(a: Column, b) -> Column:
    return a * b


def divide(a: Column, b) -> Column:
    return a / b


def mod(a: Column, b) -> Column:
    return a % b


def abs_val(c: Column) -> Column:
    return F.abs(c)


def ceil_val(c: Column) -> Column:
    return F.ceil(c)


def floor_val(c: Column) -> Column:
    return F.floor(c)


def round_val(c: Column, scale: int = 0) -> Column:
    return F.round(c, scale)


def pow_val(c: Column, p) -> Column:
    return F.pow(c, p)


def sqrt_val(c: Column) -> Column:
    return F.sqrt(c)


def ln_val(c: Column) -> Column:
    return F.log(c)


def log10_val(c: Column) -> Column:
    return F.log10(c)


def random_value() -> Column:
    """EL random(): uniform long.  Nondeterministic — never in oracle paths."""
    return (F.rand() * F.lit(float(2**62))).cast("long")


def from_radix(c: Column, radix: int) -> Column:
    return F.conv(c, radix, 10).cast("long")


def to_radix(c: Column, radix: int) -> Column:
    return F.conv(c.cast("string"), 10, radix)


# ------------------------------------------------------------- date/time ---

def now() -> Column:
    return F.current_timestamp()


def format_ts(c: Column, fmt: str) -> Column:
    """EL format() with Java SimpleDateFormat patterns — Spark's
    ``date_format`` accepts the same pattern family."""
    return F.date_format(c, fmt)


def to_date_el(c: Column, fmt: str | None = None) -> Column:
    return F.to_date(c, fmt) if fmt else F.to_date(c)


def to_timestamp_el(c: Column, fmt: str | None = None) -> Column:
    return F.to_timestamp(c, fmt) if fmt else F.to_timestamp(c)


def to_number_ts(c: Column) -> Column:
    """EL toNumber() on a date → epoch millis."""
    return (F.unix_timestamp(c) * 1000 + F.date_format(c, "SSS").cast("long"))


def from_epoch_millis(c: Column) -> Column:
    return F.timestamp_millis(c.cast("long"))


def date_plus_days(c: Column, n: int) -> Column:
    return F.date_add(c, n)


def date_minus_days(c: Column, n: int) -> Column:
    return F.date_sub(c, n)


# --------------------------------------------------- boolean / condition ---

def is_null(c: Column) -> Column:
    return c.isNull()


def not_null(c: Column) -> Column:
    return c.isNotNull()


def is_empty(c: Column) -> Column:
    return c.isNull() | (F.trim(c) == "")


def equals(a: Column, b) -> Column:
    return a == b


def equals_ignore_case(a: Column, b) -> Column:
    return F.upper(a) == F.upper(F.lit(b) if isinstance(b, str) else b)


def gt(a: Column, b) -> Column:
    return a > b


def ge(a: Column, b) -> Column:
    return a >= b


def lt(a: Column, b) -> Column:
    return a < b


def le(a: Column, b) -> Column:
    return a <= b


def and_(a: Column, b: Column) -> Column:
    return a & b


def or_(a: Column, b: Column) -> Column:
    return a | b


def not_(a: Column) -> Column:
    return ~a


def if_else(cond: Column, if_true, if_false) -> Column:
    return F.when(cond, if_true).otherwise(if_false)


# -------------------------------------------------------------- coercion ---

def to_number(c: Column) -> Column:
    """EL toNumber(): string→long, null on failure (EL returns error;
    try_cast's null is the closest total-function semantics)."""
    return c.try_cast("long")


def to_decimal(c: Column) -> Column:
    return c.try_cast("double")


def to_string(c: Column) -> Column:
    return c.cast("string")


# ------------------------------------------------------------------ JSON ---

def json_path(c: Column, path: str) -> Column:
    """EL jsonPath('$.x') → get_json_object (SURVEY.md §2.9 JSON family)."""
    return F.get_json_object(c, path)


def json_tuple_el(c: Column, *fields: str):
    return F.json_tuple(c, *fields)


# ------------------------------------------------------------------- ids ---

def new_uuid() -> Column:
    return F.expr("uuid()")


def deterministic_id(*cols: Column) -> Column:
    """NiFi uuid5-style deterministic id from content: stable across runs,
    unlike UUID() — use in oracle-checked paths."""
    return F.sha2(F.concat_ws("", *[c.cast("string") for c in cols]), 256)
