"""Property-based EL-function equivalence (SURVEY.md §5.2): random
inputs through the Spark wrappers vs the expected pure-Python semantics.

Each hypothesis example is a BATCH of values (one DataFrame round-trip
per example, not per value) so the suite stays fast; ``max_examples`` is
kept small because every example is a full Spark job.
"""

from __future__ import annotations

import base64
import hashlib

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from apache_nifi_spark.functions import el

SETTINGS = dict(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)

# printable-ish text without surrogates; Spark string fns are UTF-8 clean
TEXT = st.text(
    alphabet=st.characters(min_codepoint=32, max_codepoint=0x2FF), max_size=40
)


def _run(spark, values: list[str], col):
    df = spark.createDataFrame([(v,) for v in values], "s string")
    return [r.out for r in df.select(col(F.col("s")).alias("out")).collect()]


LATIN1 = st.text(
    alphabet=st.characters(min_codepoint=32, max_codepoint=0xFF), max_size=40
)


@given(st.lists(LATIN1, min_size=1, max_size=24))
@settings(**SETTINGS)
def test_upper_lower_roundtrip_semantics(spark, values):
    # Latin-1 only: beyond it the JVM and CPython ship different Unicode
    # case-table versions (e.g. U+0264 ɤ→U+A7CB exists in one, not the
    # other) — a platform skew, not an engine bug.
    got = _run(spark, values, el.to_upper)
    assert got == [v.upper() for v in values]
    got = _run(spark, values, el.to_lower)
    assert got == [v.lower() for v in values]


@given(st.lists(TEXT, min_size=1, max_size=24))
@settings(**SETTINGS)
def test_base64_encode_decode_identity(spark, values):
    enc = _run(spark, values, el.base64_encode)
    assert enc == [base64.b64encode(v.encode()).decode() for v in values]
    dec = _run(spark, values, lambda c: el.base64_decode(el.base64_encode(c)))
    assert dec == values


def _java_url_encode(s: str) -> str:
    # java.net.URLEncoder semantics (x-www-form-urlencoded): alnum and
    # '.-*_' pass through, space → '+', everything else %XX per UTF-8
    # byte.  Differs from RFC-3986 urllib on '*' (safe in Java) and '~'
    # (escaped in Java).
    out = []
    for b in s.encode("utf-8"):
        ch = chr(b)
        if ch.isascii() and (ch.isalnum() or ch in ".-*_"):
            out.append(ch)
        elif ch == " ":
            out.append("+")
        else:
            out.append(f"%{b:02X}")
    return "".join(out)


@given(st.lists(TEXT, min_size=1, max_size=24))
@settings(**SETTINGS)
def test_url_encode_matches_java_form_encoding(spark, values):
    # Spark url_encode is application/x-www-form-urlencoded (space → '+'),
    # the same contract as NiFi's urlEncode (java.net.URLEncoder)
    got = _run(spark, values, el.url_encode)
    assert got == [_java_url_encode(v) for v in values]
    rt = _run(spark, values, lambda c: el.url_decode(el.url_encode(c)))
    assert rt == values


@given(st.lists(TEXT, min_size=1, max_size=24), st.sampled_from([":", "-", "ab"]))
@settings(**SETTINGS)
def test_substring_before_after_missing_sep_returns_whole(spark, values, sep):
    before = _run(spark, values, lambda c: el.substring_before(c, sep))
    assert before == [v.split(sep, 1)[0] if sep in v else v for v in values]
    after = _run(spark, values, lambda c: el.substring_after(c, sep))
    # NiFi substringAfter returns the input unchanged when sep is absent
    assert after == [v.split(sep, 1)[1] if sep in v else v for v in values]


@given(st.lists(TEXT, min_size=1, max_size=24), st.sampled_from(["x", "ab", " "]))
@settings(**SETTINGS)
def test_index_of_is_zero_based_minus_one_missing(spark, values, sub):
    got = _run(spark, values, lambda c: el.index_of(c, sub))
    assert got == [v.find(sub) for v in values]


@given(st.lists(TEXT, min_size=1, max_size=24))
@settings(**SETTINGS)
def test_hash_sha256_matches_hashlib(spark, values):
    got = _run(spark, values, el.hash_sha256)
    assert got == [hashlib.sha256(v.encode()).hexdigest() for v in values]


@given(
    st.lists(st.text(alphabet="abc ", max_size=20), min_size=1, max_size=24),
    st.integers(min_value=0, max_value=30),
)
@settings(**SETTINGS)
def test_pad_left_right_size_contract(spark, values, size):
    left = _run(spark, values, lambda c: el.pad_left(c, size, "_"))
    # lpad truncates when the input exceeds size — same as java String.format
    assert left == [v[:size] if len(v) >= size else "_" * (size - len(v)) + v for v in values]
    right = _run(spark, values, lambda c: el.pad_right(c, size, "_"))
    assert right == [v[:size] if len(v) >= size else v + "_" * (size - len(v)) for v in values]


@given(st.lists(TEXT, min_size=1, max_size=24))
@settings(**SETTINGS)
def test_replace_matches_python_str_replace(spark, values):
    got = _run(spark, values, lambda c: el.replace(c, "a", "XY"))
    assert got == [v.replace("a", "XY") for v in values]


@given(st.lists(st.integers(min_value=-10**12, max_value=10**12), min_size=1, max_size=24))
@settings(**SETTINGS)
def test_math_plus_minus_mod_integer_semantics(spark, values):
    df = lambda: spark.createDataFrame([(v,) for v in values], "n long")  # noqa: E731
    got = [r.o for r in df().select(el.plus(F.col("n"), 7).alias("o")).collect()]
    assert got == [v + 7 for v in values]
    got = [r.o for r in df().select(el.multiply(F.col("n"), 3).alias("o")).collect()]
    assert got == [v * 3 for v in values]


@given(
    st.lists(
        st.lists(st.text(alphabet="ab,x ", max_size=8), min_size=1, max_size=5),
        min_size=1,
        max_size=12,
    )
)
@settings(**SETTINGS)
def test_get_delimited_field_matches_csv_module(spark, rows):
    """Differential vs Python's csv writer: build quote-when-needed CSV
    lines (fields may contain the delimiter), then getDelimitedField(i)
    must recover each field with strip=true — the quote-awareness a
    naive split lacks."""
    import csv
    import io as _io

    from apache_nifi_spark.functions.el_parser import compile_el

    lines = []
    for fields in rows:
        buf = _io.StringIO()
        csv.writer(buf, quoting=csv.QUOTE_MINIMAL, lineterminator="").writerow(fields)
        lines.append((buf.getvalue(), fields))
    df = spark.createDataFrame([(ln,) for ln, _ in lines], "line string")
    width = max(len(f) for _, f in lines)
    cols = [
        compile_el(f"${{line:getDelimitedField({i + 1}, ',', '\"', '~', true)}}").alias(f"f{i}")
        for i in range(width)
    ]
    got = df.select(*cols).collect()
    for row, (_, fields) in zip(got, lines):
        for i, want in enumerate(fields):
            # csv QUOTE_MINIMAL doubles embedded quotes; our fields have
            # none by alphabet, so strip=true equals the raw field
            assert row[f"f{i}"] == want, (fields, i, row[f"f{i}"])
