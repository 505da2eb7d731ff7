"""EL string-compiler tests: parsed EL must equal hand-built Columns.

Property strategy: for a library of (EL source, equivalent hand-built
Column) pairs, evaluate both over the customer/events fixtures and assert
row-for-row equality — the parser is correct iff it is indistinguishable
from writing the Column by hand (functions/el.py is already oracled).
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from apache_nifi_spark import io
from apache_nifi_spark.functions import el as E
from apache_nifi_spark.functions.el_parser import (
    ELSyntaxError,
    compile_el,
    el_predicate,
    el_select,
)

PAIRS = [
    ("${c_name:toUpper()}", lambda: E.to_upper(F.col("c_name"))),
    ("${c_name:toUpper():substring(0, 8)}",
     lambda: F.substring(E.to_upper(F.col("c_name")), 1, 8)),
    ("${c_mktsegment:toLower():append('-x'):prepend('y-')}",
     lambda: F.concat(F.lit("y-"), F.concat(E.to_lower(F.col("c_mktsegment")), F.lit("-x")))),
    ("${c_name:substringAfter('#')}",
     lambda: E.substring_after(F.col("c_name"), "#")),
    ("${c_name:substringAfter('#'):toNumber():plus(5):multiply(2)}",
     lambda: (E.substring_after(F.col("c_name"), "#").try_cast("long") + 5) * 2),
    ("${c_custkey:toString():padLeft(10, '0')}",
     lambda: F.lpad(F.col("c_custkey").cast("string"), 10, "0")),
    ("${c_name:replaceAll('[0-9]+', 'N')}",
     lambda: F.regexp_replace(F.col("c_name"), "[0-9]+", "N")),
    ("${c_name:length()}", lambda: F.length(F.col("c_name"))),
    ("${c_name:indexOf('#')}", lambda: F.instr(F.col("c_name"), "#") - 1),
    ("${c_mktsegment:equalsIgnoreCase('building')}",
     lambda: F.upper(F.col("c_mktsegment")) == F.lit("BUILDING")),
    ("${c_acctbal:gt(1000):and(${c_nationkey:lt(10)})}",
     lambda: (F.col("c_acctbal") > 1000) & (F.col("c_nationkey") < 10)),
    ("${c_acctbal:le(0):or(${c_mktsegment:startsWith('BUI')})}",
     lambda: (F.col("c_acctbal") <= 0) | F.startswith(F.col("c_mktsegment"), F.lit("BUI"))),
    ("${c_acctbal:gt(0):not()}", lambda: ~(F.col("c_acctbal") > 0)),
    ("${c_acctbal:gt(0):ifElse('pos', 'neg')}",
     lambda: F.when(F.col("c_acctbal") > 0, F.lit("pos")).otherwise(F.lit("neg"))),
    ("${c_mktsegment:isEmpty()}", lambda: E.is_empty(F.col("c_mktsegment"))),
    ("${c_name:hash('SHA-256')}", lambda: F.sha2(F.col("c_name").cast("binary"), 256)),
    ("${c_name:base64Encode():base64Decode()}",
     lambda: F.unbase64(E.base64_encode(F.col("c_name"))).cast("string")),
    ("${literal(41):plus(1)}", lambda: F.lit(41) + 1),
    ("tag-${c_custkey}-${c_mktsegment:toLower()}",
     lambda: F.concat(F.lit("tag-"), F.col("c_custkey").cast("string"),
                      F.lit("-"), E.to_lower(F.col("c_mktsegment")).cast("string"))),
    ("$$it-${c_custkey}", lambda: F.concat(F.lit("$it-"), F.col("c_custkey").cast("string"))),
]


@pytest.fixture(scope="module")
def customer(spark, sf_dir):
    return io.load_table(spark, sf_dir, "customer")


@pytest.mark.parametrize("src,build", PAIRS, ids=[p[0] for p in PAIRS])
def test_parsed_equals_handbuilt(customer, src, build):
    df = customer.select(
        compile_el(src).cast("string").alias("parsed"),
        build().cast("string").alias("hand"),
    )
    diff = df.filter(
        ~(F.col("parsed").eqNullSafe(F.col("hand")))
    ).count()
    assert diff == 0, f"parsed EL diverges from hand-built Column for {src!r}"


def test_multiattr_any_vs_all(spark, sf_dir):
    ev = io.load_table(spark, sf_dir, "events")
    any_n = ev.filter(
        el_predicate("${anyAttribute('event_type', 'props'):contains('ick')}")
    ).count()
    all_n = ev.filter(
        el_predicate("${allAttributes('event_type', 'props'):contains('ick')}")
    ).count()
    hand_any = ev.filter(
        F.contains(F.col("event_type"), F.lit("ick"))
        | F.contains(F.col("props"), F.lit("ick"))
    ).count()
    hand_all = ev.filter(
        F.contains(F.col("event_type"), F.lit("ick"))
        & F.contains(F.col("props"), F.lit("ick"))
    ).count()
    assert (any_n, all_n) == (hand_any, hand_all)
    assert all_n <= any_n


def test_custom_resolver_reads_map_column(spark):
    df = spark.createDataFrame(
        [(1, {"color": "red"}), (2, {"color": "blue"})], "id int, attrs map<string,string>"
    )
    col = compile_el(
        "${color:toUpper()}", resolver=lambda n: F.col("attrs").getItem(n)
    )
    got = {r.id: r.c for r in df.select("id", col.alias("c")).collect()}
    assert got == {1: "RED", 2: "BLUE"}


def test_el_select_shape(customer):
    out = el_select(
        customer, {"u": "${c_name:toUpper()}"}, keep=["c_custkey"]
    )
    assert out.columns == ["c_custkey", "u"]


@pytest.mark.parametrize(
    "bad",
    [
        "${attr:toUpper(}",          # unbalanced args
        "${attr:noSuchFunc()}",      # unknown function
        "${attr:substring('a')}",    # wrong arg type
        "${unterminated",            # no closing brace
        "${attr:equals('x') trailing}",
    ],
)
def test_syntax_errors_are_raised(bad):
    with pytest.raises(ELSyntaxError):
        compile_el(bad)


def test_literal_only_text():
    # no expressions at all → constant string
    from pyspark.sql import Column
    assert isinstance(compile_el("plain text"), Column)


def test_any_matching_attribute_expands_schema(spark, sf_dir):
    """anyMatchingAttribute(regex) over the schema universe equals the
    hand-written OR; allMatchingAttributes equals the AND; zero matches
    yield the quantifier identities (false / true)."""
    from apache_nifi_spark.functions.el_parser import compile_el_for

    d = io.load_table(spark, sf_dir, "documents")
    got = d.filter(
        compile_el_for(d, "${anyMatchingAttribute('lang|source'):equals('en')}")
    ).count()
    want = d.filter((F.col("lang") == "en") | (F.col("source") == "en")).count()
    assert got == want and got > 0

    got_all = d.filter(
        compile_el_for(d, "${allMatchingAttributes('lang|source'):notNull()}")
    ).count()
    want_all = d.filter(F.col("lang").isNotNull() & F.col("source").isNotNull()).count()
    assert got_all == want_all

    # zero-match identities
    assert d.filter(
        compile_el_for(d, "${anyMatchingAttribute('nope_.*'):notNull()}")
    ).count() == 0
    assert d.filter(
        compile_el_for(d, "${allMatchingAttributes('nope_.*'):notNull()}")
    ).count() == d.count()

    # without a universe the regex form must fail loudly
    with pytest.raises(ELSyntaxError):
        compile_el("${anyMatchingAttribute('x.*'):notNull()}")


def test_get_delimited_field_quote_aware(spark):
    """The 2.7.2 getDelimitedField signature: delimiters inside quoted
    fields don't split; escape chars pass through; strip removes quotes."""
    rows = [
        ('"a,b",c,d', "a,b", "c", "d"),          # comma inside quotes
        ('x,"y",z', "x", '"y"', "z"),            # quoted middle, unstripped
        ("p,q,r", "p", "q", "r"),                # plain
        ('"",m,n', "", "m", "n"),                # empty quoted field
    ]
    df = spark.createDataFrame(
        [(r[0],) for r in rows], "line string"
    )
    out = df.select(
        "line",
        compile_el("${line:getDelimitedField(1, ',', '\"', '~', true)}").alias("f1"),
        compile_el("${line:getDelimitedField(2)}").alias("f2"),
        compile_el("${line:getDelimitedField(3)}").alias("f3"),
    ).collect()
    by_line = {r["line"]: r for r in out}
    for line, f1, f2, f3 in rows:
        r = by_line[line]
        assert r["f1"] == f1, (line, r["f1"])
        assert r["f2"] == f2, (line, r["f2"])
        assert r["f3"] == f3, (line, r["f3"])


def test_parameter_context_substitution(spark, sf_dir):
    """#{param} resolves before EL parsing (so parameters can carry EL
    fragments), ##{ escapes, unknown parameters fail validation-style,
    and getStateValue reads the driver-side state map."""
    from apache_nifi_spark.functions.el_parser import resolve_parameters

    assert resolve_parameters("x ##{a} #{p}!", {"p": "V"}) == "x #{a} V!"
    with pytest.raises(ELSyntaxError):
        resolve_parameters("#{missing}", {})
    with pytest.raises(ELSyntaxError):
        resolve_parameters("#{unterminated", {"unterminated": "v"})

    c = io.load_table(spark, sf_dir, "customer")
    # a parameter that contributes an EL fragment, like NiFi allows
    got = c.select(
        compile_el(
            "#{expr}", parameters={"expr": "${c_name:toUpper()}"}
        ).alias("u")
    ).first()["u"]
    assert got == c.first()["c_name"].upper()

    # state scope: compile-time scalar comparison
    n_all = c.count()
    n = c.filter(
        compile_el(
            "${c_custkey:lt(${getStateValue('cap')})}", state={"cap": 10}
        ).cast("boolean")
    ).count()
    assert 0 < n < n_all
    with pytest.raises(ELSyntaxError):
        compile_el("${getStateValue('k')}")  # no state mapping provided
