"""ValidateXml XSD-mode compiler tests: constructs the registry fixture
doesn't reach (nested complex types, unbounded occurs, unsupported
particles, date/boolean simple types)."""

from __future__ import annotations

import pytest

from apache_nifi_spark.functions.xsd import validate_xml_xsd, xsd_compile

NESTED_XSD = """
<xs:schema xmlns:xs="http://www.w3.org/2001/XMLSchema">
  <xs:element name="order">
    <xs:complexType>
      <xs:sequence>
        <xs:element name="id" type="xs:long"/>
        <xs:element name="placed" type="xs:date"/>
        <xs:element name="rush" type="xs:boolean" minOccurs="0"/>
        <xs:element name="line" minOccurs="1" maxOccurs="unbounded">
          <xs:complexType>
            <xs:sequence>
              <xs:element name="sku" type="xs:string"/>
              <xs:element name="qty" type="xs:int"/>
            </xs:sequence>
          </xs:complexType>
        </xs:element>
      </xs:sequence>
    </xs:complexType>
  </xs:element>
</xs:schema>
"""

DOCS = {
    "ok": "<order><id>1</id><placed>2026-01-02</placed><rush>true</rush>"
          "<line><sku>a</sku><qty>2</qty></line>"
          "<line><sku>b</sku><qty>3</qty></line></order>",
    "ok_no_rush": "<order><id>2</id><placed>2026-01-02</placed>"
                  "<line><sku>a</sku><qty>1</qty></line></order>",
    "bad_date": "<order><id>3</id><placed>Jan 2</placed>"
                "<line><sku>a</sku><qty>1</qty></line></order>",
    "bad_bool": "<order><id>4</id><placed>2026-01-02</placed><rush>yep</rush>"
                "<line><sku>a</sku><qty>1</qty></line></order>",
    "no_lines": "<order><id>5</id><placed>2026-01-02</placed></order>",
    "nested_type": "<order><id>6</id><placed>2026-01-02</placed>"
                   "<line><sku>a</sku><qty>two</qty></line></order>",
    "out_of_order": "<order><placed>2026-01-02</placed><id>7</id>"
                    "<line><sku>a</sku><qty>1</qty></line></order>",
    "trailing_junk": "<order><id>8</id><placed>2026-01-02</placed>"
                     "<line><sku>a</sku><qty>1</qty></line><x/></order>",
}

EXPECTED = {
    "ok": (True, None),
    "ok_no_rush": (True, None),
    "bad_date": (False, "type:placed"),
    "bad_bool": (False, "type:rush"),
    "no_lines": (False, "occurs:line"),
    "nested_type": (False, "type:qty"),
    "out_of_order": (False, "occurs:id"),
    "trailing_junk": (False, "unexpected:x"),
}


def test_xsd_nested_matrix(spark):
    df = spark.createDataFrame(list(DOCS.items()), "k string, content string")
    got = {
        r["k"]: (r["valid"], r["validation_error"])
        for r in validate_xml_xsd(df, NESTED_XSD).collect()
    }
    assert got == EXPECTED


def test_xsd_unsupported_constructs_raise():
    with pytest.raises(ValueError, match="xs:choice|particle|content models"):
        xsd_compile(
            '<xs:schema xmlns:xs="http://www.w3.org/2001/XMLSchema">'
            '<xs:element name="r"><xs:complexType><xs:choice>'
            '<xs:element name="a" type="xs:string"/>'
            "</xs:choice></xs:complexType></xs:element></xs:schema>"
        )
    with pytest.raises(ValueError, match="unsupported XSD type"):
        xsd_compile(
            '<xs:schema xmlns:xs="http://www.w3.org/2001/XMLSchema">'
            '<xs:element name="r" type="xs:hexBinary"/></xs:schema>'
        )
    with pytest.raises(ValueError, match="exactly one top-level"):
        xsd_compile('<xs:schema xmlns:xs="http://www.w3.org/2001/XMLSchema"/>')


FLAT_XSD = """
<xs:schema xmlns:xs="http://www.w3.org/2001/XMLSchema">
  <xs:element name="event">
    <xs:complexType>
      <xs:sequence>
        <xs:element name="id" type="xs:long"/>
        <xs:element name="user" type="xs:string" minOccurs="0" maxOccurs="2"/>
        <xs:element name="score" type="xs:int" maxOccurs="unbounded"/>
        <xs:element name="note" type="xs:string" minOccurs="0"/>
      </xs:sequence>
    </xs:complexType>
  </xs:element>
</xs:schema>
"""


def _parser_reference(doc, spec):
    """The module's own parser path, invoked directly — the ground truth
    the columnar fast path must reproduce label-for-label."""
    import xml.etree.ElementTree as ET

    from apache_nifi_spark.functions.xsd import _check, _local

    try:
        root = ET.fromstring(doc if doc is not None else "")
    except ET.ParseError:
        return "malformed"
    if _local(root.tag) != spec.name:
        return f"root:{_local(root.tag)}"
    return _check(root, spec)


def test_xsd_columnar_fast_path_differential(spark):
    """Fuzzed differential: the hybrid validator (JVM fast path for plain
    docs + parser path for the rest) must agree with the parser reference
    on every document — including docs engineered to exercise advance,
    under/over-occurs, type, unexpected, wrong-root, and every
    router-excluded construct (attributes, comments, entities, unicode,
    inter-element whitespace, malformed)."""
    import random

    rng = random.Random(424242)
    spec = xsd_compile(FLAT_XSD)
    tags = ["id", "user", "score", "note", "bogus", "zz"]
    texts = ["1", "-42", "+0", "x9", "", " 7 ", "\t12\n", "hi there", "3.5",
             "true", "99999999999"]
    docs = []
    for i in range(300):
        roll = rng.random()
        if roll < 0.05:
            docs.append("<event><id>1</id><score>2</score>")  # malformed
        elif roll < 0.08:
            docs.append("<wrong><id>1</id></wrong>")
        elif roll < 0.12:  # router-excluded constructs → parser path
            docs.append(rng.choice([
                '<event><id a="b">1</id><score>2</score></event>',
                "<event><!-- c --><id>1</id><score>2</score></event>",
                "<event><id>1&amp;2</id><score>2</score></event>",
                "<event> <id>1</id><score>2</score></event>",
                "<event><id>ü</id><score>2</score></event>",
                "<event><id/><score>2</score></event>",
            ]))
        else:
            kids = "".join(
                f"<{t}>{rng.choice(texts)}</{t}>"
                for t in (rng.choice(tags) for _ in range(rng.randrange(0, 7)))
            )
            docs.append(f"<event>{kids}</event>")
    rows = [(i, d) for i, d in enumerate(docs)]
    df = spark.createDataFrame(rows, "k long, content string")
    got = {
        r["k"]: (r["valid"], r["validation_error"])
        for r in validate_xml_xsd(df, FLAT_XSD).collect()
    }
    assert len(got) == len(docs)  # the branch split loses no rows
    for i, d in enumerate(docs):
        want = _parser_reference(d, spec)
        assert got[i] == (want is None, want), f"doc {i}: {d!r}"


def test_xsd_valid_regex_is_sound_and_engages():
    """The fast-path regex must bless exactly the plainly-valid docs
    (soundness: rlike ⟹ parser-valid) and must actually match the
    common valid shapes — a router regression pushing everything to
    Python would show here."""
    import re

    from apache_nifi_spark.functions.xsd import _flat_children, _valid_plain_rx

    spec = xsd_compile(FLAT_XSD)
    rx = re.compile(_valid_plain_rx(spec, _flat_children(spec)))
    proves_valid = [
        "<event><id>1</id><score>2</score></event>",
        "<event><id>-7</id><score>2</score><score>3</score></event>",
        "<event><id> 5 </id><score>\t2\n</score></event>",  # strip parity
        "<event><id>1</id><user>a b</user><score>1</score><note></note></event>",
    ]
    for d in proves_valid:
        assert rx.match(d), d
        assert _parser_reference(d, spec) is None, d
    takes_parser_path = [
        "<event><score>2</score></event>",          # occurs:id
        "<event><id>x</id><score>2</score></event>",  # type:id
        "<event><id>1</id></event>",                # occurs:score
        "<other><id>1</id></other>",                # root
        "<event><id>1</id><score>1</score><zz>!</zz></event>",  # unexpected
        '<event><id a="b">1</id><score>2</score></event>',  # wider XML: valid
        "<event><id>1</id><score>2</score>",        # malformed
        "<event><id>]]></id><score>2</score></event>",  # ]]> is malformed
    ]
    for d in takes_parser_path:
        assert not rx.match(d), d
    # nested and duplicate-name schemas skip the fast path entirely
    assert _valid_plain_rx(xsd_compile(NESTED_XSD),
                           _flat_children(xsd_compile(NESTED_XSD))) is None
