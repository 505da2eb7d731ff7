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
