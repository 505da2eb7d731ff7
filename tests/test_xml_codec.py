"""XML RecordReader/RecordSetWriter codec (sources/xml_codec.py).

Round-trip fidelity under an explicit schema (the XMLReader controller-
service contract), escaping, null suppression, arrays-as-repeated-
elements, nested structs, and write modes.
"""

import pytest
from pyspark.sql import Row
from pyspark.sql import types as T

from apache_nifi_spark.sources.xml_codec import read_xml, write_xml


def test_roundtrip_fixture_table(spark, tmp_path):
    from apache_nifi_spark.io import load_table

    sup = load_table(spark, "/root/testdata/sf0.001", "supplier")
    out = str(tmp_path / "sup")
    write_xml(sup, out)
    back = read_xml(spark, out, sup.schema)
    assert sorted(sup.collect()) == sorted(back.collect())


def test_roundtrip_timestamps_and_doubles(spark, tmp_path):
    from apache_nifi_spark.io import load_table

    orders = load_table(spark, "/root/testdata/sf0.001", "orders")
    out = str(tmp_path / "orders")
    write_xml(orders, out)
    back = read_xml(spark, out, orders.schema)
    a = orders.orderBy("o_orderkey").collect()
    b = back.orderBy("o_orderkey").collect()
    assert a == b


def test_escaping_special_chars(spark, tmp_path):
    df = spark.createDataFrame(
        [(1, "a<b&c>d"), (2, 'quote"apos\''), (3, "tag</record>injection")],
        "id bigint, s string",
    )
    out = str(tmp_path / "esc")
    write_xml(df, out)
    back = read_xml(spark, out, df.schema)
    assert sorted(df.collect()) == sorted(back.collect())


def test_null_suppression_and_arrays_and_structs(spark, tmp_path):
    schema = T.StructType(
        [
            T.StructField("id", T.LongType(), False),
            T.StructField("name", T.StringType(), True),
            T.StructField("tags", T.ArrayType(T.StringType(), False), True),
            T.StructField(
                "addr",
                T.StructType(
                    [
                        T.StructField("city", T.StringType(), True),
                        T.StructField("zip", T.IntegerType(), True),
                    ]
                ),
                True,
            ),
        ]
    )
    df = spark.createDataFrame(
        [
            (1, "x", ["a", "b", "c"], Row(city="Springfield", zip=12345)),
            (2, None, [], None),
        ],
        schema,
    )
    out = str(tmp_path / "nested")
    write_xml(df, out)
    back = read_xml(spark, out, schema)
    rows = {r.id: r for r in back.collect()}
    assert rows[1].tags == ["a", "b", "c"]
    assert rows[1].addr.city == "Springfield" and rows[1].addr.zip == 12345
    assert rows[2].name is None and rows[2].addr is None
    # empty array is indistinguishable from absent (repeated-element
    # encoding) — reads back as [] because containsNull list yields no hits
    assert rows[2].tags == []


def test_write_modes(spark, tmp_path):
    df = spark.createDataFrame([(1, "a")], "id bigint, s string")
    out = str(tmp_path / "modes")
    write_xml(df, out)
    with pytest.raises(FileExistsError):
        write_xml(df, out, mode="error")
    write_xml(df, out, mode="ignore")
    write_xml(df, out, mode="overwrite")
    assert read_xml(spark, out, df.schema).count() == 1


def test_binary_hex_roundtrip(spark, tmp_path):
    df = spark.createDataFrame([(1, bytearray(b"\x00\xff<&>"))], "id bigint, raw binary")
    out = str(tmp_path / "bin")
    write_xml(df, out)
    back = read_xml(spark, out, df.schema)
    assert bytes(back.first().raw) == b"\x00\xff<&>"
