"""RecordPath string-parser tests: path text vs hand-built nested Columns."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from apache_nifi_spark.functions.recordpath_parser import (
    RecordPathError,
    compile_record_path as rp,
    record_path_remove,
    record_path_update,
)


@pytest.fixture(scope="module")
def nested(spark):
    return spark.createDataFrame(
        [
            (1, {"id": 10, "name": "ann"}, [1, 2, 3, 4],
             [{"tag": "a", "v": 5}, {"tag": "b", "v": 50}], {"k": "x"}),
            (2, {"id": 20, "name": "bob"}, [7, 8],
             [{"tag": "c", "v": 99}], {"k": "y"}),
        ],
        "event_id int, user struct<id:int,name:string>, vals array<int>, "
        "items array<struct<tag:string,v:int>>, m map<string,string>",
    )


def _vals(df, col, name="c"):
    return [r[name] for r in df.select(col.alias(name)).orderBy("event_id").collect()]


def test_child_and_index_navigation(nested):
    d = nested.select(
        "event_id",
        rp("/user/name").alias("n"),
        rp("/vals[0]").alias("v0"),
        rp("/vals[-1]").alias("vl"),
        rp("/m['k']").alias("mk"),
    ).orderBy("event_id").collect()
    assert [r.n for r in d] == ["ann", "bob"]
    assert [r.v0 for r in d] == [1, 7]
    assert [r.vl for r in d] == [4, 8]
    assert [r.mk for r in d] == ["x", "y"]


def test_index_out_of_range_is_null(nested):
    got = _vals(nested.select("event_id", rp("/vals[9]").alias("c")), F.col("c"))
    assert got == [None, None]


def test_range_indices_star(nested):
    d = nested.select(
        "event_id",
        rp("/vals[0..1]").alias("r"),
        rp("/vals[0,1]").alias("i"),
        rp("/vals[*]").alias("s"),
    ).orderBy("event_id").collect()
    assert [r.r for r in d] == [[1, 2], [7, 8]]
    assert [r.i for r in d] == [[1, 2], [7, 8]]
    assert [r.s for r in d] == [[1, 2, 3, 4], [7, 8]]


def test_predicate_and_projection_after_array(nested):
    d = nested.select(
        "event_id",
        rp("/items[./v > 10]/tag").alias("t"),
        rp("/vals[. > 2]").alias("big"),
    ).orderBy("event_id").collect()
    assert [r.t for r in d] == [["b"], ["c"]]
    assert [r.big for r in d] == [[3, 4], [7, 8]]


def test_star_then_field_maps_elements(nested):
    d = nested.select("event_id", rp("/items[*]/v").alias("v")).orderBy(
        "event_id"
    ).collect()
    assert [r.v for r in d] == [[5, 50], [99]]


def test_toplevel_functions(nested):
    d = nested.select(
        "event_id",
        rp("concat(/user/name, '-', /user/id)").alias("cat"),
        rp("count(/vals)").alias("n"),
        rp("coalesce(/m['missing'], /user/name)").alias("co"),
        rp("toUpperCase(/user/name)").alias("up"),
    ).orderBy("event_id").collect()
    assert [r.cat for r in d] == ["ann-10", "bob-20"]
    assert [r.n for r in d] == [4, 2]
    assert [r.co for r in d] == ["ann", "bob"]
    assert [r.up for r in d] == ["ANN", "BOB"]


def test_update_nested_and_starred(nested):
    u = record_path_update(nested, "/user/name", F.upper)
    u = record_path_update(u, "/items[*]/v", lambda c: c * 10)
    d = u.orderBy("event_id").collect()
    assert [r.user.name for r in d] == ["ANN", "BOB"]
    assert [[i.v for i in r.items] for r in d] == [[50, 500], [990]]
    # untouched sibling fields survive
    assert [r.user.id for r in d] == [10, 20]


def test_remove_top_nested_and_starred(nested):
    assert "vals" not in record_path_remove(nested, "/vals").columns
    r1 = record_path_remove(nested, "/user/id")
    assert r1.schema["user"].dataType.fieldNames() == ["name"]
    r2 = record_path_remove(nested, "/items[*]/v")
    el = r2.schema["items"].dataType.elementType
    assert el.fieldNames() == ["tag"]


@pytest.mark.parametrize(
    "bad",
    [
        "user/name",          # must start with /
        "/vals[1..0]",        # inverted range
        "/vals[",             # unterminated selector
        "/items[./v ~ 3]",    # bad operator
        "nosuchfn(/a)",       # unknown function
        "/a/b trailing",      # trailing junk
    ],
)
def test_errors(bad):
    with pytest.raises(RecordPathError):
        rp(bad)


def test_update_rejects_non_star_selector(nested):
    with pytest.raises(RecordPathError):
        record_path_update(nested, "/vals[0]", lambda c: c)


def test_descendant_axis_expands_schema(spark):
    from apache_nifi_spark.functions.recordpath_parser import (
        compile_record_path_for as rpf,
    )

    df = spark.createDataFrame(
        [
            (1, {"id": 10, "geo": {"id": 7, "zone": "z1"}}, {"id": 99},
             [{"score": 1.0}, {"score": 2.0}]),
            (2, {"id": 20, "geo": {"id": 8, "zone": "z2"}}, {"id": 88},
             [{"score": 3.0}]),
        ],
        "event_id int, user struct<id:int,geo:struct<id:int,zone:string>>, "
        "meta struct<id:int>, items array<struct<score:double>>",
    )
    rows = df.select(
        "event_id",
        rpf(df, "//id").alias("ids"),        # 3 matches, depth-first
        rpf(df, "//zone").alias("zone"),     # single match → value
        rpf(df, "//score").alias("scores"),  # through array<struct>
        rpf(df, "/user/geo/../id").alias("uid"),  # parent pops geo
    ).orderBy("event_id").collect()
    assert rows[0].ids == [10, 7, 99] and rows[1].ids == [20, 8, 88]
    assert [r.zone for r in rows] == ["z1", "z2"]
    assert rows[0].scores == [1.0, 2.0] and rows[1].scores == [3.0]
    assert [r.uid for r in rows] == [10, 20]

    # axis errors: no match, parent above root, schemaless compile
    with pytest.raises(RecordPathError):
        rpf(df, "//nothere")
    with pytest.raises(RecordPathError):
        rpf(df, "/..")
    with pytest.raises(RecordPathError):
        rp("//id")
    with pytest.raises(RecordPathError):
        rp("/user/../id")
