"""NiFi RecordPath function surface on Spark nested types.

RecordPath navigates/constructs nested records inside record-aware
processors [2.7.2-surface; SURVEY.md §2.9 last row].  Spark's complex-type
functions are a strict superset; wrappers keep RecordPath names where they
differ.  All JVM-side — no UDFs.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

__all__ = [
    "array_of", "map_of", "record_of", "field_count", "filter_array",
    "transform_array", "aggregate_array", "element_at_path", "map_keys_of",
    "map_values_of", "explode_field", "flatten_array", "slice_array",
    "array_contains_value", "distinct_array", "sort_array_asc",
    "zip_arrays", "unescape_json_record", "escape_json_record", "coalesce_fields",
]


def array_of(*cols: Column) -> Column:
    return F.array(*cols)


def map_of(*cols: Column) -> Column:
    """RecordPath mapOf(k1,v1,k2,v2,...)."""
    return F.create_map(*cols)


def record_of(**fields: Column) -> Column:
    """RecordPath recordOf(...) → struct with named fields."""
    return F.struct(*[v.alias(k) for k, v in fields.items()])


def field_count(c: Column) -> Column:
    """RecordPath count() over an array field."""
    return F.size(c)


def filter_array(c: Column, pred) -> Column:
    return F.filter(c, pred)


def transform_array(c: Column, fn) -> Column:
    return F.transform(c, fn)


def aggregate_array(c: Column, zero, merge, finish=None) -> Column:
    if finish is None:
        return F.aggregate(c, zero, merge)
    return F.aggregate(c, zero, merge, finish)


def element_at_path(c: Column, key) -> Column:
    return F.element_at(c, key)


def map_keys_of(c: Column) -> Column:
    return F.map_keys(c)


def map_values_of(c: Column) -> Column:
    return F.map_values(c)


def explode_field(c: Column) -> Column:
    return F.explode(c)


def flatten_array(c: Column) -> Column:
    return F.flatten(c)


def slice_array(c: Column, start: int, length: int) -> Column:
    return F.slice(c, start, length)


def array_contains_value(c: Column, v) -> Column:
    return F.array_contains(c, v)


def distinct_array(c: Column) -> Column:
    return F.array_distinct(c)


def sort_array_asc(c: Column, asc: bool = True) -> Column:
    return F.sort_array(c, asc)


def zip_arrays(a: Column, b: Column, fn) -> Column:
    return F.zip_with(a, b, fn)


def unescape_json_record(c: Column, schema) -> Column:
    """EL unescapeJson → parse a JSON string into a typed struct."""
    return F.from_json(c, schema)


def escape_json_record(c: Column) -> Column:
    return F.to_json(c)


def coalesce_fields(*cols: Column) -> Column:
    return F.coalesce(*cols)
