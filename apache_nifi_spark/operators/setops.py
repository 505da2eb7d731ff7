"""Sorts / limits / set operations (SURVEY.md §2.8).

``funnel`` is NiFi's funnel (N edges → 1 = UNION ALL); distinct union,
intersect and except cover the membership-routing idioms
(ScanContent/DetectDuplicate chains).

Scale: unionByName is a zero-shuffle plan concatenation; intersect/except
shuffle both sides on all columns — at scale prefer the keyed semi/anti
joins in ``operators.join`` when a key exists.
"""

from __future__ import annotations

from pyspark.sql import DataFrame

__all__ = ["funnel", "distinct_union", "intersect_records", "except_records"]


def funnel(*dfs: DataFrame) -> DataFrame:
    """Funnel: merge N connections into one — UNION ALL, schema-aligned by
    name, missing columns padded with null (NiFi merges heterogeneous
    FlowFile streams the same way: attributes union, content pass-through).
    """
    out = dfs[0]
    for d in dfs[1:]:
        out = out.unionByName(d, allowMissingColumns=True)
    return out


def distinct_union(*dfs: DataFrame) -> DataFrame:
    """UNION (distinct)."""
    return funnel(*dfs).dropDuplicates()


def intersect_records(a: DataFrame, b: DataFrame, keep_duplicates: bool = False) -> DataFrame:
    return a.intersectAll(b) if keep_duplicates else a.intersect(b)


def except_records(a: DataFrame, b: DataFrame, keep_duplicates: bool = False) -> DataFrame:
    return a.exceptAll(b) if keep_duplicates else a.subtract(b)
