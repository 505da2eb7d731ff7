"""Jolt chain tests: columnar ↔ interpreter differential, wildcard
semantics, guards."""

from __future__ import annotations

import json

import pytest

from apache_nifi_spark.functions.jolt import (
    jolt_columnar,
    jolt_reference,
    jolt_transform_json,
)

CHAIN = [
    {"operation": "shift", "spec": {
        "id": "order.key",
        "status": ["order.state", "audit.state"],
        "cust": {"name": "who.name"},
    }},
    {"operation": "default", "spec": {"order": {"source": "import"}, "tag": 1}},
    {"operation": "remove", "spec": {"audit": ""}},
]

DOCS = [
    {"id": 7, "status": "F", "cust": {"name": "Ann", "zip": "x"}, "junk": 1},
    {"id": 1},                      # partial: unmatched subtrees omitted
    {"cust": {"zip": "x"}},         # nothing shifts; defaults only
    {},                             # empty document
]


def test_columnar_matches_interpreter(spark):
    """The two execution tiers must agree document-for-document
    (parsed comparison — key order is tier-specific)."""
    assert jolt_columnar("content", CHAIN) is not None
    df = spark.createDataFrame(
        [(i, json.dumps(d)) for i, d in enumerate(DOCS)] + [(99, "not json")],
        "i int, content string",
    )
    got = {
        r["i"]: (json.loads(r["content"]) if r["content"] is not None else None)
        for r in jolt_transform_json(df, CHAIN, "content").collect()
    }
    for i, d in enumerate(DOCS):
        assert got[i] == jolt_reference(json.loads(json.dumps(d)), CHAIN), (i, got[i])
    assert got[99] is None  # unparseable → null in both tiers


def test_wildcard_and_backreference_interpreter(spark):
    ops = [{"operation": "shift", "spec": {"*": "flat.&", "keep": "top"}}]
    assert jolt_columnar("content", ops) is None  # interpreter tier
    doc = {"a": 1, "b": "x", "keep": True}
    assert jolt_reference(dict(doc), ops) == {
        "flat": {"a": 1, "b": "x"},
        "top": True,
    }
    df = spark.createDataFrame([(json.dumps(doc),)], "content string")
    out = json.loads(jolt_transform_json(df, ops).first()["content"])
    assert out == {"flat": {"a": 1, "b": "x"}, "top": True}


def test_backreference_levels():
    ops = [{"operation": "shift", "spec": {"grp": {"*": "&1.&0.v"}}}]
    assert jolt_reference({"grp": {"x": 5}}, ops) == {"grp": {"x": {"v": 5}}}


def test_remove_wildcard_and_default_no_overwrite():
    assert jolt_reference(
        {"a": 1, "b": 2}, [{"operation": "remove", "spec": {"*": ""}}]
    ) == {}
    assert jolt_reference(
        {"k": "keep"}, [{"operation": "default", "spec": {"k": "new"}}]
    ) == {"k": "keep"}


def test_default_remove_into_shifted_leaf_falls_back(spark):
    """A default/remove spec that descends into (or scalar-defaults over)
    a shifted LEAF cannot be compiled — the leaf's runtime type/presence
    is unknown — so the chain must route to the interpreter tier and the
    tiers must agree."""
    cases = [
        # default descends into a leaf that is a dict at runtime
        ([{"operation": "shift", "spec": {"a": "x"}},
          {"operation": "default", "spec": {"x": {"b": 1}}}],
         {"a": {"c": 2}}),
        # remove descends into a leaf that is a dict at runtime
        ([{"operation": "shift", "spec": {"a": "x"}},
          {"operation": "remove", "spec": {"x": {"c": ""}}}],
         {"a": {"c": 2, "d": 3}}),
        # scalar default fills a shifted key absent at runtime
        ([{"operation": "shift", "spec": {"a": "x"}},
          {"operation": "default", "spec": {"x": 5}}],
         {}),
    ]
    for ops, doc in cases:
        assert jolt_columnar("content", ops) is None, ops
        df = spark.createDataFrame([(json.dumps(doc),)], "content string")
        out = json.loads(jolt_transform_json(df, ops).first()["content"])
        assert out == jolt_reference(json.loads(json.dumps(doc)), ops), ops


def test_unsupported_operation_raises():
    with pytest.raises(ValueError, match="unsupported Jolt operation"):
        jolt_reference({}, [{"operation": "cardinality", "spec": {}}])
