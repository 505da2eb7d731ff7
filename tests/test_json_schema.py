"""ValidateJson compiler tests: keyword semantics the registry fixture
doesn't reach (arrays, enum misses, vacuous checks, first-error order).
"""

from __future__ import annotations

from apache_nifi_spark.functions.json_schema import json_schema_sql, validate_json

SCHEMA = {
    "type": "object",
    "required": ["id"],
    "properties": {
        "id": {"type": "integer", "minimum": 1},
        "tags": {"type": "array", "minItems": 1, "maxItems": 3},
        "kind": {"type": "string", "enum": ["a", "b"]},
        "score": {"type": "number", "maximum": 10},
        "name": {"type": "string", "minLength": 2, "pattern": "^[A-Z]"},
        "flag": {"type": "boolean"},
    },
}

DOCS = {
    "ok": '{"id": 3, "tags": ["x"], "kind": "a", "score": 9.5, "name": "Bo", "flag": true}',
    "int_as_float": '{"id": 4.0}',  # 4.0 IS an integer (zero fraction)
    "id_frac": '{"id": 4.5}',
    "id_low": '{"id": 0}',
    "no_id": '{"kind": "a"}',
    "too_many_tags": '{"id": 1, "tags": [1, 2, 3, 4]}',
    "empty_tags": '{"id": 1, "tags": []}',
    "bad_enum": '{"id": 1, "kind": "z"}',
    "bad_pattern": '{"id": 1, "name": "bo"}',
    "short_name": '{"id": 1, "name": "B"}',
    "flag_str": '{"id": 1, "flag": "true"}',
    "vacuous_nonstring_enum": '{"id": 1, "kind": 7}',  # enum vacuous; type fails
    "null_id": '{"id": null}',  # present (required ok) but type fails
    "truncated": '{"id": 1',
}

EXPECTED = {
    "ok": (True, None),
    "int_as_float": (True, None),
    "id_frac": (False, "type:$.id"),
    "id_low": (False, "minimum:$.id"),
    "no_id": (False, "required:$.id"),
    "too_many_tags": (False, "maxItems:$.tags"),
    "empty_tags": (False, "minItems:$.tags"),
    "bad_enum": (False, "enum:$.kind"),
    "bad_pattern": (False, "pattern:$.name"),
    "short_name": (False, "minLength:$.name"),
    "flag_str": (False, "type:$.flag"),
    "vacuous_nonstring_enum": (False, "type:$.kind"),
    "null_id": (False, "type:$.id"),
    "truncated": (False, "malformed"),
}


def test_validate_json_keyword_matrix(spark):
    df = spark.createDataFrame(list(DOCS.items()), "k string, content string")
    out = {
        r["k"]: (r["valid"], r["validation_error"])
        for r in validate_json(df, SCHEMA).collect()
    }
    assert out == EXPECTED


def test_sql_backend_agrees_on_matrix():
    import duckdb

    valid_sql, err_sql = json_schema_sql(SCHEMA, "content")
    con = duckdb.connect()
    rows = con.execute(
        "SELECT k, " + valid_sql + ", " + err_sql + " FROM (VALUES "
        + ", ".join(f"('{k}', '{v}')" for k, v in DOCS.items())
        + ") t(k, content)"
    ).fetchall()
    assert {k: (v, e) for k, v, e in rows} == EXPECTED


COMPOSED = {
    "$defs": {"pid": {"type": "string", "pattern": "^P[0-9]+$"}},
    "type": "object",
    "required": ["id"],
    "properties": {
        "id": {"$ref": "#/$defs/pid"},
        "v": {"anyOf": [{"type": "integer", "minimum": 0}, {"type": "string"}]},
        "mode": {
            "oneOf": [
                {"type": "string", "enum": ["a"]},
                {"type": "string", "minLength": 3},
            ]
        },
        "tags": {"maxItems": 3, "items": {"type": "integer", "minimum": 1}},
        "w": {"allOf": [{"type": "integer"}, {"minimum": 5}]},
    },
}

COMPOSED_DOCS = {
    "ok": '{"id": "P1", "v": 3, "mode": "a", "tags": [1, 2], "w": 9}',
    "ok_v_str": '{"id": "P2", "v": "x"}',
    "ok_missing_optional": '{"id": "P3"}',
    "ref_fail": '{"id": "Q1"}',
    "anyof_fail": '{"id": "P4", "v": -2}',
    "oneof_both_true": '{"id": "P5", "mode": "alpha"}',  # one branch only → ok
    "oneof_fail_neither": '{"id": "P6", "mode": "zz"}',
    "items_fail": '{"id": "P7", "tags": [1, 0]}',
    "items_past_len_vacuous": '{"id": "P8", "tags": [5]}',
    "allof_fail": '{"id": "P9", "w": 2}',
}

COMPOSED_EXPECTED = {
    "ok": True,
    "ok_v_str": True,
    "ok_missing_optional": True,
    "ref_fail": False,
    "anyof_fail": False,
    "oneof_both_true": True,
    "oneof_fail_neither": False,
    "items_fail": False,
    "items_past_len_vacuous": True,
    "allof_fail": False,
}


def test_composition_keywords_both_backends(spark):
    """$ref / allOf / anyOf / oneOf / bounded items: the same compiled
    schema must agree with itself across the Spark and DuckDB backends
    AND with the expected spec outcomes."""
    import duckdb

    df = spark.createDataFrame(list(COMPOSED_DOCS.items()), "k string, content string")
    got = {
        r["k"]: r["valid"] for r in validate_json(df, COMPOSED).collect()
    }
    assert got == COMPOSED_EXPECTED

    valid_sql, _ = json_schema_sql(COMPOSED, "content")
    con = duckdb.connect()
    rows = con.execute(
        "SELECT k, " + valid_sql + " FROM (VALUES "
        + ", ".join(f"('{k}', '{v}')" for k, v in COMPOSED_DOCS.items())
        + ") t(k, content)"
    ).fetchall()
    assert {k: v for k, v in rows} == COMPOSED_EXPECTED


EXTENDED = {
    "type": "object",
    "properties": {
        "n": {"multipleOf": 5, "exclusiveMinimum": 0, "exclusiveMaximum": 100},
        "kind": {"const": "order"},
        "ver": {"const": 2},
        "tags": {"uniqueItems": True},
    },
}

EXTENDED_DOCS = {
    "ok": '{"n": 25, "kind": "order", "ver": 2, "tags": [1, 2, "1"]}',
    "not_multiple": '{"n": 7}',
    "at_excl_min": '{"n": 0}',
    "at_excl_max": '{"n": 100}',
    "bad_const_str": '{"kind": "refund"}',
    "bad_const_num": '{"ver": 3}',
    "const_wrong_type": '{"kind": 5}',
    "dup_items": '{"tags": [1, 2, 1]}',
    "dup_str_items": '{"tags": ["a", "a"]}',
    "mixed_not_dup": '{"tags": ["1", 1]}',  # string "1" != number 1
    "all_missing": "{}",
}

EXTENDED_EXPECTED = {
    "ok": (True, None),
    "not_multiple": (False, "multipleOf:$.n"),
    "at_excl_min": (False, "exclusiveMinimum:$.n"),
    "at_excl_max": (False, "exclusiveMaximum:$.n"),
    "bad_const_str": (False, "const:$.kind"),
    "bad_const_num": (False, "const:$.ver"),
    "const_wrong_type": (False, "const-type:$.kind"),
    "dup_items": (False, "uniqueItems:$.tags"),
    "dup_str_items": (False, "uniqueItems:$.tags"),
    "mixed_not_dup": (True, None),
    "all_missing": (True, None),
}


def test_extended_keywords_both_backends(spark):
    """const / multipleOf / exclusiveMin/Max / uniqueItems agree across
    backends and match spec outcomes (incl. the '\"1\"' vs 1 distinction
    uniqueItems must preserve)."""
    import duckdb

    df = spark.createDataFrame(
        list(EXTENDED_DOCS.items()), "k string, content string"
    )
    got = {
        r["k"]: (r["valid"], r["validation_error"])
        for r in validate_json(df, EXTENDED).collect()
    }
    assert got == EXTENDED_EXPECTED

    valid_sql, err_sql = json_schema_sql(EXTENDED, "content")
    con = duckdb.connect()
    rows = con.execute(
        "SELECT k, " + valid_sql + ", " + err_sql + " FROM (VALUES "
        + ", ".join(f"('{k}', '{v}')" for k, v in EXTENDED_DOCS.items())
        + ") t(k, content)"
    ).fetchall()
    assert {k: (v, e) for k, v, e in rows} == EXTENDED_EXPECTED


def test_composition_guards():
    import pytest

    with pytest.raises(ValueError, match="maxItems"):
        json_schema_sql({"items": {"type": "integer"}}, "c")
    with pytest.raises(ValueError, match="unresolvable"):
        json_schema_sql({"$ref": "#/$defs/nope"}, "c")
    with pytest.raises(ValueError, match="depth"):
        json_schema_sql(
            {"$defs": {"a": {"$ref": "#/$defs/a"}}, "$ref": "#/$defs/a"}, "c"
        )


def test_filter_does_not_collapse_staged_projections(spark):
    """Optimizer-fence regression guard (round-6 verdict #1): a consumer
    filtering on ``valid`` must NOT get the staged rule pipeline
    re-inlined into one interpreted filter predicate.  Pre-fence, this
    plan held ~75 copies of the JSON parse per row (24 s / 100k rows at
    sf0.1); with the fence the parse appears exactly once and each
    path's variant-get at most once."""
    df = spark.createDataFrame(list(DOCS.items()), "k string, content string")
    routed = validate_json(df, SCHEMA).filter("valid").drop("valid", "validation_error")
    plan = routed._jdf.queryExecution().optimizedPlan().toString()
    assert plan.count("parseJson") == 1, plan
    # one try_variant_get per registered path (6 property paths, each a
    # variant + possibly a string extraction), never rule-multiplied
    n_gets = plan.count("try_variant_get")
    assert n_gets <= 2 * (len(SCHEMA["properties"]) + 1), (n_gets, plan)
    # the valid-filter must sit ABOVE the staged projections, not be
    # substituted into them: the fence term must survive optimization
    assert "SPARK_PARTITION_ID" in plan.upper(), plan


def test_unsupported_keywords_raise():
    import pytest

    with pytest.raises(ValueError):
        json_schema_sql({"type": "tuple"}, "c")
    with pytest.raises(ValueError):
        json_schema_sql({"enum": [1, 2]}, "c")
