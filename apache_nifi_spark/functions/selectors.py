"""Subscription/selector semantics for the connector-level consumers.

NiFi 2.7.2 surface [SURVEY.md §2.1]: ``ConsumeMQTT`` subscribes with MQTT
topic filters (``+``/``#`` wildcards), ``ConsumeJMS`` applies a JMS
message selector (the SQL-92 conditional subset), ``GetMongo`` filters
with a MongoDB query document.  The *wire* clients are commodity
libraries; the semantics worth an engine are these three little
predicate languages — each compiled here to a Catalyst ``Column`` at
plan-build time, so filtering is pushdown-eligible, codegen'd, and free
of per-row Python at any scale.
"""

from __future__ import annotations

import re
from typing import Any

from pyspark.sql import Column
from pyspark.sql import functions as F

__all__ = [
    "mqtt_filter_regex",
    "mqtt_topic_matches",
    "compile_mongo_query",
    "jms_selector",
]


# ---------------------------------------------------------------------
# MQTT topic filters (MQTT 5.0 spec §4.7: topic names and filters)
# ---------------------------------------------------------------------

def mqtt_filter_regex(topic_filter: str) -> str:
    """Compile an MQTT topic filter to an RE2-safe anchored regex.

    Rules (MQTT 5.0 §4.7.1):
    - ``+`` matches exactly one level (cannot match an empty filter-level
      boundary's slash);
    - a trailing ``/#`` matches the parent level itself and any number of
      child levels (``sport/#`` matches ``sport``);
    - a bare ``#`` matches every topic.

    The ``$``-prefix rule (wildcard-leading filters must not match
    ``$SYS/…`` topics) is handled in :func:`mqtt_topic_matches` as a
    separate conjunct, NOT with a lookahead — lookaheads aren't RE2, and
    keeping the regex RE2-clean lets the same pattern run in engines
    (DuckDB among them) whose regex is RE2.
    """
    levels = topic_filter.split("/")
    parts: list[str] = []
    for i, lvl in enumerate(levels):
        if lvl == "#":
            if i != len(levels) - 1:
                raise ValueError("'#' is only valid as the last level")
            if i == 0:
                return "^.*$"
            # trailing '/#': the separator for this level hasn't been
            # appended yet, so make the whole '/tail' optional — the
            # parent level itself matches too.
            parts.append("(/.*)?")
            break
        if i:
            parts.append("/")
        if lvl == "+":
            parts.append("[^/]*")
        elif "+" in lvl or "#" in lvl:
            raise ValueError(f"wildcard must occupy a whole level: {lvl!r}")
        else:
            parts.append(re.escape(lvl))
    return "^" + "".join(parts) + "$"


def mqtt_topic_matches(topic: Column, topic_filter: str) -> Column:
    """Boolean Column: does ``topic`` match ``topic_filter``?

    Implements the full matching rule including the ``$``-prefix guard:
    filters whose FIRST level is a wildcard never match topics starting
    with ``$`` (so ``#`` doesn't sweep up ``$SYS`` topics).
    """
    m = topic.rlike(mqtt_filter_regex(topic_filter))
    first = topic_filter.split("/")[0]
    if first in ("+", "#"):
        m = m & ~topic.startswith("$")
    return m


# ---------------------------------------------------------------------
# MongoDB query documents (GetMongo's `Query` property)
# ---------------------------------------------------------------------

_CMP = {
    "$eq": lambda c, v: c.eqNullSafe(F.lit(v)) if v is None else (c == F.lit(v)),
    # Mongo's $ne matches documents where the field is ABSENT or null —
    # under Spark's three-valued logic `c != lit(v)` is NULL there and
    # the row would be dropped, so the null case is explicit (same
    # reasoning as $nin below; ADVICE r4 #2).
    "$ne": lambda c, v: ~c.eqNullSafe(F.lit(v))
    if v is None
    else ((c != F.lit(v)) | c.isNull()),
    "$gt": lambda c, v: c > F.lit(v),
    "$gte": lambda c, v: c >= F.lit(v),
    "$lt": lambda c, v: c < F.lit(v),
    "$lte": lambda c, v: c <= F.lit(v),
}


def _field_predicate(field: str, cond: Any) -> Column:
    col = F.col(field)
    if not isinstance(cond, dict):
        # {field: literal} — implicit $eq
        return _CMP["$eq"](col, cond)
    preds: list[Column] = []
    for op, v in cond.items():
        if op in _CMP:
            preds.append(_CMP[op](col, v))
        elif op == "$in":
            preds.append(col.isin(list(v)))
        elif op == "$nin":
            # Mongo's $nin also matches missing fields
            preds.append(~col.isin(list(v)) | col.isNull())
        elif op == "$exists":
            preds.append(col.isNotNull() if v else col.isNull())
        elif op == "$regex":
            preds.append(col.rlike(v))
        elif op == "$not":
            # $not matches when the inner predicate does NOT — including
            # absent/null fields, where the inner predicate is NULL and
            # bare `~pred` would drop the row (ADVICE r4 #2).
            preds.append(~_field_predicate(field, v) | col.isNull())
        else:
            raise ValueError(f"unsupported operator {op!r}")
    out = preds[0]
    for p in preds[1:]:
        out = out & p
    return out


def compile_mongo_query(query: dict[str, Any]) -> Column:
    """Compile a MongoDB query document to a Catalyst predicate Column.

    Supported surface (the subset GetMongo flows actually write):
    implicit equality, ``$eq $ne $gt $gte $lt $lte $in $nin $exists
    $regex $not`` per field, and ``$and $or $nor`` at any level.  Dotted
    paths work via ``F.col``'s nested-field resolution.

    Top-level keys combine with AND — exactly Mongo's semantics.
    """
    preds: list[Column] = []
    for key, val in query.items():
        if key in ("$and", "$or", "$nor"):
            subs = [compile_mongo_query(sub) for sub in val]
            combined = subs[0]
            for s in subs[1:]:
                combined = (combined & s) if key == "$and" else (combined | s)
            preds.append(~combined if key == "$nor" else combined)
        elif key.startswith("$"):
            raise ValueError(f"unsupported top-level operator {key!r}")
        else:
            preds.append(_field_predicate(key, val))
    if not preds:
        return F.lit(True)
    out = preds[0]
    for p in preds[1:]:
        out = out & p
    return out


# ---------------------------------------------------------------------
# JMS message selectors (JMS 3.1 §3.8: SQL-92 conditional subset)
# ---------------------------------------------------------------------

#: Tokens legal in a JMS selector beyond identifiers/literals.  Spark
#: SQL's expression grammar is a strict superset of the JMS selector
#: grammar, so compilation is `F.expr` — but only after this allowlist
#: rejects anything outside the selector language (function calls,
#: subqueries, casts), which would otherwise smuggle arbitrary SQL.
_JMS_KEYWORDS = {
    "and", "or", "not", "between", "like", "escape", "in", "is", "null",
    "true", "false",
}

#: SQL reserved words that are NOT part of the JMS selector grammar but
#: would parse in Spark SQL — rejecting them closes the smuggling
#: channels the token scan alone missed (ADVICE r4 #3): scalar/IN
#: subqueries (`x IN (SELECT ...)` — '(' follows the keyword IN, so the
#: function-call check never fires) and niladic functions
#: (`current_date`).  JMS 3.1 §3.8 technically allows such words as
#: property names; this compiler rejects them — rename or quote the
#: property upstream (documented divergence, the safe default).
_JMS_FORBIDDEN = {
    "select", "from", "where", "group", "having", "order", "by", "union",
    "intersect", "except", "join", "inner", "outer", "left", "right",
    "cross", "lateral", "case", "when", "then", "else", "end", "cast",
    "exists", "all", "any", "some", "distinct", "as", "interval", "with",
    "values", "limit", "window", "over", "partition",
    "current_date", "current_timestamp", "current_time", "current_user",
    "session_user", "user", "now", "rand", "random", "uuid", "pi", "e",
}

_TOKEN_RE = re.compile(
    r"""\s*(?:
        (?P<str>'(?:[^']|'')*')            # SQL string literal
      | (?P<num>\d+(?:\.\d*)?(?:[eE][+-]?\d+)?)
      | (?P<ident>[A-Za-z_$][A-Za-z0-9_$.]*)
      | (?P<op><>|<=|>=|=|<|>|\+|-|\*|/|\(|\)|,)
    )""",
    re.X,
)


def jms_selector(selector: str) -> Column:
    """Compile a JMS message selector to a predicate Column.

    JMS selectors are the SQL-92 conditional-expression subset over
    header fields and properties (identifiers), with ``BETWEEN``,
    ``IN``, ``LIKE [ESCAPE]``, ``IS [NOT] NULL``, boolean/arithmetic
    operators, and typed literals.  That grammar parses identically in
    Spark SQL, so the compiler is: tokenize, verify every token is
    selector-legal (no function application — an identifier directly
    followed by ``(`` is rejected), then hand the text to ``F.expr``.
    """
    pos = 0
    prev_ident = False
    n = len(selector)
    while pos < n:
        m = _TOKEN_RE.match(selector, pos)
        if not m:
            if selector[pos:].strip() == "":
                break
            raise ValueError(f"illegal token at {selector[pos:pos+20]!r}")
        if m.group("ident"):
            word = m.group("ident").lower()
            if word in _JMS_FORBIDDEN:
                raise ValueError(
                    f"{word!r} is not JMS selector syntax (SQL reserved word)"
                )
            prev_ident = word not in _JMS_KEYWORDS
        elif m.group("op"):
            if m.group("op") == "(" and prev_ident:
                raise ValueError("function calls are not JMS selector syntax")
            prev_ident = False
        else:
            prev_ident = False
        pos = m.end()
    return F.expr(selector)
