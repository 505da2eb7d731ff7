"""EvaluateXQuery (§2.4 [2.7.2-surface]): XQuery expressions over an XML
content column.

Scope (documented): the FLWOR-less core of XQuery 1.0 — path expressions
with predicates plus the XPath 1.0 function library, which XQuery's
expression grammar embeds verbatim.  That is the overwhelming majority of
EvaluateXQuery property values in real flows (NiFi's own processor doc
examples are all of this form); ``for/let/where/order by/return`` clauses
raise with a clear diagnostic rather than mis-evaluating.

Compilation is onto Spark's built-in ``xpath_*`` family (JVM javax.xml,
evaluated inside codegen — no Python UDF):

- ``count(path)`` / ``sum(path)`` / ``number(path)`` → ``xpath_double``
  (XPath 1.0 evaluates these natively; ``count`` casts back to long)
- ``boolean(...)`` or an explicit comparison → ``xpath_boolean``
- ``string(...)``, ``data(...)``, a ``.../text()`` tail, or any plain
  path → ``xpath_string`` (``data()`` is XQuery spelling; it unwraps to
  the same atomization ``string()`` does for single nodes)

Scale: map-only column expressions over the scan — one javax.xml parse
per (row, expression), identical shape to EvaluateXPath.
"""

from __future__ import annotations

import re
from collections.abc import Mapping

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = ["compile_xquery", "evaluate_xquery"]

#: FLWOR / construction syntax we refuse rather than mis-evaluate
_UNSUPPORTED = re.compile(
    r"(?:^|[^\w$])(for|let|where|order\s+by|return)\s+\$|\belement\s*\{|<\w+[^>]*>"
)

_NUM_FN = re.compile(r"^\s*(count|sum|number)\s*\((.*)\)\s*$", re.DOTALL)
_BOOL_FN = re.compile(r"^\s*boolean\s*\(.*\)\s*$", re.DOTALL)
_STR_FN = re.compile(r"^\s*(?:string|data)\s*\((.*)\)\s*$", re.DOTALL)
_CMP = re.compile(r"(!=|<=|>=|=|<|>|\b(?:and|or)\b)")


def _esc(expr: str) -> str:
    return expr.replace("'", "\\'")


def compile_xquery(xml_col: str, expr: str) -> Column:
    """One XQuery expression → one Spark Column over ``xml_col``."""
    if _UNSUPPORTED.search(expr):
        raise ValueError(
            f"unsupported XQuery (FLWOR/node construction): {expr!r} — "
            "only path+predicate expressions with the XPath function "
            "library compile (documented subset)"
        )
    m = _NUM_FN.match(expr)
    if m:
        fn = m.group(1)
        # XPath 1.0 evaluates count/sum/number natively inside the engine
        col = F.expr(f"xpath_double(`{xml_col}`, '{_esc(expr)}')")
        return col.cast("bigint") if fn == "count" else col
    if _BOOL_FN.match(expr):
        return F.expr(f"xpath_boolean(`{xml_col}`, '{_esc(expr)}')")
    m = _STR_FN.match(expr)
    if m:
        return F.expr(f"xpath_string(`{xml_col}`, '{_esc(m.group(1).strip())}')")
    # a bare comparison over paths is a boolean expression in XPath 1.0
    if expr.lstrip().startswith("/") and _CMP.search(expr):
        return F.expr(f"xpath_boolean(`{xml_col}`, '{_esc(expr)}')")
    return F.expr(f"xpath_string(`{xml_col}`, '{_esc(expr)}')")


def evaluate_xquery(
    df: DataFrame, xml_col: str, queries: Mapping[str, str]
) -> DataFrame:
    """EvaluateXQuery's attribute-destination mode: one output column per
    named expression, like EvaluateXPath but accepting the XQuery
    spellings (``data()``, embedded function calls)."""
    return df.withColumns(
        {out: compile_xquery(xml_col, q) for out, q in queries.items()}
    )
