"""Catalyst plan introspection — the query-lifecycle IR (SURVEY.md §3.1).

NiFi executes its flow graph as drawn, with no optimizer and no plan to
inspect (§4.1); this module is the observability surface that replaces
"look at the canvas": what filters reached the scan, where the shuffles
are, how wide the codegen spans stretch.  Tests use it to pin the
physical-plan properties the 100 TB design depends on (pushdown,
broadcast choice, bounded exchange count) so a regression in plan shape
fails CI before it fails a cluster.
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame


def executed_plan(df: DataFrame) -> str:
    """The physical (executed) plan, post-AQE-prep, as text."""
    return df._jdf.queryExecution().executedPlan().toString()


def formatted_explain(df: DataFrame) -> str:
    """`EXPLAIN FORMATTED` text: numbered operators + per-operator detail
    (PushedFilters, ReadSchema, join build sides...)."""
    jqe = df._jdf.queryExecution()
    jvm = df.sparkSession._jvm
    mode = jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
    return jqe.explainString(mode)


def count_exchanges(df: DataFrame) -> int:
    """Number of shuffle exchanges in the physical plan — every one is a
    full network rewrite of the stream; the scale budget counts them."""
    return len(re.findall(r"\bExchange (?:hashpartitioning|rangepartitioning|RoundRobinPartitioning|SinglePartition)", executed_plan(df)))


def count_codegen_spans(df: DataFrame) -> int:
    """Number of WholeStageCodegen spans — wider/fewer is better (more
    operators fused into single JVM loops).

    Under AQE codegen is inserted per query stage at execution, so run an
    action on ``df`` first (e.g. ``df.collect()``); before that the
    adaptive plan reports zero spans."""
    return len(set(re.findall(r"\[codegen id : (\d+)\]", formatted_explain(df))))


def pushed_filters(df: DataFrame) -> list[str]:
    """Filters that reached the data source scan (predicate pushdown)."""
    out: list[str] = []
    for m in re.finditer(r"PushedFilters: \[([^\]]*)\]", formatted_explain(df)):
        body = m.group(1).strip()
        if body:
            out.extend(p.strip() for p in body.split(","))
    return out


def has_broadcast_join(df: DataFrame) -> bool:
    """True if any join in the plan is broadcast (hash or nested-loop) —
    the small-dim strategy LookupRecord maps to (§2.6)."""
    plan = executed_plan(df)
    return "BroadcastHashJoin" in plan or "BroadcastNestedLoopJoin" in plan
