"""Plan introspection + provenance (SURVEY.md §3.1, §4, §2.11 provenance).

NiFi's observability surface is the provenance repository (per-FlowFile
lineage events) and the flow's live queue counts; our engine's equivalents
are Catalyst plan introspection (:mod:`introspect` — the IR at each
lifecycle stage, §3.1) and ``observe()``-based row accounting
(:mod:`provenance`).
"""

from apache_nifi_spark.plans.introspect import (
    count_codegen_spans,
    count_exchanges,
    executed_plan,
    formatted_explain,
    has_broadcast_join,
    pushed_filters,
)
from apache_nifi_spark.plans.provenance import ProvenanceTrail
from apache_nifi_spark.plans.flow_registry import FlowRegistry

__all__ = [
    "FlowRegistry",
    "ProvenanceTrail",
    "count_codegen_spans",
    "count_exchanges",
    "executed_plan",
    "formatted_explain",
    "has_broadcast_join",
    "pushed_filters",
]
