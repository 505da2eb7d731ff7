"""ConsumeAMQP / PublishAMQP wire semantics over the FileKafkaBus
transport (SURVEY.md §2.1 — the last connector row that was
pattern-only).

AMQP 0-9-1's routing model (the part worth an engine; the wire client is
a commodity library): producers publish to an EXCHANGE with a routing
key; the exchange routes each message to the QUEUES whose bindings
match.  Three exchange kinds cover the model:

- ``direct``: binding key equals the routing key exactly;
- ``fanout``: every bound queue, key ignored;
- ``topic``: dot-separated binding patterns, ``*`` = exactly one word,
  ``#`` = zero or more words (RabbitMQ tutorial 5 semantics — ``a.#``
  matches ``a`` itself).

Spark-first shape: each queue is a topic on the :class:`FileKafkaBus`
(so consumers inherit its exactly-once, checkpointed-resume, contiguous
offset semantics unchanged), and ROUTING IS A CATALYST PREDICATE — the
binding pattern compiles once, driver-side, to an RE2-safe regex and
each queue's delivery is ``df.filter(pred)``: codegen'd, pushdown-
eligible, zero per-message Python.  A message matched by several
bindings of the same queue is delivered ONCE (AMQP's rule): the
per-queue predicate is the OR of its binding predicates, not a union of
per-binding copies.

At scale this is exactly a multi-sink routed write — one scan, Q
filtered writes; the same shape PartitionRecord/RouteOnAttribute use.
"""

from __future__ import annotations

import re

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from apache_nifi_spark.streaming.kafka_bus import FileKafkaBus

__all__ = ["amqp_topic_regex", "binding_matches", "AmqpExchange"]


def amqp_topic_regex(pattern: str) -> str:
    """Compile an AMQP topic binding pattern to an anchored RE2-safe
    regex (no lookaround, so the identical pattern runs in DuckDB).

    Words are dot-separated; ``*`` matches exactly one word; ``#``
    matches zero or more words and absorbs its adjacent dot (``a.#``
    matches ``a``; ``#.a`` matches ``a``; ``a.#.b`` matches ``a.b``).
    """
    for tok in pattern.split("."):
        if tok in ("*", "#"):
            continue
        if "*" in tok or "#" in tok:
            raise ValueError(f"wildcard must occupy a whole word: {tok!r}")
    esc = re.escape(pattern)
    # interior '#': consume both dots, re-emit one + zero-or-more words
    prev = None
    while prev != esc:
        prev = esc
        esc = esc.replace(r"\.\#\.", r"\.(?:[^.]+\.)*@MID@")
    esc = esc.replace("@MID@", "")
    esc = esc.replace(r"\.\#", r"(?:\.[^.]+)*")  # trailing '.#'
    esc = esc.replace(r"\#\.", r"(?:[^.]+\.)*")  # leading '#.'
    esc = esc.replace(r"\#", ".*")               # bare '#'
    esc = esc.replace(r"\*", "[^.]+")
    return "^" + esc + "$"


def binding_matches(routing_key: Column, kind: str, binding_key: str) -> Column:
    """Boolean Column: does a message with ``routing_key`` match one
    binding of an exchange of ``kind``?"""
    if kind == "fanout":
        return F.lit(True)
    if kind == "direct":
        return routing_key == F.lit(binding_key)
    if kind == "topic":
        return routing_key.rlike(amqp_topic_regex(binding_key))
    raise ValueError(f"unsupported exchange kind {kind!r}")


class AmqpExchange:
    """An AMQP exchange routing onto FileKafkaBus-backed queues.

    >>> ex = AmqpExchange(bus, "events", kind="topic")
    >>> ex.bind("q_click", "click.#")
    >>> ex.bind("q_even", "*.even")
    >>> ex.publish(df, routing_key_col="rk", value_col="v")
    >>> ex.read_batch(spark, "q_click")          # Kafka source schema
    """

    def __init__(self, bus: FileKafkaBus, name: str, kind: str = "topic"):
        if kind not in ("direct", "fanout", "topic"):
            raise ValueError(f"unsupported exchange kind {kind!r}")
        self.bus = bus
        self.name = name
        self.kind = kind
        self._bindings: dict[str, list[str]] = {}  # queue -> binding keys

    def bind(self, queue: str, binding_key: str = "") -> "AmqpExchange":
        self._bindings.setdefault(queue, []).append(binding_key)
        return self

    def _queue_topic(self, queue: str) -> str:
        return f"{self.name}.{queue}"

    def _queue_pred(self, rk: Column, queue: str) -> Column:
        # AMQP delivery rule: one copy per queue no matter how many of
        # its bindings match — OR the predicates, don't union the rows.
        preds = [
            binding_matches(rk, self.kind, b) for b in self._bindings[queue]
        ]
        out = preds[0]
        for p in preds[1:]:
            out = out | p
        return out

    def publish(
        self,
        df: DataFrame,
        routing_key_col: str = "routing_key",
        value_col: str = "value",
    ) -> dict[str, int]:
        """Route ``df`` to every bound queue; returns rows-delivered per
        queue.  One scan, Q codegen'd filtered publishes; the routing key
        rides along as the Kafka-schema key so consumers can re-read it.
        """
        delivered: dict[str, int] = {}
        rk = F.col(routing_key_col)
        for queue in self._bindings:
            routed = df.filter(self._queue_pred(rk, queue)).select(
                rk.alias("__amqp_rk"), F.col(value_col).alias("__amqp_v")
            )
            delivered[queue] = self.bus.publish(
                routed,
                self._queue_topic(queue),
                key_col="__amqp_rk",
                value_col="__amqp_v",
            )
        return delivered

    def read_batch(self, spark: SparkSession, queue: str) -> DataFrame:
        """Batch view of a queue (Kafka source schema; key = routing key)."""
        return self.bus.read_batch(spark, self._queue_topic(queue))

    def consume(self, spark: SparkSession, queue: str, **kw) -> DataFrame:
        """Streaming consumer for a queue — FileKafkaBus semantics
        (checkpointed exactly-once, resumable) apply unchanged."""
        return self.bus.consume(spark, self._queue_topic(queue), **kw)
