"""Kafka semantics closed for real on the file bus (streaming/kafka_bus).

The differential contract: a pipeline written against Spark's Kafka
source SCHEMA must produce, via publish→consume on the bus, exactly what
the same computation produces as pure batch on the original records —
plus the broker invariants (contiguous monotone offsets per partition,
sticky key partitioning, checkpointed exactly-once resume).
"""

import json

import pytest
from pyspark.sql import functions as F

from apache_nifi_spark.streaming.kafka_bus import KAFKA_SOURCE_SCHEMA, FileKafkaBus
from apache_nifi_spark.streaming.sources import run_to_memory


@pytest.fixture()
def bus(tmp_path):
    return FileKafkaBus(str(tmp_path / "bus"), num_partitions=4)


def _events(spark, n=200):
    return spark.range(n).select(
        F.col("id").alias("event_id"),
        (F.col("id") % 7).cast("string").alias("user_id"),
        F.concat(F.lit("type_"), (F.col("id") % 3).cast("string")).alias("event_type"),
        (F.col("id") * 1.5).alias("value"),
    )


def _published(spark, bus, topic="t", n=200):
    df = _events(spark, n).select(
        F.col("user_id").alias("k"),
        F.to_json(F.struct("event_id", "event_type", "value")).alias("v"),
    )
    bus.publish(df, topic, key_col="k", value_col="v")
    return bus


def test_consume_schema_is_exact_kafka_source_schema(spark, bus):
    _published(spark, bus)
    sdf = bus.consume(spark, "t")
    assert sdf.isStreaming
    expected = [
        ("key", "binary"),
        ("value", "binary"),
        ("topic", "string"),
        ("partition", "int"),
        ("offset", "bigint"),
        ("timestamp", "timestamp"),
        ("timestampType", "int"),
    ]
    assert sdf.dtypes == expected


def test_offsets_contiguous_and_monotone_across_publishes(spark, bus):
    _published(spark, bus, n=100)
    first_ends = bus.log_end_offsets("t")
    _published(spark, bus, n=50)
    batch = bus.read_batch(spark, "t")
    per_part = (
        batch.groupBy("partition")
        .agg(
            F.count("*").alias("n"),
            F.min("offset").alias("lo"),
            F.max("offset").alias("hi"),
            F.countDistinct("offset").alias("d"),
        )
        .collect()
    )
    for r in per_part:
        assert r["lo"] == 0, "log starts at offset 0"
        assert r["hi"] == r["n"] - 1, "contiguous, no gaps"
        assert r["d"] == r["n"], "no duplicate offsets"
    ends = bus.log_end_offsets("t")
    assert sum(ends.values()) == 150
    assert all(ends[p] >= first_ends.get(p, 0) for p in ends), "log-end only advances"


def test_same_key_lands_on_same_partition(spark, bus):
    _published(spark, bus)
    batch = bus.read_batch(spark, "t").withColumn("k", F.col("key").cast("string"))
    multi = (
        batch.groupBy("k")
        .agg(F.countDistinct("partition").alias("nparts"))
        .filter(F.col("nparts") > 1)
        .count()
    )
    assert multi == 0


def test_differential_stream_vs_batch(spark, bus):
    """The headline closure: Kafka-schema pipeline via the bus ==
    the same aggregation straight over the source records."""
    _published(spark, bus, n=300)

    def pipeline(kafka_df):
        parsed = kafka_df.select(
            F.from_json(
                F.col("value").cast("string"),
                "event_id bigint, event_type string, value double",
            ).alias("r")
        ).select("r.*")
        return parsed.groupBy("event_type").agg(
            F.count("*").alias("n"),
            F.sum(F.col("value").cast("decimal(30,6)")).cast("double").alias("total"),
        )

    via_bus = run_to_memory(pipeline(bus.consume(spark, "t")), output_mode="complete")
    direct = (
        _events(spark, 300)
        .groupBy("event_type")
        .agg(
            F.count("*").alias("n"),
            F.sum(F.col("value").cast("decimal(30,6)")).cast("double").alias("total"),
        )
    )
    assert sorted(via_bus.collect()) == sorted(direct.collect())


def test_consumer_group_resume_exactly_once(spark, bus, tmp_path):
    """A consumer group (stable checkpoint) that drained the log sees ONLY
    newly published records on its next drain — no replay, no loss."""
    _published(spark, bus, n=60)
    cp = str(tmp_path / "group1_cp")
    out = str(tmp_path / "group1_out")

    def drain():
        q = (
            bus.consume(spark, "t")
            .writeStream.format("parquet")
            .option("path", out)
            .option("checkpointLocation", cp)
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
        return spark.read.schema(KAFKA_SOURCE_SCHEMA).parquet(out)

    assert drain().count() == 60
    _published(spark, bus, n=25)
    sunk = drain()
    assert sunk.count() == 85  # 25 new appended — no replay of the first 60
    dupes = (
        sunk.groupBy("partition", "offset").count().filter(F.col("count") > 1).count()
    )
    assert dupes == 0  # exactly-once: every (partition, offset) delivered once


def test_null_key_round_robins_all_partitions(spark, bus):
    df = spark.range(400).select(F.col("id").cast("string").alias("v"))
    bus.publish(df, "nk", key_col=None, value_col="v")
    parts = {r["partition"] for r in bus.read_batch(spark, "nk").select("partition").distinct().collect()}
    assert parts == {0, 1, 2, 3}


def test_streaming_publish_idempotent_producer(spark, bus, tmp_path):
    """foreachBatch publisher with the transactional.id ledger: a stream
    drains into the topic exactly once, and a REPLAYED micro-batch (same
    batchId redelivered after a simulated restart) does not double-append."""
    src_dir = str(tmp_path / "src")
    _events(spark, 40).write.parquet(src_dir)
    sdf = spark.readStream.schema(
        "event_id bigint, user_id string, event_type string, value double"
    ).parquet(src_dir).select(
        F.col("user_id").alias("k"),
        F.to_json(F.struct("event_id", "event_type", "value")).alias("v"),
    )
    q = bus.publish_stream(
        sdf, "st", "producer-1", str(tmp_path / "cp"), key_col="k", value_col="v"
    )
    q.awaitTermination()
    assert bus.read_batch(spark, "st").count() == 40

    import json as _json
    import os as _os
    import shutil

    led = _os.path.join(bus.root, "st", "_producer_producer-1.json")
    assert _json.load(open(led))["last_batch"] == 0

    # simulate a post-publish, pre-checkpoint crash: wipe the CHECKPOINT
    # (but keep the producer ledger) so the engine redelivers batch 0 —
    # the ledger must recognize the replay and skip the append
    shutil.rmtree(str(tmp_path / "cp"))
    q2 = bus.publish_stream(
        sdf, "st", "producer-1", str(tmp_path / "cp"), key_col="k", value_col="v"
    )
    q2.awaitTermination()
    assert bus.read_batch(spark, "st").count() == 40  # no double-append


# ---------------------------------------------------------------------
# AMQP exchange semantics over the bus (streaming/amqp_bus.py)
# ---------------------------------------------------------------------

def test_amqp_topic_regex_translation():
    import re

    from apache_nifi_spark.streaming.amqp_bus import amqp_topic_regex

    cases = {
        "a.b": {"a.b": True, "a.b.c": False, "a": False},
        "*.b": {"a.b": True, "x.b": True, "a.c": False, "b": False},
        "a.#": {"a": True, "a.b": True, "a.b.c": True, "b.a": False},
        "#.b": {"b": True, "a.b": True, "x.y.b": True, "b.a": False},
        "a.#.b": {"a.b": True, "a.x.b": True, "a.x.y.b": True, "a.bc": False},
        "#": {"a": True, "a.b.c": True, "": True},
        "*": {"a": True, "a.b": False},
    }
    for pattern, checks in cases.items():
        rx = amqp_topic_regex(pattern)
        for key, want in checks.items():
            got = re.fullmatch(rx.strip("^$"), key) is not None
            assert got is want, (pattern, rx, key, want, got)
    import pytest as _pytest

    with _pytest.raises(ValueError):
        amqp_topic_regex("a.b#")


def test_amqp_exchange_kinds_and_deliver_once(spark, tmp_path):
    from apache_nifi_spark.streaming.amqp_bus import AmqpExchange
    from apache_nifi_spark.streaming.kafka_bus import FileKafkaBus

    df = spark.createDataFrame(
        [("order.eu", "a"), ("order.us", "b"), ("cancel.eu", "c"), ("order", "d")],
        "rk string, v string",
    )
    bus = FileKafkaBus(str(tmp_path / "bus"), num_partitions=2)

    topic = AmqpExchange(bus, "t", kind="topic")
    # two overlapping bindings on ONE queue: order.eu matches both but
    # must be delivered once (AMQP rule)
    topic.bind("q1", "order.#").bind("q1", "*.eu")
    n = topic.publish(df, "rk", "v")
    got = sorted(
        r["key"].decode() for r in topic.read_batch(spark, "q1").collect()
    )
    assert got == ["cancel.eu", "order", "order.eu", "order.us"]
    assert n["q1"] == 4

    direct = AmqpExchange(bus, "d", kind="direct")
    direct.bind("qd", "order.eu")
    direct.publish(df, "rk", "v")
    assert [r["key"].decode() for r in direct.read_batch(spark, "qd").collect()] == ["order.eu"]

    fan = AmqpExchange(bus, "f", kind="fanout")
    fan.bind("qa").bind("qb")
    fan.publish(df, "rk", "v")
    assert fan.read_batch(spark, "qa").count() == 4
    assert fan.read_batch(spark, "qb").count() == 4

    # differential: exchange-routed queue == plain batch filter
    import pyspark.sql.functions as F

    want = sorted(
        r["v"] for r in df.filter(
            F.col("rk").rlike("^order(?:\\.[^.]+)*$") | F.col("rk").rlike("^[^.]+\\.eu$")
        ).collect()
    )
    assert sorted(
        r["value"].decode() for r in topic.read_batch(spark, "q1").collect()
    ) == want
