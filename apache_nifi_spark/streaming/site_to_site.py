"""Site-to-site transfer — SURVEY.md §2.11 / §3.3.

NiFi moves FlowFiles between clusters with the site-to-site protocol
(remote process group → peer's input port over TLS port 10000, evidenced
at reference ``scripts.sh:72-98``).  The Spark-native equivalent is a
shared bus: the producer pipeline streams to a durable directory (or
Kafka topic) with its own checkpoint, the consumer pipeline tails that
bus with a second independent checkpoint — exactly-once on both sides
replaces the S2S two-phase commit.

At scale the bus is an object-store prefix (or Kafka); partitioned
parquet keeps the hand-off splittable so the consumer cluster scans in
parallel.
"""

from __future__ import annotations

import tempfile

from pyspark.sql import DataFrame, SparkSession

__all__ = ["s2s_push", "s2s_pull"]


def s2s_push(sdf: DataFrame, bus_dir: str | None = None) -> str:
    """Producer half (remote process group → peer input port): drain the
    stream to the bus directory, exactly-once via the producer-side
    checkpoint.  Returns the bus path for the consumer."""
    bus = bus_dir or tempfile.mkdtemp(prefix="anspark_s2s_bus_")
    cp = tempfile.mkdtemp(prefix="anspark_s2s_cp_")
    q = (
        sdf.writeStream.format("parquet")
        .option("path", bus)
        .option("checkpointLocation", cp)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return bus


def s2s_pull(spark: SparkSession, bus: str) -> DataFrame:
    """Consumer half (peer's input port): tail the bus as a file stream
    with an independent checkpoint — the receiving flow's own source."""
    schema = spark.read.parquet(bus).schema  # footer-only read
    return spark.readStream.schema(schema).format("parquet").load(bus)
