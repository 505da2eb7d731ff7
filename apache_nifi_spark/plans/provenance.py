"""Provenance: per-stage row accounting via ``observe()`` (SURVEY.md §1.1
provenance row, §2.11).

NiFi writes a provenance event per FlowFile per hop (CREATE / ROUTE /
CONTENT_MODIFIED / DROP...) into a dedicated repository — per-record cost
proportional to traffic.  The Spark-native equivalent is aggregate
accounting: ``df.observe(stage, count, ...)`` attaches metric collection
to the already-running plan (zero extra passes, zero shuffles — metrics
ride the task results), and the trail materializes as a small lineage
table.  Per-stage row counts are exactly NiFi's queue/provenance counters
aggregated per hop; identity-level lineage at 100 TB would be a
first-class column (uuid per row), not a side log.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Observation, SparkSession
from pyspark.sql import functions as F

__all__ = ["ProvenanceTrail"]


class ProvenanceTrail:
    """Collects named per-stage observations over one batch pipeline.

    Usage::

        trail = ProvenanceTrail()
        df = trail.stage(scan_df, "CREATE")          # after the source
        df = trail.stage(df.filter(...), "ROUTE")    # after each hop
        result = df...                                # build the rest
        result.collect()                              # ONE action runs all
        trail.snapshot(spark)                         # lineage DataFrame

    Metrics attach to the single plan execution; nothing is recomputed.
    """

    def __init__(self) -> None:
        self._stages: list[tuple[str, Observation]] = []

    def stage(self, df: DataFrame, name: str) -> DataFrame:
        """Attach an observation point (a provenance 'hop') named ``name``."""
        obs = Observation(f"provenance_{len(self._stages)}_{name}")
        self._stages.append((name, obs))
        return df.observe(obs, F.count(F.lit(1)).alias("rows"))

    def events(self) -> list[tuple[int, str, int]]:
        """(hop_index, stage, n_rows) per observed stage — call after the
        pipeline's action has run (Observation.get blocks until then)."""
        return [
            (i, name, int(obs.get["rows"]))
            for i, (name, obs) in enumerate(self._stages)
        ]

    def snapshot(self, spark: SparkSession) -> DataFrame:
        """The provenance trail as a (hop, stage, n_rows) DataFrame — the
        `_provenance` table shape; bounded by stage count, not data size."""
        return spark.createDataFrame(
            self.events(), schema="hop INT, stage STRING, n_rows BIGINT"
        )

    def write(self, spark: SparkSession, path: str) -> None:
        """Append the trail to a `_provenance` parquet directory."""
        self.snapshot(spark).write.mode("append").parquet(path)
