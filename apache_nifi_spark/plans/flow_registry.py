"""Flow version control: the NiFi Registry analog.

The reference deployment runs a dedicated NiFi Registry service
(/root/reference/nifi-registry/deployement.yaml:13-16,51 — H2-backed,
5 GiB PVC) whose job is buckets → flows → immutable versioned snapshots,
with clients pinning a flow version.  In a Spark-first engine a "flow"
is a declarative query (SQL text or a named builder), so version control
reduces to an append-only catalog of (bucket, flow, version, definition,
digest) rows plus a resolver that turns a pinned version back into a
DataFrame.

Storage: in-memory dict by default; ``save``/``load`` persist the
catalog as a parquet directory (the PVC analog) — append-only, so
history survives restarts and a version can never be rewritten, only
superseded (NiFi Registry's immutable-snapshot contract).
"""

from __future__ import annotations

import hashlib

from pyspark.sql import DataFrame, SparkSession

__all__ = ["FlowRegistry"]


class FlowRegistry:
    """Append-only registry of versioned flow definitions (SQL text)."""

    def __init__(self) -> None:
        # (bucket, flow) → list of (version, sql_text, digest, comment)
        self._flows: dict[tuple[str, str], list[tuple[int, str, str, str]]] = {}

    # -- publish / resolve ------------------------------------------------

    def publish(
        self, bucket: str, flow: str, sql_text: str, comment: str = ""
    ) -> int:
        """Snapshot a flow definition; returns the new (monotonic) version.
        Re-publishing identical content still creates a version — matching
        NiFi Registry, where every commit is a snapshot."""
        versions = self._flows.setdefault((bucket, flow), [])
        version = len(versions) + 1
        digest = hashlib.sha256(sql_text.encode()).hexdigest()
        versions.append((version, sql_text, digest, comment))
        return version

    def history(self, bucket: str, flow: str) -> list[tuple[int, str, str]]:
        """Commit history of a flow as (version, digest, comment) tuples,
        oldest first; empty when the flow was never published."""
        return [
            (v, d, c) for (v, _s, d, c) in self._flows.get((bucket, flow), [])
        ]

    def get(self, bucket: str, flow: str, version: int | None = None) -> str:
        """SQL text of a pinned version (None → latest)."""
        versions = self._flows[(bucket, flow)]
        if version is None:
            return versions[-1][1]
        return versions[version - 1][1]

    def run(
        self,
        spark: SparkSession,
        bucket: str,
        flow: str,
        version: int | None = None,
        parameters: dict[str, str] | None = None,
    ) -> DataFrame:
        """Materialize a pinned flow version as a DataFrame.  The caller
        registers whatever views the flow references (io.register_views
        for the fixture tables) — the registry stores definitions, not
        data, exactly like the reference service.

        ``parameters`` is the NiFi Parameter-Context analog: ``#{name}``
        placeholders in the stored definition resolve at RUN time, so one
        versioned flow serves several environments.  Values are
        SQL-escaped as string literals; a missing parameter raises."""
        sql_text = self.get(bucket, flow, version)
        if parameters or "#{" in sql_text:
            import re

            def sub(m: "re.Match[str]") -> str:
                name = m.group(1)
                if not parameters or name not in parameters:
                    raise KeyError(f"unbound flow parameter #{{{name}}}")
                return "'" + str(parameters[name]).replace("'", "''") + "'"

            sql_text = re.sub(r"#\{([A-Za-z0-9_.-]+)\}", sub, sql_text)
        return spark.sql(sql_text)

    # -- catalog ----------------------------------------------------------

    def snapshot(self, spark: SparkSession) -> DataFrame:
        """The catalog as a DataFrame: one row per (bucket, flow, version)."""
        rows = [
            (b, f, v, d, c, len(s))
            for (b, f), versions in sorted(self._flows.items())
            for (v, s, d, c) in versions
        ]
        return spark.createDataFrame(
            rows,
            "bucket string, flow string, version int, digest string,"
            " comment string, def_chars int",
        )

    def save(self, spark: SparkSession, path: str) -> None:
        self.snapshot_with_defs(spark).write.mode("overwrite").parquet(path)

    def snapshot_with_defs(self, spark: SparkSession) -> DataFrame:
        rows = [
            (b, f, v, s, d, c)
            for (b, f), versions in sorted(self._flows.items())
            for (v, s, d, c) in versions
        ]
        return spark.createDataFrame(
            rows,
            "bucket string, flow string, version int, sql_text string,"
            " digest string, comment string",
        )

    @classmethod
    def load(cls, spark: SparkSession, path: str) -> "FlowRegistry":
        reg = cls()
        for r in (
            spark.read.parquet(path)
            .orderBy("bucket", "flow", "version")
            .collect()  # control-plane: versioned-flow CATALOG rows, never table data
        ):
            reg._flows.setdefault((r["bucket"], r["flow"]), []).append(
                (r["version"], r["sql_text"], r["digest"], r["comment"])
            )
        return reg
