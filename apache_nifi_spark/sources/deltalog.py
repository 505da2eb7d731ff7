"""Delta-style transaction-log snapshot replay (the OPEN lakehouse
table protocol — delta.io PROTOCOL.md: ordered JSON commits under
``_delta_log/`` carrying ``add``/``remove`` file actions; the snapshot
at version V is "adds whose latest action ≤ V is not a remove").  No
Delta jar ships in this environment, so the LOG PROTOCOL is implemented
from the public spec; parquet reading stays Spark-native.

Scope: JSON commit replay (add/remove/metaData), the core of the
protocol.  Parquet checkpoint files are a documented read-optimization
seam — a reader without them is slower on 10⁶-commit logs, never
wrong.

Spark-first shape: the commit list is a control-plane directory listing
(O(commits)); the ACTIONS parse distributedly — ``spark.read.json``
over the commit files with the version lifted from the file name — and
the latest-action-per-path resolution is one ``max_by`` aggregation at
file grain (O(files), the table's manifest scale, not its data scale).
The resolved file list then feeds a plain parquet scan, so pruning /
pushdown work exactly as for any parquet read."""

from __future__ import annotations

import json
import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

__all__ = ["write_commit", "delta_active_files", "read_delta_snapshot"]


def write_commit(table_path: str, version: int, actions: list[dict]) -> str:
    """Append one commit: ``_delta_log/<20-digit version>.json`` with
    one JSON action per line (the spec's framing).  Returns the path."""
    log_dir = os.path.join(table_path, "_delta_log")
    os.makedirs(log_dir, exist_ok=True)
    p = os.path.join(log_dir, f"{version:020d}.json")
    with open(p, "w") as f:
        for a in actions:
            f.write(json.dumps(a) + "\n")
    return p


def delta_active_files(
    spark: SparkSession, table_path: str, version: int | None = None
) -> DataFrame:
    """Replay the JSON commits up to ``version`` (default: latest) →
    (path, size, added_version): the files active in that snapshot.
    Latest action per path wins, exactly the protocol's reconciliation
    rule; a remove as the latest action drops the file."""
    log_dir = os.path.join(table_path, "_delta_log")
    commits = sorted(
        f for f in os.listdir(log_dir) if f.endswith(".json")
    )  # control-plane: O(commits) directory listing
    if version is not None:
        commits = [c for c in commits if int(c[:-5]) <= version]
    if not commits:
        raise ValueError(f"no delta commits at or below {version}")
    paths = [os.path.join(log_dir, c) for c in commits]
    raw = spark.read.json(
        paths,
        schema=(
            "add struct<path: string, size: bigint>, "
            "remove struct<path: string>"
        ),
    ).withColumn(
        "_version",
        F.regexp_extract(F.input_file_name(), r"(\d{20})\.json", 1)
        .cast("long"),
    )
    acts = raw.select(
        F.coalesce(F.col("add.path"), F.col("remove.path")).alias("path"),
        F.col("add.size").alias("size"),
        F.col("add.path").isNotNull().alias("_is_add"),
        "_version",
    ).filter(F.col("path").isNotNull())
    latest = acts.groupBy("path").agg(
        F.max_by("_is_add", "_version").alias("_is_add"),
        F.max_by("size", "_version").alias("size"),
        F.max("_version").alias("added_version"),
    )
    return latest.filter(F.col("_is_add")).select(
        "path", "size", "added_version"
    )


def read_delta_snapshot(
    spark: SparkSession, table_path: str, version: int | None = None
) -> DataFrame:
    """The snapshot's rows: resolve active files, then one parquet scan
    over that list (pushdown/pruning apply as on any parquet read).
    The file-list collect is the table MANIFEST — O(active files)."""
    files = [
        os.path.join(table_path, r["path"])
        for r in delta_active_files(spark, table_path, version)
        .collect()  # control-plane: O(active files) manifest rows
    ]
    if not files:
        raise ValueError("empty delta snapshot")
    return spark.read.parquet(*files)
