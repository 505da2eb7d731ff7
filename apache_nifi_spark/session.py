"""SparkSession factory.

NiFi's engine runtime (the long-running JVM configured by the reference's
``base/nifi/configmap.yaml`` / ``nifi-deploy.yaml``) maps onto a single
SparkSession here.  Defaults are chosen for correctness-vs-oracle first
(UTC session timezone — DuckDB timestamps are UTC-naive) and for scale
second (AQE on, skew-join handling on, broadcast threshold tuned).

At 100 TB the same builder runs unchanged on a real cluster: everything
below is standard Spark SQL conf, nothing local-mode specific except the
``master`` argument which callers override via ``SPARK_GRAFT_CPUS``.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

__all__ = ["get_spark", "stop_spark"]


def get_spark(
    app_name: str = "apache-nifi-spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or fetch) the engine's SparkSession.

    Parameters
    ----------
    master:
        Defaults to ``local[$SPARK_GRAFT_CPUS]`` (env, default 32).  On a
        real cluster pass ``None`` via spark-submit and let the submitter
        set the master.
    shuffle_partitions:
        Default: number of local cores (small-SF testing).  At scale this
        is overridden; AQE coalesces post-shuffle partitions anyway.
    """
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    if master is None:
        master = f"local[{cpus}]"
    if shuffle_partitions is None:
        shuffle_partitions = cpus

    builder = (
        SparkSession.builder.appName(app_name)
        .master(master)
        # Oracle parity: DuckDB compares naive/UTC timestamps.
        .config("spark.sql.session.timeZone", "UTC")
        # Adaptive execution: runtime re-plan, skew-join splitting, and
        # post-shuffle coalescing — the scale path for 100 TB inputs.
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        # Arrow for every pandas UDF / mapInPandas boundary.
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        # PySpark's per-API-call error-context capture walks the Python
        # stack and makes two extra py4j round-trips on EVERY DataFrame
        # method (pyspark/errors/utils.py _with_origin) — measured
        # ~1 s per mega-flow compile (413 captures) and a diffuse tax
        # on every query construction.  An engine compiles plans
        # programmatically; the enriched "which user line built this
        # column" context has no reader here, so trade it for driver
        # CPU.  (r16 optimization; standard conf, default true.)
        .config("spark.python.sql.dataFrameDebugging.enabled", "false")
        # Fixture events.parquet carries TIMESTAMP(NANOS) which Spark's
        # vectorized reader rejects; read as long and convert in io.py.
        .config("spark.sql.legacy.parquet.nanosAsLong", "true")
        # Broadcast joins for bounded dimension tables (LookupRecord analog).
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
        # Driver heap: Spark's 1g default is sized for a thin cluster
        # driver; in local mode the driver JVM *is* every executor, so
        # broadcast builds + 32 concurrent tasks need real heap (1g OOMs
        # broadcast construction at sf≥1).  Honored only at JVM launch —
        # a getOrCreate against a live session keeps its existing heap.
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "24g"))
        # Keep driver result transfers bounded — no huge collects by design.
        .config("spark.driver.maxResultSize", "2g")
        .config("spark.ui.enabled", "false")
        # ContextCleaner frees broadcasts/shuffles only when the driver
        # GCs; the default periodic GC (30 min) never fires inside a
        # minutes-long local run, so a 200-query session accumulates
        # executor-side state and slows tail queries.  1 min keeps the
        # steady state flat; on a real cluster this conf is standard.
        .config("spark.cleaner.periodicGC.interval", "1min")
        # Whole-stage codegen compiles one or more Janino classes per
        # unique plan; a long session over hundreds of distinct queries
        # fills Java 17's default 240 MB reserved code cache, after which
        # the JIT stops compiling and tail queries run interpreter-tier
        # (diffuse 20-40 % slowdowns late in a suite).  512 MB keeps the
        # full registry hot; extra flags (profiling, GC logs) pass through
        # $SPARK_GRAFT_JAVA_OPTS.  Standard long-running-engine JVM conf.
        # r16 added -XX:+ExplicitGCInvokesConcurrent on the unverified
        # theory that explicit/periodic GCs caused mid-query STW spikes;
        # the r17 full-suite A/B (2 runs per side, interleaved, same
        # tree) measured a WASH (per-query geomean ON/OFF 0.996 over
        # 477 rows, streaming tail not flag-dependent) and the one
        # pathological outlier of the four runs (kmeans 8.6 s) landed
        # on an ON run — concurrent cycles started by between-query
        # System.gc() hygiene bleed INTO the next timed queries.
        # Dropped: STW collections between queries are unbilled and
        # deterministic.
        .config(
            "spark.driver.extraJavaOptions",
            (
                "-XX:ReservedCodeCacheSize=512m "
                + os.environ.get("SPARK_GRAFT_JAVA_OPTS", "")
            ).strip(),
        )
    )
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    return builder.getOrCreate()


def stop_spark() -> None:
    active = SparkSession.getActiveSession()
    if active is not None:
        active.stop()
