"""Fixture loading and the ConvertRecord-style format bridge.

NiFi reads content through RecordReaders and writes through RecordSetWriters
(Avro/JSON/CSV/XML/Parquet) [2.7.2-surface, SURVEY.md §1.1/§2.2]; in Spark
the DataFrame *is* the record set, so the whole reader/writer surface is
``spark.read.format(a)`` → ``df.write.format(b)``.

Scale notes: parquet scans get predicate pushdown + column pruning from
Catalyst for free; ``load_table`` never caches or collects, so the 100 TB
path streams through executors untouched by the driver.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

__all__ = [
    "TABLES",
    "load_table",
    "load_all",
    "register_views",
    "convert_record",
    "widen_if_narrow",
    "normalize_events_ts",
]

#: Fixture tables the driver materializes (TESTDATA.md).
TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)


#: (applicationId, sf_dir, table) → lazy scan DataFrame; see load_table.
_TABLE_CACHE: dict[tuple[str, str, str], DataFrame] = {}


def normalize_events_ts(df: DataFrame, target: str = "timestamp_ntz") -> DataFrame:
    """Dtype-adaptive ``ts`` normalization — never assume the fixture's
    physical parquet type.

    The fixtures have shipped ``events.ts`` as both TIMESTAMP(NANOS)
    (read as BIGINT via ``spark.sql.legacy.parquet.nanosAsLong``) and
    TIMESTAMP(MICROS) (read as TIMESTAMP_NTZ) across rounds; branching on
    the *read* dtype makes every loader correct under either:

    - ``bigint`` → nanos epoch; integer ``div 1000`` truncates ns→µs
      exactly like DuckDB/pandas (a double division would lose precision,
      ns epochs exceed 2^53).
    - any timestamp flavor → already µs-resolution; just cast to
      ``target``.

    ``target`` is ``timestamp_ntz`` for batch (DuckDB's naive-timestamp
    oracle semantics) and ``timestamp`` for streaming (watermarks require
    TIMESTAMP; the session tz is UTC so the instant is identical).
    """
    dtype = dict(df.dtypes).get("ts")
    if dtype is None:
        return df
    if dtype == "bigint":
        col = F.timestamp_micros(F.expr("ts div 1000"))
    else:
        col = F.col("ts")
    return df.withColumn("ts", col.cast(target))


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Scan one fixture table (GetFile/FetchFile analog, SURVEY.md §2.1).

    ``events.ts`` is normalized to microsecond TIMESTAMP_NTZ whatever the
    parquet physical type is — see :func:`normalize_events_ts`.

    The ``nanosAsLong`` conf is set here (runtime-settable, idempotent)
    rather than only at session build so callers with their own
    SparkSession — including the correctness driver — read a
    TIMESTAMP(NANOS) events.parquet without PARQUET_TYPE_ILLEGAL; it is
    a no-op for µs fixtures.

    The returned DataFrame is cached per (application, sf_dir, table):
    ``spark.read.parquet`` costs a ~120 ms schema-inference round-trip,
    and a DataFrame is an immutable lazy plan, so handing back the same
    scan node to every query is free — Catalyst re-optimizes per query
    regardless.  The fixtures are read-only, so the plan can't go stale.
    """
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    key = (spark.sparkContext.applicationId, sf_dir, name)
    cached = _TABLE_CACHE.get(key)
    if cached is not None:
        return cached
    df = spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))
    if name == "events":
        df = normalize_events_ts(df, "timestamp_ntz")
    _TABLE_CACHE[key] = df
    return df


def widen_if_narrow(df: DataFrame) -> DataFrame:
    """Round-robin repartition to ``defaultParallelism`` when the scan has
    fewer split tasks than HALF the cores.

    The test fixtures are single-file, single-row-group parquet, so any
    CPU-heavy per-row work downstream of the scan (decimal aggregation,
    XPath parsing, regex extraction) would otherwise pin to ONE task while
    31 cores idle.  At real scale a 100 TB table has thousands of row
    groups and this is a no-op — the guard makes the exchange a
    small-input-only cost, mirroring the probe `minhash_near_duplicates`
    already uses.

    Two lessons measured at sf1 (BASELINE.md §D): count SPLITS, not
    files — ``inputFiles()`` says 1 for a 135 MB file that
    maxPartitionBytes already splits into 34 scan tasks, which made the
    old guard fire a full 6M-row exchange under an already-parallel
    scan; and only widen below par/2 — at 17 of 32 tasks the exchange
    costs more than the extra parallelism repays (q1 1.42 s plain vs
    1.85 s widened).

    Apply AFTER pushed-down filters (a repartition above the scan would
    block predicate pushdown), BEFORE the expensive projection/agg.

    Split counting (r16 optimization): the old probe was
    ``df.rdd.getNumPartitions()``, which analyzes + optimizes the whole
    plan and throws the result away — measured 0.13-0.2 s of pure
    driver time PER CALL on a fresh plan, paid by every widen-using
    query construction (~60 call sites × best-of-2 bench runs).  The
    split count is instead computed from the scan's file metadata with
    Spark's own ``FilePartition.maxSplitBytes`` formula (same conf
    inputs: maxPartitionBytes, openCostInBytes, bytesPerCore over
    defaultParallelism), which costs one ``inputFiles()`` logical-plan
    walk (~3 ms).  Non-file plans (checkpointed RDDs, in-memory
    relations) and non-local URIs keep the RDD probe fallback — on a
    real cluster those are exactly the already-parallel cases where
    no-widen is the right answer anyway.
    """
    sc = df.sparkSession.sparkContext
    par = sc.defaultParallelism
    n_splits = _estimated_scan_splits(df, par)
    if n_splits is None:
        try:
            n_splits = df.rdd.getNumPartitions()
        except Exception:
            n_splits = par
    if n_splits < max(par // 2, 1):
        return df.repartition(par)
    return df


def _size_bytes(v: str) -> int:
    """Parse a Spark byte-size conf string (plain digits or k/m/g/t
    suffix, case-insensitive, optional 'b')."""
    s = v.strip().lower()
    mult = 1
    for suf, m in (("t", 1024**4), ("g", 1024**3), ("m", 1024**2), ("k", 1024)):
        if s.rstrip("b").endswith(suf):
            s = s.rstrip("b")[: -1]
            mult = m
            break
    return int(float(s) * mult)


def _estimated_scan_splits(df: DataFrame, par: int) -> int | None:
    """Spark's scan split count from file metadata (None = not a local
    file scan, caller falls back to the RDD probe).

    Mirrors ``FilePartition.maxSplitBytes``: maxSplitBytes =
    min(maxPartitionBytes, max(openCostInBytes, bytesPerCore)) with
    bytesPerCore = Σ(size+openCost)/defaultParallelism, then packs
    splits greedily → partition count ≈ ceil(Σ(size+openCost) /
    maxSplitBytes).  Parquet fixtures are splittable, so no
    unsplittable-file branch is needed; estimate drift of ±1 split
    cannot flip the par/2 gate decision except at the boundary, where
    either choice was measured equivalent (the guard exists to catch
    1-vs-32, not 15-vs-17).

    Known blind spots (r16 advice — acceptable for a widen gate, noted
    so nobody reuses this as an exact split count): ``inputFiles()``
    reflects the relation BEFORE partition pruning, so on a
    directory-partitioned table with pushed partition filters the
    estimate can overcount splits and skip a widen the RDD probe would
    have applied (perf drift only, never wrong results); and for a
    multi-scan plan (joins/unions) it sums ALL sources' files, again
    erring toward not widening — the conservative side for an exchange
    that is pure overhead when misapplied."""
    try:
        files = df.inputFiles()
    except Exception:
        return None
    if not files:
        return None
    conf = df.sparkSession.conf
    open_cost = _size_bytes(conf.get("spark.sql.files.openCostInBytes", "4194304"))
    max_pb = _size_bytes(conf.get("spark.sql.files.maxPartitionBytes", "134217728"))
    total = 0
    for uri in files:
        if not uri.startswith("file:"):
            return None
        path = uri[len("file://"):] if uri.startswith("file://") else uri[len("file:"):]
        try:
            total += os.stat(path).st_size + open_cost
        except OSError:
            return None
    bytes_per_core = total // max(par, 1)
    max_split = min(max_pb, max(open_cost, bytes_per_core))
    return max(1, -(-total // max(max_split, 1)))


def pin_for_rescan(df: DataFrame) -> DataFrame:
    """``localCheckpoint`` a frame that an iterative control loop will
    re-scan once per round (k-means, k-center, PQ training, power
    iteration), keeping the upstream plan's partition width.

    r17 measurement note: r16 added a byte-proportional ``coalesce``
    here (one partition per 64 MB of scan bytes) on the theory that
    kilobyte-scale pinned frames shouldn't pay a core-width task wave
    per round.  A strict same-window A/B (the r16 verdict's item 1)
    showed the opposite: the iterative consumers' per-round work is
    O(rows × k × dim) COMPUTE, not I/O, so a bytes-based partition
    budget serialized the loops onto one core — kcenter 2.96 → 1.2 s,
    PQ 2.5 → 0.96 s, kmeans 1.5 → 0.7 s, semdedup 2.2 → 1.3 s,
    dominant_direction 1.35 → 0.95 s at sf0.1 when the coalesce was
    REMOVED (best-of-2, A/B/A/B).  The upstream width (scan splits, or
    the widen gate's core-width) already follows data size at scale,
    so the pin keeps it.  ``localCheckpoint(eager=False)`` stays: every
    round re-reads materialized blocks instead of replaying the
    quantize projection, and the lineage truncation keeps per-round
    plans flat.
    """
    return df.localCheckpoint(eager=False)


def load_all(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    return {name: load_table(spark, sf_dir, name) for name in TABLES}


def register_views(spark: SparkSession, sf_dir: str) -> None:
    """Register every fixture as a temp view so flows can use ``spark.sql``
    (QueryRecord / JoinEnrichment-SQL analogs run against these)."""
    for name in TABLES:
        load_table(spark, sf_dir, name).createOrReplaceTempView(name)


def convert_record(
    spark: SparkSession,
    in_path: str,
    in_format: str,
    out_path: str,
    out_format: str,
    mode: str = "overwrite",
    read_options: dict[str, str] | None = None,
    write_options: dict[str, str] | None = None,
) -> None:
    """ConvertRecord analog: reader→writer format bridge (SURVEY.md §2.4).

    NiFi pairs a RecordReader with a RecordSetWriter per processor; here the
    bridge is a scan + write with no per-record code, so Catalyst can prune
    and push down, and the write is partition-parallel.

    ``mode`` mirrors PutFile's conflict-resolution strategy
    (replace/ignore/fail → overwrite/ignore/error, SURVEY.md §2.2).
    """
    reader = spark.read.format(in_format).options(**(read_options or {}))
    df = reader.load(in_path)
    df.write.mode(mode).options(**(write_options or {})).format(out_format).save(out_path)
