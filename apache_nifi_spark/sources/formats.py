"""Record format bridge + file sources/sinks.

NiFi mappings (SURVEY.md §2.1/§2.2/§2.4):

- ``read_records`` / ``write_records`` — the RecordReader / RecordSetWriter
  controller services behind every record-aware processor: one call per
  format, schema explicit (schema-on-read discipline, SURVEY.md §1.3).
- ``convert_record`` — the ConvertRecord processor: a pure reader→writer
  format bridge with no row-level logic.
- ``read_binary_files`` — GetFile for opaque payloads: one row per file,
  ``content BINARY`` + path metadata, the FlowFile shape of §1.1.
- ``jdbc_read`` — ExecuteSQL/QueryDatabaseTable: partitioned JDBC scan.
- PutFile conflict strategies map onto Spark save modes: replace →
  ``overwrite``, ignore → ``ignore``, fail → ``error``.

Scale notes: every reader here is a distributed scan (splittable formats
split per block; gzip'd text falls back to file granularity), and every
writer emits one file per partition — ``partition_by`` gives NiFi's
PartitionRecord + PutFile directory layout with partition pruning on
read-back.
"""

from __future__ import annotations

from collections.abc import Mapping, Sequence

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T
from pyspark.sql.types import StructType

# Formats with a native DataFrame reader/writer in this build, plus
# "avro"/"xml" via the dependency-free codecs in avro_codec.py /
# xml_codec.py (the spark-avro / spark-xml jars are absent in this env).
_FORMATS = {"parquet", "csv", "json", "text", "orc", "avro", "xml", "cbor"}

_DEFAULT_READ_OPTIONS: dict[str, dict[str, str]] = {
    # header carries names; types come from the explicit schema, never
    # from sampling (inference breaks schema discipline and costs a scan)
    "csv": {"header": "true"},
}
_DEFAULT_WRITE_OPTIONS: dict[str, dict[str, str]] = {
    "csv": {"header": "true"},
}


def _check_format(fmt: str) -> str:
    fmt = fmt.lower()
    if fmt not in _FORMATS:
        raise ValueError(f"unsupported record format {fmt!r}; one of {sorted(_FORMATS)}")
    return fmt


def read_records(
    spark: SparkSession,
    path: str,
    fmt: str = "parquet",
    schema: StructType | str | None = None,
    options: Mapping[str, str] | None = None,
) -> DataFrame:
    """RecordReader: load ``path`` as typed records.

    For text formats pass ``schema`` explicitly — NiFi's reader services
    resolve a schema before parsing, and so do we (PERMISSIVE mode keeps
    malformed rows routable via validate_record, §2.3).
    """
    fmt = _check_format(fmt)
    if fmt == "avro":
        from .avro_codec import read_avro

        if isinstance(schema, str):
            schema = T.StructType.fromDDL(schema)
        return read_avro(spark, path, schema=schema)
    if fmt == "xml":
        from .xml_codec import read_xml

        if schema is None:
            raise ValueError("xml reader requires an explicit schema")
        return read_xml(spark, path, schema)
    if fmt == "cbor":
        from .cbor_codec import read_cbor

        if schema is None:
            raise ValueError("cbor reader requires an explicit schema")
        if isinstance(schema, str):
            schema = T.StructType.fromDDL(schema)
        return read_cbor(spark, path, schema)
    reader = spark.read.format(fmt)
    for k, v in {**_DEFAULT_READ_OPTIONS.get(fmt, {}), **dict(options or {})}.items():
        reader = reader.option(k, v)
    if schema is not None:
        reader = reader.schema(schema)
    return reader.load(path)


def write_records(
    df: DataFrame,
    path: str,
    fmt: str = "parquet",
    mode: str = "overwrite",
    partition_by: Sequence[str] | None = None,
    options: Mapping[str, str] | None = None,
) -> None:
    """RecordSetWriter + PutFile: serialize ``df`` under ``path``.

    ``mode`` is the PutFile conflict strategy (overwrite/ignore/error/
    append); ``partition_by`` produces the PartitionRecord directory
    layout (one subdir per key value → partition pruning on read-back).
    """
    fmt = _check_format(fmt)
    if fmt == "avro":
        from .avro_codec import write_avro

        if partition_by:
            raise ValueError("partition_by is not supported for the avro codec path")
        write_avro(df, path, mode=mode, codec=dict(options or {}).get("codec", "deflate"))
        return
    if fmt == "xml":
        from .xml_codec import write_xml

        if partition_by:
            raise ValueError("partition_by is not supported for the xml codec path")
        write_xml(df, path, mode=mode)
        return
    if fmt == "cbor":
        from .cbor_codec import write_cbor

        if partition_by:
            raise ValueError("partition_by is not supported for the cbor codec path")
        write_cbor(df, path, mode=mode)
        return
    writer = df.write.format(fmt).mode(mode)
    for k, v in {**_DEFAULT_WRITE_OPTIONS.get(fmt, {}), **dict(options or {})}.items():
        writer = writer.option(k, v)
    if partition_by:
        writer = writer.partitionBy(*partition_by)
    writer.save(path)


def convert_record(
    spark: SparkSession,
    df: DataFrame,
    fmt: str,
    path: str,
    options: Mapping[str, str] | None = None,
) -> DataFrame:
    """ConvertRecord: write ``df`` in ``fmt`` and read it back with the
    SOURCE schema (reader→writer bridge, no inference, no row logic).

    Returns the re-read DataFrame so round-trip fidelity is assertable —
    the oracle-checked property (bytes through a text format and back must
    equal the relational input).
    """
    write_records(df, path, fmt, mode="overwrite", options=options)
    return read_records(spark, path, fmt, schema=df.schema, options=options)


def read_binary_files(spark: SparkSession, path: str, glob: str | None = None) -> DataFrame:
    """GetFile/FetchFile for opaque payloads: ``binaryFile`` source —
    (path, modificationTime, length, content BINARY) per file.  Content is
    read lazily per-task; listings scale via the file index, not the
    driver."""
    reader = spark.read.format("binaryFile")
    if glob:
        reader = reader.option("pathGlobFilter", glob)
    return reader.load(path)


def jdbc_read(
    spark: SparkSession,
    url: str,
    query: str,
    partition_column: str | None = None,
    lower_bound: int | None = None,
    upper_bound: int | None = None,
    num_partitions: int | None = None,
    options: Mapping[str, str] | None = None,
) -> DataFrame:
    """ExecuteSQL / QueryDatabaseTable / GenerateTableFetch: JDBC scan.

    With the partition quadruple set this is GenerateTableFetch — the
    executor-parallel range fetch; without it, a single-connection
    ExecuteSQL.  Exercised for real against the embedded Derby engine
    Spark ships (see registry `execute_sql_jdbc`); any networked
    JDBC-compliant store swaps in via ``url``.

    Spark's JDBC source rejects ``query`` + ``partitionColumn`` together,
    so a partitioned read wraps the query as a derived table.
    """
    reader = spark.read.format("jdbc").option("url", url)
    if partition_column is not None:
        if None in (lower_bound, upper_bound, num_partitions):
            raise ValueError("partitioned JDBC read needs lower/upper bound and numPartitions")
        reader = (
            reader.option("dbtable", f"({query}) fetch_sub")
            .option("partitionColumn", partition_column)
            .option("lowerBound", lower_bound)
            .option("upperBound", upper_bound)
            .option("numPartitions", num_partitions)
        )
    else:
        reader = reader.option("query", query)
    for k, v in dict(options or {}).items():
        reader = reader.option(k, v)
    return reader.load()


def jdbc_write(
    df: DataFrame,
    url: str,
    table: str,
    mode: str = "overwrite",
    options: Mapping[str, str] | None = None,
) -> None:
    """PutDatabaseRecord / PutSQL: executor-parallel JDBC insert — each
    partition opens one connection and batches its rows (Spark's
    ``batchsize``, default 1000).  ``mode="overwrite"`` recreates the
    table (NiFi's truncate-and-load recipe); ``append`` is the incremental
    put."""
    writer = df.write.format("jdbc").option("url", url).option("dbtable", table)
    for k, v in dict(options or {}).items():
        writer = writer.option(k, v)
    writer.mode(mode).save()
