"""GenerateTableFetch planning — SURVEY.md §2.1.

The execution half of NiFi's JDBC trio already lives in
:func:`apache_nifi_spark.sources.formats.jdbc_read` (ExecuteSQL /
QueryDatabaseTable / partitioned range fetch).  This module supplies the
*planning* half: ``GenerateTableFetch`` turns (table, partition column,
N) into N range predicates that downstream fetch tasks run in parallel.

Scale design: the bounds come from one partial+final min/max aggregate
(no collect); the ranges are generated with ``sequence``+``explode`` on
that one-row frame, so the plan stays fully declarative and the same
code path works whether N is 8 or 8,192 fetch partitions.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = [
    "generate_table_fetch",
    "incremental_fetch",
    "plan_table_ddl",
    "update_database_table",
    "list_database_tables",
]


def generate_table_fetch(
    df: DataFrame, column: str, num_partitions: int, table_name: str
) -> DataFrame:
    """GenerateTableFetch: emit one row per fetch partition with inclusive
    integer bounds and the WHERE predicate NiFi would hand to ExecuteSQL.

    Mirrors Spark's own JDBC stride logic (lowerBound/upperBound/
    numPartitions): stride = ceil((max - min + 1) / N); the final
    partition is clamped to the true max.
    """
    bounds = df.agg(
        F.min(F.col(column)).cast("bigint").alias("lo"),
        F.max(F.col(column)).cast("bigint").alias("hi"),
    )
    n = F.lit(num_partitions)
    stride = F.ceil((F.col("hi") - F.col("lo") + 1) / n).cast("bigint")
    parts = bounds.select(
        "lo",
        "hi",
        stride.alias("stride"),
        F.explode(F.sequence(F.lit(0), n - 1)).alias("partition_id"),
    )
    p_lo = F.col("lo") + F.col("partition_id") * F.col("stride")
    p_hi = F.least(p_lo + F.col("stride") - 1, F.col("hi"))
    return parts.select(
        F.col("partition_id").cast("int").alias("partition_id"),
        p_lo.alias("lower_bound"),
        p_hi.alias("upper_bound"),
        F.concat(
            F.lit(f"SELECT * FROM {table_name} WHERE {column} >= "),
            p_lo.cast("string"),
            F.lit(f" AND {column} <= "),
            p_hi.cast("string"),
        ).alias("fetch_sql"),
    ).filter(F.col("lower_bound") <= F.col("hi"))


def incremental_fetch(
    spark,
    url: str,
    table: str,
    max_value_column: str,
    last_max: int | None,
    options=None,
) -> "DataFrame":
    """QueryDatabaseTable's incremental contract (SURVEY.md §2.1): fetch
    only rows whose ``max_value_column`` exceeds the last observed
    maximum; the caller persists the new maximum as state (NiFi keeps it
    in its state manager; a Spark pipeline keeps it in the checkpoint /
    a control table).

    The predicate runs IN the database (JDBC pushdown), so each poll
    reads only the delta — the pattern that turns a JDBC table into an
    incremental source without CDC infrastructure.
    """
    from apache_nifi_spark.sources.formats import jdbc_read

    where = f' WHERE {max_value_column} > {int(last_max)}' if last_max is not None else ""
    return jdbc_read(
        spark, url, f"SELECT * FROM {table}{where}", options=options
    )


#: Spark simpleString type → ANSI SQL DDL type (the NiFi
#: StandardColumnTypeMap equivalent; VARCHAR sized for record columns).
_DDL_TYPES = {
    "bigint": "BIGINT",
    "int": "INTEGER",
    "smallint": "SMALLINT",
    "tinyint": "SMALLINT",
    "double": "DOUBLE",
    "float": "REAL",
    "string": "VARCHAR(4000)",
    "boolean": "BOOLEAN",
    "timestamp": "TIMESTAMP",
    "date": "DATE",
}


def plan_table_ddl(
    schema,
    table: str,
    existing_columns: dict[str, str] | None,
) -> list[str]:
    """UpdateDatabaseTable's planning half (NiFi 2.x §2.2): diff a record
    schema against the live table and emit the DDL that reconciles them —
    CREATE TABLE when the table is absent, one ALTER TABLE ADD COLUMN per
    missing field otherwise.  Existing columns are never dropped or
    retyped (NiFi's behavior: additive evolution only).  Pure planning —
    returns statements; ``update_database_table`` executes them.

    ``existing_columns`` maps lower-cased column name → DDL type (None =
    table absent).  Column names are emitted QUOTED, matching the
    case-preserving quoting Spark's JDBC writer uses.
    """
    def ddl_type(f) -> str:
        t = f.dataType.simpleString()
        if t.startswith("decimal"):
            return t.upper()
        if t not in _DDL_TYPES:
            raise ValueError(f"no DDL mapping for column {f.name!r}: {t}")
        return _DDL_TYPES[t]

    if existing_columns is None:
        cols = ", ".join(f'"{f.name}" {ddl_type(f)}' for f in schema.fields)
        return [f"CREATE TABLE {table} ({cols})"]
    return [
        f'ALTER TABLE {table} ADD COLUMN "{f.name}" {ddl_type(f)}'
        for f in schema.fields
        if f.name.lower() not in existing_columns
    ]


def update_database_table(
    spark, url: str, table: str, schema, driver_options: dict | None = None
) -> list[str]:
    """UpdateDatabaseTable (NiFi 2.x): make the live table's shape match
    the record schema before a PutDatabaseRecord write — create it if
    absent, add any missing columns (additive-only, like NiFi).

    Control-plane by nature: one JDBC metadata read + O(new columns) DDL
    statements on the driver, exactly what the single-threaded NiFi
    processor does; the subsequent data write stays executor-parallel.
    Returns the statements it executed (empty = already in sync).
    """
    jvm = spark.sparkContext._jvm
    conn = jvm.java.sql.DriverManager.getConnection(url)
    try:
        meta = conn.getMetaData()
        existing: dict[str, str] | None = None
        for name_case in (table, table.upper(), table.lower()):
            rs = meta.getColumns(None, None, name_case, None)
            cols: dict[str, str] = {}
            while rs.next():
                cols[rs.getString("COLUMN_NAME").lower()] = rs.getString("TYPE_NAME")
            rs.close()
            if cols:
                existing = cols
                break
        stmts = plan_table_ddl(schema, table, existing)
        st = conn.createStatement()
        try:
            for s in stmts:
                st.executeUpdate(s)
        finally:
            st.close()
        return stmts
    finally:
        conn.close()


def list_database_tables(
    spark, url: str, types: tuple[str, ...] = ("TABLE",)
) -> "DataFrame":
    """ListDatabaseTables (§2.1): one JDBC metadata session manifests the
    catalog's tables into a (table_schema, table_name, table_type)
    DataFrame — the primary-node listing that fans out into per-table
    GenerateTableFetch / QueryDatabaseTable work downstream.  O(tables)
    control-plane, like every List* manifest."""
    jvm = spark.sparkContext._jvm
    conn = jvm.java.sql.DriverManager.getConnection(url)
    try:
        arr = spark.sparkContext._gateway.new_array(jvm.java.lang.String, len(types))
        for i, t in enumerate(types):
            arr[i] = t
        rs = conn.getMetaData().getTables(None, None, "%", arr)
        rows = []
        while rs.next():
            rows.append(
                (rs.getString("TABLE_SCHEM"), rs.getString("TABLE_NAME"),
                 rs.getString("TABLE_TYPE"))
            )
        rs.close()
    finally:
        conn.close()
    return spark.createDataFrame(
        rows, "table_schema string, table_name string, table_type string"
    )
