"""Local differential checker mirroring the driver's correctness gate.

Runs every registry query on Spark AND its DuckDB oracle over the same
parquet fixtures, then compares: row count, normalized schema, and
order-insensitive exact values.  Usage:

    python tools/check_oracle.py [--json OUT.json] [sf_dir] [query ...]

Exit code 0 iff every checked query matches exactly.  ``--json``
additionally writes the machine-readable receipt the round commits as
``CORRECTNESS_full_r{N}.json`` (judge item r15 #1: the driver samples
~50 of the registry every round; this file is the committed evidence
for the rest).
"""

from __future__ import annotations

import os
import sys

import duckdb
import numpy as np
import pandas as pd

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from apache_nifi_spark import io  # noqa: E402
from apache_nifi_spark.registry import ORACLES, QUERIES  # noqa: E402
from apache_nifi_spark.session import get_spark  # noqa: E402


def duck_con(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for t in io.TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'"
        )
    return con


def normalize(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    for c in df.columns:
        s = df[c]
        if pd.api.types.is_datetime64_any_dtype(s):
            df[c] = pd.to_datetime(s).astype("datetime64[us]")
        elif s.dtype == object:
            df[c] = s.map(lambda v: tuple(v) if isinstance(v, (list, np.ndarray)) else v)
    if len(df):
        df = df.sort_values(by=list(df.columns), kind="mergesort").reset_index(drop=True)
    return df


def compare(name: str, spark_pdf: pd.DataFrame, duck_pdf: pd.DataFrame) -> list[str]:
    problems: list[str] = []
    if len(spark_pdf) != len(duck_pdf):
        problems.append(f"rowcount spark={len(spark_pdf)} duck={len(duck_pdf)}")
    scols, dcols = sorted(spark_pdf.columns), sorted(duck_pdf.columns)
    if scols != dcols:
        problems.append(f"columns spark={scols} duck={dcols}")
        return problems
    a, b = normalize(spark_pdf), normalize(duck_pdf)
    for c in a.columns:
        if str(a[c].dtype) != str(b[c].dtype):
            problems.append(f"dtype[{c}] spark={a[c].dtype} duck={b[c].dtype}")
    if problems:
        return problems
    for c in a.columns:
        av, bv = a[c], b[c]
        if pd.api.types.is_float_dtype(av):
            eq = (av.values == bv.values) | (np.isnan(av.values) & np.isnan(bv.values))
            eq |= av.isna().values & bv.isna().values
        else:
            eq = (av.values == bv.values) | (av.isna().values & bv.isna().values)
        bad = ~eq
        if bad.any():
            i = int(np.argmax(bad))
            problems.append(
                f"value[{c}] {int(bad.sum())}/{len(a)} differ; first row {i}: "
                f"spark={av.iloc[i]!r} duck={bv.iloc[i]!r}"
            )
    return problems


def main() -> int:
    args = sys.argv[1:]
    json_out = None
    if args and args[0] == "--json":
        json_out = args[1]
        args = args[2:]
    sf_dir = args[0] if args else "/root/testdata/sf0.01"
    only = set(args[1:])
    detail: dict[str, str] = {}
    spark = get_spark(app_name="oracle-check")
    con = duck_con(sf_dir)

    failed, passed, skipped = [], [], []
    for name, fn in QUERIES.items():
        if only and name not in only:
            continue
        if name not in ORACLES:
            try:
                n = fn(spark, sf_dir).count()
                print(f"  ~ {name}: rows-only check, {n} rows")
                skipped.append(name)
            except Exception as e:  # noqa: BLE001
                failed.append(name)
                detail[name] = f"rows-only EXCEPTION {type(e).__name__}"
                print(f"  ✗ {name} (rows-only) EXCEPTION {type(e).__name__}: {str(e)[:300]}")
            continue
        try:
            frame = fn(spark, sf_dir)
            # driver-contract check: the driver's pandas canonicalizer
            # cannot hash list/dict cells, so no oracled output may
            # expose a top-level array/map/struct column (the pytest
            # gate covers non-wire queries; this covers everything)
            from pyspark.sql import types as T

            bad_cols = [
                f"{f.name}:{f.dataType.simpleString()}"
                for f in frame.schema.fields
                if isinstance(f.dataType, (T.ArrayType, T.MapType, T.StructType))
            ]
            sdf = frame.toPandas()
            ddf = con.execute(ORACLES[name]).df()
            problems = compare(name, sdf, ddf)
            if bad_cols:
                problems.append(
                    f"driver-unhashable top-level columns: {bad_cols}"
                )
        except Exception as e:  # noqa: BLE001
            problems = [f"EXCEPTION {type(e).__name__}: {e}"]
        if problems:
            failed.append(name)
            detail[name] = "; ".join(p[:200] for p in problems)
            print(f"  ✗ {name}")
            for p in problems:
                print(f"      {p}")
        else:
            passed.append(name)
            print(f"  ✓ {name} ({len(sdf)} rows)")

    print(f"\n{len(passed)} passed, {len(failed)} failed, {len(skipped)} rows-only")
    if failed:
        print("FAILED:", ", ".join(failed))
    if json_out:
        import json as _json

        status = {n: "pass" for n in passed}
        status.update({n: "rows_only" for n in skipped})
        status.update({n: "fail" for n in failed})
        with open(json_out, "w") as f:
            _json.dump(
                {
                    "sf_dir": sf_dir,
                    "n_queries": len(passed) + len(failed) + len(skipped),
                    "passed": len(passed),
                    "failed": len(failed),
                    "rows_only": len(skipped),
                    "failures": {n: detail.get(n, "") for n in failed},
                    "queries": status,
                },
                f,
                indent=1,
                sort_keys=True,
            )
    spark.stop()
    return 1 if failed else 0


if __name__ == "__main__":
    raise SystemExit(main())
