"""Fixture contract check: assert each driver table's schema — including
the *physical* timestamp type of events.ts — with a readable error.

The events.ts physical type has changed between rounds (NANOS vs MICROS)
and silently broke loaders twice; this makes the class of bug a 5-second
diagnosis:

    python tools/fixture_check.py [/root/testdata/sf0.01]
"""

from __future__ import annotations

import os
import sys

import pyarrow.parquet as pq

#: columns the repo's queries actually touch (the driver's slim TPC-H-ish
#: fixtures, TESTDATA.md) — a superset column set is fine, a subset fails.
EXPECTED_COLUMNS = {
    "region": {"r_regionkey", "r_name"},
    "nation": {"n_nationkey", "n_name", "n_regionkey"},
    "customer": {"c_custkey", "c_name", "c_nationkey", "c_acctbal", "c_mktsegment"},
    "supplier": {"s_suppkey", "s_name", "s_nationkey", "s_acctbal"},
    "part": {"p_partkey", "p_name", "p_brand", "p_type", "p_size", "p_retailprice"},
    "orders": {
        "o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice",
        "o_orderdate", "o_orderpriority",
    },
    "lineitem": {
        "l_orderkey", "l_partkey", "l_suppkey", "l_linenumber",
        "l_quantity", "l_extendedprice", "l_discount", "l_tax",
        "l_returnflag", "l_linestatus", "l_shipdate",
    },
    "events": {"event_id", "ts", "user_id", "event_type", "value", "props"},
    "documents": {"doc_id", "text", "lang", "source", "n_chars"},
    "embeddings": {"vec_id", "embedding", "label"},
}


def check(sf_dir: str) -> list[str]:
    problems: list[str] = []
    for name, want in EXPECTED_COLUMNS.items():
        path = os.path.join(sf_dir, f"{name}.parquet")
        if not os.path.exists(path):
            problems.append(f"{name}: MISSING at {path}")
            continue
        try:
            schema = pq.read_schema(path)
        except Exception as e:  # pragma: no cover
            problems.append(f"{name}: unreadable parquet footer: {e}")
            continue
        cols = set(schema.names)
        if want is not None and not want.issubset(cols):
            problems.append(
                f"{name}: missing columns {sorted(want - cols)} (has {sorted(cols)})"
            )
        if name == "events" and "ts" in cols:
            ts_type = schema.field("ts").type
            print(
                f"events.ts physical type: {ts_type} "
                f"(loader is dtype-adaptive; both ns and us are fine)"
            )
    return problems


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else os.environ.get(
        "SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01"
    )
    problems = check(sf_dir)
    if problems:
        print(f"FIXTURE CONTRACT VIOLATIONS in {sf_dir}:")
        for p in problems:
            print(f"  - {p}")
        return 1
    print(f"fixture contract OK: {len(EXPECTED_COLUMNS)} tables in {sf_dir}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
