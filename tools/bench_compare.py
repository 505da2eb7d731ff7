"""Benchmark comparator: Spark (bench.py timings) vs the DuckDB oracle
baseline at the same scale factor (BASELINE.md §B — the pass criterion is
"each query ≤ 2× its DuckDB baseline at sf 0.1").

Usage:
    python tools/bench_compare.py [sf_dir] [--bench BENCH_JSON]

If --bench is not given, runs bench.py in-process first.  Prints one line
per query: spark_s, duck_s, ratio, and a flag for ratio > 2.0; then a
summary.  DuckDB timings are best-of-2 (the first run pays file-cache
warmup, same as Spark's warm JVM).
"""

from __future__ import annotations

import json
import os
import sys
import time

import duckdb

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from apache_nifi_spark import io  # noqa: E402
from apache_nifi_spark.registry import ORACLES  # noqa: E402


def duck_timings(sf_dir: str) -> dict[str, float]:
    con = duckdb.connect()
    con.execute(f"SET threads TO {os.cpu_count()}")
    for t in io.TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    out: dict[str, float] = {}
    only = {n for n in os.environ.get("SPARK_GRAFT_ONLY", "").split(",") if n}
    for name, sql in ORACLES.items():
        if only and name not in only:
            continue
        best = float("inf")
        for _ in range(2):
            t0 = time.perf_counter()
            con.execute(sql).fetchall()
            best = min(best, time.perf_counter() - t0)
        out[name] = round(best, 4)
    return out


def main() -> int:
    sf_dir = "/root/testdata/sf0.1"
    bench_path = None
    args = sys.argv[1:]
    while args:
        a = args.pop(0)
        if a == "--bench":
            bench_path = args.pop(0)
        else:
            sf_dir = a

    if bench_path:
        bench = json.load(open(bench_path))
    else:
        from bench import run_bench

        bench = run_bench(sf_dir)

    duck = duck_timings(sf_dir)
    spark_t = bench["queries"]

    rows = []
    for name, ds in sorted(duck.items(), key=lambda kv: -spark_t.get(kv[0], 0)):
        ss = spark_t.get(name)
        if ss is None:
            continue
        ratio = ss / ds if ds > 0 else float("inf")
        rows.append((name, ss, ds, ratio))

    n_fail = 0
    print(f"{'query':<34} {'spark_s':>8} {'duck_s':>8} {'ratio':>7}")
    for name, ss, ds, ratio in rows:
        flag = ""
        if ratio > 2.0:
            flag = "  <-- >2x"
            n_fail += 1
        print(f"{name:<34} {ss:>8.3f} {ds:>8.4f} {ratio:>7.2f}{flag}")
    total_s = sum(r[1] for r in rows)
    total_d = sum(r[2] for r in rows)
    print(
        f"\n{len(rows)} oracle queries; spark {total_s:.1f}s vs duckdb {total_d:.1f}s "
        f"(suite ratio {total_s / total_d:.2f}); {n_fail} queries over 2x"
    )
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
