"""Dump ``explain("formatted")`` for registry queries to files.

Usage:
    python tools/plan_dump.py --out plans/r16 --suffix before [sf_dir] query...

Writes ``<out>/<query>_<suffix>.txt`` for each named query — the
round-16 optimization deliverable (the judge checks plan claims against
these committed files).  Uses the same session config as bench.py so
the captured plan is the one the bench actually runs.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    out_dir = "plans/r16"
    suffix = "before"
    sf_dir = "/root/testdata/sf0.1"
    names: list[str] = []
    args = sys.argv[1:]
    while args:
        a = args.pop(0)
        if a == "--out":
            out_dir = args.pop(0)
        elif a == "--suffix":
            suffix = args.pop(0)
        elif os.path.isdir(a):
            sf_dir = a
        else:
            names.append(a)

    from apache_nifi_spark.registry import QUERIES
    from apache_nifi_spark.session import get_spark

    spark = get_spark(app_name="plan_dump", shuffle_partitions=4)
    spark.conf.set("spark.sql.files.maxPartitionBytes", "512m")
    spark.conf.set("spark.sql.files.openCostInBytes", "64m")
    os.makedirs(out_dir, exist_ok=True)
    import contextlib
    import io as _io

    rc = 0
    for name in names:
        try:
            df = QUERIES[name](spark, sf_dir)
            buf = _io.StringIO()
            with contextlib.redirect_stdout(buf):
                df.explain("formatted")
            text = buf.getvalue()
        except Exception as e:  # noqa: BLE001 — report and continue
            print(f"FAIL {name}: {type(e).__name__}: {e}")
            rc = 1
            continue
        path = os.path.join(out_dir, f"{name}_{suffix}.txt")
        with open(path, "w") as f:
            f.write(text)
        n_ex = text.count("Exchange")
        print(f"ok {name} -> {path} (Exchange x{n_ex})")
    spark.stop()
    return rc


if __name__ == "__main__":
    raise SystemExit(main())
