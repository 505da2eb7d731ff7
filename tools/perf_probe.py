"""Per-query timing probe for config experiments.

Usage:
    python tools/perf_probe.py [--shuffle N] [--mpb BYTES] [--shm]
        [--conf k=v ...] [--runs N] [sf_dir] query...

Times each named registry query (best-of-N, noop sink) under the given
session config and prints one compact JSON line, so A/B config runs are
one shell loop.  This is a tuning tool, not the measurement of record —
bench.py stays the contract.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    import tempfile

    shuffle = 4
    mpb = "512m"
    runs = 2
    use_shm = False
    extra: dict[str, str] = {}
    sf_dir = "/root/testdata/sf0.1"
    names: list[str] = []
    args = sys.argv[1:]
    while args:
        a = args.pop(0)
        if a == "--shuffle":
            shuffle = int(args.pop(0))
        elif a == "--mpb":
            mpb = args.pop(0)
        elif a == "--runs":
            runs = int(args.pop(0))
        elif a == "--shm":
            use_shm = True
        elif a == "--conf":
            k, v = args.pop(0).split("=", 1)
            extra[k] = v
        elif os.path.isdir(a):
            sf_dir = a
        else:
            names.append(a)

    if use_shm and os.path.isdir("/dev/shm"):
        shm = "/dev/shm/anspark_probe"
        os.makedirs(shm, exist_ok=True)
        tempfile.tempdir = shm
        extra.setdefault("spark.local.dir", shm)

    from apache_nifi_spark.registry import QUERIES
    from apache_nifi_spark.session import get_spark

    spark = get_spark(
        app_name="perf_probe", shuffle_partitions=shuffle, extra_conf=extra
    )
    spark.conf.set("spark.sql.files.maxPartitionBytes", mpb)
    spark.conf.set("spark.sql.files.openCostInBytes", "64m")

    QUERIES["flagship_revenue"](spark, sf_dir).collect()  # warm
    out: dict[str, float] = {}
    for name in names or list(QUERIES):
        fn = QUERIES[name]
        best = float("inf")
        for _ in range(runs):
            t0 = time.perf_counter()
            fn(spark, sf_dir).write.mode("overwrite").format("noop").save()
            best = min(best, time.perf_counter() - t0)
        out[name] = round(best, 4)
    spark.stop()
    print(json.dumps({"shuffle": shuffle, "mpb": mpb, "shm": use_shm,
                      "conf": extra, "total": round(sum(out.values()), 4),
                      "queries": out}))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
