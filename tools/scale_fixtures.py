"""Scale the sf0.1 fixtures up N× (default 10× ≈ sf1) for the
floor-separation benchmark (BASELINE.md §D).

Rationale: at sf0.1 most queries sit on Spark's fixed ~0.1–0.2 s per-job
scheduler/codegen floor, so per-query ratios vs DuckDB measure the floor,
not the plans (VERDICT r3 'Next round #3').  This tool replicates every
fixture table N× with per-replica key offsets so ALL referential joins
stay exactly consistent (replica i's orders reference replica i's
customers, etc.), writing to a sibling dir the bench can point at.

Key strides are max_key+1 per table; dims (region, nation) are shared
across replicas, like TPC-H's fixed-small dims.  Document text gets a
per-replica suffix so the corpus grows in *distinct* documents (replicas
would otherwise be exact duplicates and dedup queries would measure an
unrealistically degenerate corpus).

Pure DuckDB — fast (~seconds), deterministic, zero Spark involvement, so
the scaled data is identical no matter which engine reads it.

Usage:
    python tools/scale_fixtures.py [src_dir] [dst_dir] [factor]
    # defaults: /root/testdata/sf0.1  <repo>/.bench_data/sf1  10
"""

from __future__ import annotations

import os
import sys

import duckdb

#: table → columns to offset by (replica × stride(col's home table)).
#: Strides are per *entity* so foreign keys move in lockstep.
OFFSETS: dict[str, dict[str, str]] = {
    "lineitem": {"l_orderkey": "orders", "l_partkey": "part", "l_suppkey": "supplier"},
    "orders": {"o_orderkey": "orders", "o_custkey": "customer"},
    "customer": {"c_custkey": "customer"},
    "supplier": {"s_suppkey": "supplier"},
    "part": {"p_partkey": "part"},
    "events": {"event_id": "events", "user_id": "events_user"},
    "documents": {"doc_id": "documents"},
    "embeddings": {"vec_id": "embeddings"},
}

#: entity → (table, key column) the stride is computed from.
STRIDE_KEY = {
    "orders": ("orders", "o_orderkey"),
    "part": ("part", "p_partkey"),
    "supplier": ("supplier", "s_suppkey"),
    "customer": ("customer", "c_custkey"),
    "events": ("events", "event_id"),
    "events_user": ("events", "user_id"),
    "documents": ("documents", "doc_id"),
    "embeddings": ("embeddings", "vec_id"),
}

SHARED_DIMS = ("region", "nation")


def scale(src: str, dst: str, factor: int) -> None:
    os.makedirs(dst, exist_ok=True)
    con = duckdb.connect()
    con.execute(f"SET threads TO {os.cpu_count()}")

    strides = {
        ent: con.execute(
            f"SELECT max({key}) + 1 FROM '{src}/{tab}.parquet'"
        ).fetchone()[0]
        for ent, (tab, key) in STRIDE_KEY.items()
    }

    for t in SHARED_DIMS:
        con.execute(
            f"COPY (SELECT * FROM '{src}/{t}.parquet') TO '{dst}/{t}.parquet' (FORMAT PARQUET)"
        )
        print(f"{t}: shared dim copied")

    for t, offs in OFFSETS.items():
        cols = [r[0] for r in con.execute(f"DESCRIBE SELECT * FROM '{src}/{t}.parquet'").fetchall()]
        sel = []
        for c in cols:
            if c in offs:
                sel.append(f"{c} + r.i * {strides[offs[c]]} AS {c}")
            elif t == "documents" and c == "text":
                # Replicas must be distinct in SHINGLE space, not just by
                # content hash, and WITHOUT adding any shingles shared
                # across a replica.  Two failed designs, both measured at
                # sf1 (BASELINE.md §D): a ' r<i>' suffix left every doc
                # ~95% Jaccard-similar to its 9 cross-replica siblings
                # (10× the corpus's near-dup density → 225k candidate
                # pairs, 115 s); inserting a replica token between words
                # created a boundary-shingle pool common to ALL docs of a
                # replica, which captured the minhash minima and
                # collapsed LSH bands into thousand-doc buckets (98M
                # candidate pairs).  A per-replica Caesar cipher is the
                # clean transform: bijective on shingles, so every
                # within-replica Jaccard is EXACTLY the original corpus's
                # (near-dup rate scales linearly) while cross-replica
                # shingle sets are disjoint (text is pure [a-z ]).
                az = "abcdefghijklmnopqrstuvwxyz"
                rot = (
                    "CASE r.i % 26 "
                    + " ".join(
                        f"WHEN {k} THEN translate(text, '{az}', '{az[k:] + az[:k]}')"
                        for k in range(1, 26)
                    )
                    + " ELSE text END"
                )
                sel.append(f"{rot} AS text")
            else:
                sel.append(c)
        q = (
            f"COPY (SELECT {', '.join(sel)} FROM '{src}/{t}.parquet', "
            f"range({factor}) r(i)) TO '{dst}/{t}.parquet' "
            f"(FORMAT PARQUET, ROW_GROUP_SIZE 262144)"
        )
        con.execute(q)
        n = con.execute(f"SELECT count(*) FROM '{dst}/{t}.parquet'").fetchone()[0]
        print(f"{t}: {n} rows")


if __name__ == "__main__":
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    src = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    dst = sys.argv[2] if len(sys.argv) > 2 else os.path.join(repo, ".bench_data", "sf1")
    factor = int(sys.argv[3]) if len(sys.argv) > 3 else 10
    scale(src, dst, factor)
