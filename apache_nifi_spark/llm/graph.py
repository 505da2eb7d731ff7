"""Deterministic fixed-point PageRank (§2.12 graph tier — link-graph
authority scoring, the ranking signal web-curation pipelines weight
documents by; joins ``llm/cluster.connected_components`` as the second
iterative graph operator).

Engine-deterministic the same way kmeans/PCA/the trainer are: ranks are
INTEGERS at a fixed scale, every per-edge contribution is an exact
integer division ``(r_src · d_num) div (d_den · outdeg_src)``, and
every inbound sum is an exact bigint aggregate — addition order cannot
move a bit, so K unrolled iterations replay identically in the SQL
oracle.  Dangling-node mass is DROPPED (the documented variant; the
redistribute variant is one extra broadcast join with the same
algebra).

Scale shape (100 TB rules): the edge table — the corpus-sized side —
is hash-partitioned by source ONCE and checkpoint-pinned; each
iteration is one join on that partitioning plus one map-side-combined
aggregate to node grain, and the per-round rank frame is
localCheckpoint-pinned so plan depth stays constant in the iteration
count (the kmeans precedent).  Nothing corpus-sized crosses the driver:
the only collect is the 1-row node count.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["pagerank_fixed_point"]

#: fixed-point rank scale (ranks are ints at 1e-6 units)
_SCALE = 1_000_000


def pagerank_fixed_point(
    edges: DataFrame,
    src_col: str = "src",
    dst_col: str = "dst",
    iters: int = 3,
    damping_num: int = 85,
    damping_den: int = 100,
) -> DataFrame:
    """``iters`` rounds of integer-exact PageRank over a directed edge
    list (duplicate edges count as parallel links, the multigraph
    convention).  Returns (node, rank) with rank = fixed-point units /
    1e-6, plus ``rank_frac`` as the double for presentation.

    Per round: r'(v) = floor(S·(den−num)/(den·N)) +
    Σ_{u→v} (r(u)·num) div (den·outdeg(u)) — all integer ops."""
    e = edges.select(F.col(src_col).alias("_s"), F.col(dst_col).alias("_d"))
    deg = e.groupBy("_s").agg(F.count(F.lit(1)).alias("_deg"))
    # corpus-sized side partitioned by the join key ONCE; ranks meet it
    # exchange-free on their side of every iteration
    ej = (
        e.join(deg, "_s")
        .repartition("_s")
        .localCheckpoint(eager=False)
    )
    nodes = (
        e.select(F.col("_s").alias("_n"))
        .unionByName(e.select(F.col("_d").alias("_n")))
        .distinct()
        .localCheckpoint(eager=False)
    )
    n_nodes = nodes.count()  # control-plane: one scalar
    if n_nodes == 0:
        return nodes.select(
            F.col("_n").alias("node"),
            F.lit(0).cast("bigint").alias("rank"),
            F.lit(0.0).alias("rank_frac"),
        )
    base = (_SCALE * (damping_den - damping_num)) // (damping_den * n_nodes)
    init = _SCALE // n_nodes

    ranks = nodes.select("_n", F.lit(init).cast("bigint").alias("_r"))
    for _ in range(iters):
        contrib = (
            ej.join(ranks.withColumnRenamed("_n", "_s"), "_s")
            .select(
                F.col("_d").alias("_n"),
                F.expr(
                    f"(_r * {damping_num}) div ({damping_den} * _deg)"
                ).alias("_c"),
            )
            .groupBy("_n")
            .agg(F.sum("_c").alias("_in"))
        )
        ranks = (
            nodes.join(contrib, "_n", "left")
            .select(
                "_n",
                (F.lit(base) + F.coalesce(F.col("_in"), F.lit(0)))
                .cast("bigint")
                .alias("_r"),
            )
            # pinned per round: keeps the final plan depth constant in
            # ``iters`` (kmeans precedent)
            .localCheckpoint(eager=False)
        )
    return ranks.select(
        F.col("_n").alias("node"),
        F.col("_r").alias("rank"),
        (F.col("_r").cast("double") / float(_SCALE)).alias("rank_frac"),
    )
