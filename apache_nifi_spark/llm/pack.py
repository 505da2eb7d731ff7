"""Context-window packing: greedy sequential binning of documents into
token-budget packs — the step between chunking/filtering and batch
assembly in a pretraining data pipeline (short documents are packed
together so a training sequence wastes no budget on padding).

Greedy fold semantics ("keep appending until the next doc would
overflow, then open a new pack") are inherently sequential, so this is
NOT window-expressible — it is the textbook case for
``applyInPandas``: parallel across groups (source shards), an exact
Arrow-batched fold within each group.  At 100 TB the group key is the
shard/file id, giving thousands of independent folds; no group ever
exceeds one shard.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

__all__ = ["pack_greedy", "shard_layout", "rendezvous_shard"]


def pack_greedy(
    df: DataFrame,
    budget: int,
    group_col: str = "source",
    id_col: str = "doc_id",
    token_col: str = "n_tokens",
) -> DataFrame:
    """Assign each row a ``pack_id`` (0-based per group): rows are taken
    in ``id_col`` order; a row joins the current pack when its tokens
    fit in ``budget``, else it opens the next pack.  A row larger than
    the whole budget gets a pack of its own (never split).

    Output: (group, id, tokens, pack_id) — deterministic for a given
    (group, id, tokens) input regardless of partitioning.
    """
    import pandas as pd

    out_schema = (
        f"{group_col} string, {id_col} long, {token_col} long, pack_id long"
    )

    def _pack(pdf: "pd.DataFrame") -> "pd.DataFrame":
        pdf = pdf.sort_values(id_col).reset_index(drop=True)
        pack_ids = []
        pack, acc = -1, 0
        for n in pdf[token_col]:
            if pack >= 0 and acc + n <= budget:
                acc += n
            else:
                pack += 1
                acc = n
            pack_ids.append(pack)
        pdf["pack_id"] = pack_ids
        return pdf[[group_col, id_col, token_col, "pack_id"]]

    return (
        df.select(group_col, id_col, F.col(token_col).cast("long").alias(token_col))
        .groupBy(group_col)
        .applyInPandas(_pack, out_schema)
    )


def shard_layout(
    df: DataFrame,
    id_col: str = "doc_id",
    n_shards: int = 64,
) -> DataFrame:
    """Deterministic global shuffle for training-data layout: every
    document gets a shard and a position, both pure functions of its id —
    the reproducible "shuffled" order a pretraining run needs (re-running
    the pipeline, resuming mid-epoch, or regenerating one lost shard
    yields byte-identical layout; a random shuffle can't promise any of
    that).

    shard = md5-derived uniform hash mod n_shards; position = rank of the
    hash within the shard (ties broken by id — md5 collisions at 52 bits
    are ~2^-52 but the layout must be total-ordered regardless).  One
    shuffle on shard + a per-shard sort, exactly the write path of a
    sharded training-set export; the md5 derivation value-oracles.
    """
    h = F.conv(
        F.substring(F.md5(F.col(id_col).cast("string")), 1, 13), 16, 10
    ).cast("bigint")
    w = Window.partitionBy("shard").orderBy("h", id_col)
    return (
        df.select(F.col(id_col), h.alias("h"))
        .withColumn("shard", F.pmod(F.col("h"), F.lit(n_shards)).cast("int"))
        .withColumn("position", F.row_number().over(w))
        .select(id_col, "shard", "position")
    )


def rendezvous_shard(key, n_shards: int):
    """Highest-random-weight (rendezvous) shard assignment (Thaler &
    Ravishankar 1998 — the consistent-hashing family member with exact
    minimal disruption): a key's shard is the one whose salted hash
    ``md5(key ':' shard)`` is LARGEST.  Growing the shard count from N
    to N+1 moves a document ONLY if the new shard's hash beats all N
    old ones — so exactly the ~1/(N+1) expected fraction moves and
    every moved document lands on the NEW shard, never reshuffled among
    survivors (the invariant tests/test_llm.py asserts).  This is the
    re-shard-stable alternative to ``shard_layout``'s modulo hash
    (which moves ~N/(N+1) of the corpus on resize).

    Pure column expression over md5 (portable, codegen'd, no shuffle):
    argmax via ``array_max`` over (hash, shard) structs — struct
    comparison breaks exact hash ties toward the higher shard id,
    matching the oracle's ``max_by(s, h || s)``."""
    from pyspark.sql import functions as F

    pairs = F.array(
        *[
            F.struct(
                F.md5(
                    F.concat(key.cast("string"), F.lit(f":{s}"))
                ).alias("h"),
                F.lit(s).alias("s"),
            )
            for s in range(n_shards)
        ]
    )
    return F.array_max(pairs)["s"]
