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

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["pack_greedy"]


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
