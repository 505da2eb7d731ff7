"""BPE tokenizer training + encoding (SURVEY.md §2.12 tokenizer tier),
fully engine-deterministic and value-oracle-able.

Byte-pair encoding (Sennrich et al. 2016, public algorithm) trains on
WORD TYPES with counts, not the raw corpus: each merge step counts
adjacent piece pairs weighted by word frequency, picks the most
frequent pair (ties break lexicographically, so the choice is total-
ordered), and fuses that pair everywhere.  Both the trainer and the
encoder here represent a word's pieces as a SPACE-JOINED STRING
('l o w _' — pieces never contain spaces), which makes the merge
application a plain ``replace(' '||pieces||' ', ' a b ', ' ab ')`` —
an operation Spark and DuckDB execute with identical left-to-right
non-overlapping semantics, so K unrolled iterations agree bit-for-bit
across engines.  (Divergence note vs canonical BPE: immediately
repeated occurrences sharing a boundary space — 'a b a b' — fuse only
at alternating positions in one pass, identically in both engines;
canonical BPE fuses all.  Deterministic, documented, and immaterial to
the operator contract.)

Scale shape: training runs on the VOCABULARY (two-stage agg collapses
the corpus to word types before anything else — at 100 TB the vocab is
MBs), each merge step is one explode + two-stage agg + a 1-row
broadcast; encoding is map-only over documents with the K learned
merges broadcast as 1-row columns.  Zero UDFs, zero collects.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

__all__ = ["word_vocab", "bpe_train", "bpe_encode", "initial_pieces"]

#: End-of-word marker appended as its own piece (the classic BPE '</w>',
#: shortened to keep fixture strings readable; '_' never appears in the
#: lowercased [a-z0-9'] token alphabet used here).
EOW = "_"


def initial_pieces(word):  # Column -> Column
    """'low' → 'l o w _' (every char its own piece + end marker)."""
    return F.concat(
        F.trim(F.regexp_replace(word, "(.)", r"$1 ")), F.lit(" " + EOW)
    )


def word_vocab(df: DataFrame, text_col: str = "text", top: int = 200) -> DataFrame:
    """Word types + counts, bounded to the ``top`` most frequent
    (count desc, word asc — total order) — the trainer's working set."""
    tokens = F.explode(
        F.filter(
            F.split(F.lower(F.col(text_col)), r"[^a-z0-9']+", -1), lambda t: t != ""
        )
    ).alias("word")
    return (
        df.select(tokens)
        .groupBy("word")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .orderBy(F.col("cnt").desc(), "word")
        .limit(top)
    )


def _adjacent_pairs(pieces_col):  # Column(list-ready string) -> Column(array<string>)
    arr = F.split(pieces_col, " ", -1)
    return F.transform(
        F.sequence(F.lit(0), F.size(arr) - 2),
        lambda j: F.concat(F.element_at(arr, j + 1), F.lit(" "), F.element_at(arr, j + 2)),
    )


def _apply_merge(pieces_col, pair_col):
    """Fuse every (left-to-right non-overlapping) occurrence of the
    space-separated pair; ``pair_col`` is 'a b', fused form is 'ab'."""
    fused = F.replace(pair_col, F.lit(" "), F.lit(""))
    padded = F.concat(F.lit(" "), pieces_col, F.lit(" "))
    replaced = F.replace(
        padded,
        F.concat(F.lit(" "), pair_col, F.lit(" ")),
        F.concat(F.lit(" "), fused, F.lit(" ")),
    )
    return F.trim(replaced)


def bpe_train(vocab: DataFrame, merges: int = 8) -> DataFrame:
    """Learn ``merges`` BPE merge rules from a (word, cnt) vocabulary.
    Returns (step, pair, merged, pair_cnt) — step is 1-based rule
    order.  Each step's winning pair joins back as a 1-row broadcast;
    the per-step state is pinned with ``localCheckpoint`` (executor-side
    materialization, the connected-components precedent) because the
    naive lazy chain references each previous state TWICE (pair counts
    and re-piecing) — unchecked, the plan doubles per merge and is
    exponential in the schedule length.  The checkpointed working set is
    the vocabulary: tiny by construction."""
    state = vocab.select(
        "word", "cnt", initial_pieces(F.col("word")).alias("pieces")
    ).localCheckpoint()
    rules = None
    for step in range(1, merges + 1):
        pairs = state.select(
            "cnt", F.explode(_adjacent_pairs(F.col("pieces"))).alias("pair")
        )
        top = (
            pairs.groupBy("pair")
            .agg(F.sum("cnt").alias("pair_cnt"))
            .orderBy(F.col("pair_cnt").desc(), "pair")
            .limit(1)
            .select(
                F.lit(step).alias("step"),
                "pair",
                F.replace(F.col("pair"), F.lit(" "), F.lit("")).alias("merged"),
                "pair_cnt",
            )
            # eager=False: the pin still cuts lineage, but materializes
            # inside the NEXT job that consumes it (the every-other-step
            # state checkpoint) instead of costing its own Spark job per
            # merge step — 8 fewer jobs, warm wall 3.0 s → 2.5 s at
            # sf0.1 (and the cold first run 8.1 s → 2.4 s: the per-step
            # eager actions were also each paying plan-compile floors).
            .localCheckpoint(eager=False)
        )
        rules = top if rules is None else rules.unionByName(top)
        state = state.crossJoin(
            F.broadcast(top.select(F.col("pair").alias("_p")))
        ).select(
            "word", "cnt",
            _apply_merge(F.col("pieces"), F.col("_p")).alias("pieces"),
        )
        # Cut lineage every OTHER step: the un-cut chain doubles per
        # merge (state feeds both the pair counts and the re-piecing),
        # but two uncut steps only quadruple the node count while
        # halving the checkpoint job overhead — measured best.
        if step % 2 == 0 or step == merges:
            state = state.localCheckpoint()
    return rules


def bpe_encode(
    df: DataFrame,
    rule_pairs: list[str],
    text_col: str = "text",
) -> DataFrame:
    """Tokenize documents with a LEARNED rule schedule: words → char
    pieces → the merges applied in step order as literal replaces (the
    learned schedule is K tiny strings — tokenizer deployment ships the
    merge table as a constant, exactly how production tokenizers work).
    Emits piece statistics per document (token count and compression vs
    character count) — the training-pipeline signal.

    The per-word piece strings run through the SAME replace algebra as
    training, so encode(corpus) under the learned rules reproduces the
    trainer's final state."""
    words = df.select(
        "doc_id",
        F.explode(
            F.filter(
                F.split(F.lower(F.col(text_col)), r"[^a-z0-9']+", -1),
                lambda t: t != "",
            )
        ).alias("word"),
    )
    pieces = initial_pieces(F.col("word"))
    for pair in rule_pairs:
        pieces = _apply_merge(pieces, F.lit(pair))
    per_word = words.select(
        "doc_id",
        F.size(F.split(pieces, " ", -1)).alias("n_pieces"),
        F.length("word").alias("n_chars"),
    )
    return per_word.groupBy("doc_id").agg(
        F.sum("n_pieces").alias("total_pieces"),
        F.count(F.lit(1)).alias("n_words"),
        F.sum("n_chars").alias("total_chars"),
    )
