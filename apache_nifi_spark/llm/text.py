"""Text analysis operators: token stats, language ID, quality scoring,
document fingerprinting.

All pure column expressions over the ``documents`` table shape
(doc_id, text, lang, source, n_chars) — zero UDFs, so these run inside
whole-stage codegen at full scan speed; at 100 TB they are
scan-bandwidth-bound, which is the best possible shape.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = [
    "token_stats",
    "bpe_ish_tokens",
    "vocab_topk",
    "language_id",
    "quality_score",
    "unigram_logprob",
    "bigram_logprob",
    "tfidf_keywords",
    "zipf_fit",
    "c4_line_filter",
    "rolling_fingerprint",
    "ccnet_buckets",
    "chunk_sliding",
    "pii_redact",
    "repetition_scores",
    "normalize_urls",
    "decontaminate",
    "gopher_quality_rules",
    "STOPWORDS",
    "PII_PATTERNS",
    "GOPHER_STOPWORDS",
]

#: Tiny per-language stopword lists for the n-gram/stopword language-ID
#: heuristic.  Deliberately small — the operator structure (broadcast map
#: + argmax) is what matters; swap in real lists in production.
STOPWORDS: dict[str, list[str]] = {
    "en": ["the", "and", "of", "to", "a", "in", "is", "it", "that", "for"],
    "es": ["el", "la", "de", "que", "y", "en", "un", "es", "por", "con"],
    "fr": ["le", "la", "de", "et", "un", "en", "est", "que", "pour", "dans"],
    "de": ["der", "die", "das", "und", "in", "von", "zu", "mit", "ist", "auf"],
    "zh": ["的", "了", "是", "在", "我", "有", "和", "就", "不", "人"],
}

#: BPE-ish pre-tokenization: letter runs | single digits | punctuation.
#: (The GPT-2-style pattern family, simplified to RE2/Java-compatible.)
BPE_ISH_PATTERN = r"[A-Za-z]+|[0-9]|[^A-Za-z0-9\s]"


def _ws_tokens(text: Column) -> Column:
    """Whitespace tokens with no empty strings (leading/trailing safe)."""
    return F.filter(F.split(text, r"\s+", -1), lambda t: t != "")


def tokens_arrow(
    df: DataFrame,
    text_col: str = "text",
    id_col: str | None = None,
    pattern: str = "[^a-z0-9']+",
    lower: bool = True,
    with_pos: bool = False,
) -> DataFrame:
    """Exploded token stream via ``mapInArrow`` + PyArrow's RE2 engine —
    the regexp-free-JVM tokenize path (round-11 verdict item 3).

    Java's regex engine costs ~5-8× DuckDB's RE2 per byte (the measured
    library constant behind the ccnet/bpe/paragraph-dedup sf1 walls);
    Arrow's ``split_pattern_regex`` IS RE2, and ``mapInArrow`` ships the
    text column as Arrow buffers (no per-row Python), so the whole
    tokenize runs vectorized C++: lower → RE2 split → ``list_flatten``
    (+ ``list_parent_indices`` to carry the id) → drop empties.
    Measured at sf1 (50 k docs, 2.7 M tokens): 0.85 s vs 2.0 s for the
    ``F.split`` form on an identical count+agg plan — ~2.4×.

    Semantics are identical to
    ``explode(filter(split(lower(text), pattern), t -> t != ''))`` for
    the ASCII character-class patterns used here (empty leading/trailing
    splits filtered, empty text → no rows, null text → no rows).

    Scale shape: map-only (partitioning preserved, no shuffle), Arrow
    batch transfer both ways; the one trade is leaving whole-stage
    codegen for the tokenize stage — a win whenever the regex dominates,
    which the sf1 measurements show it does for corpus-grain tokenizes.

    SIZE-ADAPTIVE (round-12 bench finding): below ``min_bytes`` of
    projected input (Catalyst plan statistics — the same size estimate
    AQE's broadcast decision reads) the Python round-trip overhead
    exceeds the regex saving (~+0.9 s per pass at sf0.1's 250 KB vs
    −2.2 s at sf1's 2.4 MB), so small inputs take the equivalent JVM
    ``F.split`` form.  Unknown statistics default to huge → Arrow, the
    right call at production scale.

    ``with_pos=True`` adds an int ``pos`` column: the token's index in
    the RAW split (before empty-string filtering), so values from the
    Arrow and JVM paths are identical; within a document ``pos`` is
    strictly increasing, which is the ordering contract position-aware
    callers (RAKE phrase runs) rely on.  The id column's output type is
    derived from the input schema — callers with int/string ids get a
    matching Arrow schema (ADVICE r12).
    """
    import pyarrow as pa

    parts = []
    if id_col:
        id_type = df.schema[id_col].dataType.simpleString()
        parts.append(f"{id_col} {id_type}")
    if with_pos:
        parts.append("pos int")
    parts.append("token string")
    out_schema = ", ".join(parts)
    cols = [id_col, text_col] if id_col else [text_col]

    min_bytes = 1 << 20
    try:
        est = int(
            df.select(*cols)
            ._jdf.queryExecution().optimizedPlan().stats().sizeInBytes()
        )
    except Exception:  # stats unavailable → assume big (scale-safe)
        est = min_bytes
    if est < min_bytes:
        raw = F.split(
            F.lower(F.col(text_col)) if lower else F.col(text_col),
            pattern,
            -1,
        )
        if with_pos:
            sel = [F.col(id_col)] if id_col else []
            return (
                df.select(*sel, F.posexplode(raw).alias("pos", "token"))
                .filter(F.col("token") != "")
            )
        toks = F.explode(
            F.filter(raw, lambda t: t != "")
        ).alias("token")
        return (
            df.select(id_col, toks) if id_col else df.select(toks)
        )

    def run(batches):
        import numpy as np
        import pyarrow.compute as pc

        for b in batches:
            t = b.column(b.schema.get_field_index(text_col))
            if lower:
                t = pc.utf8_lower(t)
            toks = pc.split_pattern_regex(t, pattern=pattern)
            flat = pc.list_flatten(toks)
            mask = pc.not_equal(flat, "")
            idx = pc.list_parent_indices(toks) if (id_col or with_pos) else None
            arrays, names = [], []
            if id_col:
                ids = pc.take(b.column(b.schema.get_field_index(id_col)), idx)
                arrays.append(ids.filter(mask))
                names.append(id_col)
            if with_pos:
                par = idx.to_numpy(zero_copy_only=False)
                # fresh compute results have offset 0, so offsets[i] is
                # the flat start of list i; flat_index - start = raw pos
                starts = toks.offsets.to_numpy(zero_copy_only=False)[par]
                pos = (
                    np.arange(len(par), dtype=np.int64) - starts
                ).astype(np.int32)
                arrays.append(pa.array(pos).filter(mask))
                names.append("pos")
            arrays.append(flat.filter(mask))
            names.append("token")
            yield pa.RecordBatch.from_arrays(arrays, names)

    return df.select(*cols).mapInArrow(run, out_schema)


def regexp_replace_arrow(
    df: DataFrame,
    text_col: str,
    pattern: str,
    replacement: str,
    id_col: str = "doc_id",
) -> DataFrame:
    """``regexp_replace`` via ``mapInArrow`` + RE2 — the companion to
    :func:`tokens_arrow` for replace-shaped hot regexes (round-11
    verdict item 3; the paragraph-lining pass was one of the three sf1
    walls blaming the Java-regex constant).  ``replacement`` uses RE2
    rewrite syntax (``\\1``…``\\9`` backreferences, not Java's ``$1``).
    Map-only, partitioning preserved; returns (id_col, text_col).
    Output schema types are derived from the input schema (ADVICE
    r12 — a caller with an int/string id must not get a mismatch)."""
    import pyarrow as pa

    def run(batches):
        import pyarrow.compute as pc

        for b in batches:
            t = pc.replace_substring_regex(
                b.column(b.schema.get_field_index(text_col)),
                pattern=pattern,
                replacement=replacement,
            )
            yield pa.RecordBatch.from_arrays(
                [b.column(b.schema.get_field_index(id_col)), t],
                [id_col, text_col],
            )

    id_type = df.schema[id_col].dataType.simpleString()
    text_type = df.schema[text_col].dataType.simpleString()
    return df.select(id_col, text_col).mapInArrow(
        run, f"{id_col} {id_type}, {text_col} {text_type}"
    )


def token_stats(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Token counting + basic shape stats: whitespace tokens, BPE-ish
    tokens, char length, mean token length."""
    t = F.col(text_col)
    toks = _ws_tokens(t)
    return df.withColumns(
        {
            "n_tokens_ws": F.size(toks),
            "n_tokens_bpe": F.size(F.regexp_extract_all(t, F.lit(BPE_ISH_PATTERN), 0)),
            "len_chars": F.length(t),
            "mean_token_len": F.when(
                F.size(toks) > 0,
                F.aggregate(
                    toks,
                    F.lit(0).cast("long"),
                    lambda acc, x: acc + F.length(x),
                ).cast("double")
                / F.size(toks),
            ),
        }
    )


def bpe_ish_tokens(text: Column) -> Column:
    return F.regexp_extract_all(text, F.lit(BPE_ISH_PATTERN), 0)


def vocab_topk(
    df: DataFrame,
    text_col: str = "text",
    k: int = 100,
    min_count: int = 1,
) -> DataFrame:
    """Corpus vocabulary: top-k lowercased word tokens by document-wide
    frequency — the vocabulary/frequency-table pass of a tokenizer-
    training or corpus-analysis pipeline (SURVEY.md §2.12 class).

    Shape at 100 TB: explode → two-stage hash agg (partial map-side
    combine collapses each partition's counts to its distinct tokens
    before the single shuffle; vocabulary cardinality ≪ token count, so
    the exchange carries the small side) → TakeOrdered for the top-k
    (no global sort materialization).  Ties break lexicographically so
    the result is total-ordered and oracle-exact.
    """
    tokens = F.explode(
        F.filter(
            F.split(F.lower(F.col(text_col)), r"[^a-z0-9']+", -1), lambda t: t != ""
        )
    ).alias("token")
    return (
        df.select(tokens)
        .groupBy("token")
        .agg(F.count(F.lit(1)).alias("freq"))
        .filter(F.col("freq") >= min_count)
        .orderBy(F.col("freq").desc(), F.col("token"))
        .limit(k)
    )


def language_id(
    df: DataFrame, text_col: str = "text", out_col: str = "lang_pred"
) -> DataFrame:
    """Language identification by stopword-hit scoring: tokenize, count
    hits against each language's (tiny, broadcast-literal) stopword set,
    argmax with a deterministic tie-break on language code.

    ``array_intersect`` keeps it set-based and JVM-side; scoring N
    languages is N array ops per row, no shuffle.
    """
    toks = F.array_distinct(_ws_tokens(F.lower(F.col(text_col))))
    scores = [
        (lang, F.size(F.array_intersect(toks, F.array(*[F.lit(w) for w in words]))))
        for lang, words in STOPWORDS.items()
    ]
    best = F.greatest(*[s for _, s in scores])
    pred = F.lit("unknown")
    # reversed so the FIRST language in STOPWORDS wins ties deterministically
    for lang, s in reversed(scores):
        pred = F.when((s == best) & (best > 0), F.lit(lang)).otherwise(pred)
    return df.withColumn(out_col, pred)


def quality_score(
    df: DataFrame, text_col: str = "text", out_col: str = "quality"
) -> DataFrame:
    """Heuristic document quality in [0,1]: blend of length band, symbol
    ratio, stopword presence, and mean-word-length sanity — the standard
    pretraining-corpus filters (C4-style) as one pass of column math."""
    t = F.col(text_col)
    toks = _ws_tokens(t)
    n_tok = F.size(toks)
    n_chars = F.length(t)
    sym = n_chars - F.length(F.regexp_replace(t, r"[^A-Za-z0-9\s]", ""))
    sym_ratio = F.when(n_chars > 0, sym.cast("double") / n_chars).otherwise(0.0)
    en_stop = F.array(*[F.lit(w) for w in STOPWORDS["en"]])
    stop_hits = F.size(F.array_intersect(F.array_distinct(toks), en_stop))
    mean_wl = F.when(
        n_tok > 0,
        (n_chars - n_tok + 1).cast("double") / n_tok,
    ).otherwise(0.0)
    score = (
        F.when((n_tok >= 10) & (n_tok <= 100000), 0.4).otherwise(0.0)
        + F.when(sym_ratio < 0.1, 0.2).otherwise(0.0)
        + F.when(stop_hits >= 2, 0.2).otherwise(0.0)
        + F.when((mean_wl >= 2.0) & (mean_wl <= 12.0), 0.2).otherwise(0.0)
    )
    return df.withColumns(
        {
            "n_tokens": n_tok,
            "symbol_ratio": sym_ratio,
            "stopword_hits": stop_hits,
            "mean_word_len": mean_wl,
            out_col: score,
        }
    )


def quality_logit(
    df: DataFrame, text_col: str = "text", out_col: str = "quality_logit"
) -> DataFrame:
    """Continuous quality score: a fixed-weight linear model over the
    one-pass features (the fasttext-style quality-classifier stand-in a
    pretraining pipeline thresholds on, vs ``quality_score``'s coarse
    bands).  Emits the LOGIT and ``keep = logit > 0`` rather than the
    sigmoid: ordering and thresholding are identical, and the linear
    form uses only IEEE-exact ops (mul/add/sqrt/abs — no exp/log, whose
    last-ulp behavior differs between Java's Math and libm), so the
    score value-oracles bit-for-bit.  Weights are fixed constants of the
    operator: length (diminishing via sqrt, capped), symbol density,
    stopword evidence (capped), and word-length deviation from English's
    ~5.5-char mean."""
    t = F.col(text_col)
    toks = _ws_tokens(t)
    n_tok = F.size(toks)
    n_chars = F.length(t)
    sym = n_chars - F.length(F.regexp_replace(t, r"[^A-Za-z0-9\s]", ""))
    sym_ratio = F.when(n_chars > 0, sym.cast("double") / n_chars).otherwise(0.0)
    en_stop = F.array(*[F.lit(w) for w in STOPWORDS["en"]])
    stop_hits = F.size(F.array_intersect(F.array_distinct(toks), en_stop))
    mean_wl = F.when(
        n_tok > 0, (n_chars - n_tok + 1).cast("double") / n_tok
    ).otherwise(0.0)
    logit = (
        F.lit(-0.8)
        + F.lit(0.14) * F.sqrt(F.least(n_tok, F.lit(10000)).cast("double"))
        - F.lit(6.0) * sym_ratio
        + F.lit(0.18) * F.least(stop_hits, F.lit(20)).cast("double")
        - F.lit(0.35) * F.abs(mean_wl - F.lit(5.5))
    )
    return df.withColumns({out_col: logit, "keep": logit > 0})


def unigram_logprob(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    vocab: DataFrame | None = None,
    out_col: str = "mean_logprob",
) -> DataFrame:
    """Corpus-trained unigram language-model scoring (the CCNet/KenLM-style
    perplexity filter of a pretraining pipeline, §2.12 quality tier):
    train token frequencies on the corpus itself (or score against a
    ``vocab`` trained elsewhere — the cross-corpus filtering setup), then
    score each document by its mean token log-probability under Laplace
    smoothing: p(t) = (c(t)+1) / (T+V).  Out-of-vocabulary tokens get the
    smoothed floor 1/(T+V).  Low scores flag gibberish/boilerplate; the
    companion ``ppl = exp(-mean_logprob)`` is the familiar perplexity.

    Shape at 100 TB: training is a two-stage hash agg (map-side combine
    collapses each partition to its distinct tokens before one small
    exchange — vocabulary ≪ token count); scoring joins the exploded
    token stream to the vocabulary UN-HINTED — AQE broadcasts it while
    its measured size fits and degrades to a shuffled hash join beyond
    (web-corpus vocabulary is Heaps-sublinear but UNBOUNDED: 10⁸–10⁹
    types at 100 TB, so a forced ``F.broadcast`` here is an executor
    OOM — r12 verdict item 2).  Then one partial/final agg back to doc
    grain.  Both rounded to 6 dp — double addition order is
    partition-dependent, same policy as text_char_entropy.
    """
    from pyspark.sql import functions as _F  # local alias keeps Column algebra clear

    # Arrow/RE2 tokenize (see tokens_arrow): the corpus-grain regex is
    # the measured cost center at sf1; semantics identical to the
    # F.split form
    tokens = tokens_arrow(df, text_col=text_col, id_col=id_col)
    if vocab is None:
        vocab = tokens.groupBy("token").agg(_F.count(_F.lit(1)).alias("c"))
    stats = vocab.agg(
        _F.sum("c").alias("t_total"), _F.count(_F.lit(1)).alias("v_size")
    )
    denom = (_F.col("t_total") + _F.col("v_size")).cast("double")
    scored = (
        tokens.join(vocab, "token", "left")
        .crossJoin(F.broadcast(stats))
        .select(
            id_col,
            _F.log((_F.coalesce(_F.col("c"), _F.lit(0)) + 1).cast("double") / denom)
            .alias("lp"),
        )
    )
    return scored.groupBy(id_col).agg(
        _F.count(_F.lit(1)).alias("n_tokens"),
        _F.round(_F.sum("lp") / _F.count(_F.lit(1)), 6).alias(out_col),
        _F.round(_F.exp(-_F.sum("lp") / _F.count(_F.lit(1))), 6).alias("ppl"),
    )


def zipf_fit(
    df: DataFrame,
    text_col: str = "text",
    top: int = 100,
) -> DataFrame:
    """Corpus-level Zipf-law fit (§2.12 corpus-analysis tier): OLS of
    ``ln(freq)`` against ``ln(rank)`` over the top-``top`` vocabulary
    ranks.  Natural corpora fit α ≈ 1; a collapsed or synthetic corpus
    (template spam, near-duplicate floods, truncated vocab) shows up as
    an α far from 1 or a poor fit — a standard one-number health check
    before committing tokenizer/mixture decisions.

    Shape at 100 TB: vocabulary agg (two-stage, map-side combined), then
    the top-``top`` cut is a TakeOrdered (no global sort) and the fit
    runs over those ``top`` rows — bounded by construction, so the
    final single-partition window/agg is control-plane-sized.  α and
    intercept rounded to 6 dp (double sums over the rank rows are
    partition-order-dependent — the unigram_logprob policy).

    Returns ONE row: (n_types, n_tokens, alpha, intercept).
    """
    from pyspark.sql import Window, functions as _F

    counts = (
        df.select(
            _F.explode(
                _F.filter(
                    _F.split(_F.lower(_F.col(text_col)), r"[^a-z0-9']+", -1),
                    lambda t: t != "",
                )
            ).alias("token")
        )
        .groupBy("token")
        .agg(_F.count(_F.lit(1)).alias("freq"))
    )
    totals = counts.agg(
        _F.count(_F.lit(1)).alias("n_types"),
        _F.sum("freq").alias("n_tokens"),
    )
    topn = counts.orderBy(_F.col("freq").desc(), "token").limit(top)
    # rank over the bounded top-N set (≤ `top` rows — the one-partition
    # window is control-plane-sized by construction)
    w = Window.orderBy(_F.col("freq").desc(), "token")
    xy = topn.select(
        _F.log(_F.row_number().over(w).cast("double")).alias("x"),
        _F.log(_F.col("freq").cast("double")).alias("y"),
    )
    s = xy.agg(
        _F.count(_F.lit(1)).cast("double").alias("n"),
        _F.sum("x").alias("sx"),
        _F.sum("y").alias("sy"),
        _F.sum(_F.col("x") * _F.col("y")).alias("sxy"),
        _F.sum(_F.col("x") * _F.col("x")).alias("sxx"),
    )
    slope = (_F.col("sxy") - _F.col("sx") * _F.col("sy") / _F.col("n")) / (
        _F.col("sxx") - _F.col("sx") * _F.col("sx") / _F.col("n")
    )
    fitted = s.select(
        _F.round(-slope, 6).alias("alpha"),
        _F.round(
            (_F.col("sy") - slope * _F.col("sx")) / _F.col("n"), 6
        ).alias("intercept"),
    )
    return totals.crossJoin(F.broadcast(fitted)).select(
        "n_types", "n_tokens", "alpha", "intercept"
    )


def tfidf_keywords(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    k: int = 5,
) -> DataFrame:
    """Per-document tf-idf keyword extraction (§2.12 corpus-analysis
    tier): the classic training-data signal for topic balance audits,
    dedup explanation ("what is this cluster about"), and retrieval-
    style filtering.  ``score = tf · (ln((N+1)/(df+1)) + 1)`` (smoothed
    idf, sklearn's convention), top-``k`` terms per document.

    Shape at 100 TB: one explode → doc-grain tf agg; df is a second agg
    over the distinct (doc, term) pairs the first already produced;
    idf joins back un-hinted (AQE broadcasts while the measured term
    table fits; vocabulary is corpus-unbounded, so no forced hint —
    r12 verdict item 2); the top-k cut is a
    window over the doc partition — hash-partitioned by document, no
    global sort.  Ranking uses the 6-dp-ROUNDED score with a term
    tie-break, so the cut is total-ordered and engine-exact (raw double
    scores differ in last-ulp across engines; rounding first makes the
    order — and therefore the top-k set — identical).

    Returns (id, term, tf, score, rank), rank 1..k per document.
    """
    from pyspark.sql import Window, functions as _F

    tokens = df.select(
        id_col,
        _F.explode(
            _F.filter(
                _F.split(_F.lower(_F.col(text_col)), r"[^a-z0-9']+", -1),
                lambda t: t != "",
            )
        ).alias("term"),
    )
    # Pin (doc, term, tf) once: three consumers below (df counts, the
    # doc-count scalar, the scoring join) would otherwise each replay
    # the token explode.  eager=False folds materialization into the
    # first consuming job — one corpus scan total, no standalone job.
    tf = (
        tokens.groupBy(id_col, "term")
        .agg(_F.count(_F.lit(1)).alias("tf"))
        .localCheckpoint(eager=False)
    )
    # N rides the plan as a 1-row broadcast (keyless by nature, bounded
    # by construction) instead of a driver-side count job.
    nd = tf.select(id_col).distinct().agg(
        _F.count(_F.lit(1)).alias("__n_docs")
    )
    dfreq = tf.groupBy("term").agg(_F.count(_F.lit(1)).alias("df"))
    idf = _F.log(
        (_F.col("__n_docs") + 1).cast("double")
        / (_F.col("df") + 1).cast("double")
    ) + _F.lit(1.0)
    scored = tf.join(dfreq, "term").crossJoin(
        F.broadcast(nd)
    ).select(
        id_col,
        "term",
        "tf",
        _F.round(_F.col("tf").cast("double") * idf, 6).alias("score"),
    )
    w = Window.partitionBy(id_col).orderBy(
        _F.col("score").desc(), _F.col("term")
    )
    return (
        scored.withColumn("rank", _F.row_number().over(w))
        .filter(_F.col("rank") <= k)
        .select(id_col, "term", "tf", "score", "rank")
    )


def bigram_logprob(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    lam: float = 0.7,
    out_col: str = "mean_logprob",
) -> DataFrame:
    """Interpolated bigram language-model scoring — the next tier above
    ``unigram_logprob`` on the KenLM/CCNet quality ladder (§2.12): train
    unigram AND bigram counts on the corpus, then score each document by
    its mean token log-probability under Jelinek-Mercer interpolation

        p(wᵢ|wᵢ₋₁) = λ·p_bi + (1−λ)·p_uni
        p_bi  = (c(wᵢ₋₁wᵢ)+1) / (c(wᵢ₋₁)+V)      (Laplace per history)
        p_uni = (c(wᵢ)+1) / (T+V)

    with the first token of a document scored by the unigram term alone.
    A bigram model separates fluent text from shuffled-word salad that a
    unigram filter scores identically — the standard next signal a
    pretraining pipeline adds.

    Shape at 100 TB: the (prev, cur) stream is built COLUMNAR with an
    index-aware ``transform`` over the token array (map-only — no window
    over doc partitions, no O(len²) array copying), so training is two
    hash aggs and scoring is the token stream joined to the two count
    tables UN-HINTED — both the unigram and bigram tables broadcast
    while AQE measures them small and degrade to hash joins beyond
    (vocabulary is corpus-unbounded; r12 verdict item 2).
    Mean rounded to 6 dp — double addition order is partition-dependent,
    same policy as ``unigram_logprob``.
    """
    from pyspark.sql import functions as _F

    toks = df.select(
        id_col,
        _F.filter(
            _F.split(_F.lower(_F.col(text_col)), r"[^a-z0-9']+", -1),
            lambda t: t != "",
        ).alias("t"),
    )
    # (pos, cur, prev) stream, columnar: element_at is 1-based, the
    # transform index 0-based, so prev of the i-th element is t[i].
    # Pinned once (lazy — materializes inside the first consuming job):
    # three consumers below (unigram counts, bigram counts, scoring)
    # would otherwise each replay the tokenize+explode over the corpus.
    stream = (
        toks.select(
            id_col,
            _F.explode(
                _F.expr(
                    "transform(t, (x, i) -> struct("
                    "i + 1 as pos, x as cur,"
                    " case when i = 0 then null else element_at(t, i) end as prev))"
                )
            ).alias("u"),
        )
        .select(id_col, "u.pos", "u.cur", "u.prev")
        .localCheckpoint(eager=False)
    )
    uni = stream.groupBy(_F.col("cur").alias("token")).agg(
        _F.count(_F.lit(1)).alias("c")
    )
    stats = uni.agg(
        _F.sum("c").alias("t_total"), _F.count(_F.lit(1)).alias("v_size")
    )
    bi = (
        stream.filter(_F.col("prev").isNotNull())
        .groupBy(_F.col("prev").alias("bp"), _F.col("cur").alias("bc"))
        .agg(_F.count(_F.lit(1)).alias("cb"))
    )
    up = uni.select(_F.col("token").alias("ptoken"), _F.col("c").alias("pc"))
    scored = (
        stream.join(uni, stream["cur"] == uni["token"], "left")
        .join(up, stream["prev"] == _F.col("ptoken"), "left")
        .join(
            bi,
            (stream["prev"] == _F.col("bp")) & (stream["cur"] == _F.col("bc")),
            "left",
        )
        .crossJoin(F.broadcast(stats))
    )
    denom_u = (_F.col("t_total") + _F.col("v_size")).cast("double")
    p_uni = (_F.coalesce(_F.col("c"), _F.lit(0)) + 1).cast("double") / denom_u
    p_bi = (_F.coalesce(_F.col("cb"), _F.lit(0)) + 1).cast("double") / (
        _F.coalesce(_F.col("pc"), _F.lit(0)) + _F.col("v_size")
    ).cast("double")
    lp = _F.when(_F.col("prev").isNull(), _F.log(p_uni)).otherwise(
        _F.log(_F.lit(lam) * p_bi + (_F.lit(1.0) - _F.lit(lam)) * p_uni)
    )
    return (
        scored.select(id_col, lp.alias("lp"))
        .groupBy(id_col)
        .agg(
            _F.count(_F.lit(1)).alias("n_tokens"),
            _F.round(_F.sum("lp") / _F.count(_F.lit(1)), 6).alias(out_col),
            _F.round(_F.exp(-_F.sum("lp") / _F.count(_F.lit(1))), 6).alias("ppl"),
        )
    )


def chunk_sliding(
    df: DataFrame,
    text_col: str = "text",
    size: int = 50,
    stride: int = 25,
    start_col: str = "chunk_start",
    chunk_col: str = "chunk_text",
) -> DataFrame:
    """Sliding-window chunking: split a document into overlapping
    ``size``-token windows every ``stride`` tokens — the standard
    context-window prep for training/embedding pipelines.

    Pure array ops (split → sequence of starts → explode → slice), so
    the fan-out happens JVM-side inside codegen; at 100 TB the explode
    multiplies rows ~(n_tokens/stride)× with zero shuffle — chunk rows
    stay in their parent's partition until a downstream op needs a
    repartition.  1-based ``chunk_start`` (token index) is part of the
    output so chunks are traceable back to their source span.
    """
    toks = _ws_tokens(F.col(text_col))
    starts = F.sequence(F.lit(1), F.greatest(F.size(toks), F.lit(1)), F.lit(stride))
    return (
        df.withColumn("__toks", toks)
        .withColumn(start_col, F.explode(starts))
        .withColumn(
            chunk_col,
            F.concat_ws(" ", F.slice(F.col("__toks"), F.col(start_col), size)),
        )
        .drop("__toks")
    )


#: PII patterns, constrained to the RE2 ∩ Java-regex common dialect so
#: the identical pattern runs on Spark and the DuckDB oracle.  Order
#: matters: emails first (contain digits/dots), then IPv4 (dotted
#: digits), then phone runs.  The phone pattern requires a short lead
#: group plus 2–5 separator-delimited digit groups (word-bounded) — this
#: covers the common 3-group forms (415-555-0199, 415.555.0199,
#: 555 123 4567) as well as +CC 4-group internationals, while long
#: decimals (3.141592653), ISO timestamps, and bare ID/order numbers
#: survive because they lack a separator between every group.
#: (A space-separated numeric table row can still look phone-shaped;
#: that residual over-redaction is the accepted tradeoff of a
#: lookahead-free dialect.)
PII_PATTERNS: list[tuple[str, str]] = [
    (r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "[EMAIL]"),
    (r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b", "[IP]"),
    (r"\+?\b\d{1,3}(?:[ .-]\d{1,4}){2,5}\b", "[PHONE]"),
]


def pii_redact(
    df: DataFrame, text_col: str = "text", out_col: str = "redacted"
) -> DataFrame:
    """Redact emails / IPv4s / phone-number runs with typed placeholders —
    the pretraining-corpus PII scrub as a chain of ``regexp_replace``
    (JVM-side, scan-bandwidth-bound; no UDF)."""
    out = F.col(text_col)
    for pattern, token in PII_PATTERNS:
        out = F.regexp_replace(out, pattern, token)
    return df.withColumn(out_col, out)


def repetition_scores(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Gopher-style repetition signals per document (Rae et al. 2021 §A1.1
    quality filters): the fraction of tokens taken by the single most
    frequent token, and the fraction of 2-grams that are repeats.
    Machine-generated / boilerplate text scores high on both; a
    pretraining filter drops rows above thresholds.

    Shape: explode → two (id, gram) aggregations → join back.  Two
    shuffles keyed on (doc, gram).  MEASURED ALTERNATIVE (round 5,
    sf1): a zero-shuffle all-array variant (run-length fold over
    sort_array + array_distinct bigrams) is SLOWER — 5.6 s vs 5.0 s —
    because higher-order-function lambdas evaluate interpreted
    per-element while the explode path stays whole-stage-codegen'd
    through both aggregations; the shuffles are not the bottleneck.
    Division is exact-int → double, so the scores value-oracle
    bit-for-bit.
    """
    # No widen: both downstream aggregations shuffle on (doc, gram),
    # which already spreads the heavy phase; measured, an extra exchange
    # above the explode costs more than it saves here.
    base = df.select(F.col(id_col), _ws_tokens(F.col(text_col)).alias("__t"))
    uni = (
        base.select(id_col, F.explode("__t").alias("tok"))
        .groupBy(id_col, "tok")
        .agg(F.count(F.lit(1)).alias("c"))
        .groupBy(id_col)
        .agg(
            F.max("c").alias("__top"),
            F.sum("c").alias("n_tokens"),
        )
    )
    # NB: guard the sequence bound — sequence(1, 0) counts DOWN in Spark,
    # which would fabricate out-of-range indices on 0/1-token docs.
    bigrams = base.select(
        id_col,
        F.explode(
            F.expr(
                "IF(size(__t) >= 2,"
                " transform(sequence(1, size(__t) - 1),"
                "           i -> concat(__t[i - 1], ' ', __t[i])),"
                " array())"
            )
        ).alias("bg"),
    )
    big = bigrams.groupBy(id_col).agg(
        F.count(F.lit(1)).alias("__nbg"),
        F.count_distinct(F.col("bg")).alias("__dbg"),
    )
    return (
        uni.join(big, id_col, "left")
        .select(
            id_col,
            "n_tokens",
            (F.col("__top").cast("double") / F.col("n_tokens").cast("double")).alias(
                "top_unigram_frac"
            ),
            F.coalesce(
                (F.col("__nbg") - F.col("__dbg")).cast("double")
                / F.col("__nbg").cast("double"),
                F.lit(0.0),
            ).alias("dup_bigram_frac"),
        )
    )


def decontaminate(
    corpus: DataFrame,
    benchmark: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 8,
) -> DataFrame:
    """Benchmark decontamination: flag corpus documents sharing any
    ``n``-gram (token-level) with a held-out benchmark/eval set — the
    standard pre-training hygiene pass (GPT-3 appendix C shape).

    Both sides explode to distinct n-grams and meet in ONE equi-join on
    the gram; corpus docs with ≥1 hit are ``contaminated``.  The gram
    key is xxhash64-COMPRESSED, built without ever materializing the
    gram string: tokens hash once per doc, each gram hashes its 8-long
    slice — vs concat_ws'ing ~45-byte strings this cut the sf1 wall
    5.9 s → 3.2 s (gram build + an 8-byte vs 45-byte join key).  A
    cross-gram hash collision could flag a clean doc (~2⁻⁶⁴ per pair;
    none exist in any fixture — the string-key oracle stays value-exact)
    and in the false-positive direction only, the safe side for
    decontamination.  The benchmark side (small by construction) is
    broadcast by size.
    Output: corpus (id, contaminated boolean).
    """

    def grams(d: DataFrame, out: str) -> DataFrame:
        return (
            d.withColumn("__t", _ws_tokens(F.col(text_col)))
            .withColumn("__th", F.expr("transform(__t, t -> xxhash64(t))"))
            .select(
                F.col(id_col).alias(out),
                F.explode(
                    F.expr(
                        f"IF(size(__th) >= {n},"
                        f" array_distinct(transform(sequence(1, size(__th) - {n - 1}),"
                        f"   i -> xxhash64(slice(__th, i, {n})))),"
                        " array())"
                    )
                ).alias("gram"),
            )
        )

    c = grams(corpus, "cid")
    b = grams(benchmark, "bid").select("gram").distinct()
    hits = c.join(b, "gram").select("cid").distinct()
    return corpus.select(id_col).join(
        hits.withColumnRenamed("cid", id_col).withColumn("contaminated", F.lit(True)),
        id_col,
        "left",
    ).select(id_col, F.coalesce("contaminated", F.lit(False)).alias("contaminated"))


def ngram_novelty(
    corpus: DataFrame,
    reference: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 8,
) -> DataFrame:
    """Per-document n-gram novelty rate against a reference corpus —
    the incremental-data-valuation metric (what fraction of this
    document's ``n``-grams has the training set never seen?) that
    curation pipelines rank new crawls by before paying to process
    them.  The structural complement of :func:`decontaminate`: that
    one asks "any overlap?" (boolean), this one measures the overlap's
    complement at shingle grain.

    Same xxhash64-compressed gram key as decontaminate (tokens hash
    once, grams hash 8-long slices — no gram strings materialize); the
    corpus side keeps its per-doc DISTINCT grams, the reference side
    collapses to a global distinct gram set, and one LEFT equi-join +
    per-doc agg yields (total, novel, rate).  Documents shorter than
    ``n`` tokens have no shingles and drop out (same rule both
    engines).  At scale: reference grams broadcast when small, shuffle
    equi-join otherwise — never all-pairs.
    Output: (id, n_shingles, n_novel, novelty_rate)."""

    def grams(d: DataFrame, out: str) -> DataFrame:
        return (
            d.withColumn("__t", _ws_tokens(F.col(text_col)))
            .withColumn("__th", F.expr("transform(__t, t -> xxhash64(t))"))
            .select(
                F.col(id_col).alias(out),
                F.explode(
                    F.expr(
                        f"IF(size(__th) >= {n},"
                        f" array_distinct(transform(sequence(1, size(__th) - {n - 1}),"
                        f"   i -> xxhash64(slice(__th, i, {n})))),"
                        " array())"
                    )
                ).alias("gram"),
            )
        )

    c = grams(corpus, id_col)
    ref = (
        grams(reference, "__rid")
        .select("gram")
        .distinct()
        .withColumn("__seen", F.lit(True))
    )
    j = c.join(ref, "gram", "left")
    return j.groupBy(id_col).agg(
        F.count(F.lit(1)).alias("n_shingles"),
        F.sum(F.when(F.col("__seen").isNull(), 1).otherwise(0))
        .cast("bigint")
        .alias("n_novel"),
        F.round(
            F.sum(F.when(F.col("__seen").isNull(), 1).otherwise(0))
            / F.count(F.lit(1)),
            6,
        ).alias("novelty_rate"),
    )


def rolling_fingerprint(
    df: DataFrame, text_col: str = "text", out_col: str = "fingerprint", mod: int = 1 << 31
) -> DataFrame:
    """Polynomial rolling-hash fingerprint over BPE-ish tokens:
    fp = fold(tokens, 0, (acc, tok) → (acc·1315423911 + h(tok)) mod m),
    h(tok) = first 32 bits of md5(tok) — portable across engines (DuckDB
    computes the identical fold, so this is value-oracled).

    Order-sensitive (unlike MinHash) — detects exact-prefix/reordering
    differences; used as a cheap content-identity for provenance.
    """
    toks = bpe_ish_tokens(F.col(text_col))
    tok_hash = lambda tok: F.pmod(
        F.conv(F.substring(F.md5(tok), 1, 8), 16, 10).cast("long"), F.lit(mod)
    )
    fp = F.aggregate(
        toks,
        F.lit(0).cast("long"),
        lambda acc, tok: F.pmod(
            F.pmod(acc * F.lit(1315423911 % mod), F.lit(mod)) + tok_hash(tok),
            F.lit(mod),
        ),
    )
    return df.withColumn(out_col, fp)


def normalize_urls(df: DataFrame, url_col: str = "url", out_col: str = "url_norm") -> DataFrame:
    """URL canonicalization for web-corpus dedup (§2.12): lowercase
    scheme+host, strip default ports, drop tracking params (utm_*,
    fbclid, gclid), drop fragments, collapse trailing slash on bare
    paths.  All regexp_replace — engine-portable, codegen'd; the
    canonical URL is the key exact/near dedup groups on for web data.
    """
    u = F.col(url_col)
    # lowercase scheme://host (up to first /, ? or #)
    u = F.concat(
        F.lower(F.regexp_extract(u, r"^([^/?#]*://[^/?#]*)", 1)),
        F.regexp_replace(u, r"^[^/?#]*://[^/?#]*", ""),
    )
    u = F.regexp_replace(u, r"^(https?://[^/?#]*):(80|443)(?=[/?#]|$)", r"$1")
    u = F.regexp_replace(u, r"#.*$", "")                       # fragment
    # tracking params: when the dropped param is FIRST and others follow,
    # the next param inherits the '?'
    tracker = r"(utm_[A-Za-z0-9_]*|fbclid|gclid)=[^&#]*"
    u = F.regexp_replace(u, r"\?" + tracker + r"&", "?")
    u = F.regexp_replace(u, r"[?&]" + tracker, "")
    u = F.regexp_replace(u, r"\?$", "")                        # empty query
    u = F.regexp_replace(u, r"^(https?://[^/?#]+)/$", r"$1")   # bare trailing /
    return df.withColumn(out_col, u)


#: C4-style line-level blocklist (Raffel et al. 2020 §2.2, public rules):
#: lines carrying boilerplate markers are dropped wholesale.
C4_LINE_BLOCKLIST = ["javascript", "cookie", "lorem ipsum", "terms of use",
                     "privacy policy", "all rights reserved"]


def c4_line_filter(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    min_words: int = 3,
    min_kept_lines: int = 1,
) -> DataFrame:
    """The C4 line-level cleaning pass (Raffel et al. 2020, public
    heuristics): keep only lines that end in terminal punctuation, have
    at least ``min_words`` words, and carry no boilerplate marker; then
    reassemble the document from its surviving lines and drop documents
    left with fewer than ``min_kept_lines``.

    Entirely columnar — split → per-line predicates inside a single
    ``filter`` lambda → ``array_join`` — so the whole pass is one
    map-only projection + one filter at scan bandwidth; no explode, no
    shuffle, no UDF.  Emits (id, clean_text, n_lines, n_kept).
    """
    lines = F.split(F.col(text_col), r"\n", -1)

    def keep(line: Column) -> Column:
        t = F.trim(line)
        lower = F.lower(t)
        ends_ok = t.rlike(r'[.!?"”]$')
        words_ok = F.size(F.filter(F.split(t, r"\s+", -1), lambda w: w != "")) >= min_words
        block_hit = None
        for marker in C4_LINE_BLOCKLIST:
            hit = lower.contains(marker)
            block_hit = hit if block_hit is None else (block_hit | hit)
        return ends_ok & words_ok & ~block_hit

    kept = F.filter(lines, keep)
    out = df.select(
        id_col,
        F.array_join(kept, "\n").alias("clean_text"),
        F.size(lines).alias("n_lines"),
        F.size(kept).alias("n_kept"),
    )
    return out.filter(F.col("n_kept") >= min_kept_lines)


#: The Gopher rule's required-stopword set (Rae et al. 2021 §A1.1): a
#: document must contain at least two of these as whole tokens.
GOPHER_STOPWORDS = ["the", "be", "to", "of", "and", "that", "have", "with"]


def gopher_quality_rules(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    min_words: int = 50,
    max_words: int = 100_000,
) -> DataFrame:
    """The Gopher document-quality rule set (Rae et al. 2021 §A1.1, the
    public MassiveText filter every later pretraining recipe derives
    from): word-count bounds, mean-word-length bounds [3, 10],
    hash/ellipsis symbol-to-word ratio ≤ 0.1, ≤ 90 % of lines starting
    with a bullet, ≤ 30 % ending with an ellipsis, ≥ 80 % of words
    containing an alphabetic character, and ≥ 2 of the 8 required
    stopwords present.

    Entirely columnar and map-only — one projection computes every rule
    from the whitespace-token and line arrays; no explode, no shuffle,
    no UDF; scan-bandwidth at any scale.  Every threshold compares as
    CROSS-MULTIPLIED INTEGERS (e.g. ``10·symbols ≤ words`` instead of a
    float ratio ≤ 0.1), so the booleans are bit-identical on any engine
    with no float policy needed.  Reported ratio columns are rounded to
    6 dp for the differential.

    Returns (id, n_words, mean_word_len, symbol_ratio, frac_alpha_words,
    n_stop_hits, keep).
    """
    words = _ws_tokens(F.col(text_col))
    lines = F.split(F.col(text_col), r"\n", -1)
    n_words = F.size(words)
    total_chars = F.aggregate(
        words, F.lit(0).cast("bigint"), lambda a, w: a + F.length(w)
    )
    hashes = F.length(text_col) - F.length(F.replace(F.col(text_col), F.lit("#")))
    dots = (
        F.length(text_col)
        - F.length(F.replace(F.col(text_col), F.lit("..."), F.lit("")))
    ) / 3
    uni_ellipsis = F.length(text_col) - F.length(
        F.replace(F.col(text_col), F.lit("…"))
    )
    symbols = (hashes + dots + uni_ellipsis).cast("bigint")
    alpha_words = F.size(F.filter(words, lambda w: w.rlike("[A-Za-z]")))
    n_lines = F.size(lines)
    bullet_lines = F.size(
        F.filter(lines, lambda ln: ln.rlike(r"^\s*([•\-\*]\s)"))
    )
    ellipsis_lines = F.size(
        F.filter(lines, lambda ln: ln.rlike(r"(\.\.\.|…)\s*$"))
    )
    low_words = F.transform(words, F.lower)
    stop_hits = F.size(
        F.filter(
            F.array(*[F.lit(s) for s in GOPHER_STOPWORDS]),
            lambda s: F.array_contains(low_words, s),
        )
    )
    keep = (
        (n_words >= min_words)
        & (n_words <= max_words)
        & (total_chars >= 3 * n_words)
        & (total_chars <= 10 * n_words)
        & (10 * symbols <= n_words)
        & (10 * bullet_lines <= 9 * n_lines)
        & (10 * ellipsis_lines <= 3 * n_lines)
        & (5 * alpha_words >= 4 * n_words)
        & (stop_hits >= 2)
    )
    return df.select(
        id_col,
        n_words.cast("bigint").alias("n_words"),
        F.round(total_chars / n_words, 6).alias("mean_word_len"),
        F.round(symbols / n_words, 6).alias("symbol_ratio"),
        F.round(alpha_words / n_words, 6).alias("frac_alpha_words"),
        stop_hits.cast("int").alias("n_stop_hits"),
        keep.alias("keep"),
    )


def ccnet_buckets(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    parts: int = 3,
) -> DataFrame:
    """CCNet's perplexity split (Wenzek et al. 2020 §4.3): score every
    document with the corpus unigram LM (:func:`unigram_logprob`) and
    cut the corpus into equal-size perplexity buckets — ``head`` (lowest
    perplexity, highest quality), ``middle``, ``tail`` — the partition
    CCNet publishes and pretraining recipes sample from at different
    rates.

    Bucketing is ntile ARITHMETIC on an exact total order
    (``(parts·(rank-1)) div N``), not a float-boundary compare: ranks
    order by the 6-dp-rounded perplexity with the document id as the
    tie-break, so the cut is bit-identical on any engine and any
    partitioning.

    Scale shape (the two-pass distributed sort, not a global window):
    a corpus split IS a global sort, but the sort never runs as one
    task here.  Pass 1 ``repartitionByRange(R, ppl, id)`` range-shuffles
    the doc-grain frame (3 narrow columns, far smaller than the corpus)
    and counts rows per range partition — O(R) control-plane ints.
    Pass 2 turns those counts into cumulative offsets and computes the
    global rank as ``offset[pid] + row_number() over (partition by pid
    order by ppl, id)`` — every sort task handles ~N/R rows, none sees
    the whole corpus.  The range frame is localCheckpoint-pinned because
    range boundaries are sampled per-execution: both passes must see the
    SAME partition layout.  The rank (hence the cut) is exact and
    boundary-independent because (ppl, id) is a total order, so the
    arithmetic matches the single-window form bit-for-bit.

    Returns (id, n_tokens, ppl, bucket ∈ {head, middle, tail, b<k>}).
    """
    from pyspark.sql import Window
    from pyspark.sql import functions as _F

    scored = unigram_logprob(df, text_col=text_col, id_col=id_col)
    sess = df.sparkSession
    try:
        n_range = int(sess.conf.get("spark.sql.shuffle.partitions"))
    except Exception:  # pragma: no cover - conf always present on real sessions
        n_range = 32
    n_range = max(1, n_range)
    ranged = (
        scored.repartitionByRange(n_range, _F.col("ppl"), _F.col(id_col))
        .withColumn("_pid", _F.spark_partition_id())
        .localCheckpoint(eager=False)
    )
    counts = {
        r["_pid"]: r["c"]
        for r in ranged.groupBy("_pid")
        .agg(_F.count(_F.lit(1)).alias("c"))
        .collect()  # control-plane: O(range partitions) manifest rows
    }
    total = sum(counts.values())
    if total == 0:
        return scored.select(
            id_col, "n_tokens", "ppl", _F.lit(None).cast("string").alias("bucket")
        )
    offsets, acc = [], 0
    for pid in range(n_range):
        offsets.append(acc)
        acc += counts.get(pid, 0)
    # one packed string literal, not n_range Literal AST nodes
    off_col = _F.get(
        _F.split(_F.lit(",".join(str(o) for o in offsets)), ",", -1), _F.col("_pid")
    ).cast("long")
    w = Window.partitionBy("_pid").orderBy("ppl", id_col)
    ranked = ranged.select(
        id_col,
        "n_tokens",
        "ppl",
        (off_col + _F.row_number().over(w)).alias("_rn"),
    )
    tile = _F.expr(f"({parts} * (_rn - 1)) div {total}")
    names = {0: "head", 1: "middle", parts - 1: "tail"}
    label = _F.lit(None).cast("string")
    for k in range(parts - 1, -1, -1):
        label = _F.when(tile == k, _F.lit(names.get(k, f"b{k}"))).otherwise(label)
    return ranked.select(id_col, "n_tokens", "ppl", label.alias("bucket"))


def rake_keywords(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    stopwords: list[str] | None = None,
    k: int = 25,
) -> DataFrame:
    """RAKE keyword extraction (Rose et al. 2010, the public rapid
    automatic keyword extraction algorithm — the co-occurrence
    complement to :func:`tfidf_keywords`): candidate phrases are the
    maximal runs of non-stopword tokens, each word scores
    ``degree/frequency`` where ``degree(w) = Σ |phrase|`` over phrases
    containing ``w`` and ``frequency(w)`` is its occurrence count, and a
    phrase scores the sum of its word scores.

    Determinism contract: degree and frequency are exact integers; the
    per-word ratio is one correctly-rounded IEEE division; the phrase
    sum folds IN POSITION ORDER (left fold from the first word — double
    addition is order-dependent, so the oracle replays
    ``list_reduce(list(score ORDER BY pos))``), rounded 6 dp at the
    edge.  Ties break lexicographically on the phrase.

    Scale shape (r13 rewrite — the r12 window+shuffle formulation cost
    3.7 s at sf1): candidate phrases come from ONE regex split on the
    stopword boundaries directly — ``(?<![a-z0-9'])(stop|…)(?![a-z0-9'])``
    — so the phrase stream is MAP-ONLY (no per-doc window, no
    token-grain groupBy; a run of non-stopword tokens between two
    stopword occurrences IS the split piece, with word order preserved
    natively).  Then two map-side-combined aggs (word stats are
    vocabulary-grain; distinct-phrase rows are far below corpus grain)
    → un-hinted word-score join (AQE broadcasts while the measured
    vocab fits; word-grain cardinality is corpus-unbounded, so no
    forced hint — r12 verdict item 2) → TakeOrdered top-k.

    Returns (phrase, n_words, rake_score), top ``k`` corpus-wide
    distinct phrases by (score DESC, phrase)."""
    from pyspark.sql import functions as _F

    stop = stopwords if stopwords is not None else STOPWORDS["en"]
    alt = "|".join(sorted(stop))

    min_bytes = 1 << 20
    try:
        est = int(
            df.select(text_col)
            ._jdf.queryExecution().optimizedPlan().stats().sizeInBytes()
        )
    except Exception:  # stats unavailable → assume big (scale-safe)
        est = min_bytes
    if est < min_bytes:
        # small input: one Java split at stopword occurrences
        # (token-bounded via lookarounds over the word charset);
        # punctuation/whitespace stay inside pieces and fall out at the
        # per-piece word split — exactly the runs-of-non-stopword-tokens
        # definition the oracle replays
        sep = r"(?<![a-z0-9'])(?:" + alt + r")(?![a-z0-9'])"
        pieces = df.select(
            _F.explode(
                _F.split(_F.lower(_F.col(text_col)), sep, -1)
            ).alias("_piece")
        )
    else:
        # corpus scale: RE2 has no lookarounds, so the Arrow path
        # normalizes first (non-word runs → one space, pad both ends)
        # and then splits on RUNS of space-bounded stopwords —
        # ``· S(· S)*·`` consumes chained stopwords ("of the") exactly
        # like the lookaround form; both passes are vectorized C++
        # (the tokens_arrow rationale: Java regex is the measured
        # 5-8×/byte constant, and the r13 lookaround-alternation form
        # measured 5.8 s at sf1 vs ~1 s for this pipeline).  The WORD
        # split also happens here (pieces are single-space-normalized,
        # so it is a plain space split) — emitting (phrase, _words)
        # directly keeps the Java-regex word split out of the plan
        # entirely; measured: CollapseProject inlined that split into
        # all three consuming projections (phrase/words/size), tripling
        # a 1.2 s evaluation (the r10 lesson, again).
        import pyarrow as pa

        sep_run = f" (?:{alt})(?: (?:{alt}))* "

        def run(batches):
            import pyarrow.compute as pc

            for b in batches:
                t = pc.utf8_lower(b.column(0))
                t = pc.replace_substring_regex(
                    t, pattern="[^a-z0-9']+", replacement=" "
                )
                t = pc.binary_join_element_wise(" ", t, " ", "")
                ps = pc.split_pattern_regex(t, pattern=sep_run)
                flat = pc.utf8_trim_whitespace(pc.list_flatten(ps))
                words = pc.split_pattern(flat, " ")
                yield pa.RecordBatch.from_arrays(
                    [flat, words], ["phrase", "_words"]
                )

        raw = df.select(text_col).mapInArrow(
            run, "phrase string, _words array<string>"
        )
        phrases = (
            raw.select("phrase", "_words", _F.size("_words").alias("n_words"))
            .filter(_F.col("phrase") != "")
            .localCheckpoint(eager=False)  # two consumers: stats + scores
        )
        return _rake_score(phrases, k)
    words = _F.filter(
        _F.split(_F.col("_piece"), r"[^a-z0-9']+", -1), lambda t: t != ""
    )
    phrases = (
        pieces.select(
            words.alias("_words"),
        )
        .select(
            _F.concat_ws(" ", "_words").alias("phrase"),
            "_words",
            _F.size("_words").alias("n_words"),
        )
        .filter(_F.col("n_words") > 0)
        .localCheckpoint(eager=False)  # two consumers: word stats + scores
    )
    return _rake_score(phrases, k)


def _rake_score(phrases: DataFrame, k: int) -> DataFrame:
    """Shared RAKE scoring tail over the (phrase, _words, n_words)
    candidate stream: word degree/frequency stats, per-phrase
    position-ordered score fold, corpus-wide top-k."""
    from pyspark.sql import functions as _F
    wstats = (
        phrases.select(_F.explode("_words").alias("_w"), "n_words")
        .groupBy("_w")
        .agg(
            _F.count(_F.lit(1)).alias("_freq"),
            _F.sum("n_words").alias("_deg"),
        )
        .select(
            "_w",
            (_F.col("_deg").cast("double") / _F.col("_freq").cast("double"))
            .alias("_ws_score"),
        )
    )
    # score DISTINCT phrases (word stats above use every instance, per
    # RAKE; the phrase score is a function of the phrase string alone)
    scored_words = (
        phrases.dropDuplicates(["phrase"])
        .select("phrase", "n_words",
                _F.posexplode("_words").alias("_pos", "_w"))
        .join(wstats, "_w")
    )
    return (
        scored_words.groupBy("phrase", "n_words")
        .agg(
            _F.array_sort(
                _F.collect_list(_F.struct("_pos", _F.col("_ws_score")))
            ).alias("_sc")
        )
        # fold word scores in position order, starting FROM the first
        # element (the repo's portable-fold convention)
        .select(
            "phrase", "n_words",
            _F.round(
                _F.expr(
                    "aggregate(slice(_sc, 2, size(_sc) - 1),"
                    " _sc[0]._ws_score, (acc, s) -> acc + s._ws_score)"
                ),
                6,
            ).alias("rake_score"),
        )
        .orderBy(_F.col("rake_score").desc(), "phrase")
        .limit(k)
    )
