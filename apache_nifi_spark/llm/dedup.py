"""Deduplication operators: exact, MinHash-LSH, SimHash, n-gram Jaccard.

Scale design (the whole point of these over naive pairwise):
- Exact dedup is one hash-groupBy — a single shuffle on the digest.
- MinHash-LSH turns O(n²) near-dup detection into: per-row signature
  (narrow, JVM array ops) → band-bucket groupBy (shuffle on small keys)
  → candidate pairs only within buckets → Jaccard verify on candidates.
  At 100 TB the only quadratic term is within-bucket, bounded by band
  tuning, and the signature pass is embarrassingly parallel.
- SimHash gives a 64-bit sketch; near-dup candidates come from the
  pigeonhole principle on 16-bit chunks (hamming ≤ 3 ⇒ one chunk equal),
  again avoiding all-pairs.
- n-gram Jaccard is the exact verifier, only ever run on blocked or
  LSH-filtered candidate sets.

No Python UDFs anywhere — signatures and sketches are Spark higher-order
array expressions.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = [
    "exact_dedup",
    "char_shingles",
    "minhash_signatures",
    "lsh_candidate_pairs",
    "minhash_near_duplicates",
    "simhash",
    "ngram_jaccard_pairs",
    "embedding_cosine_duplicates",
    "substring_span_dedup",
    "substring_span_clean",
    "paragraph_dedup",
]

# Mersenne prime 2^31-1: modulus for the universal hash family
# h_i(x) = (a_i * x + b_i) mod P — standard MinHash construction.  31-bit
# values keep a*h + b < 2^63, so the whole family runs in native long
# arithmetic with no overflow (and no 128-bit emulation).
_P = (1 << 31) - 1


def exact_dedup(
    df: DataFrame, text_col: str, id_col: str, keep: str = "min"
) -> DataFrame:
    """Exact duplicate removal by content digest (DeduplicateRecord at
    corpus scale): one row per distinct text, keeping the smallest id,
    with the duplicate count.  One shuffle on sha256."""
    keep_fn = F.min if keep == "min" else F.max
    return (
        df.groupBy(F.sha2(F.col(text_col).cast("binary"), 256).alias("text_sha256"))
        .agg(
            keep_fn(F.col(id_col)).alias(id_col),
            F.count(F.lit(1)).alias("dup_count"),
        )
    )


def char_shingles(text: Column, n: int = 5) -> Column:
    """Distinct character n-grams (the MinHash input set), as an array.
    Empty array for texts shorter than n — guarded explicitly, because
    ``sequence(1, 0)`` in Spark is the DESCENDING [1, 0] (default step
    -1 when start > stop), which would hand sub-n texts a bogus
    non-empty shingle set (and diverge from DuckDB's empty
    ``generate_series(1, 0)``)."""
    return F.when(
        F.length(text) >= n,
        F.array_distinct(
            F.transform(
                F.sequence(F.lit(1), F.length(text) - (n - 1)),
                lambda i: F.substring(text, i, n),
            )
        ),
    ).otherwise(F.array().cast("array<string>"))


def _perm_constants(num_perm: int, seed: int = 42) -> list[tuple[int, int]]:
    """Deterministic (a, b) pairs for the universal hash family.  Plain
    LCG expansion of the seed — reproducible across runs/engines."""
    consts = []
    state = seed
    for _ in range(num_perm):
        state = (state * 6364136223846793005 + 1442695040888963407) % (1 << 63)
        a = (state % (_P - 1)) + 1
        state = (state * 6364136223846793005 + 1442695040888963407) % (1 << 63)
        b = state % _P
        consts.append((a, b))
    return consts


def minhash_signatures(
    df: DataFrame,
    id_col: str,
    text_col: str,
    num_perm: int = 64,
    shingle_n: int = 5,
    seed: int = 42,
    hash_fn: str = "xxhash64",
) -> DataFrame:
    """MinHash signature per document: sig[i] = min over shingles s of
    (a_i * h(s) + b_i) mod P, h = xxhash64 (unsigned via pmod) or, with
    ``hash_fn="md5"``, the first 60 bits of md5(s) — engine-portable, so
    the whole signature (and everything downstream) value-oracles.

    Pure array expressions — each row is independent, no shuffle.  Keeps
    the distinct per-shingle hash set (``shingle_hashes``) alongside for
    the later exact-Jaccard verify.

    The signature is ONE ``aggregate`` fold over the hashed shingles with
    an array<long> accumulator: per shingle, ``zip_with(acc, consts,
    (m, c) -> least(m, (c.a·h + c.b) mod P))``.  This allocates one
    num_perm-length array per shingle instead of num_perm shingle-length
    arrays per row (the naive per-perm ``array_min∘transform`` shape) —
    measured 2.8× faster at equal output.  Documents with no shingles
    (shorter than ``shingle_n``) get the identity signature [P, P, …]
    (min over the empty set), which collides only with other empty docs.
    """
    # One JVM-side parse instead of num_perm×3 Py4J Column constructions
    # (driver plan-build latency, not executor cost).
    consts = F.expr(
        "array("
        + ",".join(
            f"named_struct('a', {a}L, 'b', {b}L)"
            for a, b in _perm_constants(num_perm, seed)
        )
        + ")"
    )
    # Staged projections: shingles → hashes → signature.  Each stage
    # references the previous alias, which keeps CollapseProject from
    # re-inlining the expensive subtree — the shingle/hash arrays are
    # computed ONCE per row.
    #
    # The RAW shingle strings never leave this function: downstream
    # (banding, exact-Jaccard verify) works on the per-shingle hash set.
    # Jaccard over distinct 60-bit hashes equals Jaccard over the strings
    # up to a 2^-60-per-pair collision — and both engines derive the same
    # hashes, so value parity holds regardless.  The payoff is the verify
    # intersecting long arrays (primitive hash sets) instead of re-hashing
    # n-char strings for every candidate pair.
    shingled = df.select(
        F.col(id_col), char_shingles(F.col(text_col), shingle_n).alias("shingles")
    )
    if hash_fn == "xxhash64":
        full_hash = lambda s: F.xxhash64(s)
    elif hash_fn == "md5":
        # 15 hex chars = 60 bits < 2^63: conv's decimal string casts to
        # long losslessly; identical value via hex-cast in any engine.
        full_hash = lambda s: F.conv(F.substring(F.md5(s), 1, 15), 16, 10).cast("long")
    else:
        raise ValueError("hash_fn must be 'xxhash64' or 'md5'")
    hashed = shingled.select(
        id_col,
        F.transform("shingles", full_hash).alias("shingle_hashes"),
    )
    # Fold input: hashes reduced mod P so a·h+b stays under 2^62.
    sig = F.aggregate(
        F.transform("shingle_hashes", lambda h: F.pmod(h, F.lit(_P))),
        F.array_repeat(F.lit(_P).cast("long"), num_perm),
        lambda acc, h: F.zip_with(
            acc, consts, lambda m, c: F.least(m, F.pmod(c["a"] * h + c["b"], F.lit(_P)))
        ),
    )
    return hashed.select(
        F.col(id_col), F.col("shingle_hashes"), sig.alias("signature")
    )


def lsh_candidate_pairs(
    sig_df: DataFrame,
    id_col: str,
    bands: int = 16,
    rows_per_band: int = 4,
    band_hash: str = "xxhash64",
) -> DataFrame:
    """Band the signatures and emit candidate pairs sharing any band bucket.

    bands × rows_per_band must equal the signature length.  Shuffles on
    (band, bucket) — small keys — then self-joins only within
    buckets; ``a.id < b.id`` dedups the pair space, and a distinct
    collapses pairs that collide in several bands.

    ``band_hash="xxhash64"`` compresses each band slice to one long (the
    scale path: 8-byte shuffle keys); ``"raw"`` buckets on the slice
    array itself — bigger keys, but bit-identical in any engine, which
    is what lets the full LSH pipeline value-oracle.
    """
    if band_hash == "xxhash64":
        bucket_of = lambda i: F.xxhash64(
            F.slice("signature", i * rows_per_band + 1, rows_per_band)
        )
    elif band_hash == "raw":
        bucket_of = lambda i: F.slice("signature", i * rows_per_band + 1, rows_per_band)
    else:
        raise ValueError("band_hash must be 'xxhash64' or 'raw'")
    banded = sig_df.select(
        F.col(id_col),
        F.posexplode(F.array(*[bucket_of(i) for i in range(bands)])).alias(
            "band", "bucket"
        ),
    )
    a = banded.alias("a")
    b = banded.alias("b")
    return (
        a.join(
            b,
            (F.col(f"a.band") == F.col("b.band"))
            & (F.col("a.bucket") == F.col("b.bucket"))
            & (F.col(f"a.{id_col}") < F.col(f"b.{id_col}")),
        )
        .select(
            F.col(f"a.{id_col}").alias("id_a"), F.col(f"b.{id_col}").alias("id_b")
        )
        .distinct()
    )


def minhash_near_duplicates(
    df: DataFrame,
    id_col: str,
    text_col: str,
    num_perm: int = 64,
    shingle_n: int = 5,
    bands: int = 16,
    threshold: float = 0.7,
    seed: int = 42,
    hash_fn: str = "xxhash64",
) -> DataFrame:
    """End-to-end MinHash-LSH near-dup pipeline: signatures → banded
    candidates → exact Jaccard (on distinct shingle-hash sets) ≥ threshold.

    Output: (id_a, id_b, jaccard).  The exact verify runs only on LSH
    candidates — the step that makes this viable at corpus scale.
    ``hash_fn="md5"`` switches both the shingle hash and the band
    buckets to the engine-portable forms (value-oracle mode).
    """
    # Signature work is CPU-bound per row; a small single-file input would
    # otherwise pin it to one task.  At corpus scale the scan already has
    # enough splits and this rebalance is a cheap narrow-ish shuffle.
    # (inputFiles() is a metadata probe; .rdd.getNumPartitions() would
    # force a full plan conversion.)
    parallelism = df.sparkSession.sparkContext.defaultParallelism
    try:
        n_splits = len(df.inputFiles())
    except Exception:
        n_splits = parallelism
    if n_splits < parallelism:
        df = df.repartition(parallelism)
    # The signature table is reused three times (both sides of the bucket
    # self-join + the verify joins); persist it so signatures are computed
    # exactly once.  It is narrow — id + 64 longs + shingle-hash array — and
    # spills to disk at corpus scale (MEMORY_AND_DISK default).
    sigs = minhash_signatures(
        df, id_col, text_col, num_perm, shingle_n, seed, hash_fn
    ).persist()
    # Eager materialization: the downstream branches (bucket join a/b sides,
    # two verify joins) otherwise race to compute signatures concurrently
    # before the cache is populated.  At corpus scale this is where the
    # signature table would be written out as its own artifact.
    sigs.count()
    # The candidate table is byte-tiny (pairs of ids) but each pair costs a
    # full shingle-set intersection downstream; AQE's size-based coalescing
    # would fold it into one partition and serialize the verify.  Explicit
    # round-robin repartition keeps the CPU-bound verify wide.
    # Shingle-less docs (shorter than shingle_n) all carry the identity
    # signature [P, P, …] and would land in ONE band bucket — O(k²)
    # candidate pairs among k short/empty docs before the jaccard-NULL
    # filter drops every one of them.  Exact dedup owns those docs;
    # exclude them from banding entirely.
    cands = lsh_candidate_pairs(
        sigs.filter(F.size("shingle_hashes") > 0),
        id_col,
        bands,
        num_perm // bands,
        band_hash="raw" if hash_fn == "md5" else "xxhash64",
    ).repartition(parallelism)
    # Signature-estimate prefilter: the banding's false-positive pairs
    # (docs sharing a few hot shingles) vastly outnumber true near-dups
    # on vocabulary-dense corpora — measured 2.1M candidates for ~1k
    # true pairs at 50k docs — and each one would otherwise pay a full
    # shingle-set intersection AND ship two ~400-long hash arrays
    # through the join shuffle.  The minhash ESTIMATE (matching perms /
    # num_perm) is already in hand, 64 longs per doc: keep a pair only
    # if est ≥ threshold − 0.25.  With 64 perms that margin is >4σ, so
    # the added miss rate (~2e-5 per true pair) is an order of magnitude
    # below the banding's own ~11% miss at J=threshold — in-family for
    # LSH semantics, and the oracle applies the IDENTICAL deterministic
    # filter, so value parity is unaffected.  Measured at sf1 (50k docs,
    # 2.1M banded candidates): end-to-end 29.1 s → 11.9 s.
    min_frac = threshold - 0.25
    sg = sigs.select(F.col(id_col), F.col("signature"))
    est_matches = F.size(
        F.filter(
            F.zip_with("sg_a", "sg_b", lambda x, y: x == y), lambda b: b
        )
    )
    pre = (
        cands.join(
            sg.withColumnsRenamed({id_col: "id_a", "signature": "sg_a"}), "id_a"
        )
        .join(sg.withColumnsRenamed({id_col: "id_b", "signature": "sg_b"}), "id_b")
        .filter(
            est_matches.cast("double") / F.lit(float(num_perm)) >= F.lit(min_frac)
        )
        .select("id_a", "id_b")
    )
    sh = sigs.select(F.col(id_col), F.col("shingle_hashes"))
    pairs = (
        pre.join(
            sh.withColumnsRenamed({id_col: "id_a", "shingle_hashes": "sh_a"}), "id_a"
        ).join(
            sh.withColumnsRenamed({id_col: "id_b", "shingle_hashes": "sh_b"}), "id_b"
        )
    )
    inter = F.size(F.array_intersect("sh_a", "sh_b"))
    union = F.size("sh_a") + F.size("sh_b") - inter
    return (
        pairs.withColumn(
            "jaccard",
            # union == 0 (both texts sub-n) → NULL → dropped: gram-less
            # docs have no defined similarity; exact dedup owns them.
            F.when(union > 0, inter.cast("double") / union.cast("double")),
        )
        .filter(F.col("jaccard") >= threshold)
        .select("id_a", "id_b", "jaccard")
    )


def simhash(
    df: DataFrame,
    id_col: str,
    text_col: str,
    out_col: str = "simhash64",
    hash_fn: str = "xxhash64",
) -> DataFrame:
    """64-bit SimHash sketch: per-token hash; each output bit is the
    sign of the vote sum over tokens for that bit position.

    Implemented as explode → one groupBy with 64 conditional-sum
    aggregates → bit packing.  One shuffle on the id; everything else is
    codegen'd.  Near-dup candidates: equi-join on any 16-bit chunk
    (pigeonhole for hamming ≤ 3).

    ``hash_fn="xxhash64"`` (default) is the scale path — one native
    64-bit hash per token.  ``hash_fn="md5"`` derives the 64 bits from
    the md5 hex digits (bit i = bit i%4 of digit 16 - i//4), which any
    engine reproduces exactly — the value-oracle-able variant.
    """
    from apache_nifi_spark.io import widen_if_narrow

    # Widen BEFORE the explode: per-token hashing + 64 bit-votes are the
    # CPU cost, and shuffling whole docs is cheaper than shuffling tokens.
    tokens = widen_if_narrow(df).select(
        F.col(id_col),
        F.explode(F.split(F.col(text_col), r"\s+", -1)).alias("tok"),
    )
    # All 64-way expressions below are built as SQL strings parsed JVM-side
    # in a handful of calls: constructing them with Column operators costs
    # ~650 Py4J round-trips (~2 s of DRIVER latency per plan build) for the
    # identical Catalyst tree.
    if hash_fn == "xxhash64":
        tokens = tokens.withColumn("h", F.xxhash64("tok"))

        def bit_sql(i: int) -> str:
            return f"(shiftright(h, {i}) & 1) = 1"
    elif hash_fn == "md5":
        # Two 32-bit conv halves instead of 16 per-digit convs (8× less
        # per-token prep, same bit mapping): the first 16 hex chars are a
        # 64-bit value H1:H2; bit i of the sketch = bit (i%4) of hex digit
        # (16 - i//4), which is exactly bit i of H2 for i < 32 and bit
        # (i - 32) of H1 otherwise.
        tokens = tokens.withColumn("hx", F.md5("tok")).withColumns(
            {
                "__h1": F.expr("CAST(conv(substring(hx, 1, 8), 16, 10) AS BIGINT)"),
                "__h2": F.expr("CAST(conv(substring(hx, 9, 8), 16, 10) AS BIGINT)"),
            }
        )

        def bit_sql(i: int) -> str:
            half, off = ("__h2", i) if i < 32 else ("__h1", i - 32)
            return f"(shiftright({half}, {off}) & 1) = 1"
    else:
        raise ValueError("hash_fn must be 'xxhash64' or 'md5'")
    votes = tokens.groupBy(id_col).agg(
        *[
            F.expr(f"sum(IF({bit_sql(i)}, 1, -1)) AS b{i}")
            for i in range(64)
        ]
    )
    # Disjoint powers of two, so addition == bitwise OR; bit 63 is the
    # long sign bit.
    terms = [
        f"IF(b{i} > 0, CAST({(1 << i) if i < 63 else -(1 << 63)} AS BIGINT), CAST(0 AS BIGINT))"
        for i in range(64)
    ]
    packed = F.expr(" + ".join(terms))
    return votes.select(F.col(id_col), packed.alias(out_col))


def ngram_jaccard_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str,
    block_col: str,
    n: int = 3,
    threshold: float = 0.5,
) -> DataFrame:
    """Exact n-gram Jaccard similarity within a blocking key (language,
    length bucket, LSH bucket…).  The block join bounds the pair space —
    never call this unblocked at scale.

    Output: (id_a, id_b, jaccard ≥ threshold).
    """
    grams = df.select(
        F.col(id_col),
        F.col(block_col).alias("__blk"),
        char_shingles(F.col(text_col), n).alias("grams"),
    )
    a, b = grams.alias("a"), grams.alias("b")
    pairs = a.join(
        b,
        (F.col("a.__blk") == F.col("b.__blk"))
        & (F.col(f"a.{id_col}") < F.col(f"b.{id_col}")),
    )
    inter = F.size(F.array_intersect("a.grams", "b.grams"))
    union = F.size("a.grams") + F.size("b.grams") - inter
    return (
        pairs.select(
            F.col(f"a.{id_col}").alias("id_a"),
            F.col(f"b.{id_col}").alias("id_b"),
            # union == 0 (both sub-n/empty) → NULL → dropped by the
            # filter: gram-less docs have no defined n-gram similarity
            # (exact-dedup already collapses identical empties), and
            # this matches the oracle's empty generate_series semantics.
            F.when(union > 0, inter.cast("double") / union.cast("double"))
            .alias("jaccard"),
        )
        .filter(F.col("jaccard") >= threshold)
    )


def embedding_cosine_duplicates(
    embeddings: DataFrame,
    id_col: str,
    vec_col: str,
    block_col: str,
    threshold: float = 0.95,
) -> DataFrame:
    """Embedding-cosine near-duplicate pairs within a blocking key.

    The semantic tier of the dedup stack: two documents are near-dups when
    their embeddings' cosine similarity ≥ threshold.  Blocked self-join
    (block key = cluster label / SRP bucket / IVF cell at scale — never
    unblocked all-pairs).  Norms and the array<double> precast are
    computed once per ROW before the join; the pair loop is a single
    left-fold dot product (similarity.py hot-path rules), no UDF.

    Output: (id_a, id_b, cosine ≥ threshold), id_a < id_b.
    """
    from apache_nifi_spark.llm.similarity import _dvec, dot_product, l2_norm

    side = embeddings.select(
        F.col(id_col),
        F.col(block_col).alias("__blk"),
        _dvec(F.col(vec_col)).alias("__v"),
        l2_norm(_dvec(F.col(vec_col))).alias("__n"),
    )
    from apache_nifi_spark.io import widen_if_narrow

    # The pair-level dot-product fold is the CPU cost; when the probe side
    # comes from a single-split fixture Catalyst broadcasts the other side
    # and the whole pair loop runs in ONE task.  Widening the probe side
    # spreads it; no-op when the scan already has enough splits.
    a, b = widen_if_narrow(side).alias("a"), side.alias("b")
    pairs = a.join(
        b,
        (F.col("a.__blk") == F.col("b.__blk"))
        & (F.col(f"a.{id_col}") < F.col(f"b.{id_col}")),
    )
    cos = dot_product(F.col("a.__v"), F.col("b.__v")) / (
        F.col("a.__n") * F.col("b.__n")
    )
    return (
        pairs.select(
            F.col(f"a.{id_col}").alias("id_a"),
            F.col(f"b.{id_col}").alias("id_b"),
            cos.alias("cosine"),
        )
        .filter(F.col("cosine") >= threshold)
    )


def substring_span_dedup(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    window: int = 32,
    stride: int = 8,
    drop_ratio: float = 0.5,
) -> DataFrame:
    """Exact-substring repetition dedup (the distributed approximation
    of Lee et al. 2022, "Deduplicating Training Data Makes Language
    Models Better", which finds ≥50-token repeats with a suffix array):
    slide a ``window``-char window at ``stride`` over every document,
    hash each span, and count how many DISTINCT documents share each
    span.  A document whose shared-window fraction reaches
    ``drop_ratio`` is flagged as a substring-level duplicate (boiler-
    plate, mirrored articles, licence blocks).

    Where the suffix array finds exact maximal repeats on one machine,
    the windowed formulation is embarrassingly parallel: the span frame
    is one explode (``len/stride`` rows per doc), the cross-doc count
    is one groupBy on a 60-bit md5 span key (8-byte shuffle rows — the
    span TEXT never shuffles), and the verdict is one doc-grain agg.
    At 100 TB nothing is pairwise: cost is linear in corpus size, the
    only quadratic-looking step (span → docs) is bounded by true span
    multiplicity.  Collision odds on the 60-bit key are the documented
    minhash convention (≪ 2⁻³⁰ for any realistic corpus).

    Documents shorter than ``window`` have no spans and are always
    kept (n_windows = 0, share_ratio = 0.0) — sequence() is guarded the
    same way as char_shingles (Spark's descending-sequence footgun).

    Returns (id, n_windows, n_shared, share_ratio, kept), one row per
    input document.
    """
    spans = df.select(
        F.col(id_col),
        F.explode(
            F.when(
                F.length(text_col) >= window,
                F.transform(
                    F.sequence(
                        F.lit(1),
                        F.length(text_col) - (window - 1),
                        F.lit(stride),
                    ),
                    lambda p: F.substring(F.col(text_col), p, window),
                ),
            ).otherwise(F.array().cast("array<string>"))
        ).alias("_span"),
    ).select(
        id_col,
        F.conv(F.substring(F.md5("_span"), 1, 15), 16, 10)
        .cast("long")
        .alias("_h60"),
    )
    shared = (
        spans.groupBy("_h60")
        .agg(F.count_distinct(F.col(id_col)).alias("_nd"))
        .filter(F.col("_nd") >= 2)
        .select("_h60")
    )
    per_doc = (
        spans.join(shared.withColumn("_is_shared", F.lit(1)), "_h60", "left")
        .groupBy(id_col)
        .agg(
            F.count(F.lit(1)).alias("n_windows"),
            F.sum(F.coalesce(F.col("_is_shared"), F.lit(0))).alias("n_shared"),
        )
    )
    return (
        df.select(id_col)
        .join(per_doc, id_col, "left")
        .select(
            id_col,
            F.coalesce("n_windows", F.lit(0)).cast("bigint").alias("n_windows"),
            F.coalesce("n_shared", F.lit(0)).cast("bigint").alias("n_shared"),
            F.when(
                F.coalesce("n_windows", F.lit(0)) > 0,
                F.col("n_shared").cast("double") / F.col("n_windows").cast("double"),
            )
            .otherwise(F.lit(0.0))
            .alias("share_ratio"),
            F.coalesce(
                F.col("n_shared").cast("double") / F.col("n_windows").cast("double")
                < F.lit(drop_ratio),
                F.lit(True),
            ).alias("kept"),
        )
    )


def substring_span_clean(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    window: int = 32,
    stride: int = 8,
) -> DataFrame:
    """Exact-substring span REMOVAL — the actual output of Lee et al.
    2022 ("Deduplicating Training Data Makes Language Models Better"):
    where :func:`substring_span_dedup` flags whole documents, this
    operator excises the repeated spans and keeps the rest of the text.
    Windows whose 60-bit hash occurs in ≥2 distinct documents are
    removal intervals; overlapping intervals merge (gaps-and-islands in
    plain window functions — a running ``max(end)`` over preceding rows
    marks island starts, a running sum numbers them), and the cleaned
    text is rebuilt from the uncovered segments with one ``lag`` pass —
    no per-row Python, no quadratic step, every stage standard SQL both
    engines execute identically.

    Scale shape: windows shuffle as 8-byte hash keys (text never
    shuffles with them); interval merge + segment rebuild partition by
    document, so the heavy window work is document-local; the final
    rebuild concatenates an ordered struct array.  Cost is linear in
    corpus size.

    Returns (id, clean_text, removed_chars, n_islands) — one row per
    input document; untouched documents pass through with
    ``removed_chars = 0``.
    """
    from pyspark.sql import Window

    W = window
    base = df.select(
        F.col(id_col), F.col(text_col).alias("_text"),
        F.length(text_col).alias("_len"),
    )
    pos = base.select(
        id_col,
        "_text",
        F.explode(
            F.when(
                F.col("_len") >= W,
                F.sequence(F.lit(1), F.col("_len") - (W - 1), F.lit(stride)),
            ).otherwise(F.array().cast("array<int>"))
        ).alias("p"),
    ).select(
        id_col,
        "p",
        F.conv(F.substring(F.md5(F.substring("_text", F.col("p"), F.lit(W))), 1, 15),
               16, 10).cast("long").alias("_h60"),
        # NOT pinned: both the shared-hash agg and the hit join replay
        # this explode+md5, but the pass is cheap codegen work — an A/B
        # at sf1 measured the localCheckpoint variant SLOWER (4.7 s vs
        # 3.8 s warm): caching ~1M small rows costs more than recompute.
    )
    shared = (
        pos.groupBy("_h60")
        .agg(F.count_distinct(F.col(id_col)).alias("_nd"))
        .filter(F.col("_nd") >= 2)
        .select("_h60")
    )
    hits = pos.join(shared, "_h60").select(id_col, "p")
    w_ord = Window.partitionBy(id_col).orderBy("p")
    prev_max_e = F.max(F.col("p") + W).over(
        w_ord.rowsBetween(Window.unboundedPreceding, -1)
    )
    islands = hits.withColumn(
        "_island",
        F.sum(
            F.when(F.col("p") > F.coalesce(prev_max_e, F.lit(-1)), 1).otherwise(0)
        ).over(w_ord),
    )
    merged = islands.groupBy(id_col, "_island").agg(
        F.min("p").alias("s"), (F.max("p") + W).alias("e")
    )
    # sentinel interval at end-of-text so the lag pass emits the tail
    # segment; only docs that HAVE removals need rebuilding
    touched = merged.select(id_col).distinct()
    sentinel = touched.join(base, id_col).select(
        id_col, (F.col("_len") + 1).alias("s"), (F.col("_len") + 1).alias("e")
    )
    allint = merged.select(id_col, "s", "e").unionByName(sentinel)
    w_seg = Window.partitionBy(id_col).orderBy("s")
    segs = allint.join(base, id_col).select(
        id_col,
        "s",
        "e",
        F.coalesce(F.lag("e").over(w_seg), F.lit(1)).alias("_seg_start"),
        "_text",
        "_len",
    )
    rebuilt = (
        segs.withColumn(
            "_seg",
            F.expr("substring(_text, _seg_start, s - _seg_start)"),
        )
        .groupBy(id_col)
        .agg(
            F.concat_ws(
                "",
                F.transform(
                    F.array_sort(F.collect_list(F.struct("s", "_seg"))),
                    lambda x: x["_seg"],
                ),
            ).alias("clean_text"),
            # the sentinel contributes e - s = 0, so summing is safe
            F.sum(F.col("e") - F.col("s")).cast("bigint").alias("removed_chars"),
            (F.count(F.lit(1)) - 1).cast("int").alias("n_islands"),
        )
    )
    return (
        base.join(rebuilt, id_col, "left")
        .select(
            id_col,
            F.coalesce("clean_text", F.col("_text")).alias("clean_text"),
            F.coalesce("removed_chars", F.lit(0)).cast("bigint")
            .alias("removed_chars"),
            F.coalesce("n_islands", F.lit(0)).cast("int").alias("n_islands"),
        )
    )


def paragraph_dedup(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    sep: str = "\n",
) -> DataFrame:
    """Corpus-wide exact paragraph/line dedup — the RefinedWeb /
    MassiveText curation step (Penedo et al. 2023 §3; Rae et al. 2021
    A.1.2): boilerplate lines repeated across pages (headers, cookie
    banners, navigation) are removed EVERYWHERE except their first
    occurrence, and documents are rebuilt from their surviving lines.

    First occurrence is the corpus-global (id, position) minimum for
    that exact line text — deterministic, partitioning-independent.

    Scale shape (why this is not a window function): the natural
    formulation is ``row_number() OVER (PARTITION BY para ORDER BY id,
    pos) = 1``, but a window sorts every partition, and paragraph keys
    are Zipf-skewed at corpus scale (empty lines / "Home" / cookie
    banners are the hottest keys precisely because they are the
    boilerplate being removed).  A ``min(struct(id, pos))`` aggregation
    computes the same winner with map-side partial combine — the hot
    key's billions of occurrences collapse to one candidate per input
    partition before the exchange, so skew never concentrates on one
    reducer.  Two shuffles total: by line text (winner agg) and by
    document (reassembly).

    Returns (id, clean_text, kept_paras) — documents whose every line
    was claimed by an earlier document disappear (fully-boilerplate
    pages), matching the reference pipelines' drop-empty behavior.
    """
    import re as _re

    paras = df.select(
        F.col(id_col).alias("_id"),
        F.posexplode(F.split(F.col(text_col), _re.escape(sep))).alias(
            "_pos", "_para"
        ),
    )
    winners = (
        paras.groupBy("_para")
        .agg(F.min(F.struct("_id", "_pos")).alias("_w"))
        .select(
            F.col("_w._id").alias("_id"),
            F.col("_w._pos").alias("_pos"),
            "_para",
        )
    )
    return (
        winners.groupBy("_id")
        .agg(
            F.array_join(
                F.transform(
                    F.array_sort(F.collect_list(F.struct("_pos", "_para"))),
                    lambda s: s["_para"],
                ),
                sep,
            ).alias("clean_text"),
            F.count(F.lit(1)).alias("kept_paras"),
        )
        .select(F.col("_id").alias(id_col), "clean_text", "kept_paras")
    )
