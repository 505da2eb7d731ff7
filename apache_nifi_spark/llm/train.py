"""Deterministic quality-classifier TRAINING: class-balanced full-batch
gradient descent over hashed unigram features, engine-deterministic the
same way ``llm/pca.dominant_direction`` and
``llm/cluster.kmeans_fixed_point`` are.

Why a curation engine needs this: production pretraining pipelines
train their quality/toxicity filters on the corpus itself (CCNet's
fastText language/quality models; LLaMA's Wikipedia-reference
classifier).  ``llm/dsir.hashed_linear_score`` ships the INFERENCE half
with a documented stand-in weight table; this module closes the loop —
the weights come out of a real descent over labeled documents, and the
per-round weight vector is control-plane state (B integers), exactly
the kmeans-centroid / BPE-merge-table precedent.

Determinism contract (what makes a TRAINING run value-oracle-able):

- features are integer gram counts (md5-bucket hashing, portable),
- weights are integers at a fixed scale; every per-document dot product
  is an exact bigint fold; every gradient component is an exact
  decimal(38,0) sum — addition-order-independent, so partitioning
  cannot move a bit,
- the per-document nonlinearity is the RATIONAL sigmoid
  ``σ̃(m) = 0.5 + m / (2·(1+|m|))`` — only IEEE +,·,/,abs, each
  correctly rounded and therefore bit-identical on the JVM and the
  oracle engine.  (``exp`` carries no such cross-engine guarantee: two
  correct libm implementations may differ in the last ulp, which a
  value-hash differential would catch.  The logistic curve is an
  inference-time presentation choice; for descent the rational link
  trains the same decision boundary.)
- the residual is re-quantized per document with BOTH the 1/n_grams
  mean pooling AND the class-balance weight folded into the
  quantization (``floor(R·(p−y)·cw/n)``), so the gradient sum needs no
  per-document float work afterwards.  Class weights ``cw_y =
  N/(2·N_y)`` are the standard balanced-logistic reweighting — without
  them a skewed base rate drags every weight toward the majority class
  before per-feature signal can emerge (there is no bias term to
  absorb it).

Honest capability note: a mean-pooled linear model over 64 hashed
buckets is a WEAK learner — on the synthetic fixture corpus it beats
the majority class by a few points, and an exact float logistic
regression does no better (the ceiling is the model class, not the
optimizer).  On linearly-separable data the same trainer converges to
near-perfect accuracy in a handful of steps (see
tests/test_llm.py::test_logreg_train_learns_separable_signal).

Scale shape (100 TB rules): one tokenize+hash pass builds SPARSE
(doc, bucket, count) features (narrow, doc-partitioned, pinned once
with a lazy localCheckpoint — the bpe.py precedent); each descent step
scores every document with an O(occupied-buckets) fold evaluated ONCE
per doc, joins the residual back to the count rows doc-locally, and
aggregates ≤B partial sums — the only exchange; the driver sees ≤B
integers per step.  The final scoring plan is map-only over literal
weights.  Sparse beats a dense B-vector at every B (the dense build is
B×grams interpreted lambda steps per doc, and exploding a dense vector
lets CollapseProject re-evaluate the residual fold per (doc, bucket) —
measured 2.0 s → 0.3 s per step at sf0.1) and is exactly the layout
that survives fastText's B = 2M.
"""

from __future__ import annotations

import math

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from apache_nifi_spark.llm.dsir import _bucket, _tokens
from apache_nifi_spark.llm.pca import _packed_arr

__all__ = ["logreg_train_fixed_point"]

#: weight / residual fixed-point scale (weights are ints at 1e-6 units)
_SCALE = 1_000_000


def logreg_train_fixed_point(
    df: DataFrame,
    label: Column,
    text_col: str = "text",
    id_col: str = "doc_id",
    buckets: int = 64,
    iters: int = 3,
    lr: float = 64.0,
) -> DataFrame:
    """Train a hashed-unigram linear classifier by ``iters`` balanced
    full-batch descent steps and score every document with the trained
    weights.

    Returns (id, n_grams, y, margin, prob, keep):

    - ``margin`` — trained-weight mean-pooled score (6 dp),
    - ``prob``   — rational-sigmoid probability (6 dp),
    - ``keep``   — decision at the 0.5 boundary (computed on the
      UNROUNDED probability, which is bit-identical cross-engine).

    Weights start at zero (no seed, no init randomness); each step's
    gradient is collected as B control-plane integers and the update
    ``w_j ← w_j − floor(lr·g_j/N)`` replays in the oracle with the same
    IEEE double operations.
    """
    base = df.select(
        F.col(id_col).alias("_id"),
        F.col(text_col).alias("_text"),
        label.cast("int").alias("_y"),
    )
    toks = base.select(
        "_id", "_y", F.explode(_tokens(F.col("_text"))).alias("_tok")
    )
    # Hash DISTINCT tokens only: md5 is the engine-portable hash and by
    # far the priciest per-call step — paying it once per vocabulary
    # entry instead of once per token occurrence cut the feature build
    # 8.9 s → ~3 s at sf1 (5M occurrences, tiny vocabulary).  The
    # token→bucket map is a vocabulary-sized dimension (the dsir
    # weight-table precedent): broadcast here; at a 100 TB vocabulary
    # (~millions of types) it is still MBs, and AQE would pick the
    # shuffle join if it ever outgrew that.
    cnt_tok = (
        toks.groupBy("_id", "_y", "_tok")
        .agg(F.count(F.lit(1)).cast("bigint").alias("_c"))
        # pinned: BOTH the vocabulary distinct and the bucket join read
        # this frame — without the pin the vocab branch re-runs the
        # whole tokenize+count (measured: the duplicated scan was most
        # of an 8.6 s feature build at sf1)
        .localCheckpoint(eager=False)
    )
    vocab = (
        cnt_tok.select("_tok")
        .distinct()
        .select("_tok", _bucket(F.col("_tok"), buckets).alias("_b"))
    )
    # SPARSE features throughout: (doc, bucket, count) rows for the
    # gradient and a per-doc (bucket, count) struct list for the scoring
    # fold — never a dense B-vector (a dense build costs B×grams
    # interpreted lambda steps per doc; sparse folds only the occupied
    # buckets, ~10× cheaper at B=64 and the gap widens with B).  Both
    # pinned lazily; cnts is HASH-PARTITIONED BY DOCUMENT so the
    # per-iteration gradient join is exchange-free on the big side (the
    # descent reads them iters+2 times; both are narrow).  Counts are
    # order-independent, so collect_list ordering never matters.
    cnts = (
        cnt_tok.join(F.broadcast(vocab), "_tok")
        .groupBy("_id", "_y", "_b")
        .agg(F.sum("_c").alias("_c"))
        .repartition("_id")
        .localCheckpoint(eager=False)
    )
    feat = (
        cnts.groupBy("_id", "_y")
        .agg(
            F.collect_list(F.struct("_b", "_c")).alias("_sc"),
            F.sum("_c").alias("_n"),
        )
        .localCheckpoint(eager=False)
    )

    # Class priors → balanced-logistic residual weights cw_y = N/(2·N_y)
    # (GREATEST guard: a single-class corpus trains as unweighted).
    cls = {
        r["_y"]: r["c"]
        for r in feat.groupBy("_y")
        .agg(F.count(F.lit(1)).alias("c"))
        .collect()  # control-plane: 2 rows, the class priors
    }
    n1 = cls.get(1, 0)
    n0 = cls.get(0, 0)
    nn = n0 + n1
    if nn == 0:
        cw1 = cw0 = 1.0
    else:
        cw1 = float(nn) / (2.0 * max(n1, 1))
        cw0 = float(nn) / (2.0 * max(n0, 1))

    def scored(w: list[int]) -> tuple[Column, Column]:
        # sparse dot: fold only the occupied buckets of _sc against the
        # packed weight literal (constant-folded to one array once)
        dot = F.expr(
            f"aggregate(_sc, cast(0 as bigint), (acc, s) -> acc"
            f" + element_at({_packed_arr(w)}, cast(s._b as int) + 1) * s._c)"
        )
        m = dot.cast("double") / (F.col("_n").cast("double") * float(_SCALE))
        p = F.lit(0.5) + m / (F.lit(2.0) * (F.lit(1.0) + F.abs(m)))
        return m, p

    w = [0] * buckets
    for _ in range(iters if nn else 0):
        _m, p = scored(w)
        cw = F.when(F.col("_y") == 1, F.lit(cw1)).otherwise(F.lit(cw0))
        q = F.floor(
            ((F.lit(float(_SCALE)) * (p - F.col("_y").cast("double"))) * cw)
            / F.col("_n").cast("double")
        ).cast("bigint")
        # Gradient over the SPARSE count rows: g_b = Σ_d q_d·c_db.  The
        # per-doc residual q (an O(B) interpreted fold) is evaluated
        # exactly once per document on the narrow qdoc projection —
        # exploding the dense vector instead would let CollapseProject
        # re-evaluate it per (doc, bucket) pair, B× the work (measured
        # 2.0 s → 0.3 s per step at sf0.1).  Both join sides are
        # doc-partitioned, so only the B-row output exchanges.
        qdoc = feat.select("_id", q.alias("_q"))
        g_rows = (
            cnts.join(qdoc, "_id")
            .groupBy("_b")
            .agg(
                F.sum(
                    (F.col("_c") * F.col("_q")).cast("decimal(38,0)")
                ).alias("g")
            )
            .collect()  # control-plane: ≤B gradient sums (sparse)
        )
        g = {r["_b"]: r["g"] for r in g_rows}
        w = [
            wj - int(math.floor(lr * float(g.get(j, 0)) / nn))
            for j, wj in enumerate(w)
        ]

    m, p = scored(w)
    return feat.select(
        F.col("_id").alias(id_col),
        F.col("_n").alias("n_grams"),
        F.col("_y").alias("y"),
        F.round(m, 6).alias("margin"),
        F.round(p, 6).alias("prob"),
        (p >= F.lit(0.5)).alias("keep"),
    )
