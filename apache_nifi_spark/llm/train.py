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

Scale shape (100 TB rules): one tokenize+hash pass builds the per-doc
count vector (narrow: B ints + a label per document, pinned once with a
lazy localCheckpoint — the bpe.py precedent); each descent step is one
map-only scoring pass + one two-stage aggregation whose exchange moves
B partial sums; the driver sees B integers per step.  The final scoring
plan is map-only over literal weights.  The dense count vector is the
small-B choice (B=64 here); the sparse (doc, bucket, count) layout is
the drop-in swap when B grows to fastText's 2M.
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
    ).select("_id", "_y", _bucket(F.col("_tok"), buckets).alias("_b"))
    # Dense per-doc count vector: counts are order-independent, so the
    # collect_list ordering never matters.  Pinned lazily — the descent
    # reads this frame iters+2 times and it is narrow (B ints + label).
    feat = (
        toks.groupBy("_id", "_y")
        .agg(F.collect_list("_b").alias("_bs"))
        .select(
            "_id",
            "_y",
            F.expr(
                f"transform(sequence(0, {buckets - 1}),"
                " j -> cast(size(filter(_bs, b -> b = j)) as bigint))"
            ).alias("_cv"),
            F.size("_bs").cast("bigint").alias("_n"),
        )
        .localCheckpoint(eager=False)
    )

    # Class priors → balanced-logistic residual weights cw_y = N/(2·N_y)
    # (GREATEST guard: a single-class corpus trains as unweighted).
    cls = {r["_y"]: r["c"] for r in feat.groupBy("_y").agg(F.count(F.lit(1)).alias("c")).collect()}
    n1 = cls.get(1, 0)
    n0 = cls.get(0, 0)
    nn = n0 + n1
    if nn == 0:
        cw1 = cw0 = 1.0
    else:
        cw1 = float(nn) / (2.0 * max(n1, 1))
        cw0 = float(nn) / (2.0 * max(n0, 1))

    def scored(w: list[int]) -> tuple[Column, Column]:
        dot = F.expr(
            f"aggregate(zip_with(_cv, {_packed_arr(w)}, (a, b) -> a * b),"
            " cast(0 as bigint), (acc, x) -> acc + x)"
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
        g_rows = (
            feat.select(F.posexplode("_cv").alias("pos", "cj"), q.alias("_q"))
            .groupBy("pos")
            .agg(
                F.sum(
                    (F.col("cj") * F.col("_q")).cast("decimal(38,0)")
                ).alias("g")
            )
            .orderBy("pos")
            .collect()  # control-plane: B gradient sums
        )
        w = [
            wj - int(math.floor(lr * float(r["g"]) / nn))
            for wj, r in zip(w, g_rows)
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
