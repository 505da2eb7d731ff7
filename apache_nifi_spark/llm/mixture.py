"""Temperature-based corpus mixture sampling (§2.12 data-selection
tier): the multilingual-LM domain-rebalancing step (mBERT/XLM-R's
``p_i ∝ (n_i/N)^τ`` exponentiated sampling, Conneau & Lample 2019 §3.1;
mT5 §3.2) — upsample small domains, downsample dominant ones, hit a
token budget, all DETERMINISTICALLY so shards regenerate byte-identical.

Pipeline:

1. per-domain token totals ``n_i`` (one map-side-combined agg — the
   only corpus-grain work),
2. temperature weights ``w_i = (n_i/N)^τ`` and the mixture
   ``q_i = w_i / Σw``; per-domain keep-rate
   ``r_i = min(1, q_i · B / n_i)`` for a token budget ``B = frac·N``,
3. deterministic Bernoulli: keep a document iff its md5-derived 32-bit
   uniform falls below ``floor(r_i · 2³²)`` — a pure function of the
   row, the repo's stratified-sampling convention
   (operators/sample.sample_stratified_hash), so the selection is
   reproducible across runs, partitionings, and engines.

Determinism contract (what makes temperature sampling
value-oracle-able):

- τ is restricted to ``{1, 0.5, 0.25}``: ``x^0.5 = sqrt(x)`` and
  ``x^0.25 = sqrt(sqrt(x))`` are compositions of correctly-rounded IEEE
  ops, bit-identical cross-engine — general ``pow``/``exp·ln`` carry no
  last-ulp guarantee (the rational-sigmoid precedent in llm/train),
- the normalization ``Σw`` is a FIXED-ORDER left fold over domains
  sorted by name (double addition is order-dependent; the oracle's
  ``list_reduce(list(w ORDER BY domain))`` replays the same fold),
- the keep threshold is an INTEGER ``floor(r_i·2³²)`` compared against
  the integer md5 uniform — no float compare at the decision boundary.

Scale shape: domain stats collect as control-plane rows (O(domains));
the keep decision is a map-only codegen'd filter riding literal
thresholds — no shuffle beyond the two bounded aggs.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["temperature_mixture_rates", "temperature_mixture_summary"]

_U32 = 4294967296.0


def _tau_weight(x: float, tau: float) -> float:
    if tau == 1.0:
        return x
    if tau == 0.5:
        return math.sqrt(x)
    if tau == 0.25:
        return math.sqrt(math.sqrt(x))
    raise ValueError("tau must be one of 1, 0.5, 0.25 (portability contract)")


def temperature_mixture_rates(
    df: DataFrame,
    stratum_col: str = "source",
    text_col: str = "text",
    tau: float = 0.5,
    budget_frac: float = 0.5,
) -> dict[str, tuple[int, int, float, int]]:
    """domain → (n_docs, n_tokens, keep_rate, int_threshold): the
    control-plane mixture table (step 1+2 above)."""
    stats = sorted(
        (r[stratum_col], int(r["nd"]), int(r["n"]))
        for r in df.groupBy(stratum_col)
        .agg(
            F.count(F.lit(1)).alias("nd"),
            F.sum(F.size(F.split(text_col, " ", -1)).cast("bigint")).alias("n"),
        )
        .collect()  # control-plane: O(domains) mixture rows
    )
    nn = sum(n for _s, _d, n in stats)  # integer: order-independent
    wgts = [(_tau_weight(n / float(nn), tau)) for _s, _d, n in stats]
    z = wgts[0]
    for w in wgts[1:]:  # fixed-order left fold (domains sorted by name)
        z = z + w
    budget = budget_frac * float(nn)
    out: dict[str, tuple[int, int, float, int]] = {}
    for (s, nd, n), w in zip(stats, wgts):
        rate = min(1.0, w / z * budget / float(n))
        out[s] = (nd, n, rate, int(math.floor(rate * _U32)))
    return out


def temperature_mixture_summary(
    df: DataFrame,
    stratum_col: str = "source",
    text_col: str = "text",
    id_col: str = "doc_id",
    tau: float = 0.5,
    budget_frac: float = 0.5,
) -> DataFrame:
    """Per-domain mixture audit: (domain, n_docs, n_tokens, keep_rate,
    kept_docs, kept_tokens) after the deterministic temperature-τ
    selection — the receipt a pipeline records alongside the sampled
    shards.  The doc-grain keep decision is the map-only integer
    threshold filter described in the module docstring."""
    rates = temperature_mixture_rates(
        df, stratum_col, text_col, tau, budget_frac
    )
    thr = F.lit(None).cast("bigint")
    for s, (_nd, _n, _rate, t) in sorted(rates.items()):
        thr = F.when(F.col(stratum_col) == s, F.lit(t)).otherwise(thr)
    u = (
        F.conv(
            F.substring(F.md5(F.col(id_col).cast("string")), 1, 8), 16, 10
        ).cast("bigint")
    )
    toks = F.size(F.split(text_col, " ", -1)).cast("bigint")
    scored = df.select(
        F.col(stratum_col).alias("domain"),
        toks.alias("_toks"),
        (u < thr).alias("_keep"),
    )
    agg = scored.groupBy("domain").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("_toks").alias("n_tokens"),
        F.sum(F.col("_keep").cast("bigint")).alias("kept_docs"),
        F.sum(F.when(F.col("_keep"), F.col("_toks")).otherwise(F.lit(0)))
        .cast("bigint")
        .alias("kept_tokens"),
    )
    rate_col = F.lit(None).cast("double")
    for s, (_nd, _n, rate, _t) in sorted(rates.items()):
        rate_col = F.when(F.col("domain") == s, F.lit(rate)).otherwise(rate_col)
    return agg.select(
        "domain",
        "n_docs",
        "n_tokens",
        F.round(rate_col, 6).alias("keep_rate"),
        "kept_docs",
        "kept_tokens",
    )
