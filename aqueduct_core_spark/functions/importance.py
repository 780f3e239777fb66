"""DSIR-style importance scores for data selection.

Data Selection with Importance Resampling (Xie et al., NeurIPS 2023,
arXiv:2302.03169) selects pretraining documents whose hashed-n-gram
feature distribution matches a small TARGET corpus: each raw document
gets an importance log-weight ``log p_target(x) − log p_raw(x)`` under
two bag-of-features multinomials, and selection resamples by that
weight.  This module computes the per-document log-weights with plain
DataFrame aggregations — the selection itself composes with the
existing samplers (:mod:`aqueduct_core_spark.functions.sampling`).

Plan shape (the 100 TB lens): featurization is explode → 4-byte bucket
ids (document text never shuffles); the two multinomials are one
hash-aggregate each over those ids, bounded to ``n_buckets`` rows — a
broadcastable model no matter how big either corpus is; scoring is a
broadcast join + one hash agg on the doc id.  Identical shape to
:func:`aqueduct_core_spark.functions.text.unigram_logprob_scores`
(train pass + broadcast-score pass), with a second model subtracted.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from aqueduct_core_spark.functions.dedup import hash64
from aqueduct_core_spark.functions.text import round6, tokens

__all__ = ["bigram_feature_buckets", "dsir_scores", "gumbel_topk_select"]


def bigram_feature_buckets(
    df: DataFrame,
    n_buckets: int = 1024,
    id_col: str = "doc_id",
    text_col: str = "text",
    seed: int = 9,
    method: str = "md5",
) -> DataFrame:
    """One row per word-bigram occurrence: ``(id, _b)`` with ``_b`` the
    hashed feature bucket in ``[0, n_buckets)``.  Lower-cased whitespace
    bigrams, hashed with the engine's shared seeded-hash primitive
    (``md5`` keeps the SQL oracle expressible; production passes
    ``xxhash64``).  Documents with fewer than two tokens contribute no
    features and drop out of any downstream score."""
    words = tokens(F.lower(F.col(text_col)))
    bigrams = F.when(
        F.size(words) >= 2,
        F.transform(
            F.slice(words, 1, F.size(words) - 1),
            lambda w, i: F.concat(w, F.lit(" "), F.element_at(words, i + 2)),
        ),
    ).otherwise(F.array().cast("array<string>"))
    return df.select(F.col(id_col), F.explode(bigrams).alias("_bg")).select(
        id_col,
        F.pmod(hash64(F.col("_bg"), seed=seed, method=method), F.lit(int(n_buckets)))
        .cast("int")
        .alias("_b"),
    )


def dsir_scores(
    raw: DataFrame,
    target: DataFrame,
    n_buckets: int = 1024,
    id_col: str = "doc_id",
    text_col: str = "text",
    seed: int = 9,
    method: str = "md5",
    min_input_partitions: int | None = None,
) -> DataFrame:
    """Per-document DSIR importance log-weights of the RAW corpus
    against a TARGET corpus.  ``min_input_partitions`` spreads a
    small/single-split input across cores before the bigram explode
    (the dominant map cost), as in
    :func:`aqueduct_core_spark.functions.dedup.spread_small_input`.

    Both corpora reduce to hashed-bigram multinomials with add-one
    smoothing over ``n_buckets`` buckets; each raw document scores

    ``dsir_logratio = mean over its bigram occurrences of
    [ln((ct_target(b)+1)/(N_target+B)) − ln((ct_raw(b)+1)/(N_raw+B))]``

    (mean, not sum, so the weight is length-normalized — long documents
    don't dominate by token count alone), rounded to 6 dp.  Positive →
    the document looks more like the target than like the raw corpus.
    Returns ``(id, n_feats, dsir_logratio)``; documents with no bigram
    features are absent.

    Downstream selection: threshold (``dsir_logratio > 0``), top-k, or
    the paper's Gumbel-resampling — all compose as ordinary DataFrame
    ops over this output; pair with
    :func:`aqueduct_core_spark.functions.sampling.token_budget_mix` to
    hit a token budget within the selected set.
    """
    from aqueduct_core_spark.functions.dedup import spread_small_input

    raw = spread_small_input(raw, min_input_partitions)
    target = spread_small_input(target, min_input_partitions)
    rb = bigram_feature_buckets(raw, n_buckets, id_col, text_col, seed, method)
    tb = bigram_feature_buckets(target, n_buckets, id_col, text_col, seed, method)
    # the two multinomials are ≤n_buckets rows each — collect them and
    # re-emit as local relations, so each corpus is featurized exactly
    # once for its model (+ once more for raw-side scoring) and the
    # scoring join broadcasts literal rows instead of recomputing the
    # model lineage (same bounded-collect argument as
    # sampling.token_budget_mix's histogram).
    spark = raw.sparkSession
    rc_rows = rb.groupBy("_b").agg(F.count(F.lit(1)).alias("_cr")).collect()
    tc_rows = tb.groupBy("_b").agg(F.count(F.lit(1)).alias("_ct")).collect()
    n_raw = sum(r["_cr"] for r in rc_rows)
    n_tgt = sum(r["_ct"] for r in tc_rows)
    rc = spark.createDataFrame(
        [(r["_b"], r["_cr"]) for r in rc_rows] or [], "_b int, _cr long"
    )
    tc = spark.createDataFrame(
        [(r["_b"], r["_ct"]) for r in tc_rows] or [], "_b int, _ct long"
    )
    ln_tgt = F.log(F.lit(float(n_tgt) + float(n_buckets)))
    ln_raw = F.log(F.lit(float(n_raw) + float(n_buckets)))
    lp = (
        # models are ≤ n_buckets rows each — always broadcastable
        rb.join(F.broadcast(tc), "_b", "left")
        .join(F.broadcast(rc), "_b", "left")
        .select(
            F.col(id_col),
            (
                (F.log(F.coalesce(F.col("_ct"), F.lit(0)).cast("double") + 1.0) - ln_tgt)
                - (F.log(F.coalesce(F.col("_cr"), F.lit(0)).cast("double") + 1.0) - ln_raw)
            ).alias("_l"),
        )
    )
    return lp.groupBy(id_col).agg(
        F.count(F.lit(1)).cast("long").alias("n_feats"),
        round6(F.avg("_l")).alias("dsir_logratio"),
    )


def gumbel_topk_select(
    scores: DataFrame,
    k: int,
    temperature: float = 1.0,
    id_col: str = "doc_id",
    score_col: str = "dsir_logratio",
    seed: int = 17,
    method: str = "md5",
) -> DataFrame:
    """DSIR's selection step: sample ``k`` documents WITHOUT replacement
    with probability ∝ exp(score / temperature), via the Gumbel-top-k
    trick — add independent Gumbel(0,1) noise to each scaled score and
    take the top k (equivalent to sequential sampling without
    replacement; Vieira 2014).  The noise is DETERMINISTIC: uniform u
    from the engine's seeded hash primitive, normalized per method's
    actual range (md5 → non-negative 60-bit, ``u = (h + 0.5)/2⁶⁰``;
    xxhash64 → SIGNED full-range 64-bit, ``u = (h + 2⁶³ + 0.5)/2⁶⁴`` —
    using the md5 formula there would put u outside (0,1) for ~94% of
    ids, NULL their ``g``, and silently draw the sample from the
    hash-biased remainder).  Either way u ∈ (0,1), so
    ``g = −ln(−ln u)`` is finite, the draw is reproducible across
    runs/partitionings/engines, and the SQL oracle can replay the
    exact selection.

    ``temperature`` → 0 approaches deterministic top-k by score;
    large values approach a uniform sample.  Returns the selected rows
    as ``(id, score, sel_key)`` with the tie-broken top-k plan shape
    (``TakeOrderedAndProject`` — per-partition heap + driver merge,
    never a global sort).
    """
    if k <= 0:
        raise ValueError(f"need positive k, got {k=}")
    if temperature <= 0:
        raise ValueError(f"need positive temperature, got {temperature=}")
    h = hash64(F.col(id_col).cast("string"), seed=seed, method=method)
    if method == "md5":
        u = (h.cast("double") + F.lit(0.5)) / F.lit(float(2**60))
    else:  # xxhash64: signed full-range → shift into [0, 2⁶⁴)
        u = (h.cast("double") + F.lit(float(2**63) + 0.5)) / F.lit(float(2**64))
    g = -F.log(-F.log(u))
    key = F.col(score_col).cast("double") / F.lit(float(temperature)) + g
    return (
        scores.select(
            F.col(id_col),
            F.col(score_col),
            round6(key).alias("sel_key"),
        )
        .orderBy(F.col("sel_key").desc(), F.col(id_col))
        .limit(int(k))
    )
