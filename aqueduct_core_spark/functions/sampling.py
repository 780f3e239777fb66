"""Deterministic sampling for training-data pipelines.

Random sampling (``df.sample``) is not reproducible across runs,
partitionings, or engines; a corpus pipeline needs the SAME sample on
every rerun and on every system that processes the corpus.  The
standard fix is hash-bucket sampling: bucket = hash(key, salt) mod M,
keep buckets < rate·M.  Properties that matter at 100 TB:

- pure projection + filter — no shuffle, no state, pushes through any
  scan, and composes with partition pruning;
- stable under resharding / reordering (a function of the key only);
- salted, so independent samples of the same corpus don't correlate;
- engine-independent: the md5 primitive reproduces bit-exactly in any
  SQL engine (the DuckDB oracle runs the same arithmetic).

Stratified variant: an independent per-stratum rate lookup, still one
projection (the rates ride in a small CASE/broadcast map).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

from aqueduct_core_spark.functions.dedup import hash64

#: bucket modulus — percent granularity is enough for corpus sampling
SAMPLE_BUCKETS = 100


def sample_bucket(key: Column, seed: int = 42, method: str = "md5") -> Column:
    """Deterministic bucket in [0, SAMPLE_BUCKETS) from a string key.
    ``md5`` keeps the oracle expressible; production can pass
    ``xxhash64`` (same pipeline, cheaper primitive) — equivalence is
    unit-tested for distribution, not bit-identity."""
    h = hash64(key, seed=seed, method=method)
    # md5-60bit is non-negative; xxhash64 is signed → pmod either way
    return F.pmod(h, F.lit(SAMPLE_BUCKETS))


def hash_sample(
    df: DataFrame,
    rate_pct: int,
    key_col: str = "doc_id",
    seed: int = 42,
    method: str = "md5",
) -> DataFrame:
    """Keep rows whose key hashes into the first ``rate_pct`` of 100
    buckets — a reproducible ~rate_pct% sample.  Disjoint seeds give
    independent samples; the same seed always returns the same rows."""
    b = sample_bucket(F.col(key_col).cast("string"), seed=seed, method=method)
    return df.withColumn("sample_bucket", b.cast("int")).where(
        F.col("sample_bucket") < int(rate_pct)
    )


def stratified_hash_sample(
    df: DataFrame,
    rates: dict[str, int],
    stratum_col: str,
    key_col: str = "doc_id",
    default_rate_pct: int = 0,
    seed: int = 42,
    method: str = "md5",
) -> DataFrame:
    """Per-stratum sampling rates (e.g. keep 100% of rare languages,
    5% of the head language).  ``rates`` maps stratum value →
    rate_pct; unlisted strata get ``default_rate_pct``.  Still a pure
    projection: the rate lookup is a CASE chain over the (small) rate
    map, so the whole operator remains shuffle-free."""
    b = sample_bucket(F.col(key_col).cast("string"), seed=seed, method=method)
    rate = F.lit(int(default_rate_pct))
    for value, pct in sorted(rates.items()):
        rate = F.when(F.col(stratum_col) == value, F.lit(int(pct))).otherwise(rate)
    return df.withColumn("sample_bucket", b.cast("int")).where(
        F.col("sample_bucket") < rate
    )


def token_budget_mix(
    df: DataFrame,
    budgets: dict[str, int],
    stratum_col: str,
    token_col: str,
    key_col: str = "doc_id",
    seed: int = 42,
    method: str = "md5",
) -> tuple[DataFrame, dict[str, int]]:
    """Corpus mixing under per-stratum TOKEN budgets (the knob a
    training run actually sets: "20 B tokens of code, 5 B of French"),
    at hash-bucket granularity.

    Per stratum, buckets 0..99 are admitted in order while their
    cumulative ``token_col`` total stays within the stratum's budget;
    a document is kept iff ``sample_bucket < cutoff[stratum]``.
    Strata absent from ``budgets`` are dropped (a mixing recipe is
    explicit).  Granularity is ~1% of the stratum's tokens — the same
    trade :func:`hash_sample` already makes — in exchange for the
    same scale properties:

    - selection stays a pure projection + filter (reshard-stable,
      reproducible, engine-independent md5 arithmetic);
    - the only aggregation is the (stratum × 100)-row bucket histogram
      — the driver collect is bounded by ``n_strata × SAMPLE_BUCKETS``
      regardless of corpus size (same boundedness argument as
      ``operators/batching.choose_block_bits``);
    - no per-stratum global sort: an exact doc-level greedy cut would
      need a total order within each stratum (a 100 TB sort); bucket
      granularity removes it.

    Returns ``(kept_df, cutoffs)`` — the kept rows (with
    ``sample_bucket``) and the per-stratum bucket cutoffs actually
    applied, for the run manifest.
    """
    b = sample_bucket(F.col(key_col).cast("string"), seed=seed, method=method)
    wb = df.withColumn("sample_bucket", b.cast("int"))
    hist = {
        (r["s"], r["b"]): r["t"]
        for r in wb.groupBy(
            F.col(stratum_col).alias("s"), F.col("sample_bucket").alias("b")
        )
        .agg(F.sum(F.col(token_col)).alias("t"))
        .collect()  # bounded: n_strata × SAMPLE_BUCKETS rows
    }
    cutoffs: dict[str, int] = {}
    for stratum, budget in budgets.items():
        total = 0
        cut = 0
        for i in range(SAMPLE_BUCKETS):
            t = hist.get((stratum, i), 0) or 0
            if total + t > int(budget):
                break
            total += t
            cut = i + 1
        cutoffs[stratum] = cut
    cut_expr = F.lit(0)
    for stratum, cut in sorted(cutoffs.items()):
        cut_expr = F.when(
            F.col(stratum_col) == stratum, F.lit(int(cut))
        ).otherwise(cut_expr)
    return wb.where(F.col("sample_bucket") < cut_expr), cutoffs
