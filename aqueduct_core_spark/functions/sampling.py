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
