"""Lexical retrieval over the document corpus: BM25 top-k.

The non-embedding sibling of ``similarity.cosine_topk`` — the scorer a
training-data pipeline runs for benchmark decontamination sweeps and
dedup candidate generation when no embedding exists (Okapi BM25,
Robertson & Spärck Jones probabilistic relevance framework; the +1
inside the log is the standard non-negative idf variant, as in Lucene).

Plan shape at 100 TB: the query's terms are LITERALS, so per-document
term frequencies are computed map-side with ``F.filter`` over the token
array — the corpus text NEVER shuffles.  The only aggregation is one
1-row global stats pass (N, Σdl, per-term document frequencies) that is
broadcast back; scoring is a pure projection and the top-k is
``TakeOrderedAndProject``.  Integer statistics (tf, df, N, Σdl) keep
both engines exact; the final score folds the per-term contributions in
the FIXED query-term order (left-associative ``+`` chain, identical in
the SQL oracle) and applies the shared floor-round6, so the DuckDB
oracle reproduces the ranking bit-identically.

Reference parity: the reference has no search surface; this extends the
training-data-pipeline layer (SURVEY §2 "beyond the reference").
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from aqueduct_core_spark.functions.text import round6


def bm25_topk(
    docs: DataFrame,
    query_terms: list[str],
    k: int = 20,
    k1: float = 1.2,
    b: float = 0.75,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Top-``k`` documents by BM25 score for a bag of ``query_terms``.

    Returns ``(doc_id, score)`` with ``score`` floor-round6ed,
    descending, ties toward the smaller id; documents matching no term
    are excluded.  Tokenization is the engine's shared lowercase
    whitespace convention (``functions.text.tokens`` over lowered
    text)."""
    if not query_terms:
        raise ValueError("bm25_topk needs at least one query term")
    toks = F.split(F.lower(F.trim(F.col(text_col))), r"\s+")
    base = docs.select(F.col(id_col), toks.alias("_t")).withColumn(
        "_dl", F.size("_t")
    )
    nq = len(query_terms)

    def _eq(term: str):
        # one-arg lambda: a second parameter would make PySpark pass
        # the ELEMENT INDEX as the extra argument (F.filter arity rule)
        return lambda x: x == F.lit(term)

    for i, t in enumerate(query_terms):
        base = base.withColumn(
            f"_tf{i}", F.size(F.filter(F.col("_t"), _eq(t)))
        )
    stats = base.agg(
        F.count(F.lit(1)).alias("_n"),
        F.sum("_dl").alias("_sdl"),  # exact integer sum → exact avgdl
        *[
            F.sum((F.col(f"_tf{i}") > 0).cast("long")).alias(f"_df{i}")
            for i in range(nq)
        ],
    )
    s = base.crossJoin(F.broadcast(stats))
    avgdl = F.col("_sdl") / F.col("_n")
    score = None
    match = None
    for i in range(nq):
        tf, df = F.col(f"_tf{i}"), F.col(f"_df{i}")
        idf = F.log(
            (F.col("_n") - df + F.lit(0.5)) / (df + F.lit(0.5)) + F.lit(1.0)
        )
        denom = tf + F.lit(k1) * (
            F.lit(1.0) - F.lit(b) + F.lit(b) * (F.col("_dl") / avgdl)
        )
        contrib = idf * (tf * F.lit(k1 + 1.0)) / denom
        score = contrib if score is None else (score + contrib)
        hit = tf > 0
        match = hit if match is None else (match | hit)
    return (
        s.where(match)
        .select(F.col(id_col), round6(score).alias("score"))
        .orderBy(F.col("score").desc(), F.col(id_col))
        .limit(k)
    )
