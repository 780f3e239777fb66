"""DSIR importance scores (functions/importance.py): hashed-bigram
multinomial log-ratios of a raw corpus against a target corpus."""

import math

from pyspark.sql import functions as F

from aqueduct_core_spark.functions.importance import (
    bigram_feature_buckets,
    dsir_scores,
)

SCHEMA = "doc_id string, text string"


def test_feature_buckets_shape_and_determinism(spark):
    df = spark.createDataFrame(
        [("d1", "the cat sat"), ("d2", "x"), ("d3", "")], SCHEMA
    )
    got = bigram_feature_buckets(df, n_buckets=64).collect()
    # "the cat sat" -> 2 bigrams; one-token and empty docs -> none
    assert len(got) == 2
    assert all(0 <= r._b < 64 for r in got)
    again = bigram_feature_buckets(df.repartition(3), n_buckets=64).collect()
    assert sorted((r.doc_id, r._b) for r in got) == sorted(
        (r.doc_id, r._b) for r in again
    )


def test_dsir_prefers_target_like_documents(spark):
    target = spark.createDataFrame(
        [(f"t{i}", "alpha beta gamma delta") for i in range(5)], SCHEMA
    )
    raw = spark.createDataFrame(
        [
            ("match", "alpha beta gamma delta"),
            ("mixed", "alpha beta zzz qqq"),
            ("off", "zzz qqq www vvv"),
        ],
        SCHEMA,
    )
    s = {r.doc_id: r.dsir_logratio for r in dsir_scores(raw, target).collect()}
    assert s["match"] > s["mixed"] > s["off"]
    assert s["match"] > 0  # looks more like the target than the raw pool


def test_dsir_mean_logratio_matches_hand_math(spark):
    # one raw doc with one bigram; hand-compute the smoothed log ratio
    target = spark.createDataFrame([("t1", "a b")], SCHEMA)
    raw = spark.createDataFrame([("r1", "a b")], SCHEMA)
    B = 16
    out = dsir_scores(raw, target, n_buckets=B).collect()
    assert len(out) == 1 and out[0].n_feats == 1
    # both corpora have exactly that one bigram occurrence in its bucket
    expect = (math.log(2) - math.log(1 + B)) - (math.log(2) - math.log(1 + B))
    assert abs(out[0].dsir_logratio - round(expect, 6)) < 1e-9


def test_dsir_docs_without_features_absent(spark):
    target = spark.createDataFrame([("t1", "a b")], SCHEMA)
    raw = spark.createDataFrame([("r1", "a b"), ("r2", "solo"), ("r3", "")], SCHEMA)
    ids = {r.doc_id for r in dsir_scores(raw, target).collect()}
    assert ids == {"r1"}


def test_gumbel_topk_deterministic_and_temperature_limits(spark):
    from aqueduct_core_spark.functions.importance import gumbel_topk_select

    rows = [(f"d{i:03d}", float(i) / 10.0) for i in range(50)]
    df = spark.createDataFrame(rows, "doc_id string, dsir_logratio double")
    a = gumbel_topk_select(df, k=10).collect()
    b = gumbel_topk_select(df.repartition(7), k=10).collect()
    assert [r.doc_id for r in a] == [r.doc_id for r in b]  # reproducible draw
    assert len(a) == 10
    # near-zero temperature -> deterministic top-k by score
    cold = gumbel_topk_select(df, k=5, temperature=1e-9).collect()
    assert [r.doc_id for r in cold] == ["d049", "d048", "d047", "d046", "d045"]
    # different seeds -> different draws (overwhelmingly)
    c = gumbel_topk_select(df, k=10, seed=18).collect()
    assert [r.doc_id for r in a] != [r.doc_id for r in c]


def test_gumbel_topk_validates_args(spark):
    import pytest
    from aqueduct_core_spark.functions.importance import gumbel_topk_select

    df = spark.createDataFrame([("d", 0.1)], "doc_id string, dsir_logratio double")
    with pytest.raises(ValueError):
        gumbel_topk_select(df, k=0)
    with pytest.raises(ValueError):
        gumbel_topk_select(df, k=1, temperature=0.0)


def test_gumbel_topk_xxhash64_full_selection(spark):
    """The xxhash64 path: signed full-range hashes must normalize into
    (0,1) — with the md5-range formula ~94% of ids got a NULL sel_key
    and the 'sample' was drawn from a hash-biased remainder."""
    from aqueduct_core_spark.functions.importance import gumbel_topk_select

    scores = spark.createDataFrame(
        [(f"d{i}", 0.0) for i in range(200)], "doc_id string, dsir_logratio double"
    )
    out = gumbel_topk_select(scores, k=50, method="xxhash64")
    rows = out.collect()
    assert len(rows) == 50
    assert all(r["sel_key"] is not None for r in rows)
    # determinism: same seed, same draw
    again = gumbel_topk_select(scores, k=50, method="xxhash64").collect()
    assert {r["doc_id"] for r in rows} == {r["doc_id"] for r in again}
