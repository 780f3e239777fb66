"""Unit tests for the round-3 coverage additions: as-of join,
sessionization, change feed, net changes, snapshot time travel,
deterministic sampling, and corpus top-n-grams."""

import datetime as dt

import pytest
from pyspark.sql import Row, functions as F

from aqueduct_core_spark.operators.temporal import asof_join_log, sessionize
from aqueduct_core_spark.sources.changes import changefeed, net_changes

UTC = dt.timezone.utc


def _ts(minute, second=0):
    return dt.datetime(2026, 1, 1, 10, minute, second)


# ---------------------------------------------------------------------------
# asof_join_log
# ---------------------------------------------------------------------------

def test_asof_join_basic(spark):
    left = spark.createDataFrame(
        [("c1", 5), ("c1", 15), ("c1", 25), ("c2", 7)],
        "conv_id string, lsn long",
    )
    right = spark.createDataFrame(
        [("c1", 10, "m10"), ("c1", 20, "m20"), ("c3", 1, "mX")],
        "conv_id string, lsn long, marker string",
    )
    out = asof_join_log(
        left, right, keys=["conv_id"], ord_col="lsn", right_payload=["marker"]
    )
    got = {(r.conv_id, r.lsn): r.marker_asof for r in out.collect()}
    assert got == {
        ("c1", 5): None,       # before any right row
        ("c1", 15): "m10",     # latest right at-or-before 15
        ("c1", 25): "m20",
        ("c2", 7): None,       # key with no right rows at all
    }


def test_asof_join_inclusive_at_equal_ord(spark):
    left = spark.createDataFrame([("c1", 10)], "conv_id string, lsn long")
    right = spark.createDataFrame(
        [("c1", 10, "same")], "conv_id string, lsn long, marker string"
    )
    out = asof_join_log(
        left, right, keys=["conv_id"], ord_col="lsn", right_payload=["marker"]
    )
    assert out.collect()[0].marker_asof == "same"


# ---------------------------------------------------------------------------
# sessionize
# ---------------------------------------------------------------------------

def test_sessionize_gap_splits(spark):
    rows = [
        ("c1", _ts(0), 1),
        ("c1", _ts(10), 2),    # 10 min gap → same session
        ("c1", _ts(50), 3),    # 40 min gap → new session
        ("c1", _ts(55), 4),
        ("c2", _ts(0), 5),
    ]
    df = spark.createDataFrame(rows, "conv_id string, ts timestamp, lsn long")
    out = sessionize(df, gap_minutes=30).orderBy("conv_id", "session_id").collect()
    assert [(r.conv_id, r.session_id, r.n_events, r.first_lsn, r.last_lsn) for r in out] == [
        ("c1", 1, 2, 1, 2),
        ("c1", 2, 2, 3, 4),
        ("c2", 1, 1, 5, 5),
    ]
    assert out[0].start_ts.replace(tzinfo=None) == _ts(0)
    assert out[0].end_ts.replace(tzinfo=None) == _ts(10)


def test_sessionize_boundary_is_exclusive(spark):
    # exactly gap_minutes apart stays in ONE session (split needs > gap)
    rows = [("c1", _ts(0), 1), ("c1", _ts(30), 2)]
    df = spark.createDataFrame(rows, "conv_id string, ts timestamp, lsn long")
    out = sessionize(df, gap_minutes=30).collect()
    assert len(out) == 1 and out[0].n_events == 2


# ---------------------------------------------------------------------------
# changefeed
# ---------------------------------------------------------------------------

def test_changefeed_transitions(spark):
    rows = [
        (1, "c1", 0, "I", "v1"),
        (2, "c1", 0, "U", "v2"),
        (3, "c1", 0, "D", None),
        (4, "c1", 1, "U", "w1"),   # first event for the key, op U → create
        (5, "c1", None, "D", None),  # conv-level row: excluded from feed
    ]
    df = spark.createDataFrame(
        rows, "lsn long, conv_id string, turn_idx int, op string, text string"
    )
    out = {r.lsn: r for r in changefeed(df).collect()}
    assert set(out) == {1, 2, 3, 4}
    assert (out[1].change_type, out[1].prev_text) == ("create", None)
    assert (out[2].change_type, out[2].prev_text) == ("update", "v1")
    assert (out[3].change_type, out[3].prev_text) == ("delete", "v2")
    assert (out[4].change_type, out[4].prev_text) == ("create", None)


# ---------------------------------------------------------------------------
# net_changes
# ---------------------------------------------------------------------------

def _chg(spark, rows):
    return spark.createDataFrame(
        rows,
        "lsn long, conv_id string, turn_idx int, op string, role string, "
        "text string, tool string, ts timestamp",
    )


def test_net_changes_cases(spark):
    t0 = _ts(0)
    rows = [
        # key A: created+deleted entirely inside window → no net row
        (10, "c1", 0, "I", "r", "a1", None, t0),
        (11, "c1", 0, "D", None, None, None, t0),
        # key B: existed before, updated in window → U
        (1, "c1", 1, "I", "r", "b0", None, t0),
        (12, "c1", 1, "U", "r", "b1", None, t0),
        # key C: existed before, deleted in window → D
        (2, "c1", 2, "I", "r", "c0", None, t0),
        (13, "c1", 2, "D", None, None, None, t0),
        # key D: new in window → I (even though the op is 'U')
        (14, "c1", 3, "U", "r", "d1", None, t0),
        # key E: pre-window winner was a delete, re-created in window → I
        (3, "c2", 0, "I", "r", "e0", None, t0),
        (4, "c2", 0, "D", None, None, None, t0),
        (15, "c2", 0, "U", "r", "e1", None, t0),
        # key F: only post-window events → excluded
        (99, "c2", 1, "I", "r", "f1", None, t0),
        # key G: only pre-window events → excluded
        (5, "c2", 2, "I", "r", "g0", None, t0),
    ]
    out = net_changes(_chg(spark, rows), start_lsn=10, end_lsn=20)
    got = {(r.conv_id, r.turn_idx): (r.net_op, r.lsn, r.text) for r in out.collect()}
    assert got == {
        ("c1", 1): ("U", 12, "b1"),
        ("c1", 2): ("D", 13, None),
        ("c1", 3): ("I", 14, "d1"),
        ("c2", 0): ("I", 15, "e1"),
    }


# ---------------------------------------------------------------------------
# time travel
# ---------------------------------------------------------------------------

def test_time_travel_read(spark, tmp_table_dir):
    from aqueduct_core_spark.catalog.table import ParquetTranscriptTable
    from aqueduct_core_spark.config import EngineConfig
    from aqueduct_core_spark.schema import CHANGES_SCHEMA
    from aqueduct_core_spark.streaming.pipeline import replay

    t0 = _ts(0)
    mk = lambda lsn, turn, op, text: (
        lsn, op, "c1", turn, "user", text, None, t0, 100, 0, None
    )
    first = [mk(1, 0, "I", "v1"), mk(2, 1, "I", "w1")]
    second = [mk(3, 0, "U", "v2"), mk(4, 1, "D", None)]
    df1 = spark.createDataFrame(first, CHANGES_SCHEMA)
    df2 = spark.createDataFrame(second, CHANGES_SCHEMA)

    table = ParquetTranscriptTable.create(spark, tmp_table_dir, num_buckets=4)
    cfg = EngineConfig(num_buckets=4)
    replay(table, df1, cfg, start_epoch=0, start_lsn=0, lsn_bounds=(1, 2))
    v1 = table.catalog.current_version()
    replay(table, df2, cfg, lsn_bounds=(3, 4))

    now = {(r.turn_idx): r.text for r in table.read().collect()}
    assert now == {0: "v2"}  # turn 1 deleted, turn 0 updated

    then = {(r.turn_idx): r.text for r in table.read_as_of(v1).collect()}
    assert then == {0: "v1", 1: "w1"}  # the pre-second-replay state

    # history lists both versions; as-of the current version == read()
    assert v1 in table.catalog.history()


# ---------------------------------------------------------------------------
# sampling
# ---------------------------------------------------------------------------

def test_hash_sample_deterministic_and_stable(spark):
    from aqueduct_core_spark.functions.sampling import hash_sample

    df = spark.range(0, 2000).withColumnRenamed("id", "doc_id")
    s1 = sorted(r.doc_id for r in hash_sample(df, rate_pct=10).collect())
    s2 = sorted(r.doc_id for r in hash_sample(df.repartition(7), rate_pct=10).collect())
    assert s1 == s2                      # partitioning-independent
    assert 100 < len(s1) < 320           # ~10% of 2000, loose bounds
    # different seed → a different (roughly independent) sample
    s3 = sorted(r.doc_id for r in hash_sample(df, rate_pct=10, seed=7).collect())
    assert s1 != s3
    # nested sampling property: rate 5 is a subset of rate 10 (same seed)
    s5 = sorted(r.doc_id for r in hash_sample(df, rate_pct=5).collect())
    assert set(s5) <= set(s1)


def test_stratified_hash_sample(spark):
    from aqueduct_core_spark.functions.sampling import stratified_hash_sample

    df = spark.range(0, 1000).select(
        F.col("id").alias("doc_id"),
        F.when(F.col("id") % 10 == 0, "rare").otherwise("head").alias("lang"),
    )
    out = stratified_hash_sample(
        df, rates={"rare": 100, "head": 5}, stratum_col="lang"
    )
    got = out.groupBy("lang").count().collect()
    counts = {r.lang: r["count"] for r in got}
    assert counts["rare"] == 100         # rate 100% keeps every rare row
    assert 10 <= counts.get("head", 0) <= 120   # ~5% of 900


# ---------------------------------------------------------------------------
# top n-grams
# ---------------------------------------------------------------------------

def test_top_ngrams_counts_and_ties(spark):
    from aqueduct_core_spark.functions.text import top_ngrams

    docs = spark.createDataFrame(
        [
            (0, "the cat sat"),
            (1, "the cat ran"),
            (2, "a  dog"),          # whitespace collapse → "a dog"
            (3, "single"),          # < 2 tokens → contributes nothing
            (4, ""),
        ],
        "doc_id long, text string",
    )
    out = [(r.ngram, r.cnt) for r in top_ngrams(docs, n=2, k=3).collect()]
    assert out[0] == ("the cat", 2)
    # ties (count 1) broken by n-gram string ascending
    assert out[1:] == [("a dog", 1), ("cat ran", 1)]


# ---------------------------------------------------------------------------
# spread_small_input
# ---------------------------------------------------------------------------

def test_spread_small_input(spark):
    from aqueduct_core_spark.functions.dedup import spread_small_input

    one = spark.range(100).coalesce(1)
    assert spread_small_input(one, 8).rdd.getNumPartitions() == 8
    # already-wide input is untouched (no extra shuffle at scale)
    wide = spark.range(100).repartition(16)
    assert spread_small_input(wide, 8) is wide
    # None disables even the partition check
    assert spread_small_input(one, None) is one


# ---------------------------------------------------------------------------
# table-level change feed (changes_between)
# ---------------------------------------------------------------------------

def test_changes_between_emits_resolved_winners(spark, tmp_table_dir):
    from aqueduct_core_spark.catalog.table import ParquetTranscriptTable
    from aqueduct_core_spark.config import EngineConfig
    from aqueduct_core_spark.schema import CHANGES_SCHEMA
    from aqueduct_core_spark.streaming.pipeline import replay

    t0 = _ts(0)
    mk = lambda lsn, turn, op, text: (
        lsn, op, "c1", turn, "user", text, None, t0, 100, 0, None
    )
    first = [mk(1, 0, "I", "v1")]
    second = [
        mk(3, 0, "U", "v2"), mk(4, 0, "U", "v3"),   # same key twice → winner only
        mk(5, 1, "I", "w1"),
        mk(6, 2, "D", None),                          # turn tombstone
        (7, "D", "c2", None, None, None, None, t0, 89, 0, None),  # conv delete
    ]
    table = ParquetTranscriptTable.create(spark, tmp_table_dir, num_buckets=4)
    cfg = EngineConfig(num_buckets=4, mor_fold_every=10**9)
    replay(table, spark.createDataFrame(first, CHANGES_SCHEMA), cfg,
           start_epoch=0, start_lsn=0, lsn_bounds=(1, 1))
    v1 = table.catalog.current_version()
    replay(table, spark.createDataFrame(second, CHANGES_SCHEMA), cfg,
           lsn_bounds=(3, 7))

    feed = {(r.conv_id, r.turn_idx): (r.op, r.text, r._lsn)
            for r in table.changes_between(v1).collect()}
    assert feed == {
        ("c1", 0): ("U", "v3", 4),    # winner only, not the lsn-3 update
        ("c1", 1): ("I", "w1", 5),
        ("c1", 2): ("D", None, 6),    # turn tombstone is in the feed
        ("c2", None): ("D", None, 7), # conv-delete watermark row
    }
    # empty interval → empty feed with the same schema
    assert table.changes_between(table.catalog.current_version()).count() == 0


def test_changes_between_refuses_folded_interval(spark, tmp_table_dir):
    from aqueduct_core_spark.catalog.table import ParquetTranscriptTable
    from aqueduct_core_spark.config import EngineConfig
    from aqueduct_core_spark.operators.compact import fold_deltas
    from aqueduct_core_spark.schema import CHANGES_SCHEMA
    from aqueduct_core_spark.streaming.pipeline import replay

    t0 = _ts(0)
    rows = [(1, "I", "c1", 0, "user", "v1", None, t0, 100, 0, None)]
    table = ParquetTranscriptTable.create(spark, tmp_table_dir, num_buckets=4)
    cfg = EngineConfig(num_buckets=4, mor_fold_every=10**9)
    v0 = table.catalog.current_version()
    replay(table, spark.createDataFrame(rows, CHANGES_SCHEMA), cfg,
           start_epoch=0, start_lsn=0, lsn_bounds=(1, 1))
    fold_deltas(table)
    with pytest.raises(ValueError, match="undelivered deltas"):
        table.changes_between(v0)


def test_feed_replication_cascade(spark, tmp_path):
    """The reference's whole topology — central pipe → store-node sync —
    expressed with the table feed: a REPLICA built purely by applying
    the primary's changes_between feeds converges to the primary's
    exact state.  The feed rows are already LWW winners keyed like the
    change log, so apply_batch consumes them unchanged."""
    from pyspark.sql import functions as F

    from aqueduct_core_spark.catalog.table import ParquetTranscriptTable
    from aqueduct_core_spark.config import EngineConfig
    from aqueduct_core_spark.generator import generate_changes
    from aqueduct_core_spark.operators.merge import apply_batch

    log = generate_changes(spark, n_convs=60, seed=11)
    mx = int(log.agg(F.max("lsn")).collect()[0][0])
    split = mx // 2

    from aqueduct_core_spark.streaming.pipeline import replay

    cfg = EngineConfig(num_buckets=4, mor_fold_every=10**9)
    primary = ParquetTranscriptTable.create(spark, str(tmp_path / "primary"), num_buckets=4)
    v0 = primary.catalog.current_version()
    replay(primary, log.where(F.col("lsn") < split), cfg, start_epoch=0, start_lsn=0)
    v1 = primary.catalog.current_version()
    replay(primary, log.where(F.col("lsn") >= split), cfg)
    v2 = primary.catalog.current_version()

    replica = ParquetTranscriptTable.create(spark, str(tmp_path / "replica"), num_buckets=4)
    from aqueduct_core_spark.schema import LSN_COLUMN

    for epoch, (a, b) in enumerate([(v0, v1), (v1, v2)]):
        # the feed carries the table-internal lsn column; a consumer
        # applying it downstream presents it as the log's lsn
        feed = primary.changes_between(a, b).withColumnRenamed(LSN_COLUMN, "lsn")
        apply_batch(replica, feed, epoch=epoch, cfg=cfg)

    key = ["conv_id", "turn_idx"]
    p = primary.read_internal().orderBy(key).toPandas()
    r = replica.read_internal().orderBy(key).toPandas()
    assert len(p) == len(r) > 0
    import pandas as pd

    pd.testing.assert_frame_equal(
        p.reset_index(drop=True), r.reset_index(drop=True), check_dtype=False
    )


# ---------------------------------------------------------------------------
# scd2_history
# ---------------------------------------------------------------------------


_SCD_SCHEMA = (
    "lsn long, conv_id string, turn_idx int, op string, "
    "role string, text string, tool string, ts timestamp"
)


def _scd_row(lsn, conv, turn, op, text=None):
    return Row(
        lsn=lsn, conv_id=conv, turn_idx=turn, op=op,
        role=None if op == "D" else "user", text=text, tool=None,
        ts=_ts(0, lsn % 60),
    )


def test_scd2_versions_and_end_reasons(spark):
    from aqueduct_core_spark.operators.temporal import scd2_history

    rows = [
        _scd_row(1, "c1", 0, "I", "v1"),   # closed by update @3
        _scd_row(3, "c1", 0, "U", "v2"),   # closed by turn delete @5
        _scd_row(5, "c1", 0, "D"),         # tombstone: no version
        _scd_row(7, "c1", 0, "I", "v3"),   # reopened; still current
        _scd_row(2, "c2", 1, "I", "w1"),   # closed by conv tombstone @4
        _scd_row(4, "c2", None, "D"),      # conv-level tombstone
        _scd_row(6, "c2", 1, "U", "w2"),   # after the tombstone; current
    ]
    out = scd2_history(spark.createDataFrame(rows, _SCD_SCHEMA)).orderBy(
        "conv_id", "turn_idx", "valid_from_lsn"
    )
    got = [
        (r.conv_id, r.turn_idx, r.valid_from_lsn, r.valid_to_lsn,
         r.end_reason, r.is_current, r.text)
        for r in out.collect()
    ]
    assert got == [
        ("c1", 0, 1, 3, "update", False, "v1"),
        ("c1", 0, 3, 5, "delete", False, "v2"),
        ("c1", 0, 7, None, None, True, "v3"),
        ("c2", 1, 2, 4, "conv_delete", False, "w1"),
        ("c2", 1, 6, None, None, True, "w2"),
    ]


def test_scd2_conv_tombstone_closes_only_at_or_after(spark):
    """A conv tombstone BELOW a version's valid_from must not close it
    (at-or-below kills history, not the future)."""
    from aqueduct_core_spark.operators.temporal import scd2_history

    rows = [
        _scd_row(2, "c1", None, "D"),      # tombstone before any version
        _scd_row(5, "c1", 0, "I", "x"),
    ]
    out = scd2_history(spark.createDataFrame(rows, _SCD_SCHEMA)).collect()
    assert len(out) == 1
    r = out[0]
    assert (r.valid_from_lsn, r.valid_to_lsn, r.is_current) == (5, None, True)


def test_scd2_current_rows_match_lww_state(spark):
    """Invariant: the is_current slice of the SCD2 history == the LWW
    merged state (alive winners), on a generated log."""
    from aqueduct_core_spark.generator import generate_changes
    from aqueduct_core_spark.operators import lww
    from aqueduct_core_spark.operators.temporal import scd2_history
    from aqueduct_core_spark.schema import LSN_COLUMN, OP_DELETE

    log = generate_changes(spark, n_convs=40, seed=11)
    cur = (
        scd2_history(log)
        .where(F.col("is_current"))
        .select("conv_id", "turn_idx", "text", F.col("valid_from_lsn").alias("lsn"))
    )
    winners, _ = lww.resolve_batch(log, ["role", "text", "tool", "ts"])
    alive = winners.where(F.col("op") != OP_DELETE).select(
        "conv_id", "turn_idx", "text", F.col(LSN_COLUMN).alias("lsn")
    )
    assert cur.exceptAll(alive).count() == 0
    assert alive.exceptAll(cur).count() == 0


def test_state_at_lsn_matches_prefix_state(spark):
    """state_at_lsn(full log, L) == LWW state of the prefix <= L — even
    though versions open at L may be closed by events after L."""
    from aqueduct_core_spark.generator import generate_changes
    from aqueduct_core_spark.operators import lww
    from aqueduct_core_spark.operators.temporal import state_at_lsn
    from aqueduct_core_spark.schema import LSN_COLUMN, OP_DELETE

    log = generate_changes(spark, n_convs=30, seed=13)
    cut = int(log.agg(F.expr("percentile_approx(lsn, 0.6)")).collect()[0][0])

    got = state_at_lsn(log, cut).select("conv_id", "turn_idx", "text", "lsn")
    winners, _ = lww.resolve_batch(
        log.where(F.col("lsn") <= cut), ["role", "text", "tool", "ts"]
    )
    exp = winners.where(F.col("op") != OP_DELETE).select(
        "conv_id", "turn_idx", "text", F.col(LSN_COLUMN).alias("lsn")
    )
    assert got.exceptAll(exp).count() == 0
    assert exp.exceptAll(got).count() == 0


# ---------------------------------------------------------------------------
# token_budget_mix
# ---------------------------------------------------------------------------

def test_token_budget_mix_respects_budgets(spark):
    from aqueduct_core_spark.functions.sampling import token_budget_mix

    rows = [(f"d{i:03d}", "en" if i % 2 == 0 else "fr", 10) for i in range(200)]
    df = spark.createDataFrame(rows, "doc_id string, lang string, n_tokens int")
    kept, cuts = token_budget_mix(
        df, {"en": 300, "fr": 10_000}, stratum_col="lang", token_col="n_tokens"
    )
    agg = {r.lang: r.tok for r in
           kept.groupBy("lang").agg(__import__("pyspark.sql.functions",
               fromlist=["sum"]).sum("n_tokens").alias("tok")).collect()}
    # en capped at <= 300 tokens; fr budget exceeds the corpus -> all kept
    assert agg.get("en", 0) <= 300
    assert agg["fr"] == 100 * 10
    assert cuts["fr"] == 100  # every bucket admitted


def test_token_budget_mix_drops_unlisted_strata_and_is_stable(spark):
    from aqueduct_core_spark.functions.sampling import token_budget_mix

    rows = [(f"d{i:03d}", ["en", "fr", "de"][i % 3], 5) for i in range(90)]
    df = spark.createDataFrame(rows, "doc_id string, lang string, n_tokens int")
    kept, _ = token_budget_mix(
        df, {"en": 50}, stratum_col="lang", token_col="n_tokens"
    )
    assert kept.where("lang != 'en'").count() == 0
    # reshard-stable: same kept set at different parallelism
    kept2, _ = token_budget_mix(
        df.repartition(7), {"en": 50}, stratum_col="lang", token_col="n_tokens"
    )
    assert (sorted(r.doc_id for r in kept.collect())
            == sorted(r.doc_id for r in kept2.collect()))


def test_token_budget_mix_greedy_prefix_cut(spark):
    from aqueduct_core_spark.functions.sampling import (
        SAMPLE_BUCKETS, sample_bucket, token_budget_mix,
    )
    from pyspark.sql import functions as F

    rows = [(f"k{i}", "en", 7) for i in range(300)]
    df = spark.createDataFrame(rows, "doc_id string, lang string, n_tokens int")
    kept, cuts = token_budget_mix(
        df, {"en": 500}, stratum_col="lang", token_col="n_tokens"
    )
    cut = cuts["en"]
    # cumulative tokens of buckets < cut fit the budget; adding the
    # next nonempty bucket would overflow it
    per_bucket = {
        r.b: r.t for r in df.select(
            sample_bucket(F.col("doc_id")).cast("int").alias("b"), "n_tokens"
        ).groupBy("b").agg(F.sum("n_tokens").alias("t")).collect()
    }
    under = sum(t for b, t in per_bucket.items() if b < cut)
    assert under <= 500
    nxt = next((per_bucket[b] for b in range(cut, SAMPLE_BUCKETS)
                if per_bucket.get(b)), None)
    if nxt is not None:
        assert under + nxt > 500
    assert kept.count() * 7 == under


def test_asof_join_null_payload_field_is_not_backfilled(spark):
    """Row semantics: the left row gets the LATEST right row's payload
    verbatim — a null field on that row must stay null, not resurrect
    the previous right row's value (per-column ignorenulls fills would
    stitch a row that never existed; `tool` is null on most rows of
    this engine's schema, so stale-value resurrection would be
    routine)."""
    right = spark.createDataFrame(
        [("c1", 1, "user", "calc"), ("c1", 2, "asst", None)],
        "conv_id string, lsn long, role string, tool string",
    )
    left = spark.createDataFrame([("c1", 3)], "conv_id string, lsn long")
    out = asof_join_log(
        left, right, keys=["conv_id"], ord_col="lsn",
        right_payload=["role", "tool"],
    ).collect()
    assert len(out) == 1
    row = out[0]
    assert row["role_asof"] == "asst"
    assert row["tool_asof"] is None  # NOT "calc"
