"""Training-example extraction: SFT (context, target) pairs from the
merged state and (rejected, chosen) preference pairs from the CDC
update history (functions/examples.py)."""

import datetime as dt

from pyspark.sql import functions as F

from aqueduct_core_spark.functions.examples import preference_pairs, sft_examples

TS = dt.datetime(2026, 1, 1, 10, 0)

STATE_SCHEMA = "conv_id string, turn_idx int, role string, text string"
LOG_SCHEMA = (
    "lsn long, op string, conv_id string, turn_idx int, "
    "role string, text string, tool string, ts timestamp"
)


# ---------------------------------------------------------------------------
# sft_examples
# ---------------------------------------------------------------------------

def test_sft_examples_context_prefix(spark):
    state = spark.createDataFrame(
        [
            ("c1", 0, "user", "hi"),
            ("c1", 1, "assistant", "hello"),
            ("c1", 2, "user", "how?"),
            ("c1", 3, "assistant", "like this"),
            ("c2", 0, "assistant", "orphan"),  # no context -> dropped
        ],
        STATE_SCHEMA,
    )
    got = {
        (r.conv_id, r.turn_idx): (r.n_context_turns, r.context, r.target)
        for r in sft_examples(state, target_role="assistant").collect()
    }
    assert got == {
        ("c1", 1): (1, "user: hi", "hello"),
        ("c1", 3): (3, "user: hi\nassistant: hello\nuser: how?", "like this"),
    }


def test_sft_examples_min_context_and_sep(spark):
    state = spark.createDataFrame(
        [("c1", 0, "user", "a"), ("c1", 1, "assistant", "b"),
         ("c1", 2, "user", "c"), ("c1", 3, "assistant", "d")],
        STATE_SCHEMA,
    )
    out = sft_examples(state, target_role="assistant", sep=" | ",
                       min_context_turns=2).collect()
    assert len(out) == 1
    assert out[0].context == "user: a | assistant: b | user: c"
    assert out[0].target == "d"


def test_sft_examples_unordered_input_renders_in_turn_order(spark):
    state = spark.createDataFrame(
        [("c1", 2, "assistant", "late"), ("c1", 0, "user", "first"),
         ("c1", 1, "user", "second")],
        STATE_SCHEMA,
    ).repartition(3)
    out = sft_examples(state, target_role="assistant").collect()
    assert out[0].context == "user: first\nuser: second"


# ---------------------------------------------------------------------------
# preference_pairs
# ---------------------------------------------------------------------------

def _log(spark, rows):
    return spark.createDataFrame(rows, LOG_SCHEMA)


def test_preference_pairs_superseded_versions(spark):
    log = _log(spark, [
        (1, "I", "c1", 0, "assistant", "v1", None, TS),
        (2, "U", "c1", 0, "assistant", "v2", None, TS),
        (3, "U", "c1", 0, "assistant", "v3", None, TS),
        (4, "I", "c1", 1, "user", "only-version", None, TS),
    ])
    got = sorted(
        (r.rejected_lsn, r.rejected_text, r.chosen_lsn, r.chosen_text, r.n_versions)
        for r in preference_pairs(log).collect()
    )
    # both superseded versions pair with the FINAL text, not the next one
    assert got == [(1, "v1", 3, "v3", 3), (2, "v2", 3, "v3", 3)]


def test_preference_pairs_skip_deleted_keys(spark):
    log = _log(spark, [
        # key overwritten then turn-deleted: latest version not current
        (1, "I", "c1", 0, "assistant", "a1", None, TS),
        (2, "U", "c1", 0, "assistant", "a2", None, TS),
        (3, "D", "c1", 0, None, None, None, TS),
        # version ended by delete (not update) never becomes "rejected"
        (4, "I", "c1", 1, "assistant", "b1", None, TS),
        (5, "D", "c1", 1, None, None, None, TS),
        (6, "I", "c1", 1, "assistant", "b2", None, TS),
    ])
    got = preference_pairs(log).collect()
    assert got == []  # no 'update'-closed version under a current latest


def test_preference_pairs_conv_tombstone_kills_pairs(spark):
    log = _log(spark, [
        (1, "I", "c1", 0, "assistant", "v1", None, TS),
        (2, "U", "c1", 0, "assistant", "v2", None, TS),
        (3, "D", "c1", None, None, None, None, TS),  # conversation delete
        (10, "I", "c2", 0, "assistant", "w1", None, TS),
        (11, "U", "c2", 0, "assistant", "w2", None, TS),
    ])
    got = [(r.conv_id, r.rejected_text, r.chosen_text)
           for r in preference_pairs(log).collect()]
    assert got == [("c2", "w1", "w2")]


def test_preference_pairs_role_columns(spark):
    log = _log(spark, [
        (1, "I", "c1", 0, "user", "draft", None, TS),
        (2, "U", "c1", 0, "assistant", "final", "search", TS),
    ])
    r = preference_pairs(log).collect()[0]
    assert (r.rejected_role, r.chosen_role) == ("user", "assistant")
    # pairs are plan-only until an action: no UDF, single window lineage
    assert "pythonUDF" not in preference_pairs(log)._jdf.queryExecution().toString()


# ---------------------------------------------------------------------------
# PreferencePairsView (incremental materialized view over Scd2History)
# ---------------------------------------------------------------------------

def _pp_norm(df):
    return df.select(
        "conv_id", "turn_idx", "rejected_lsn", "rejected_text",
        "chosen_lsn", "chosen_text", "n_versions",
    )


def _pp_same(a, b):
    assert _pp_norm(a).exceptAll(_pp_norm(b)).count() == 0
    assert _pp_norm(b).exceptAll(_pp_norm(a)).count() == 0


def test_pairs_view_segmented_equals_batch(spark, tmp_path):
    from aqueduct_core_spark.functions.examples import (
        PreferencePairsView, preference_pairs,
    )
    from aqueduct_core_spark.generator import generate_changes
    from aqueduct_core_spark.operators.scd2 import Scd2History

    log = generate_changes(spark, n_convs=40, seed=5)
    mx = int(log.agg(F.max("lsn")).collect()[0][0])
    cuts = [0, mx // 3, (2 * mx) // 3, mx + 1]

    h = Scd2History.create(spark, str(tmp_path / "h"), num_buckets=8)
    v = PreferencePairsView.create(spark, str(tmp_path / "v"))
    for i in range(len(cuts) - 1):
        seg = log.where((F.col("lsn") >= cuts[i]) & (F.col("lsn") < cuts[i + 1]))
        h.apply(seg, epoch=i)
        m = v.refresh(h)
        assert m["mode"] == "refreshed"
        # mid-log the view must equal the batch pairs over the prefix
        prefix = log.where(F.col("lsn") < cuts[i + 1])
        _pp_same(v.read(), preference_pairs(prefix))

    _pp_same(v.read(), preference_pairs(log))
    assert preference_pairs(log).count() > 0  # the gate is non-vacuous


def test_pairs_view_refresh_noops_when_history_unchanged(spark, tmp_path):
    from aqueduct_core_spark.functions.examples import PreferencePairsView
    from aqueduct_core_spark.generator import generate_changes
    from aqueduct_core_spark.operators.scd2 import Scd2History

    log = generate_changes(spark, n_convs=10, seed=6)
    h = Scd2History.create(spark, str(tmp_path / "h"), num_buckets=4)
    v = PreferencePairsView.create(spark, str(tmp_path / "v"))
    h.apply(log, epoch=0)
    assert v.refresh(h)["mode"] == "refreshed"
    assert v.refresh(h)["mode"] == "noop"
    # re-delivered sink epoch -> no bucket rewrites -> still a no-op
    h.apply(log, epoch=0)
    assert v.refresh(h)["mode"] == "noop"


def test_pairs_view_skipped_refresh_still_converges(spark, tmp_path):
    """Refreshing only at the END of several epochs converges to the
    same table — the mapping diff accumulates dirtiness."""
    from aqueduct_core_spark.functions.examples import (
        PreferencePairsView, preference_pairs,
    )
    from aqueduct_core_spark.generator import generate_changes
    from aqueduct_core_spark.operators.scd2 import Scd2History

    log = generate_changes(spark, n_convs=30, seed=7)
    mx = int(log.agg(F.max("lsn")).collect()[0][0])
    h = Scd2History.create(spark, str(tmp_path / "h"), num_buckets=8)
    v = PreferencePairsView.create(spark, str(tmp_path / "v"))
    h.apply(log.where(F.col("lsn") <= mx // 2), epoch=0)
    h.apply(log.where(F.col("lsn") > mx // 2), epoch=1)  # no refresh between
    v.refresh(h)
    _pp_same(v.read(), preference_pairs(log))


def test_pairs_view_crash_debris_overwritten(spark, tmp_path):
    """A crash between the pair write and the meta swap leaves a dir at
    the deterministic name; the re-refresh overwrites it."""
    import os

    from aqueduct_core_spark.functions.examples import (
        PreferencePairsView, preference_pairs,
    )
    from aqueduct_core_spark.generator import generate_changes
    from aqueduct_core_spark.operators.scd2 import Scd2History

    log = generate_changes(spark, n_convs=10, seed=8)
    h = Scd2History.create(spark, str(tmp_path / "h"), num_buckets=4)
    v = PreferencePairsView.create(spark, str(tmp_path / "v"))
    h.apply(log, epoch=0)
    # simulate the crash: debris at the dir the next refresh will use
    debris = os.path.join(str(tmp_path / "v"), f"data-he{h.last_epoch()}")
    os.makedirs(os.path.join(debris, "_pbucket=0"), exist_ok=True)
    with open(os.path.join(debris, "garbage"), "w") as f:
        f.write("crash leftovers")
    v.refresh(h)
    _pp_same(v.read(), preference_pairs(log))


def test_pairs_view_rides_streaming_loop(spark, tmp_path):
    """start_stream(history=..., history_views=[view]) keeps the pair
    dataset fresh per micro-batch; a re-delivered run (fresh checkpoint)
    no-ops both sidecars."""
    from aqueduct_core_spark.catalog.table import ParquetTranscriptTable
    from aqueduct_core_spark.config import EngineConfig
    from aqueduct_core_spark.functions.examples import (
        PreferencePairsView, preference_pairs,
    )
    from aqueduct_core_spark.generator import generate_changes
    from aqueduct_core_spark.operators.scd2 import Scd2History
    from aqueduct_core_spark.streaming.pipeline import run_available_now

    log = generate_changes(spark, n_convs=30, seed=9)
    # lsn-ordered files (the binlog-tail contract the history requires)
    mx = int(log.agg(F.max("lsn")).collect()[0][0])
    for i, (lo, hi) in enumerate([(0, mx // 2), (mx // 2, mx + 1)]):
        (log.where((F.col("lsn") >= lo) & (F.col("lsn") < hi))
            .coalesce(1).write.parquet(str(tmp_path / "changes" / f"seg-{i}")))
    src = str(tmp_path / "changes" / "seg-*")

    table = ParquetTranscriptTable.create(spark, str(tmp_path / "t"), num_buckets=4)
    h = Scd2History.create(spark, str(tmp_path / "h"), num_buckets=4)
    v = PreferencePairsView.create(spark, str(tmp_path / "v"))
    cfg = EngineConfig(num_buckets=4)
    run_available_now(
        spark, table, src, str(tmp_path / "ck"), cfg,
        max_files_per_trigger=1, history=h, history_views=[v],
    )
    _pp_same(v.read(), preference_pairs(log))

    # re-delivery with a fresh checkpoint: everything no-ops
    e0, p0 = h.last_epoch(), v._meta()["epoch"]
    run_available_now(
        spark, table, src, str(tmp_path / "ck2"), cfg,
        max_files_per_trigger=1, history=h, history_views=[v],
    )
    assert (h.last_epoch(), v._meta()["epoch"]) == (e0, p0)
    _pp_same(v.read(), preference_pairs(log))


# ---------------------------------------------------------------------------
# sft_examples_view (incremental ConvView instance)
# ---------------------------------------------------------------------------

def test_sft_view_incremental_equals_batch(spark, tmp_path):
    from aqueduct_core_spark.catalog.table import ParquetTranscriptTable
    from aqueduct_core_spark.config import EngineConfig
    from aqueduct_core_spark.functions.examples import (
        sft_examples, sft_examples_view,
    )
    from aqueduct_core_spark.generator import generate_changes
    from aqueduct_core_spark.operators.merge import apply_batch

    log = generate_changes(spark, n_convs=25, seed=13)
    role = log.where(F.col("role").isNotNull()).select("role").first()[0]
    mx = int(log.agg(F.max("lsn")).collect()[0][0])

    cfg = EngineConfig(num_buckets=4, mor_fold_every=10**9)
    table = ParquetTranscriptTable.create(spark, str(tmp_path / "t"), num_buckets=4)
    view = sft_examples_view(spark, str(tmp_path / "sft"), target_role=role,
                             num_buckets=4)
    for i, (lo, hi) in enumerate([(0, mx // 2), (mx // 2, mx + 1)]):
        apply_batch(table, log.where((F.col("lsn") >= lo) & (F.col("lsn") < hi)),
                    epoch=i, cfg=cfg)
        m = view.refresh(table)
        assert m["mode"] in ("incremental", "full")
        state = table.read().select("conv_id", "turn_idx", "role", "text")
        a, b = view.read(), sft_examples(state, target_role=role)
        assert a.exceptAll(b).count() == 0 and b.exceptAll(a).count() == 0
    assert view.refresh(table)["mode"] == "noop"


def test_sft_view_rides_streaming_maintainers(spark, tmp_path):
    from aqueduct_core_spark.catalog.table import ParquetTranscriptTable
    from aqueduct_core_spark.config import EngineConfig
    from aqueduct_core_spark.functions.examples import (
        sft_examples, sft_examples_view,
    )
    from aqueduct_core_spark.generator import generate_changes
    from aqueduct_core_spark.streaming.pipeline import run_available_now

    log = generate_changes(spark, n_convs=20, seed=14)
    role = log.where(F.col("role").isNotNull()).select("role").first()[0]
    log.coalesce(2).write.parquet(str(tmp_path / "changes"))

    cfg = EngineConfig(num_buckets=4)
    table = ParquetTranscriptTable.create(spark, str(tmp_path / "t"), num_buckets=4)
    view = sft_examples_view(spark, str(tmp_path / "sft"), target_role=role,
                             num_buckets=4)
    run_available_now(spark, table, str(tmp_path / "changes"),
                      str(tmp_path / "ck"), cfg,
                      max_files_per_trigger=1, maintainers=[view])
    state = table.read().select("conv_id", "turn_idx", "role", "text")
    a, b = view.read(), sft_examples(state, target_role=role)
    assert a.exceptAll(b).count() == 0 and b.exceptAll(a).count() == 0


def test_pairs_view_survives_history_erase_at_same_epoch(spark, tmp_path):
    """A history erase/redact/prune rewrites bucket generations WITHOUT
    advancing the epoch; the follow-up view refresh must not
    overwrite-destroy the previous refresh's generation dir while other
    buckets' mappings still reference it (the epoch-named-dir bug:
    untouched buckets' pairs silently vanished from read())."""
    from aqueduct_core_spark.functions.examples import (
        PreferencePairsView, preference_pairs,
    )
    from aqueduct_core_spark.generator import generate_changes
    from aqueduct_core_spark.operators.scd2 import Scd2History

    log = generate_changes(spark, n_convs=40, seed=5)
    h = Scd2History.create(spark, str(tmp_path / "h"), num_buckets=8)
    v = PreferencePairsView.create(spark, str(tmp_path / "v"))
    h.apply(log, epoch=0)
    v.refresh(h)
    pairs_before = v.read()
    assert pairs_before.count() > 0

    # erase ONE conversation that has pairs: only its bucket is rewritten
    victim = pairs_before.select("conv_id").orderBy("conv_id").first()[0]
    h.erase([victim])
    m = v.refresh(h)
    assert m["mode"] == "refreshed"

    # survivors: exactly the batch pairs over the erased history
    expected = preference_pairs(log.where(F.col("conv_id") != victim))
    _pp_same(v.read(), expected)
    assert v.read().where(F.col("conv_id") == victim).count() == 0
    # and expire() reclaims superseded generations without touching live
    v.expire()
    _pp_same(v.read(), expected)
