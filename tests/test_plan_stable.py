"""Plan-stable replay epoch filters (scaling-median fix).

Each replay epoch's lsn-range slice must NOT embed per-epoch literals
in whole-stage-codegen source (the serial Janino recompile measured in
BENCH.md); it rides in a broadcast 1-row bounds relation instead, with
file-level scan pruning restored via a driver-side footer index.
"""

import pytest
from pyspark.sql import functions as F

from aqueduct_core_spark.catalog.table import ParquetTranscriptTable
from aqueduct_core_spark.config import EngineConfig
from aqueduct_core_spark.generator import generate_changes_pdf, expected_state_pdf
from aqueduct_core_spark.schema import CHANGES_SCHEMA
from aqueduct_core_spark.streaming.pipeline import (
    _epoch_batch,
    _lsn_file_index,
    replay,
)


@pytest.fixture(scope="module")
def log_dir(spark, tmp_path_factory):
    d = str(tmp_path_factory.mktemp("plan-stable") / "changes")
    pdf = generate_changes_pdf(n_convs=120, seed=7)
    spark.createDataFrame(pdf, schema=CHANGES_SCHEMA).repartition(6).write.parquet(d)
    return d


def test_epoch_batch_matches_literal_filter(spark, log_dir):
    log = spark.read.schema(CHANGES_SCHEMA).parquet(log_dir)
    b = log.agg(F.min("lsn").alias("lo"), F.max("lsn").alias("hi")).collect()[0]
    lo, hi = int(b["lo"]), int(b["hi"])
    mid1, mid2 = lo + (hi - lo) // 3, lo + 2 * (hi - lo) // 3
    idx = _lsn_file_index(log)
    assert idx is not None and len(idx) > 0
    for s, e in [(lo, mid1), (mid1 + 1, mid2), (mid2 + 1, hi), (hi + 10, hi + 20)]:
        expect = log.where((F.col("lsn") >= s) & (F.col("lsn") <= e)).count()
        got = _epoch_batch(log, s, e, idx).count()
        got_noidx = _epoch_batch(log, s, e, None).count()
        assert got == expect == got_noidx


def test_file_index_refuses_non_leaf_plans(spark, log_dir):
    """A transformed DataFrame must NOT be bypassed by raw file reads —
    the index is only valid for a bare scan."""
    log = spark.read.schema(CHANGES_SCHEMA).parquet(log_dir)
    assert _lsn_file_index(log.where(F.col("op") == "I")) is None
    assert _lsn_file_index(log.select("lsn", "op")) is None
    local = spark.createDataFrame([(1,)], "lsn bigint")
    assert _lsn_file_index(local) is None  # no input files


def test_file_index_prunes_scan(spark, log_dir):
    """An epoch touching one file's lsn range must read only the
    intersecting files (the pushdown-pruning replacement)."""
    log = spark.read.schema(CHANGES_SCHEMA).parquet(log_dir)
    idx = _lsn_file_index(log)
    path0, lo0, hi0 = sorted(idx, key=lambda t: t[1])[0][:3]
    batch = _epoch_batch(log, lo0, hi0, idx)
    touched = {f.replace("file:", "") for f in batch.inputFiles()}
    assert path0 in touched
    # only files overlapping [lo0, hi0] may be read
    for p, flo, fhi, _rows, _bytes in idx:
        if fhi < lo0 or flo > hi0:
            assert p not in touched


def test_epoch_plans_are_literal_free(spark, log_dir):
    """Two epochs with different ranges must produce identical codegen:
    no range literal may appear in the executed plan."""
    log = spark.read.schema(CHANGES_SCHEMA).parquet(log_dir)
    idx = _lsn_file_index(log)
    lo = min(t[1] for t in idx)
    hi = max(t[2] for t in idx)
    s1, e1 = lo + 1000, lo + 999_999
    s2, e2 = hi - 999_999, hi - 1000
    p1 = _epoch_batch(log, s1, e1, idx)._jdf.queryExecution().executedPlan().toString()
    p2 = _epoch_batch(log, s2, e2, idx)._jdf.queryExecution().executedPlan().toString()
    for plan, bounds in ((p1, (s1, e1)), (p2, (s2, e2))):
        for v in bounds:
            assert str(v) not in plan, f"literal {v} leaked into the epoch plan"


def test_replay_state_identical_both_modes(spark, log_dir, tmp_path):
    """End-to-end: plan-stable replay and literal-filter replay produce
    the same final table state as the pandas oracle."""
    log = spark.read.schema(CHANGES_SCHEMA).parquet(log_dir)
    pdf = log.toPandas()
    expected = expected_state_pdf(pdf)

    for stable in (True, False):
        cfg = EngineConfig(
            num_buckets=4,
            max_events_per_trigger=600,
            max_bytes_per_trigger=1 << 30,
            plan_stable_filters=stable,
        )
        t = ParquetTranscriptTable.create(
            spark, str(tmp_path / f"t-{stable}"), num_buckets=4
        )
        metrics = replay(t, log, cfg, start_epoch=0, start_lsn=0)
        assert len(metrics) > 3  # genuinely multi-epoch
        got = (
            t.read_internal()
            .orderBy("conv_id", "turn_idx")
            .toPandas()
            .reset_index(drop=True)
        )
        assert len(got) == len(expected)
        assert (got["text"].fillna("") == expected["text"].fillna("")).all()
        assert (got["_lsn"] == expected["_lsn"]).all()


def test_plan_triggers_from_files_unit():
    """Pure-driver manifest planning: budget packing, window clipping,
    overlap and missing-stats fallbacks."""
    from aqueduct_core_spark.operators.batching import plan_triggers_from_files

    idx = [
        ("a", 0, 99, 100, 1000),
        ("b", 100, 199, 100, 1000),
        ("c", 200, 299, 100, 1000),
        ("d", 300, 399, 50, 500),
    ]
    # row budget 200 → files pack pairwise
    r = plan_triggers_from_files(idx, max_events=200, max_bytes=1 << 30)
    assert [(t.start_lsn, t.end_lsn, t.events) for t in r] == [
        (0, 199, 200), (200, 399, 150)]
    # byte budget dominates: a | b | c+d (1000+500 fits 1500 exactly)
    r = plan_triggers_from_files(idx, max_events=10**9, max_bytes=1500)
    assert [(t.start_lsn, t.end_lsn) for t in r] == [
        (0, 99), (100, 199), (200, 399)]
    # window clipping drops non-intersecting files and clamps bounds
    r = plan_triggers_from_files(idx, 10**9, 1 << 30, start_lsn=150, end_lsn=250)
    assert len(r) == 1 and r[0].start_lsn == 150 and r[0].end_lsn == 250
    # overlapping lsn ranges → None (scan-planner fallback)
    assert plan_triggers_from_files(
        [("a", 0, 150, 10, 10), ("b", 100, 300, 10, 10)], 10, 10) is None
    # stats-less file → None
    assert plan_triggers_from_files(
        [("a", 0, 99, None, None)], 10, 10) is None
    # fully-replayed window → []
    assert plan_triggers_from_files(idx, 10, 10, start_lsn=1000) == []


def test_replay_manifest_planned(spark, tmp_path):
    """A log written in lsn order (disjoint per-file ranges) replays
    through the manifest planner — epochs align to file groups, zero
    planner Spark jobs — and the final state matches the oracle."""
    from aqueduct_core_spark.operators.batching import plan_triggers_from_files

    d = str(tmp_path / "sorted-log")
    pdf = generate_changes_pdf(n_convs=120, seed=7).sort_values("lsn")
    n = len(pdf)
    cuts = [0, n // 4, n // 2, 3 * n // 4, n]
    for i, (a, b) in enumerate(zip(cuts, cuts[1:])):
        spark.createDataFrame(pdf.iloc[a:b], schema=CHANGES_SCHEMA).coalesce(
            1
        ).write.parquet(d, mode="append")
    log = spark.read.schema(CHANGES_SCHEMA).parquet(d)
    idx = _lsn_file_index(log)
    assert idx is not None and all(t[3] is not None for t in idx)
    # disjoint files → the manifest plan exists and is file-aligned
    plan = plan_triggers_from_files(
        idx, max_events=n // 4 + 1, max_bytes=1 << 40, start_lsn=0)
    assert plan is not None and len(plan) == 4

    t = ParquetTranscriptTable.create(spark, str(tmp_path / "t"), num_buckets=4)
    cfg = EngineConfig(
        num_buckets=4, max_events_per_trigger=n // 4 + 1,
        max_bytes_per_trigger=1 << 40,
    )
    metrics = replay(t, log, cfg, start_epoch=0, start_lsn=0)
    assert len(metrics) == 4  # one epoch per file: manifest-aligned
    expected = expected_state_pdf(pdf)
    got = t.read_internal().orderBy("conv_id", "turn_idx").toPandas()
    assert len(got) == len(expected)
    assert (got["_lsn"].to_numpy() == expected["_lsn"].to_numpy()).all()


def test_replay_window_end_lsn(spark, log_dir, tmp_path):
    """end_lsn bounds the replay window (warmup/backfill use case)."""
    log = spark.read.schema(CHANGES_SCHEMA).parquet(log_dir)
    b = log.agg(F.min("lsn").alias("lo"), F.max("lsn").alias("hi")).collect()[0]
    split = int(b["lo"]) + (int(b["hi"]) - int(b["lo"])) // 2
    t = ParquetTranscriptTable.create(spark, str(tmp_path / "t"), num_buckets=4)
    cfg = EngineConfig(num_buckets=4)
    replay(t, log, cfg, start_epoch=0, start_lsn=0, end_lsn=split)
    assert t.last_committed_lsn() <= split
    # resume covers the rest; final state matches the full-log oracle
    replay(t, log, cfg)
    expected = expected_state_pdf(log.toPandas())
    got = t.read_internal().orderBy("conv_id", "turn_idx").toPandas()
    assert len(got) == len(expected)
    assert (got["_lsn"].to_numpy() == expected["_lsn"].to_numpy()).all()
