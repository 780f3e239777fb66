"""Multi-source ingestion: several independent change logs (own LSN
sequences, disjoint conversation key spaces) feeding ONE table, each
resuming from its own committed watermark."""

from pyspark.sql import functions as F
from pyspark.sql.window import Window

from aqueduct_core_spark.catalog.table import ParquetTranscriptTable
from aqueduct_core_spark.config import EngineConfig
from aqueduct_core_spark.generator import generate_changes
from aqueduct_core_spark.streaming.pipeline import (
    replay,
    replay_multi_source,
    resume_lsn_for_source,
)
from aqueduct_core_spark.verify import states_equal


def _two_logs(spark):
    """Split one generated log into two sources with DISJOINT key
    spaces; source B gets its own independent lsn sequence starting at
    0 so the two sequences overlap numerically — the case
    single-watermark resume cannot handle.  B's lsns are strided so
    they span multiple 2^14-lsn planning blocks (a block is the
    planner's atomic trigger unit)."""
    log = generate_changes(spark, n_convs=60, seed=44)
    is_b = F.abs(F.hash("conv_id")) % 2 == 1
    a = log.where(~is_b)
    b = log.where(is_b).withColumn(
        "lsn",
        (F.row_number().over(Window.orderBy("lsn")).cast("long") - 1) * 4096,
    )
    return a.cache(), b.cache()


def test_multi_source_converges_and_resumes(spark, tmp_path):
    cfg = EngineConfig(num_buckets=4, mor_fold_every=10**9,
                       max_events_per_trigger=150)
    a, b = _two_logs(spark)

    # truth: one table fed the union (LWW only compares within a key,
    # and keys are disjoint across sources, so the union replay is a
    # valid reference even with colliding lsn values)
    truth = ParquetTranscriptTable.create(spark, str(tmp_path / "truth"), num_buckets=4)
    replay(truth, a.unionByName(b), cfg, start_epoch=0, start_lsn=0)

    t = ParquetTranscriptTable.create(spark, str(tmp_path / "t"), num_buckets=4)
    out = replay_multi_source(t, {"a": a, "b": b}, cfg)
    assert len(out["a"]) > 1 and len(out["b"]) > 1  # multiple epochs each
    assert states_equal(t.read_internal(), truth.read_internal())

    # per-source watermarks landed atomically with the commits
    amax = int(a.agg(F.max("lsn")).collect()[0][0])
    bmax = int(b.agg(F.max("lsn")).collect()[0][0])
    assert resume_lsn_for_source(t, "a") == amax + 1
    assert resume_lsn_for_source(t, "b") == bmax + 1

    # drain again: both sources fully consumed -> zero new epochs
    v = t.catalog.current_version()
    out2 = replay_multi_source(t, {"a": a, "b": b}, cfg)
    assert out2["a"] == [] and out2["b"] == []
    assert t.catalog.current_version() == v
    assert states_equal(t.read_internal(), truth.read_internal())
    a.unpersist(); b.unpersist()


def test_multi_source_partial_crash_resume(spark, tmp_path):
    """Crash between sources: A drained, B not — the rerun skips A
    entirely and picks B up from zero."""
    cfg = EngineConfig(num_buckets=4, mor_fold_every=10**9,
                       max_events_per_trigger=1000)
    a, b = _two_logs(spark)

    t = ParquetTranscriptTable.create(spark, str(tmp_path / "t"), num_buckets=4)
    replay_multi_source(t, {"a": a}, cfg)  # "crash" before b
    out = replay_multi_source(t, {"a": a, "b": b}, cfg)
    assert out["a"] == []
    assert len(out["b"]) >= 1

    truth = ParquetTranscriptTable.create(spark, str(tmp_path / "truth"), num_buckets=4)
    replay(truth, a.unionByName(b), cfg, start_epoch=0, start_lsn=0)
    assert states_equal(t.read_internal(), truth.read_internal())
    a.unpersist(); b.unpersist()
