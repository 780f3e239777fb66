"""Bucket-count evolution: rewrite into a new hash-bucket layout in one
atomic commit; ingest resumes, point lookups follow the new count."""

from pyspark.sql import functions as F

from aqueduct_core_spark.catalog.table import ParquetTranscriptTable, bucket_of
from aqueduct_core_spark.config import EngineConfig
from aqueduct_core_spark.generator import generate_changes
from aqueduct_core_spark.operators.compact import rebucket
from aqueduct_core_spark.streaming.pipeline import replay
from aqueduct_core_spark.verify import states_equal


def test_rebucket_preserves_state_and_resumes_ingest(spark, tmp_path):
    cfg = EngineConfig(num_buckets=4, max_events_per_trigger=10**9,
                       mor_fold_every=10**9)
    log = generate_changes(spark, n_convs=50, seed=46).cache()
    mid = int(log.agg(F.expr("percentile_approx(lsn, 0.5)")).collect()[0][0])

    t = ParquetTranscriptTable.create(spark, str(tmp_path / "t"), num_buckets=4)
    replay(t, log, cfg, end_lsn=mid)
    pre = t.read_internal()

    m = rebucket(t, 16)
    assert m["rebucketed"] and m["previous"] == 4
    assert t.num_buckets == 16
    # content identical across the layout change
    assert states_equal(t.read_internal(), pre)
    # the new layout's bucket ids live in the new hash space (empty
    # buckets simply have no files) and the deltas folded in
    snap = t.catalog.current()
    assert {int(b) for b in snap["files"]} <= set(range(16))
    assert max(int(b) for b in snap["files"]) >= 4  # really re-hashed
    assert not snap.get("delta_files")

    # point lookup follows the committed count: the scanned bucket is
    # the NEW hash target and the row comes back
    some = t.read().select("conv_id").first()["conv_id"]
    assert 0 <= bucket_of(some, 16) < 16
    assert t.read_conversation(some).count() > 0

    # ingest resumes from the untouched epoch/lsn watermark, writing the
    # new layout; final state equals a fresh full replay
    replay(t, log, cfg)
    truth = ParquetTranscriptTable.create(spark, str(tmp_path / "truth"), num_buckets=16)
    replay(truth, log, EngineConfig(num_buckets=16, max_events_per_trigger=10**9,
                                    mor_fold_every=10**9), start_epoch=0, start_lsn=0)
    assert states_equal(t.read_internal(), truth.read_internal())

    # time travel to the pre-rebucket version still reads the old layout
    assert states_equal(t.read_internal(version=m["snapshot_id"] - 1), pre)
    log.unpersist()


def test_rebucket_noop_and_validation(spark, tmp_path):
    t = ParquetTranscriptTable.create(spark, str(tmp_path / "t"), num_buckets=4)
    assert rebucket(t, 4) == {"rebucketed": False, "num_buckets": 4}
    v = t.catalog.current_version()
    assert t.catalog.current_version() == v

    import pytest

    with pytest.raises(ValueError):
        rebucket(t, 0)
