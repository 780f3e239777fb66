"""Dead-letter quarantine: malformed events must neither poison the
merge nor vanish — they land in an append-only sidecar with a reason,
and a replayed epoch stays exactly-once on data while the quarantine
view deduplicates re-deliveries on (epoch, lsn)."""

import pandas as pd

from aqueduct_core_spark.catalog.table import ParquetTranscriptTable
from aqueduct_core_spark.config import EngineConfig
from aqueduct_core_spark.generator import generate_changes_pdf
from aqueduct_core_spark.operators.validate import (
    apply_with_quarantine,
    read_quarantine,
    split_quarantine,
    with_invalid_reason,
)
from aqueduct_core_spark.verify import state_digest
from tests.test_merge import to_spark

from pyspark.sql import types as T

from aqueduct_core_spark.schema import CHANGES_SCHEMA

#: the ingest-boundary schema: everything nullable — rows violating the
#: engine contract are exactly what the validator exists to catch
NULLABLE_SCHEMA = T.StructType(
    [T.StructField(f.name, f.dataType, True) for f in CHANGES_SCHEMA.fields]
)


def to_spark_raw(spark, pdf):
    pdf = pdf.copy()
    pdf["turn_idx"] = pd.Series(
        [None if pd.isna(v) else int(v) for v in pdf["turn_idx"]], dtype=object
    )
    return spark.createDataFrame(pdf, schema=NULLABLE_SCHEMA)


def _row(lsn=1, op="I", conv_id="c1", turn_idx=0, text="hello", **kw):
    base = {
        "lsn": lsn, "op": op, "conv_id": conv_id, "turn_idx": turn_idx,
        "role": "user", "text": text, "tool": None,
        "ts": pd.Timestamp("2026-01-01"), "event_size": 10,
        "cluster_id": 0, "location_group": None,
    }
    base.update(kw)
    return base


def test_invalid_reason_rules(spark):
    rows = [
        _row(lsn=1),                                  # valid turn upsert
        _row(lsn=2, conv_id=None),                    # null_key
        _row(lsn=3, conv_id=""),                      # null_key (empty)
        _row(lsn=-4),                                 # bad_lsn
        _row(lsn=5, op="X"),                          # bad_op
        _row(lsn=6, text=None),                       # missing_payload
        _row(lsn=7, turn_idx=-1),                     # negative_turn
        _row(lsn=8, op="D", text=None),               # valid tombstone
        _row(lsn=9, turn_idx=None, op="D", text=None),  # valid conv delete
        # first-match-wins: null conv_id AND bad op -> null_key
        _row(lsn=10, conv_id=None, op="X"),
    ]
    pdf = pd.DataFrame(rows)
    got = {
        r["lsn"]: r["_invalid_reason"]
        for r in with_invalid_reason(to_spark_raw(spark, pdf)).collect()
    }
    assert got[1] is None and got[8] is None and got[9] is None
    assert got[2] == "null_key" and got[3] == "null_key"
    assert got[-4] == "bad_lsn"
    assert got[5] == "bad_op"
    assert got[6] == "missing_payload"
    assert got[7] == "negative_turn"
    assert got[10] == "null_key"


def test_apply_with_quarantine_equals_clean_apply(spark, tmp_path):
    cfg = EngineConfig(num_buckets=4, mor_fold_every=10**9)
    pdf = generate_changes_pdf(20, seed=7)
    # corrupt a deterministic slice: every 9th event gets a bogus op
    bad_mask = pdf["lsn"] % 9 == 0
    dirty = pdf.copy()
    dirty.loc[bad_mask, "op"] = "X"

    t_dirty = ParquetTranscriptTable.create(spark, str(tmp_path / "d"), num_buckets=4)
    m = apply_with_quarantine(
        t_dirty, to_spark(spark, dirty), epoch=0, cfg=cfg,
        quarantine_dir=str(tmp_path / "q"),
    )
    assert m["quarantined"] == int(bad_mask.sum()) > 0

    # the table must equal applying only the valid rows
    from aqueduct_core_spark.operators.merge import apply_batch

    t_clean = ParquetTranscriptTable.create(spark, str(tmp_path / "c"), num_buckets=4)
    apply_batch(t_clean, to_spark(spark, pdf[~bad_mask]), epoch=0, cfg=cfg)
    assert state_digest(t_dirty.read()) == state_digest(t_clean.read())

    q = read_quarantine(spark, str(tmp_path / "q")).toPandas()
    assert len(q) == int(bad_mask.sum())
    assert (q["reason"] == "bad_op").all()
    assert (q["epoch"] == 0).all()
    assert sorted(q["lsn"]) == sorted(pdf.loc[bad_mask, "lsn"])


def test_quarantine_redelivery_dedups(spark, tmp_path):
    cfg = EngineConfig(num_buckets=4, mor_fold_every=10**9)
    pdf = generate_changes_pdf(10, seed=9)
    dirty = pdf.copy()
    bad_mask = dirty["lsn"] % 7 == 0
    dirty.loc[bad_mask, "conv_id"] = None

    table = ParquetTranscriptTable.create(spark, str(tmp_path / "t"), num_buckets=4)
    qdir = str(tmp_path / "q")
    batch = to_spark_raw(spark, dirty)
    apply_with_quarantine(table, batch, epoch=0, cfg=cfg, quarantine_dir=qdir)
    d0 = state_digest(table.read())
    v0 = table.catalog.current_version()

    # crash-replay the same epoch: merge skips idempotently, quarantine
    # re-appends — but the deduplicated view is unchanged
    apply_with_quarantine(table, batch, epoch=0, cfg=cfg, quarantine_dir=qdir)
    assert table.catalog.current_version() == v0
    assert state_digest(table.read()) == d0
    q = read_quarantine(spark, qdir).toPandas()
    assert len(q) == int(bad_mask.sum())
    raw = spark.read.parquet(qdir).count()
    assert raw == 2 * int(bad_mask.sum())  # both deliveries retained raw
