"""Anti-entropy: bucket-digest divergence detection + bucket-granular
repair between a primary and a drifted replica.

The detection must name exactly the damaged buckets (Merkle prune), the
key diff must name exactly the damaged keys, and repair must converge
the replica in one commit that touches only those buckets' files."""

import os

import pytest
from pyspark.sql import functions as F

from aqueduct_core_spark.catalog.table import ParquetTranscriptTable, bucket_of
from aqueduct_core_spark.config import EngineConfig
from aqueduct_core_spark.generator import generate_changes
from aqueduct_core_spark.operators.antientropy import (
    DIFFERS,
    MISSING_IN_PRIMARY,
    MISSING_IN_REPLICA,
    bucket_digests,
    diff_replica,
    diverging_buckets,
    key_diff,
    repair_replica,
)
from aqueduct_core_spark.streaming.pipeline import replay
from aqueduct_core_spark.verify import state_digest, states_equal

N_BUCKETS = 8


def _pair(spark, tmp_path, drop_pred=None, n_convs=60):
    """Primary replayed from the full log; replica from a filtered log
    (``drop_pred`` rows withheld = lost-write drift)."""
    cfg = EngineConfig(num_buckets=N_BUCKETS, max_events_per_trigger=10**9)
    log = generate_changes(spark, n_convs=n_convs, seed=51).cache()
    primary = ParquetTranscriptTable.create(
        spark, str(tmp_path / "p"), num_buckets=N_BUCKETS
    )
    replay(primary, log, cfg, start_epoch=0, start_lsn=0)
    replica = ParquetTranscriptTable.create(
        spark, str(tmp_path / "r"), num_buckets=N_BUCKETS
    )
    rlog = log.where(~drop_pred) if drop_pred is not None else log
    replay(replica, rlog, cfg, start_epoch=0, start_lsn=0)
    return cfg, log, primary, replica


def test_converged_pair_has_no_divergence(spark, tmp_path):
    _, _, primary, replica = _pair(spark, tmp_path)
    assert diverging_buckets(primary, replica) == []
    buckets, diff = diff_replica(primary, replica)
    assert buckets == [] and diff.count() == 0
    assert repair_replica(replica, primary) == {"repaired": False, "buckets": []}


def test_digests_localize_damage_to_exact_buckets(spark, tmp_path):
    # withhold every event of ONE conversation -> exactly its bucket diverges
    victim = "conv-00000007"
    _, log, primary, replica = _pair(
        spark, tmp_path, drop_pred=F.col("conv_id") == victim
    )
    want = bucket_of(victim, N_BUCKETS)
    assert diverging_buckets(primary, replica) == [want]

    buckets, diff = diff_replica(primary, replica)
    assert buckets == [want]
    rows = diff.collect()
    assert rows, "victim conversation must appear in the key diff"
    assert {r["conv_id"] for r in rows} == {victim}
    assert {r["status"] for r in rows} == {MISSING_IN_REPLICA}
    assert all(r["replica_lsn"] is None for r in rows)


def test_key_diff_classifies_all_three_statuses(spark, tmp_path):
    _, _, primary, _ = _pair(spark, tmp_path)
    p = primary.read_internal()
    # replica state: drop one key, corrupt one key's text, add one alien key
    some = p.orderBy("conv_id", "turn_idx").limit(2).collect()
    (k_drop, k_corrupt) = [(r["conv_id"], r["turn_idx"]) for r in some]
    r = (
        p.where(~((F.col("conv_id") == k_drop[0]) & (F.col("turn_idx") == k_drop[1])))
        .withColumn(
            "text",
            F.when(
                (F.col("conv_id") == k_corrupt[0])
                & (F.col("turn_idx") == k_corrupt[1]),
                F.concat(F.col("text"), F.lit("!bitrot")),
            ).otherwise(F.col("text")),
        )
    )
    alien = p.limit(1).select(
        F.lit("conv-alien").alias("conv_id"), *[c for c in p.columns if c != "conv_id"]
    )
    r = r.unionByName(alien)

    got = {(x["conv_id"], x["turn_idx"]): x["status"] for x in key_diff(p, r).collect()}
    assert got[k_drop] == MISSING_IN_REPLICA
    assert got[k_corrupt] == DIFFERS
    assert [s for (c, _), s in got.items() if c == "conv-alien"] == [MISSING_IN_PRIMARY]
    assert len(got) == 3


def test_repair_converges_and_touches_only_damaged_buckets(spark, tmp_path):
    victim = "conv-00000013"
    _, _, primary, replica = _pair(
        spark, tmp_path, drop_pred=F.col("conv_id") == victim
    )
    want = bucket_of(victim, N_BUCKETS)
    before = replica.catalog.current()
    ep_before = replica.last_committed_epoch()

    out = repair_replica(replica, primary)
    assert out["repaired"] and out["buckets"] == [want]

    after = replica.catalog.current()
    # verified buckets' file lists are byte-identical; only the damaged
    # bucket's base files changed (repair cost proportional to damage)
    for b in map(str, range(N_BUCKETS)):
        if int(b) == want:
            assert after["files"][b] != before["files"].get(b, [])
        else:
            assert after["files"].get(b, []) == before["files"].get(b, [])

    assert diverging_buckets(primary, replica) == []
    assert states_equal(replica.read_internal(), primary.read_internal())
    assert state_digest(replica.read_internal()) == state_digest(
        primary.read_internal()
    )
    # content-level repair: the feed/epoch watermark did not move
    assert replica.last_committed_epoch() == ep_before


def test_diff_rejects_mismatched_bucket_layouts(spark, tmp_path):
    cfg = EngineConfig(num_buckets=4, max_events_per_trigger=10**9)
    log = generate_changes(spark, n_convs=10, seed=52)
    a = ParquetTranscriptTable.create(spark, str(tmp_path / "a"), num_buckets=4)
    b = ParquetTranscriptTable.create(spark, str(tmp_path / "b"), num_buckets=8)
    replay(a, log, cfg, start_epoch=0, start_lsn=0)
    with pytest.raises(ValueError, match="bucket layouts differ"):
        diverging_buckets(a, b)


def test_null_shifted_value_is_detected(spark):
    """xxhash64 skips NULL operands, so a value shifted between nullable
    columns would hash identically without the null-flag inputs — the
    bitrot/bad-restore case the digest exists to catch."""
    from aqueduct_core_spark.operators.antientropy import _row_hash

    a = spark.createDataFrame(
        [("c1", 0, "assistant", None)],
        "conv_id string, turn_idx int, role string, text string",
    )
    b = spark.createDataFrame(
        [("c1", 0, None, "assistant")],
        "conv_id string, turn_idx int, role string, text string",
    )
    cols = ["conv_id", "turn_idx", "role", "text"]
    ha = a.select(_row_hash(cols).alias("h")).first()["h"]
    hb = b.select(_row_hash(cols).alias("h")).first()["h"]
    assert ha != hb
