"""Point-lookup serving path: driver-side bucket math + pruned read.

``spark_hash`` must agree with ``F.hash`` bit-for-bit (it decides which
bucket's files a lookup scans), and ``read_conversation`` must return
exactly what a full-table filter would — while listing only one
bucket's files.
"""

import pyspark.sql.functions as F
import pyspark.sql.types as T
import pytest

from aqueduct_core_spark.catalog.table import (
    ParquetTranscriptTable,
    bucket_expr,
    bucket_of,
    spark_hash,
)
from aqueduct_core_spark.config import EngineConfig
from aqueduct_core_spark.generator import generate_changes
from aqueduct_core_spark.streaming.pipeline import replay


def test_spark_hash_matches_f_hash_strings(spark):
    # tail lengths 0-3, multi-byte UTF-8, empty string
    vals = [
        "", "a", "ab", "abc", "abcd", "abcde", "conv-000123",
        "héllo wörld", "emoji \U0001f600 tail", "x" * 67,
    ] + [f"conv-{i:06d}" for i in range(50)]
    df = spark.createDataFrame([(v,) for v in vals], ["s"])
    got = {r["s"]: r["h"] for r in df.select("s", F.hash("s").alias("h")).collect()}
    for v in vals:
        assert spark_hash(v) == got[v], v


def test_spark_hash_matches_f_hash_longs(spark):
    vals = [0, 1, -1, 42, -42, 2**31, -(2**31), 2**62, -(2**62), 123456789012345]
    df = spark.createDataFrame([(v,) for v in vals], T.StructType(
        [T.StructField("x", T.LongType())]
    ))
    got = {r["x"]: r["h"] for r in df.select("x", F.hash("x").alias("h")).collect()}
    for v in vals:
        assert spark_hash(v) == got[v], v


def test_bucket_of_matches_bucket_expr(spark):
    vals = [f"conv-{i:06d}" for i in range(200)]
    df = spark.createDataFrame([(v,) for v in vals], ["conv_id"])
    got = {
        r["conv_id"]: r["b"]
        for r in df.select("conv_id", bucket_expr(16).alias("b")).collect()
    }
    for v in vals:
        assert bucket_of(v, 16) == got[v], v


@pytest.fixture(scope="module")
def lookup_table(spark, tmp_path_factory):
    root = str(tmp_path_factory.mktemp("pt") / "transcripts")
    table = ParquetTranscriptTable.create(spark, root, num_buckets=8)
    log = generate_changes(spark, n_convs=200, seed=11)
    cfg = EngineConfig(num_buckets=8)
    replay(table, log, cfg)
    # fold MOR deltas into base files, then land a second small delta
    # epoch so the lookup exercises BOTH the base and the delta path
    from aqueduct_core_spark.operators.compact import fold_deltas

    fold_deltas(table)
    hi = log.agg(F.max("lsn")).collect()[0][0]
    more = generate_changes(spark, n_convs=200, seed=12).withColumn(
        "lsn", F.col("lsn") + F.lit(hi)
    )
    replay(table, more, cfg)
    return table


def test_read_conversation_identity(spark, lookup_table):
    state = lookup_table.read()
    cid = state.agg(F.min("conv_id")).collect()[0][0]
    via_lookup = sorted(map(tuple, lookup_table.read_conversation(cid).collect()))
    via_filter = sorted(map(tuple, state.where(F.col("conv_id") == cid).collect()))
    assert via_lookup and via_lookup == via_filter


def test_read_conversation_prunes_to_one_bucket(spark, lookup_table):
    cid = lookup_table.read().agg(F.min("conv_id")).collect()[0][0]
    plan = lookup_table.read_conversation(cid)._jdf.queryExecution().executedPlan().toString()
    # the residual equality must reach the parquet scan...
    assert "PushedFilters" in plan and "EqualTo(conv_id" in plan
    # ...and only ONE bucket's base files may be listed: every scanned
    # parquet path must live under the looked-up bucket's directory
    snap = lookup_table.catalog.current()
    n_total = sum(len(v) for v in snap["files"].values()) + sum(
        len(v) for v in snap.get("delta_files", {}).values()
    )
    b = bucket_of(cid, 8)
    allowed = {p for p in snap["files"].get(str(b), [])}
    allowed |= {p for p in snap.get("delta_files", {}).get(str(b), [])}
    assert snap["files"].get(str(b)), "fixture should leave base files"
    assert len(allowed) < n_total  # pruning is real, not vacuous
    scanned = lookup_table.read_conversation(cid).inputFiles()
    assert scanned, "no input files resolved"
    for f in scanned:
        assert any(f.endswith(p) for p in allowed), f"file outside bucket {b}: {f}"


def test_read_conversations_multi_get(spark, lookup_table):
    """Batch multi-get: identity vs a full-table IN filter, scan pruned
    to the union of the keys' buckets, duplicates/empties handled."""
    state = lookup_table.read()
    cids = [r["conv_id"] for r in
            state.select("conv_id").distinct().orderBy("conv_id").limit(3).collect()]

    got = lookup_table.read_conversations(cids + [cids[0]])  # dupe key
    via_filter = sorted(map(tuple,
                            state.where(F.col("conv_id").isin(cids)).collect()))
    assert sorted(map(tuple, got.collect())) == via_filter

    # scan lists only the union of the keys' buckets
    snap = lookup_table.catalog.current()
    bs = {bucket_of(c, 8) for c in cids}
    allowed = set()
    for b in bs:
        allowed |= set(snap["files"].get(str(b), []))
        allowed |= set(snap.get("delta_files", {}).get(str(b), []))
    n_total = sum(len(v) for v in snap["files"].values()) + sum(
        len(v) for v in snap.get("delta_files", {}).values()
    )
    assert len(allowed) < n_total
    for f in got.inputFiles():
        assert any(f.endswith(p) for p in allowed), f

    # column projection + empty key list
    slim = lookup_table.read_conversations(cids, columns=["text"])
    assert set(slim.columns) == {"conv_id", "turn_idx", "text"}
    assert lookup_table.read_conversations([]).count() == 0
