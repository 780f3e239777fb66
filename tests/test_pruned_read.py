"""Column-pruned MOR reads: the prune must reach the parquet scan —
base files AND the nested delta winner struct — not just the output."""

import pytest
from pyspark.sql import functions as F

from aqueduct_core_spark.catalog.table import ParquetTranscriptTable
from aqueduct_core_spark.config import EngineConfig
from aqueduct_core_spark.generator import generate_changes_pdf
from aqueduct_core_spark.operators.merge import apply_batch
from tests.test_merge import to_spark

# huge fold threshold so the table keeps unfolded MOR deltas
CFG = EngineConfig(num_buckets=8, mor_fold_every=10**9)


@pytest.fixture(scope="module")
def mor_table(spark, tmp_path_factory):
    root = str(tmp_path_factory.mktemp("pruned") / "t")
    table = ParquetTranscriptTable.create(spark, root, num_buckets=8)
    pdf = generate_changes_pdf(25, seed=42)
    half = len(pdf) // 2
    apply_batch(table, to_spark(spark, pdf.iloc[:half]), epoch=0, cfg=CFG)
    apply_batch(table, to_spark(spark, pdf.iloc[half:]), epoch=1, cfg=CFG)
    assert table.catalog.current().get("delta_files"), "need live MOR deltas"
    return table


def test_pruned_read_equals_full_read(spark, mor_table):
    full = mor_table.read().select("conv_id", "turn_idx", "text")
    pruned = mor_table.read(columns=["text"])
    assert pruned.columns == ["conv_id", "turn_idx", "text"]
    assert pruned.exceptAll(full).count() == 0
    assert full.exceptAll(pruned).count() == 0


def test_prune_reaches_base_scan_and_delta_struct(spark, mor_table):
    spark.conf.set("spark.sql.debug.maxToStringFields", "200")
    spark.conf.set("spark.sql.maxMetadataStringLength", "2000")
    plan = (
        mor_table.read(columns=["text"])
        ._jdf.queryExecution().executedPlan().toString()
    )
    schemas = [
        seg.splitlines()[0] for seg in plan.split("ReadSchema:")[1:]
    ]
    assert schemas, plan
    for s in schemas:
        assert "role" not in s and "tool" not in s, s
        assert "text" in s or "_tkey" in s, s


def test_point_lookup_prunes_too(spark, mor_table):
    some_conv = mor_table.read().select("conv_id").first()["conv_id"]
    out = mor_table.read_conversation(some_conv, columns=["role"])
    assert out.columns == ["conv_id", "turn_idx", "role"]
    assert out.count() > 0


def test_unknown_column_fails_loud(spark, mor_table):
    with pytest.raises(KeyError, match="unknown column"):
        mor_table.read(columns=["nope"])


def test_prune_respects_rename(spark, mor_table, tmp_path):
    """Pruned reads address LOGICAL names post-rename."""
    from aqueduct_core_spark.operators.evolve import rename_column

    root = str(tmp_path / "t2")
    table = ParquetTranscriptTable.create(spark, root, num_buckets=8)
    pdf = generate_changes_pdf(10, seed=7)
    apply_batch(table, to_spark(spark, pdf), epoch=0, cfg=CFG)
    rename_column(table, "tool", "tool_name")
    out = table.read(columns=["tool_name"])
    assert out.columns == ["conv_id", "turn_idx", "tool_name"]
    with pytest.raises(KeyError):
        table.read(columns=["tool"])
