"""Additive schema evolution: the ``tool`` column appears mid-stream
(epoch-0 batches lack it entirely) and later batches may add brand-new
columns — absorbed metadata-only, no rewrite (north rule)."""

import pandas as pd
import pytest

from aqueduct_core_spark.catalog.table import ParquetTranscriptTable
from aqueduct_core_spark.config import EngineConfig
from aqueduct_core_spark.generator import generate_changes_pdf
from aqueduct_core_spark.operators.evolve import IncompatibleSchemaChange, evolve_table_fields
from aqueduct_core_spark.operators.merge import apply_batch
from aqueduct_core_spark.schema import CHANGES_SCHEMA, CHANGES_SCHEMA_EPOCH0
from tests.test_merge import to_spark


def test_epoch0_without_tool_then_evolution(spark, tmp_table_dir):
    import pyspark.sql.types as T

    cfg = EngineConfig(num_buckets=8)
    epoch0_schema = T.StructType(
        [
            T.StructField("conv_id", T.StringType(), False),
            T.StructField("turn_idx", T.IntegerType(), False),
            T.StructField("role", T.StringType(), True),
            T.StructField("text", T.StringType(), True),
            T.StructField("ts", T.TimestampType(), True),
            T.StructField("_lsn", T.LongType(), False),
        ]
    )
    table = ParquetTranscriptTable.create(
        spark, tmp_table_dir, num_buckets=8, schema=epoch0_schema
    )

    pdf = generate_changes_pdf(20, seed=42)
    n = len(pdf)
    first, second = pdf.iloc[: n // 2], pdf.iloc[n // 2 :]

    # epoch 0: the tool column does not exist yet
    first_no_tool = first.drop(columns=["tool"])
    df0 = spark.createDataFrame(
        first_no_tool.assign(
            turn_idx=first_no_tool["turn_idx"].astype("object").where(first_no_tool["turn_idx"].notna(), None)
        ),
        schema=CHANGES_SCHEMA_EPOCH0,
    )
    m0 = apply_batch(table, df0, epoch=0, cfg=cfg)
    assert "tool" not in [f.name for f in table.schema().fields]

    # epoch 1: tool appears → additive evolution in the same commit
    m1 = apply_batch(table, to_spark(spark, second), epoch=1, cfg=cfg)
    assert m1["added_columns"] == ["tool"]
    fields = [f.name for f in table.schema().fields]
    assert "tool" in fields

    # rows merged in epoch 0 read back with tool = NULL (no rewrite)
    state = table.read().toPandas()
    assert "tool" in state.columns
    e0_keys = set(
        first[first["turn_idx"].notna()].apply(lambda r: (r["conv_id"], int(r["turn_idx"])), axis=1)
    )
    only_e0 = state[
        state.apply(lambda r: (r["conv_id"], int(r["turn_idx"])) in e0_keys, axis=1)
    ]
    assert len(only_e0) > 0


def test_brand_new_column_mid_stream(spark, tmp_table_dir):
    cfg = EngineConfig(num_buckets=4)
    table = ParquetTranscriptTable.create(spark, tmp_table_dir, num_buckets=4)
    pdf = generate_changes_pdf(8, seed=1)
    apply_batch(table, to_spark(spark, pdf), epoch=0, cfg=cfg)

    extra = pdf[pdf["turn_idx"].notna()].head(5).copy()
    extra["lsn"] = extra["lsn"] + 50_000_000
    extra["op"] = "U"
    extra["model_name"] = "m-1"
    df = to_spark(spark, extra.drop(columns=["model_name"])).withColumn(
        "model_name", __import__("pyspark.sql.functions", fromlist=["lit"]).lit("m-1")
    )
    m = apply_batch(table, df, epoch=1, cfg=cfg)
    assert m["added_columns"] == ["model_name"]
    state = table.read().toPandas()
    assert state["model_name"].notna().sum() == 5
    assert state["model_name"].isna().sum() == len(state) - 5


def test_type_change_rejected():
    import pyspark.sql.types as T

    table_fields = [
        T.StructField("conv_id", T.StringType(), False),
        T.StructField("turn_idx", T.IntegerType(), False),
        T.StructField("text", T.StringType(), True),
        T.StructField("_lsn", T.LongType(), False),
    ]

    class FakeBatch:
        schema = T.StructType(
            [
                T.StructField("conv_id", T.StringType(), False),
                T.StructField("turn_idx", T.IntegerType(), False),
                T.StructField("text", T.IntegerType(), True),  # type change!
            ]
        )

    with pytest.raises(IncompatibleSchemaChange):
        evolve_table_fields(table_fields, FakeBatch())
