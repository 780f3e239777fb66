#!/usr/bin/env python
"""Iceberg-backend live integration spec (runnable wherever the
Iceberg Spark runtime jar is present).

The development sandbox has no network access and no
``iceberg-spark-runtime`` jar, so :class:`IcebergTranscriptTable`
(`aqueduct_core_spark/catalog/table.py`) is parse-validated but never
EXECUTED there — README "Storage backends and known limitations".
This script is the missing live spec, the analog of the reference's
storage integration specs
(/root/reference/pipe-storage-postgresql/src/integration/.../PostgresqlStorageIntegrationSpec.groovy,
/root/reference/pipe-storage-sqlite/src/integration/.../SQLiteStorageIntegrationSpec.groovy):
on any machine with the jar, ONE command runs the full contract —

    create → epoch-0 MERGE replay (pre-evolution schema)
           → additive schema evolution (ADD COLUMNS tool)
           → epoch-1 MERGE replay (evolved schema)
           → exactly-once re-apply (state digest unchanged)
           → final-state EQUALITY against the engine's own
             ParquetTranscriptTable replay of the same log

and prints one JSON verdict line.

Usage (version per your Spark; any 1.5+ runtime works)::

    spark-submit \
      --packages org.apache.iceberg:iceberg-spark-runtime-4.0_2.13:1.10.0 \
      --py-files aqueduct_core_spark.zip \
      tools/iceberg_integration.py [--warehouse /tmp/aq-iceberg-wh] [--convs 2000]

or plain ``python tools/iceberg_integration.py`` when the jar is
already on the session classpath.

Exit codes: 0 = all checks pass · 2 = Iceberg runtime absent (the
script SKIPS, it never fakes a pass) · 1 = a check failed.
"""

from __future__ import annotations

import argparse
import json
import os
import shutil
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

CATALOG = "aq_it"
TABLE = f"{CATALOG}.db.transcripts"


def state_digest(df) -> tuple[int, int]:
    """Order-insensitive digest of a transcript state: (row count,
    xor of per-row hashes over the full payload)."""
    from pyspark.sql import functions as F

    row = df.select(
        F.count(F.lit(1)).alias("n"),
        F.coalesce(
            F.expr(
                "bit_xor(xxhash64(conv_id, turn_idx, coalesce(role,'<null>'), "
                "coalesce(text,'<null>'), coalesce(tool,'<null>'), "
                "coalesce(cast(ts as string),'<null>')))"
            ),
            F.lit(0),
        ).alias("h"),
    ).collect()[0]
    return int(row["n"]), int(row["h"])


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--warehouse", default="/tmp/aq-iceberg-wh")
    ap.add_argument("--convs", type=int, default=2000)
    args = ap.parse_args()

    from aqueduct_core_spark.session import get_spark

    shutil.rmtree(args.warehouse, ignore_errors=True)
    spark = get_spark(
        "aqueduct-iceberg-integration",
        extra_conf={
            "spark.sql.extensions": (
                "org.apache.iceberg.spark.extensions.IcebergSparkSessionExtensions"
            ),
            f"spark.sql.catalog.{CATALOG}": "org.apache.iceberg.spark.SparkCatalog",
            f"spark.sql.catalog.{CATALOG}.type": "hadoop",
            f"spark.sql.catalog.{CATALOG}.warehouse": args.warehouse,
        },
    )

    from aqueduct_core_spark.catalog.table import (
        IcebergTranscriptTable,
        ParquetTranscriptTable,
        iceberg_available,
    )

    if not iceberg_available(spark):
        print(
            json.dumps(
                {
                    "iceberg_integration": "SKIPPED",
                    "reason": "iceberg-spark-runtime not on classpath; "
                    "re-run via spark-submit --packages "
                    "org.apache.iceberg:iceberg-spark-runtime-<spark>_<scala>:<ver>",
                }
            )
        )
        return 2

    from pyspark.sql import functions as F

    from aqueduct_core_spark.config import EngineConfig
    from aqueduct_core_spark.generator import generate_changes
    from aqueduct_core_spark.operators import lww
    from aqueduct_core_spark.streaming.pipeline import replay

    spark.sql(f"CREATE NAMESPACE IF NOT EXISTS {CATALOG}.db")
    spark.sql(f"DROP TABLE IF EXISTS {TABLE}")

    log = generate_changes(spark, n_convs=args.convs, seed=42).localCheckpoint()
    split = int(log.agg(F.max("lsn")).collect()[0][0]) // 2
    payload_full = ["role", "text", "tool", "ts"]
    checks: dict[str, bool] = {}

    # -- create + epoch 0 on the PRE-EVOLUTION schema (no tool column) --
    t = IcebergTranscriptTable.create(spark, TABLE, num_buckets=16)
    spark.sql(f"ALTER TABLE {TABLE} DROP COLUMN tool")
    e0 = log.where(F.col("lsn") < split).drop("tool")
    w0, d0 = lww.resolve_batch(e0, ["role", "text", "ts"])
    t.merge_resolved(w0, d0, payload_cols=("role", "text", "ts"))
    checks["epoch0_rows"] = spark.table(TABLE).count() > 0

    # -- additive evolution: metadata-only ADD COLUMNS ------------------
    for stmt in t.evolve_sql(added=[("tool", "string")], widened=[]):
        spark.sql(stmt)
    # every pre-evolution row must read back NULL tool
    checks["evolution_null_backfill"] = (
        spark.table(TABLE).where(F.col("tool").isNotNull()).count() == 0
    )

    # -- epoch 1 on the evolved schema ----------------------------------
    e1 = log.where(F.col("lsn") >= split)
    w1, d1 = lww.resolve_batch(e1, payload_full)
    t.merge_resolved(w1, d1)
    checks["epoch1_rows"] = spark.table(TABLE).count() > 0

    # -- exactly-once: re-applying the SAME resolved batch is a no-op ---
    before = state_digest(t.read_internal())
    t.merge_resolved(w1, d1)
    checks["reapply_idempotent"] = state_digest(t.read_internal()) == before

    # -- final-state equality vs the engine's Parquet replay ------------
    root = f"{args.warehouse}-parquet-ref"
    shutil.rmtree(root, ignore_errors=True)
    ref = ParquetTranscriptTable.create(spark, root, num_buckets=16)
    replay(ref, log, EngineConfig(num_buckets=16))
    checks["state_equals_parquet_replay"] = (
        state_digest(t.read_internal()) == state_digest(ref.read_internal())
    )

    ok = all(checks.values())
    print(
        json.dumps(
            {
                "iceberg_integration": "PASS" if ok else "FAIL",
                "checks": checks,
                "rows": spark.table(TABLE).count(),
                "convs": args.convs,
            }
        )
    )
    return 0 if ok else 1


if __name__ == "__main__":
    raise SystemExit(main())
