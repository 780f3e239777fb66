#!/usr/bin/env python
"""Per-epoch plan-stability A/B: literal lsn-range filters vs the
broadcast-bounds join (``EngineConfig.plan_stable_filters``).

Replays the same log with many small epochs under both modes and
prints each epoch's wall time.  With literal filters every epoch's
filter inlines fresh constants into the whole-stage-codegen source —
a serial Janino recompile per epoch (BENCH.md r2 cost anatomy, ~1-2 s).
With the bounds join, epoch 2+ reuse the compiled plan: epoch times
should be flat after the first.

    python bench/epoch_stability.py [--convs 20000] [--epochs 8] [--cpus 8]
"""

from __future__ import annotations

import argparse
import json
import os
import shutil
import sys
import tempfile

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def run_mode(spark, log, n_events: int, epochs: int, plan_stable: bool) -> list[float]:
    from aqueduct_core_spark.catalog.table import ParquetTranscriptTable
    from aqueduct_core_spark.config import EngineConfig
    from aqueduct_core_spark.streaming.pipeline import replay

    root = tempfile.mkdtemp(prefix=f"aq-epoch-ab-{int(plan_stable)}-")
    try:
        table = ParquetTranscriptTable.create(spark, root, num_buckets=16)
        cfg = EngineConfig(
            num_buckets=16,
            max_events_per_trigger=max(1, n_events // epochs),
            max_bytes_per_trigger=8 * 1024 * 1024 * 1024,
            plan_stable_filters=plan_stable,
        )
        metrics = replay(table, log, cfg, start_epoch=0, start_lsn=0)
        return [m["epoch_sec"] for m in metrics]
    finally:
        shutil.rmtree(root, ignore_errors=True)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--convs", type=int, default=20_000)
    ap.add_argument("--epochs", type=int, default=8)
    ap.add_argument("--cpus", type=int, default=8)
    args = ap.parse_args()

    from aqueduct_core_spark.generator import generate_changes
    from aqueduct_core_spark.session import get_spark

    spark = get_spark(
        "epoch-ab", master=f"local[{args.cpus}]", shuffle_partitions=args.cpus
    )
    work = tempfile.mkdtemp(prefix="aq-epoch-ab-log-")
    try:
        path = os.path.join(work, "log")
        generate_changes(spark, n_convs=args.convs, seed=42, partitions=64) \
            .write.mode("overwrite").parquet(path)
        log = spark.read.parquet(path)
        n = log.count()

        # warm shared costs (session JIT, scan of the log) once
        log.count()

        out = {}
        for plan_stable in (False, True):
            label = "plan_stable" if plan_stable else "literal_filters"
            out[label] = run_mode(spark, log, n, args.epochs, plan_stable)
        for label, secs in out.items():
            steady = secs[1:] or secs
            print(f"{label}: epochs {['%.2f' % s for s in secs]}"
                  f"  steady-state mean {sum(steady)/len(steady):.2f}s",
                  file=sys.stderr)
        print(json.dumps({
            "events": n,
            "epochs": args.epochs,
            "cpus": args.cpus,
            "epoch_secs": out,
            "steady_mean": {
                k: round(sum(v[1:]) / max(1, len(v) - 1), 3) for k, v in out.items()
            },
        }))
    finally:
        shutil.rmtree(work, ignore_errors=True)


if __name__ == "__main__":
    main()
