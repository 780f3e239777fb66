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


def _codegen_metrics(spark) -> tuple[int, float]:
    """(compilation count, total compile ms) from the JVM-global
    ``CodegenMetrics`` source — Janino recompiles measured directly,
    immune to host wall-clock noise."""
    cls = getattr(spark._jvm.org.apache.spark.metrics.source, "CodegenMetrics$")
    m = getattr(cls, "MODULE$")
    h = m.METRIC_COMPILATION_TIME()
    # histogram of per-compilation milliseconds; count × mean ≈ total
    return int(h.getCount()), h.getSnapshot().getMean()


def run_mode(spark, log, n_events: int, epochs: int, plan_stable: bool) -> dict:
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
        c0, ms0 = _codegen_metrics(spark)
        metrics = replay(table, log, cfg, start_epoch=0, start_lsn=0)
        c1, ms1 = _codegen_metrics(spark)
        n_epochs = len(metrics)
        return {
            "epoch_secs": [m["epoch_sec"] for m in metrics],
            "compilations": c1 - c0,
            "compilations_per_epoch": round((c1 - c0) / max(1, n_epochs), 2),
            # approximate (reservoir-sampled mean × count at each point)
            "compile_ms_total": round(max(0.0, c1 * ms1 - c0 * ms0), 1),
        }
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

        # one plan-stable warmup pass compiles every shape the two modes
        # share (scan, merge, commit); the measured passes then count
        # only mode-specific compilations.  NOTE: literal mode cannot be
        # self-warmed — a second identical replay would reuse the same
        # inlined constants and hit the codegen cache, which production
        # epochs (always-fresh lsn ranges) never do.
        run_mode(spark, log, n, args.epochs, plan_stable=True)
        out = {}
        for plan_stable in (False, True):
            label = "plan_stable" if plan_stable else "literal_filters"
            out[label] = run_mode(spark, log, n, args.epochs, plan_stable)
        for label, r in out.items():
            secs = r["epoch_secs"]
            steady = secs[1:] or secs
            print(f"{label}: epochs {['%.2f' % s for s in secs]}"
                  f"  steady-state mean {sum(steady)/len(steady):.2f}s"
                  f"  codegen compilations {r['compilations']}"
                  f" ({r['compilations_per_epoch']}/epoch,"
                  f" ~{r['compile_ms_total']} ms)",
                  file=sys.stderr)
        print(json.dumps({
            "events": n,
            "epochs": args.epochs,
            "cpus": args.cpus,
            "modes": out,
            "steady_mean": {
                # single-epoch runs fall back to the full list — the
                # [1:] slice alone would report a fabricated 0.0
                k: round(
                    sum(s := (v["epoch_secs"][1:] or v["epoch_secs"]))
                    / max(1, len(s)),
                    3,
                )
                for k, v in out.items()
            },
        }))
    finally:
        shutil.rmtree(work, ignore_errors=True)


if __name__ == "__main__":
    main()
