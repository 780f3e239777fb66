"""spark-submit entry point: replay a change log into a transcript table.

The cluster deployment shape the engine targets (north rule: ``run via
spark-submit --py-files on a multi-executor cluster``)::

    cd /root/repo && zip -qr /tmp/aqueduct_core_spark.zip aqueduct_core_spark
    spark-submit --master local[8] \
        --py-files /tmp/aqueduct_core_spark.zip \
        tools/submit_replay.py \
        --changes /path/to/changes --table /path/to/transcripts \
        [--generate-convs 500] [--buckets 16] [--stream]

On a real cluster only ``--master`` changes (YARN/K8s/standalone URL);
``--py-files`` ships the same zip to every executor.  The job prints
one JSON line with events applied, wall seconds, events/s, and the
final consistency check — the same verification the bench runs.

``--generate-convs N`` synthesizes a deterministic change log first
(seed 42) so the example is self-contained; ``--stream`` drains via the
Structured Streaming path (``foreachBatch`` + checkpoint) instead of
the batch ``replay()`` loop.
"""

from __future__ import annotations

import argparse
import json
import time


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--changes", required=True)
    ap.add_argument("--table", required=True)
    ap.add_argument("--buckets", type=int, default=16)
    ap.add_argument("--generate-convs", type=int, default=0)
    ap.add_argument("--stream", action="store_true")
    ap.add_argument("--checkpoint", default=None)
    args = ap.parse_args()

    # Under spark-submit the session already exists and --py-files put
    # the package zip on every executor's sys.path; getOrCreate attaches
    # to it instead of building the self-propagating local session.
    from pyspark.sql import SparkSession

    spark = SparkSession.builder.getOrCreate()

    from aqueduct_core_spark.catalog.table import ParquetTranscriptTable
    from aqueduct_core_spark.config import EngineConfig
    from aqueduct_core_spark.streaming.pipeline import replay, run_available_now
    from aqueduct_core_spark.verify import consistency_sum, table_consistency_sum

    cfg = EngineConfig(num_buckets=args.buckets)

    if args.generate_convs:
        from aqueduct_core_spark.generator import generate_changes

        generate_changes(spark, n_convs=args.generate_convs, seed=42).write.parquet(
            args.changes, mode="errorifexists"
        )

    table = ParquetTranscriptTable.create(spark, args.table, num_buckets=args.buckets)
    log = spark.read.parquet(args.changes)
    n_events = log.count()

    t0 = time.time()
    if args.stream:
        ckpt = args.checkpoint or (args.table.rstrip("/") + "_ckpt")
        run_available_now(spark, table, args.changes, ckpt, cfg)
    else:
        replay(table, log, cfg)
    wall = time.time() - t0

    ok = consistency_sum(log) == table_consistency_sum(table.read_internal())
    print(
        json.dumps(
            {
                "events": n_events,
                "sec": round(wall, 3),
                "events_per_sec": round(n_events / wall, 1),
                "mode": "stream" if args.stream else "replay",
                "state_ok": bool(ok),
                "final_rows": table.read().count(),
                "last_lsn": table.last_committed_lsn(),
            }
        )
    )
    if not ok:
        raise SystemExit(1)


if __name__ == "__main__":
    main()
