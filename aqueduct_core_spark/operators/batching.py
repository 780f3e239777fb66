"""Batch sizing: row limits + byte budgets.

The reference cuts each poll page by BOTH a row limit and a running
byte budget computed with a cumulative-sum window:
``SUM(event_size) OVER (ORDER BY msg_offset) <= maxBatchSize``
(``/root/reference/pipe-storage-postgresql/.../PostgresqlStorage.java:437-447``,
size tests ``PostgresqlStorageIntegrationSpec.groovy:183-223``), with a
per-message overhead allowance (``Message.java:27-31`` MAX_OVERHEAD_SIZE).

Two formulations:

- :func:`cut_page_by_bytes` — the literal window formulation.  A global
  ``ORDER BY lsn`` cumulative sum is a single-partition sort, which is
  exactly what you want for a ≤500-row poll page and exactly wrong for
  trigger planning at 10^10 events.
- :func:`plan_triggers` — the scale path: aggregate per fixed lsn-block
  (parallel, one pass, no global sort), running-sum the tiny block
  stats driver-side, and emit lsn-range trigger boundaries honoring
  both ``max_events_per_trigger`` and ``max_bytes_per_trigger`` at
  block granularity.  This is the engine's ``maxBytesPerTrigger``
  analog for batch-mode replay.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame, functions as F
from pyspark.sql.window import Window


def cut_page_by_bytes(
    page: DataFrame, max_batch_size: int, overhead_per_msg: int = 89
) -> DataFrame:
    """W1: keep the longest lsn-prefix whose cumulative serialized size
    (plus per-message overhead) fits the byte budget."""
    w = Window.orderBy("lsn").rowsBetween(Window.unboundedPreceding, Window.currentRow)
    running = F.sum(F.col("event_size") + F.lit(overhead_per_msg)).over(w)
    return (
        page.withColumn("_running_size", running)
        .where(F.col("_running_size") <= max_batch_size)
        .drop("_running_size")
    )


@dataclass
class TriggerRange:
    start_lsn: int
    end_lsn: int  # inclusive
    events: int
    bytes: int


def plan_triggers(
    changes: DataFrame,
    max_events: int,
    max_bytes: int,
    block_bits: int = 14,
    overhead_per_msg: int = 89,
) -> list[TriggerRange]:
    """Cut the log into lsn-range micro-batches.

    One distributed agg computes (events, bytes, min/max lsn) per
    ``lsn >> block_bits`` block; the driver then greedily packs blocks
    into ranges.  Block stats are O(max_lsn / 2^block_bits) — tiny.
    A single block larger than both budgets still becomes its own
    trigger (a block is the atomic unit; choose ``block_bits`` ≤ the
    generator stride so conversations don't force giant triggers).
    """
    stats = (
        changes.groupBy(F.shiftright(F.col("lsn"), block_bits).alias("_blk"))
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.coalesce(F.col("event_size"), F.lit(0)) + F.lit(overhead_per_msg)).alias("b"),
            F.min("lsn").alias("lo"),
            F.max("lsn").alias("hi"),
        )
        .orderBy("_blk")
        .collect()
    )
    out: list[TriggerRange] = []
    cur_start, cur_end, cur_n, cur_b = None, None, 0, 0
    for r in stats:
        n, b, lo, hi = int(r["n"]), int(r["b"]), int(r["lo"]), int(r["hi"])
        if cur_start is not None and (cur_n + n > max_events or cur_b + b > max_bytes):
            out.append(TriggerRange(cur_start, cur_end, cur_n, cur_b))
            cur_start, cur_n, cur_b = None, 0, 0
        if cur_start is None:
            cur_start = lo
        cur_end, cur_n, cur_b = hi, cur_n + n, cur_b + b
    if cur_start is not None:
        out.append(TriggerRange(cur_start, cur_end, cur_n, cur_b))
    return out
