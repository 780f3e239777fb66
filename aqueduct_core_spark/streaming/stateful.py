"""Custom stateful streaming operator: per-conversation progress.

The reference tracks per-pipe consumer state (offset registers +
``PipeState`` — ``pipe-http-client/.../PipeStateResponse.java``,
OffsetName.java:4-10) with driver-side bookkeeping.  The Spark-native
shape for *keyed* running state over a stream is
``applyInPandasWithState`` (Arrow-batched ``GroupState``, the
successor to flatMapGroupsWithState): this module tracks, per
``conv_id``, how many change events have been applied, the high-water
``lsn``, the distinct turns touched, and the latest event time — the
per-conversation analog of the engine's global offset registers, and
the building block for conversation-level SLAs (staleness alerts,
"conversation closed" detection via timeout).

State is exactly the engine's replay invariant (count, max-lsn) so a
restart from a checkpoint continues the numbers instead of resetting —
verified in ``tests/test_stateful.py`` by draining a log in two
``availableNow`` passes over one checkpoint.

Scale: state lives in the state store partitioned by ``conv_id`` (the
same key the transcript table buckets on); each micro-batch touches
only the conversations present in the batch, Arrow-batched per
partition — no driver-side state, no per-row Python.
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession, functions as F
import pyspark.sql.types as T

from aqueduct_core_spark.schema import CHANGES_SCHEMA

PROGRESS_SCHEMA = T.StructType(
    [
        T.StructField("conv_id", T.StringType(), False),
        T.StructField("events", T.LongType(), False),
        T.StructField("max_lsn", T.LongType(), False),
        T.StructField("turns", T.IntegerType(), False),
        T.StructField("last_ts", T.TimestampType(), True),
    ]
)

# state rows: (events, max_lsn, turn bitmap as csv of touched turn_idx,
# last_ts epoch-us).  The turn set is bounded by turns-per-conversation
# (hundreds), not by stream length.
_STATE_SCHEMA = T.StructType(
    [
        T.StructField("events", T.LongType()),
        T.StructField("max_lsn", T.LongType()),
        T.StructField("turn_csv", T.StringType()),
        T.StructField("last_ts_us", T.LongType()),
    ]
)


def _update_progress(
    key: tuple, pdfs: Iterator[pd.DataFrame], state
) -> Iterator[pd.DataFrame]:
    (conv_id,) = key
    if state.hasTimedOut:
        # idle conversation: emit a final row and drop the state
        events, max_lsn, turn_csv, last_ts_us = state.get
        state.remove()
        yield _row(conv_id, events, max_lsn, turn_csv, last_ts_us)
        return

    if state.exists:
        events, max_lsn, turn_csv, last_ts_us = state.get
        turns = set(int(t) for t in turn_csv.split(",") if t != "")
    else:
        events, max_lsn, turns, last_ts_us = 0, -1, set(), None

    for pdf in pdfs:
        events += len(pdf)
        if len(pdf):
            max_lsn = max(max_lsn, int(pdf["lsn"].max()))
            turns.update(int(t) for t in pdf["turn_idx"].dropna().unique())
            ts = pdf["ts"].dropna()
            if len(ts):
                us = int(ts.max().value // 1000)
                last_ts_us = us if last_ts_us is None else max(last_ts_us, us)

    turn_csv = ",".join(str(t) for t in sorted(turns))
    state.update((events, max_lsn, turn_csv, last_ts_us))
    yield _row(conv_id, events, max_lsn, turn_csv, last_ts_us)


def _row(conv_id, events, max_lsn, turn_csv, last_ts_us) -> pd.DataFrame:
    n_turns = 0 if turn_csv == "" else turn_csv.count(",") + 1
    return pd.DataFrame(
        {
            "conv_id": [conv_id],
            "events": [events],
            "max_lsn": [max_lsn],
            "turns": [n_turns],
            "last_ts": [pd.Timestamp(last_ts_us, unit="us") if last_ts_us is not None else pd.NaT],
        }
    )


def conversation_progress(
    changes_stream: DataFrame,
    timeout_ms: int | None = None,
) -> DataFrame:
    """``applyInPandasWithState`` over a *streaming* changes DataFrame:
    one output row per (batch, touched conversation) with the running
    totals.  ``timeout_ms`` (processing-time) closes idle conversations:
    their final row is emitted and the state dropped."""
    timeout = "ProcessingTimeTimeout" if timeout_ms else "NoTimeout"

    def update(key, pdfs, state):
        if timeout_ms and not state.hasTimedOut:
            state.setTimeoutDuration(timeout_ms)
        yield from _update_progress(key, pdfs, state)

    return changes_stream.groupBy("conv_id").applyInPandasWithState(
        update,
        outputStructType=PROGRESS_SCHEMA,
        stateStructType=_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=timeout,
    )


def run_progress_available_now(
    spark: SparkSession,
    changes_dir: str,
    checkpoint_dir: str,
    out_dir: str,
    timeout_s: int = 600,
) -> None:
    """Drain the log directory through the stateful operator into a
    parquet sink (one progress row per conversation per batch; the
    row with the highest ``max_lsn`` per conversation is current)."""
    stream = spark.readStream.schema(CHANGES_SCHEMA).parquet(changes_dir)
    q = (
        conversation_progress(stream)
        .writeStream.format("parquet")
        .option("path", out_dir)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    try:
        q.awaitTermination(timeout_s)
    finally:
        if q.isActive:
            q.stop()


def latest_progress(spark: SparkSession, out_dir: str) -> DataFrame:
    """Current per-conversation progress from the append-mode sink:
    argmax by (max_lsn, events) per conv."""
    out = spark.read.parquet(out_dir)
    best = F.max(F.struct("max_lsn", "events", "turns", "last_ts")).alias("s")
    return (
        out.groupBy("conv_id")
        .agg(best)
        .select("conv_id", "s.events", "s.max_lsn", "s.turns", "s.last_ts")
    )
