"""Deterministic `events` → `changes` mapping for correctness gating.

The driver's shared test corpus ships a generic ordered event stream
(``events.parquet``: event_id, ts, user_id, event_type, value, props).
This module derives a change-log of the engine's exact input shape
(FIXTURES.md §2 / BASELINE input_hint) from it — **the same pure
function expressed twice**: once as a Spark DataFrame transform
(:func:`changes_from_events`) and once as an ANSI-SQL CTE
(:data:`CHANGES_CTE_SQL`) for the DuckDB oracle.  Any semantic drift
between the two shows up as a correctness-gate hash mismatch, so keep
them in lockstep.

Mapping rules (all deterministic, no randomness):

- ``lsn``      = ``event_id`` (already a unique, monotone LSN)
- conversation = the user: ``conv_id = printf('conv-%04d', user_id)``
- ``turn_idx`` = ``event_id % 4`` → ~17 events per (conv, turn) key at
  sf0.01, a real LWW workload; NULL for conversation-level events
- conversation-level delete: every ``event_id % 97 == 0`` row becomes a
  parent-level tombstone (turn_idx NULL, op 'D') — exercises the
  hierarchical delete watermark (reference semantics: deletion kills
  everything at-or-below its offset,
  /root/reference/pipe-storage-postgresql/.../PostgresqlStorage.java:479-493)
- ``op``: 'D' for ``event_type='error'`` (turn tombstone), 'U' for
  click/view, 'I' for signup/purchase
- tombstones carry NULL payload (reference encodes deletes as
  ``data IS NULL`` — pipe-storage-sqlite/.../SQLiteQueries.java:54-55)
- ``tool`` only on purchases — sparse, like real tool-call metadata
- ``event_size`` = payload length + 89 B fixed overhead (reference
  MAX_OVERHEAD_SIZE, pipe-api/.../Message.java:27-31)
- ``cluster_id`` = ``user_id % 8`` (routing partition analog)
- **forked conversations**: users with ``user_id % 25 IN (7, 8)`` form
  adjacent FORK PAIRS (25g+7, 25g+8) whose turn payloads are canonical
  per (pair-group, turn) instead of per-event — two conversations
  replaying the same transcript, the near-duplicate shape a real
  multi-client CDC feed produces (retries, copied sessions).  This is
  what makes ``cdc_conv_near_dup`` exercise its positive path: without
  seeded forks the corpus has no conversation pair above the 0.5
  Jaccard threshold and the correctness row is vacuously green on
  0 rows (r3 verdict).  Roles and liveness still come from each
  conversation's own events, so fork pairs are NEAR-duplicates, not
  byte-identical.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F
from aqueduct_core_spark.schema import WIRE_OVERHEAD_BYTES

#: DuckDB CTE defining the identical mapping over the ``events`` view.
#: Prepend to every oracle query as ``WITH changes AS (…)``.
CHANGES_CTE_SQL = """
changes AS (
  SELECT
    event_id AS lsn,
    CASE WHEN event_id % 97 = 0 THEN 'D'
         WHEN event_type = 'error' THEN 'D'
         WHEN event_type IN ('click', 'view') THEN 'U'
         ELSE 'I' END AS op,
    printf('conv-%04d', user_id) AS conv_id,
    CASE WHEN event_id % 97 = 0 THEN NULL
         ELSE CAST(event_id % 4 AS INTEGER) END AS turn_idx,
    CASE WHEN event_id % 97 = 0 OR event_type = 'error' THEN NULL
         ELSE event_type END AS role,
    _text AS text,
    CASE WHEN event_type = 'purchase' AND event_id % 97 <> 0 THEN 'checkout'
         ELSE NULL END AS tool,
    ts,
    CAST(COALESCE(length(_text), 0) + 89 AS INTEGER) AS event_size,
    CAST(user_id % 8 AS BIGINT) AS cluster_id,
    CASE WHEN user_id % 3 = 0 THEN NULL
         ELSE CAST(user_id % 5 AS BIGINT) END AS location_group
  FROM (
    SELECT *,
      CASE WHEN event_id % 97 = 0 OR event_type = 'error' THEN NULL
           WHEN user_id % 25 IN (7, 8)
             THEN 'fork turn ' || CAST(event_id % 4 AS VARCHAR)
                  || ' the g' || CAST(CAST(floor(user_id / 25.0) AS BIGINT) AS VARCHAR)
                  || ' session replays the g' || CAST(CAST(floor(user_id / 25.0) AS BIGINT) AS VARCHAR)
                  || ' support thread about the g' || CAST(CAST(floor(user_id / 25.0) AS BIGINT) AS VARCHAR)
                  || ' password reset on the g' || CAST(CAST(floor(user_id / 25.0) AS BIGINT) AS VARCHAR)
                  || ' mobile app'
           ELSE 'evt ' || CAST(event_id AS VARCHAR) || ' :: ' || props
      END AS _text
    FROM events
  )
)
"""


def changes_from_events(events: DataFrame) -> DataFrame:
    """Spark side of the mapping — must stay semantically identical to
    :data:`CHANGES_CTE_SQL`."""
    conv_del = F.col("event_id") % 97 == 0
    is_tomb = conv_del | (F.col("event_type") == "error")
    fork = (F.col("user_id") % 25).isin(7, 8)
    # the group token g<g> recurs every ~3 words so EVERY word 3-shingle
    # contains it — fork pairs within a group are near-identical while
    # cross-group Jaccard collapses to ~0 (no quadratic all-fork clique)
    g = F.floor(F.col("user_id") / 25).cast("long").cast("string")
    fork_text = F.concat(
        F.lit("fork turn "), (F.col("event_id") % 4).cast("string"),
        F.lit(" the g"), g,
        F.lit(" session replays the g"), g,
        F.lit(" support thread about the g"), g,
        F.lit(" password reset on the g"), g,
        F.lit(" mobile app"),
    )
    text = F.when(fork, fork_text).otherwise(
        F.concat(
            F.lit("evt "), F.col("event_id").cast("string"),
            F.lit(" :: "), F.col("props"),
        )
    )
    return events.select(
        F.col("event_id").alias("lsn"),
        F.when(is_tomb, "D")
        .when(F.col("event_type").isin("click", "view"), "U")
        .otherwise("I")
        .alias("op"),
        F.format_string("conv-%04d", F.col("user_id")).alias("conv_id"),
        F.when(conv_del, F.lit(None)).otherwise((F.col("event_id") % 4).cast("int")).alias("turn_idx"),
        F.when(is_tomb, F.lit(None)).otherwise(F.col("event_type")).alias("role"),
        F.when(is_tomb, F.lit(None)).otherwise(text).alias("text"),
        F.when((F.col("event_type") == "purchase") & ~conv_del, "checkout").alias("tool"),
        # parquet may carry TIMESTAMP_NTZ; the engine schema is TIMESTAMP
        # (session TZ pinned to UTC, so the cast is value-preserving)
        F.col("ts").cast("timestamp").alias("ts"),
        F.when(is_tomb, F.lit(WIRE_OVERHEAD_BYTES))
        .otherwise(F.length(text) + WIRE_OVERHEAD_BYTES)
        .cast("int").alias("event_size"),
        (F.col("user_id") % 8).cast("long").alias("cluster_id"),
        # NULL = broadcast to every location group (reference
        # PostgresqlStorage.java:469-473); others target user%5
        F.when(F.col("user_id") % 3 == 0, F.lit(None))
        .otherwise(F.col("user_id") % 5)
        .cast("long")
        .alias("location_group"),
    )


def load_changes(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Read the shared ``events`` table and derive the change log."""
    events = spark.read.parquet(f"{sf_dir}/events.parquet")
    return changes_from_events(events)


def oracle(body_sql: str) -> str:
    """Wrap an oracle query body with the changes CTE.  A body that
    begins with further CTE definitions is joined with a comma."""
    sep = "" if body_sql.lstrip().upper().startswith(("SELECT", "WITH")) else ", "
    return f"WITH {CHANGES_CTE_SQL} {sep} {body_sql}"
