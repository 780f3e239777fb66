"""Skew handling: salted two-phase aggregation for hot conversations
(north rule, axes A+B; FIXTURES.md gives ~1% of conversations 100× the
event volume).

The LWW argmax is a hash aggregation, so Spark's partial (map-side)
combine already collapses hot keys per input partition.  Salting makes
the mitigation *explicit and guaranteed across the shuffle*: phase 1
aggregates on ``(key, salt)`` — spreading one hot key over
``salt_buckets`` reducers — and phase 2 combines the ≤``salt_buckets``
partials per key.  Because ``max(struct(lsn, …))`` is associative and
commutative and ``lsn`` is unique, the two-phase result is identical to
the direct aggregation, and final output ordering is unaffected.

AQE skew-join splitting (``spark.sql.adaptive.skewJoin.enabled``)
covers the MERGE join side; this covers the aggregation side.  The salt
is derived from the (unique) ``lsn`` — deterministic, no RNG, so
replays are bit-identical.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

SALT_COLUMN = "_salt"


def with_salt(df: DataFrame, salt_buckets: int, salt_on: str = "lsn") -> DataFrame:
    return df.withColumn(
        SALT_COLUMN, F.pmod(F.col(salt_on), F.lit(salt_buckets)).cast("int")
    )
