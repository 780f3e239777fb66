"""Payload normalization — the engine's only Python data-plane code,
and it is vectorized (Arrow-batched pandas UDFs; north rule: "no
per-row Python").

The reference treats payloads as opaque JSON strings and never
introspects them (``pipe-api/.../Message.java:14-31``); its only
payload computation is the serialized size
(``JsonHelper.toJson(message).length()`` —
``pipe-storage-sqlite/.../SQLiteStorage.java:545-557``).  Here payloads
are transcript text columns, so normalization means: Unicode/whitespace
cleanup of ``text`` before merge, plus the serialized-size computation.

Size is computed with **built-in** JVM expressions
(``length(to_json(struct(…)))``) — no Python at all; the pandas UDF is
reserved for the text cleanup that built-ins can't express.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame, functions as F
from pyspark.sql.functions import pandas_udf
from pyspark.sql import types as T
from aqueduct_core_spark.schema import WIRE_OVERHEAD_BYTES


@pandas_udf(T.StringType())
def normalize_text(s: pd.Series) -> pd.Series:
    """Arrow-vectorized text cleanup: NFC normalization, control-char
    strip, whitespace collapse, trim.  Entirely pandas-vectorized —
    one Python invocation per Arrow batch, not per row."""
    out = s.str.normalize("NFC")
    out = out.str.replace(r"[\x00-\x08\x0b\x0c\x0e-\x1f\x7f]", "", regex=True)
    out = out.str.replace(r"\s+", " ", regex=True).str.strip()
    return out


def with_normalized_text(df: DataFrame, col: str = "text") -> DataFrame:
    return df.withColumn(col, F.when(F.col(col).isNotNull(), normalize_text(F.col(col))))


def with_event_size(df: DataFrame, overhead: int = WIRE_OVERHEAD_BYTES) -> DataFrame:
    """X6: serialized JSON length, computed JVM-side (whole-stage
    codegen; zero Python)."""
    payload = F.to_json(
        F.struct(
            F.col("lsn").cast("string").alias("offset"),  # offset-as-string wire
            "op",
            "conv_id",
            "turn_idx",
            "role",
            "text",
            *(["tool"] if "tool" in df.columns else []),
            F.date_format("ts", "yyyy-MM-dd'T'HH:mm:ss'Z'").alias("created"),
        ),
        {"ignoreNullFields": "true"},  # NON_EMPTY inclusion, JsonHelper.java:25-37
    )
    return df.withColumn("event_size", (F.length(payload) + F.lit(overhead)).cast("int"))
