"""aqueduct_core_spark — a PySpark-native CDC / incremental-ingest engine.

A brand-new engine with the capability set of the reference system
(Tesco aqueduct-core, a Java/Micronaut hierarchical change-data
distribution pipe): an ordered change-event log (insert/update/delete
rows keyed by ``(conv_id, turn_idx)`` with LSN-style offsets) is tailed
and applied — deduplicated, last-writer-wins merged, key-partitioned —
into a transcript lake table with additive schema evolution,
exactly-once offset/epoch bookkeeping, checkpoint recovery and
retention compaction.

Everything is expressed Spark-first: DataFrame/SQL plans optimized by
Catalyst, Structured Streaming ``foreachBatch`` for the apply loop,
vectorized pandas/Arrow UDFs where Python is unavoidable (payload
normalization only), and no per-row Python anywhere in the hot path.

Reference parity citations use ``file:line`` into ``/root/reference``.
"""

from aqueduct_core_spark.config import EngineConfig
from aqueduct_core_spark.session import get_spark

__all__ = ["EngineConfig", "get_spark"]
__version__ = "0.3.0"
