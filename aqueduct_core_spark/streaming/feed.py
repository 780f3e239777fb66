"""Incremental consumer over the table-level change feed.

The reference's store nodes tail the central pipe with a persisted
offset register (LOCAL_LATEST_OFFSET, ``OffsetName.java:4``; the HTTP
client resumes from it, ``HttpPipeClient.java:36-63``).  This module is
that consumer loop expressed against the TABLE feed
(:meth:`~aqueduct_core_spark.catalog.table.ParquetTranscriptTable.changes_between`)
instead of the raw log: downstream consumers receive RESOLVED winners
(a key updated 100× inside an epoch appears once per epoch), and the
position is a snapshot version, not an lsn.
"""

from __future__ import annotations

import json
import os

from pyspark.sql import DataFrame

from aqueduct_core_spark.catalog.table import ParquetTranscriptTable


class FeedCursor:
    """At-least-once cursor over a table's change feed.

    ``poll()`` returns the resolved changes committed since the last
    acknowledged version (None when there is nothing new);
    ``commit()`` acknowledges them.  With ``state_path`` the
    acknowledged position persists (atomic one-line JSON, same
    write-then-rename discipline as the catalog's VERSION pointer), so
    a restarted consumer resumes exactly where it acknowledged — a
    crash between poll and commit re-delivers, never skips.

    The feed requires an unfolded interval: if a fold/compaction
    rewrote history past this cursor (the consumer lagged beyond the
    table's retention — see ``changes_between``), ``poll()`` propagates
    that ``ValueError``; recover with ``reset()`` (full resync: the
    caller re-reads table state, the cursor jumps to current).  Size
    ``mor_fold_every``/``expire_snapshots`` to the slowest consumer's
    lag, exactly as Iceberg CDF retention works.
    """

    def __init__(
        self,
        table: ParquetTranscriptTable,
        start_version: int | None = None,
        state_path: str | None = None,
    ):
        self.table = table
        self.state_path = state_path
        self._pending: int | None = None
        persisted = self._load_state()
        if persisted is not None:
            self.version = persisted
        elif start_version is not None:
            self.version = int(start_version)
        else:
            self.version = table.catalog.current_version()

    # -- consume --------------------------------------------------------
    def poll(self) -> DataFrame | None:
        """Resolved changes in ``(acknowledged, current]``, or None when
        the table hasn't advanced.  Does NOT move the cursor — call
        :meth:`commit` after processing (at-least-once)."""
        cur = self.table.catalog.current_version()
        if cur <= self.version:
            return None
        df = self.table.changes_between(self.version, cur)
        self._pending = cur
        return df

    def commit(self) -> int:
        """Acknowledge the last poll: the cursor advances (and persists,
        when ``state_path`` is set) to the version that poll captured.
        A commit with nothing pending is a no-op."""
        if self._pending is not None:
            self.version = self._pending
            self._pending = None
            self._save_state()
        return self.version

    def reset(self, to_version: int | None = None) -> int:
        """Full-resync escape hatch after retention outran this cursor:
        jump to ``to_version`` (default: current) without reading a
        feed.  The caller is responsible for re-seeding its replica
        from table state (``read_internal``/``read_as_of``) — exactly
        the reference's bootstrap-then-tail handoff."""
        self.version = (
            self.table.catalog.current_version()
            if to_version is None
            else int(to_version)
        )
        self._pending = None
        self._save_state()
        return self.version

    # -- persistence ------------------------------------------------------
    def _load_state(self) -> int | None:
        if not self.state_path or not os.path.exists(self.state_path):
            return None
        with open(self.state_path) as f:
            return int(json.load(f)["version"])

    def _save_state(self) -> None:
        if not self.state_path:
            return
        tmp = f"{self.state_path}.tmp"
        with open(tmp, "w") as f:
            json.dump({"version": self.version}, f)
            f.flush()
            os.fsync(f.fileno())
        os.replace(tmp, self.state_path)
