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
import shutil

from pyspark.sql import DataFrame, functions as F

from aqueduct_core_spark.catalog.table import ParquetTranscriptTable


def _atomic_write_json(path: str, obj: dict) -> None:
    """Write-fsync-rename JSON — the same durability discipline as the
    catalog's VERSION pointer; shared by the cursor and the publisher."""
    tmp = f"{path}.tmp"
    with open(tmp, "w") as f:
        json.dump(obj, f)
        f.flush()
        os.fsync(f.fileno())
    os.replace(tmp, path)


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
            # resume contract (Kafka auto.offset.reset semantics):
            # start_version is the INITIAL position, used only when no
            # acknowledged state exists; a surviving state file wins on
            # restart.  An intentional rewind is reset(to_version) —
            # warn when an explicit start_version is being overridden
            # so the operator who meant a rewind finds out now, not
            # from replica divergence later.
            if start_version is not None and int(start_version) != persisted:
                import warnings

                warnings.warn(
                    f"FeedCursor: persisted state at {state_path} resumes at "
                    f"version {persisted}, overriding start_version="
                    f"{int(start_version)}; use reset({int(start_version)}) "
                    "for an intentional rewind/replay",
                    stacklevel=2,
                )
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
        _atomic_write_json(self.state_path, {"version": self.version})

class FeedPublisher:
    """Exactly-once re-publication of a table's change feed as
    JSON-envelope wire segments — the reference's central-pipe
    "serve downstream sites" role (the server side of
    ``HttpPipeClient.java:36-63``'s tail loop) in file form.  The
    published directory IS a drainable change log: a downstream site
    runs ``run_available_now(wire_format="json-envelope")`` over
    :meth:`wire_glob` and converges to the primary's state through the
    ordinary exactly-once merge, with no coupling beyond the wire
    format.

    Commit protocol (rename-is-commit): each :meth:`publish` writes
    the resolved changes for the version interval ``(from_v, to_v]``
    as newline-delimited envelopes under a UNIQUE
    ``_pending/<from_v>.<uuid>/`` staging dir (racers never touch each
    other's staging; aged debris is swept under the same older-than
    contract as ``remove_orphan_files``), stamps the published-to
    version INSIDE it as a ``_to-…`` marker file (underscore prefix —
    invisible to Spark readers, like ``_SUCCESS``), then atomically
    renames to ``segments/<from_v>``.  The resume position is DERIVED
    from the committed segments' markers (seeded by ``base.json``), so
    position advances atomically with the data: a crash before the
    rename leaves sweepable debris; a crash after it has already
    published.  ``from_v = position()`` by construction and the rename
    target is keyed by the interval START alone, so racing publishers
    — even ones that read different ``to_v`` — collide on the same
    target and exactly one wins: intervals chain contiguously, nothing
    is ever skipped, double-published, or overlapping.

    Bootstrap contract: :meth:`create` stamps the table's CURRENT
    version as the base.  Create the publisher when the table is
    created (base = empty) or export that snapshot
    (``catalog/backup.py``) for the downstream seed — the classic
    snapshot + tail handoff.  Retention: a fold/compaction inside an
    unpublished interval makes ``changes_between`` fail loud (never
    under-publish); size ``mor_fold_every`` to the publish cadence,
    exactly like any feed consumer.
    """

    #: Wire compression for published segments.  The reference gzips
    #: every response body over a 1,024-byte threshold
    #: (pipe-codec ContentEncoder.java:23 threshold property,
    #: GzipCodec.java:43-85; Brotli preferred when the client offers
    #: it, BrotliCodec.java:29-34 quality 4).  Here the unit of
    #: compression is the SEGMENT FILE, not the message — segments are
    #: practically always far over the threshold, and codec-by-file-
    #: extension means every reader (Spark text source, the
    #: json-envelope drain, hadoop cat) sniffs and decompresses with
    #: zero decode branching.  ``None`` publishes plain text (debug).
    CODEC: str | None = "gzip"

    def __init__(
        self,
        table: ParquetTranscriptTable,
        out_dir: str,
        codec: str | None = CODEC,
    ):
        self.table = table
        self.out_dir = out_dir
        self.codec = codec
        if not os.path.exists(self._base_path):
            raise FileNotFoundError(
                f"no publisher at {out_dir}; FeedPublisher.create() it"
            )

    # -- layout ----------------------------------------------------------
    @property
    def _base_path(self) -> str:
        return os.path.join(self.out_dir, "base.json")

    @property
    def _segments_dir(self) -> str:
        return os.path.join(self.out_dir, "segments")

    @classmethod
    def create(
        cls,
        table: ParquetTranscriptTable,
        out_dir: str,
        codec: str | None = CODEC,
    ) -> "FeedPublisher":
        """Create a NEW publisher based at the table's current version.
        Fails loud on an existing publisher (re-basing would silently
        skip the unpublished interval); re-open one with the plain
        constructor instead."""
        base_path = os.path.join(out_dir, "base.json")
        if os.path.exists(base_path):
            raise FileExistsError(
                f"publisher already exists at {out_dir}; open it with "
                "FeedPublisher(table, out_dir) — re-creating would re-base "
                "past its unpublished interval"
            )
        os.makedirs(os.path.join(out_dir, "segments"), exist_ok=True)
        _atomic_write_json(
            base_path, {"version": table.catalog.current_version()}
        )
        return cls(table, out_dir, codec=codec)

    # -- position ---------------------------------------------------------
    def position(self) -> int:
        """Last published-to snapshot version — read straight from the
        committed segments' ``_to-…`` markers (no separate cursor file
        to fall out of sync)."""
        with open(self._base_path) as f:
            pos = int(json.load(f)["version"])
        for name in os.listdir(self._segments_dir):
            pos = max(pos, self._segment_to(name, default=pos))
        return pos

    def _segment_to(self, name: str, default: int) -> int:
        """A committed segment's published-to version, from the
        ``_to-…`` marker inside it (underscore prefix = invisible to
        Spark readers, like ``_SUCCESS``)."""
        d = os.path.join(self._segments_dir, name)
        try:
            for f in os.listdir(d):
                if f.startswith("_to-"):
                    return int(f[4:])
        except (NotADirectoryError, FileNotFoundError, ValueError):
            pass
        return default

    def wire_glob(self) -> str:
        """Stream-source path for downstream drains (new segments are
        new subdirectories; the file source's per-trigger listing picks
        them up)."""
        return os.path.join(self._segments_dir, "*")

    # -- publish ------------------------------------------------------------
    #: _pending entries older than this are crash debris and swept on
    #: the next publish (same older-than contract as remove_orphan_files:
    #: must exceed the longest possible publish attempt)
    PENDING_TTL_S = 3600.0

    def publish(self) -> dict:
        """Publish everything committed since :meth:`position` as one
        wire segment; no-op when the table hasn't advanced.

        Single-winner concurrency: the attempt stages under a UNIQUE
        ``_pending/<name>.<uuid>/`` dir (racers never touch each
        other's staging) and commits by renaming to
        ``segments/<from_v>`` — keyed by the interval START alone, so
        two racers that read the same position collide on the same
        rename target no matter what ``to_v`` each saw, and exactly one
        wins; the loser deletes its copy and reports ``lost_race``.
        Overlapping segments are therefore impossible by construction.
        The published-to version rides INSIDE the segment as a ``_to-…``
        marker written before the rename (atomic with the data)."""
        import time as _time
        import uuid as _uuid

        from aqueduct_core_spark.schema import LSN_COLUMN
        from aqueduct_core_spark.sources.envelope import to_envelope_json

        # sweep aged crash debris (never a live racer's staging: unique
        # names + the TTL contract)
        pend_root = os.path.join(self.out_dir, "_pending")
        if os.path.isdir(pend_root):
            cutoff = _time.time() - self.PENDING_TTL_S
            for entry in os.listdir(pend_root):
                p = os.path.join(pend_root, entry)
                try:
                    if os.path.getmtime(p) <= cutoff:
                        shutil.rmtree(p, ignore_errors=True)
                except FileNotFoundError:
                    continue

        from_v = self.position()
        to_v = self.table.catalog.current_version()
        if to_v <= from_v:
            return {"published": False, "position": from_v}

        feed = self.table.changes_between(from_v, to_v)
        # feed rows carry table payload only; routing metadata is a
        # log-level concern the downstream's own dims re-derive
        wire = to_envelope_json(
            feed.withColumnRenamed(LSN_COLUMN, "lsn")
            .withColumn("cluster_id", F.lit(None).cast("long"))
            .withColumn("location_group", F.lit(None).cast("long"))
        ).select("value")
        name = f"{from_v:012d}"
        pending = os.path.join(pend_root, f"{name}.{_uuid.uuid4().hex[:8]}")
        writer = wire.write.mode("overwrite")
        if self.codec:  # wire compression — see CODEC
            writer = writer.option("compression", self.codec)
        writer.text(pending)
        # the marker is part of the staged content: it becomes visible
        # atomically with the data on the rename below
        with open(os.path.join(pending, f"_to-{to_v:012d}"), "w"):
            pass
        final = os.path.join(self._segments_dir, name)
        try:
            os.rename(pending, final)
        except OSError:
            # a racing publisher committed this from_v first: single
            # winner, this attempt's copy is redundant
            shutil.rmtree(pending, ignore_errors=True)
            if not os.path.isdir(final):
                raise
            return {"published": False, "lost_race": True, "position": from_v}
        return {
            "published": True,
            "segment": name,
            "from_version": from_v,
            "to_version": to_v,
        }
