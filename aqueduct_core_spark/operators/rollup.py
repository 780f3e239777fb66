"""Incremental rollup: a continuous per-conversation aggregate
maintained from the table-level change feed (dirty-group recompute).

The consumer-side companion to the CDC core: downstream serving wants
``per-conversation stats`` (turn count, character volume, first/last
activity) without re-scanning a 10^10-row transcript table after every
epoch.  The reference's consumers do the same thing against the pipe —
tail the feed, maintain a local materialization (HttpPipeClient.java
consumers; the replica tables themselves are such a materialization).

**Why dirty-group recompute** (and not algebraic +/- deltas): the
change feed carries after-images of *winners*, not pre-images
(``catalog/table.py:changes_between``), so a sum can't be decremented
when an update rewrites a turn's text.  Recomputing only the touched
groups needs no pre-images, is exact for ANY aggregate (count, sum,
min/max, distinct sketches), and is the standard lakehouse pattern —
cost per refresh is O(changed conversations), never O(table):

1. dirty = DISTINCT conv_id over ``changes_between(v0, v1)`` — the
   manifest diff, reads only delta files committed in the interval;
2. fresh = the rollup aggregate over current state **semi-joined to
   dirty** (bucket-partitioned scan; Catalyst prunes);
3. rewrite only the rollup buckets holding dirty conversations —
   untouched buckets carry over by reference in the meta file (the
   same per-bucket referencing the main table's snapshots use).

Deleted conversations disappear naturally: a dirty conversation with
no surviving state rows produces no fresh row and its old row is
anti-joined away.

If the interval was folded (``fold_deltas`` rewrites history, so the
feed is unavailable — same contract as Iceberg CDF), refresh falls
back to a FULL recompute and says so in its metrics.

Single-writer, like every maintenance path here (fold, compaction):
one refresh job at a time; the meta file swap is atomic (``os.replace``).
"""

from __future__ import annotations

import os
import shutil

from pyspark.sql import DataFrame, SparkSession, functions as F

from aqueduct_core_spark.catalog.meta import VersionedMeta
from aqueduct_core_spark.catalog.table import ParquetTranscriptTable

#: internal hive-partition column used for bucket-pruned rewrites
_BUCKET = "_rbucket"


def conv_rollup(state: DataFrame) -> DataFrame:
    """The rollup definition: per-conversation aggregate over merged
    transcript state (one input row per live turn)."""
    return state.groupBy("conv_id").agg(
        F.count(F.lit(1)).alias("turns"),
        F.sum(F.length("text")).alias("chars"),
        F.min("ts").alias("first_ts"),
        F.max("ts").alias("last_ts"),
    )


_ROLLUP_SCHEMA = (
    "conv_id string, turns bigint, chars bigint, "
    "first_ts timestamp, last_ts timestamp"
)


class ConvView:
    """Bucket-partitioned materialization of ANY conversation-local
    transform of the merged state, refreshed incrementally from a
    :class:`ParquetTranscriptTable`'s change feed.

    ``transform(state) -> DataFrame`` must be CONVERSATION-LOCAL: the
    output rows carrying ``conv_id = c`` may depend only on c's own
    state rows (aggregations, windows or projections partitioned by
    ``conv_id``).  That is what makes the dirty-conversation recompute
    exact — a refresh re-runs the transform over just the conversations
    the change feed touched and splices the result into the untouched
    buckets.  Instances: :class:`ConvRollup` (per-conv aggregate),
    :func:`aqueduct_core_spark.functions.examples.sft_examples_view`
    (SFT example extraction).  ``refresh(table)`` matches the streaming
    loop's generic ``maintainers`` hook, so any ConvView can ride the
    apply loop per micro-batch.
    """

    def __init__(self, spark: SparkSession, root: str, transform, schema: str):
        self.spark = spark
        self.root = root
        self._transform = transform
        self._schema = schema
        self._vm = VersionedMeta(root)

    @classmethod
    def create(
        cls, spark: SparkSession, root: str, transform, schema: str,
        num_buckets: int = 32,
    ) -> "ConvView":
        os.makedirs(root, exist_ok=True)
        v = cls(spark, root, transform, schema)
        v._write_meta(
            {"table_version": -1, "num_buckets": num_buckets, "bucket_dirs": {}}
        )
        return v

    # -- meta (shared CAS protocol — catalog/meta.py) ---------------------
    @property
    def _meta_path(self) -> str:
        return self._vm.path

    def _meta(self) -> dict:
        return self._vm.read()

    def _write_meta(self, meta: dict) -> None:
        self._vm.init(meta)

    # -- read ------------------------------------------------------------
    def last_table_version(self) -> int:
        return int(self._meta()["table_version"])

    def read(self) -> DataFrame:
        """Current rollup contents (empty DataFrame before the first
        refresh)."""
        meta = self._meta()
        paths = [
            os.path.join(self.root, d, f"{_BUCKET}={b}")
            for b, d in meta["bucket_dirs"].items()
        ]
        paths = [p for p in paths if os.path.isdir(p)]
        if not paths:
            return self.spark.createDataFrame([], self._schema)
        cols = [c.split()[0] for c in self._schema.split(", ")]
        return self.spark.read.parquet(*paths).select(*cols)

    # -- refresh ----------------------------------------------------------
    def _bucket_col(self):
        n = int(self._meta()["num_buckets"])
        return F.pmod(F.hash(F.col("conv_id")), F.lit(n))

    def refresh(self, table: ParquetTranscriptTable) -> dict:
        """Bring the rollup up to the table's current snapshot.
        Returns metrics: mode (incremental/full/noop), versions,
        buckets rewritten."""
        meta = self._meta()
        v0 = int(meta["table_version"])
        v1 = table.catalog.current_version()
        if v1 == v0:
            return {"mode": "noop", "from_version": v0, "to_version": v1,
                    "buckets_rewritten": 0}

        dirty = None
        mode = "full"
        if v0 >= 0:
            try:
                dirty = (
                    table.changes_between(v0, v1)
                    .select("conv_id")
                    .distinct()
                )
                mode = "incremental"
            except (ValueError, FileNotFoundError, OSError):
                # interval folded/rewritten (ValueError) or the v0
                # manifest itself expired (FileNotFoundError — e.g. an
                # erase with purge=True ran expire_snapshots since the
                # last refresh): CDF unavailable -> full recompute
                dirty = None

        state = table.read()
        if dirty is not None:
            fresh = self._transform(state.join(dirty, "conv_id", "leftsemi"))
            affected = sorted(
                r[0]
                for r in dirty.select(
                    self._bucket_col().alias("b")
                ).distinct().collect()
            )
            kept_paths = [
                os.path.join(self.root, meta["bucket_dirs"][str(b)], f"{_BUCKET}={b}")
                for b in affected
                if str(b) in meta["bucket_dirs"]
            ]
            kept_paths = [p for p in kept_paths if os.path.isdir(p)]
            if kept_paths:
                kept = self.spark.read.parquet(*kept_paths).join(
                    dirty, "conv_id", "left_anti"
                )
                out = kept.unionByName(fresh)
            else:
                out = fresh
        else:
            fresh = self._transform(state)
            affected = list(range(int(meta["num_buckets"])))
            out = fresh

        out_dir = f"data-v{v1}"
        (
            out.withColumn(_BUCKET, self._bucket_col())
            .repartition(len(affected) or 1, F.col(_BUCKET))
            # overwrite: a crash between this write and the meta swap
            # leaves an unreferenced dir of this exact name — the
            # re-delivered refresh must overwrite it, not crash-loop on
            # errorIfExists (nothing references a dir until the meta
            # commit below)
            .write.mode("overwrite").partitionBy(_BUCKET)
            .parquet(os.path.join(self.root, out_dir))
        )
        meta["bucket_dirs"].update({str(b): out_dir for b in affected})
        meta["table_version"] = v1
        # CAS: a refresh racing another refresh (or any meta writer)
        # fails loud instead of silently reverting the winner's bucket
        # map — catalog/meta.py, same protocol as the SCD2 history
        self._vm.commit(meta, int(meta["version"]))
        return {
            "mode": mode,
            "from_version": v0,
            "to_version": v1,
            "buckets_rewritten": len(affected),
        }

    def expire(self) -> list[str]:
        """Remove data-v* dirs no bucket references anymore (the
        orphan-cleanup analog).  Dirs named for a table version ABOVE
        the last refreshed one belong to an in-flight refresh whose CAS
        commit hasn't landed yet (a generation dir is unreferenced
        until its commit) and are skipped — sweeping one would let that
        commit succeed referencing deleted files."""
        meta = self._meta()
        last_v = int(meta.get("table_version", -1))
        live = set(meta["bucket_dirs"].values())
        removed = []
        for d in os.listdir(self.root):
            if not d.startswith("data-v") or d in live:
                continue
            tail = d.removeprefix("data-v")
            if tail.isdigit() and int(tail) > last_v:
                continue  # in-flight refresh's generation
            shutil.rmtree(os.path.join(self.root, d), ignore_errors=True)
            removed.append(d)
        self._vm.cleanup()
        return removed


class ConvRollup(ConvView):
    """The original per-conversation aggregate materialization —
    :class:`ConvView` instantiated with :func:`conv_rollup`."""

    def __init__(self, spark: SparkSession, root: str):
        super().__init__(spark, root, conv_rollup, _ROLLUP_SCHEMA)

    @classmethod
    def create(
        cls, spark: SparkSession, root: str, num_buckets: int = 32
    ) -> "ConvRollup":
        os.makedirs(root, exist_ok=True)
        r = cls(spark, root)
        r._write_meta(
            {"table_version": -1, "num_buckets": num_buckets, "bucket_dirs": {}}
        )
        return r


def conversation_text(state: DataFrame, sep: str = "\n") -> DataFrame:
    """Assemble each conversation's full transcript in stable turn
    order — the serving/training payload view of the merged state
    (one `role: text` line per turn, joined with ``sep``).

    One hash aggregation on ``conv_id`` with map-side partial
    ``collect_list``; the sort is per-group ``array_sort`` over
    ``(turn_idx, …)`` structs (turn_idx is unique per conversation in
    state, so the struct order is exactly turn order) — no window, no
    global sort, skew bounded by the longest single conversation, the
    bound every per-conv operator in the engine carries.
    """
    turns = F.array_sort(
        F.collect_list(F.struct(F.col("turn_idx"), F.col("role"), F.col("text")))
    )
    return (
        state.groupBy("conv_id")
        .agg(turns.alias("_turns"))
        .select(
            "conv_id",
            F.size("_turns").cast("int").alias("n_turns"),
            F.array_join(
                F.transform(
                    "_turns", lambda t: F.concat_ws(": ", t["role"], t["text"])
                ),
                sep,
            ).alias("conv_text"),
        )
    )
