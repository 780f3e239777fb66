"""Training-example extraction from conversation transcripts.

The engine's merged state (LWW resolution of the change log) and its
SCD2 history are not just serving surfaces — they are the raw material
for supervised-fine-tuning and preference datasets.  This module turns
them into training examples with plain DataFrame plans:

- :func:`sft_examples` — (context, target) pairs: every turn of a
  chosen role becomes a target with the rendered transcript prefix as
  its context.  The standard SFT example shape.
- :func:`preference_pairs` — (rejected, chosen) pairs mined from the
  CDC *update history*: when a turn was overwritten in the log (a
  regeneration / edit), every superseded version pairs with the final
  surviving version of the same key.  The edit stream IS a preference
  signal — this is the one dataset shape only a CDC engine can produce,
  because append-only corpus snapshots never see the superseded text.

Scale notes (the 100 TB lens): both operators are a single window
shuffle partitioned by conversation (resp. turn key); skew is bounded
by the longest single conversation — the same bound every per-conv
operator in the engine carries (``operators/temporal.py``,
``operators/rollup.py``).  No UDFs, no driver collect, no self-join;
``preference_pairs`` attaches the chosen version with ``first()`` over
the same descending window that ranks versions, so the pairing is free
once the history is sorted.

Reference provenance: the update history these pairs mine is the
reference's core data model — every mutation is a new offset on the
same key and old versions stay readable until compaction
(pipe-storage-postgresql/.../PostgresqlStorage.java:252-266 upsert-
keeping-history semantics; SQLiteQueries.java:51-55 compaction is what
*removes* superseded versions).  Run extraction upstream of retention.
"""

from __future__ import annotations

import os
import shutil
import uuid

from pyspark.sql import DataFrame, SparkSession, Window, functions as F

from aqueduct_core_spark.catalog.meta import VersionedMeta

__all__ = [
    "sft_examples",
    "sft_examples_view",
    "preference_pairs",
    "pairs_from_history",
    "edit_magnitude",
    "PreferencePairsView",
]


def sft_examples(
    state: DataFrame,
    target_role: str,
    sep: str = "\n",
    min_context_turns: int = 1,
) -> DataFrame:
    """(context, target) SFT pairs from the merged transcript state.

    Every turn whose ``role`` equals ``target_role`` becomes one
    example: ``target`` is that turn's text, ``context`` is the
    rendered ``role: text`` lines of ALL earlier turns of the same
    conversation in stable turn order, joined with ``sep``.  Turns with
    fewer than ``min_context_turns`` preceding turns are dropped (a
    target with no context teaches nothing).

    Plan: one window shuffle on ``conv_id`` (running ``collect_list``
    over the preceding frame renders each prefix exactly once — no
    per-target re-scan, no quadratic array slicing); the role filter
    runs after the window so every turn contributes to contexts even
    when it never becomes a target.
    """
    line = F.concat_ws(": ", F.col("role"), F.col("text"))
    w = (
        Window.partitionBy("conv_id")
        .orderBy("turn_idx")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    return (
        state.select(
            "conv_id",
            "turn_idx",
            "role",
            F.col("text").alias("target"),
            F.count(F.lit(1)).over(w).alias("n_context_turns"),
            F.concat_ws(sep, F.collect_list(line).over(w)).alias("context"),
        )
        .where(
            (F.col("role") == target_role)
            & (F.col("n_context_turns") >= min_context_turns)
        )
        .select("conv_id", "turn_idx", "n_context_turns", "context", "target")
    )


def preference_pairs(
    changes: DataFrame,
    payload_cols: tuple[str, ...] = ("role", "text", "tool", "ts"),
) -> DataFrame:
    """(rejected, chosen) preference pairs from the CDC update history.

    A key that was written more than once carries an implicit
    preference label: the author (or upstream system) replaced the old
    text with a new one.  For every (conv_id, turn_idx) whose LATEST
    version is still current (the turn is alive in the final state),
    each superseded version closed by an ``'update'`` (i.e. genuinely
    overwritten — versions ended by turn or conversation deletes are
    removals, not preferences) yields one pair:

    ==================  ====================================================
    rejected_lsn/text   the superseded version (one row per such version)
    chosen_lsn/text     the key's final, current version
    rejected_role /
    chosen_role         roles of the two versions (filter downstream if the
                        pair should stay within one speaker role)
    n_versions          total versions the key ever had
    ==================  ====================================================

    Built on :func:`aqueduct_core_spark.operators.temporal.scd2_history`
    (itself two shuffles); the pairing adds ONE more window over the
    turn key — ``first()`` on the lsn-descending sort attaches the
    chosen version to every row, so no self-join materializes the
    pairs.
    """
    from aqueduct_core_spark.operators.temporal import scd2_history

    return pairs_from_history(scd2_history(changes, payload_cols))


def pairs_from_history(hist: DataFrame) -> DataFrame:
    """The pairing stage alone: (rejected, chosen) pairs from an SCD2
    history frame (batch-computed or the :class:`~aqueduct_core_spark.
    operators.scd2.Scd2History` sink's table).  Pure per-(conv_id,
    turn_idx) logic — all of a key's versions live in one history
    bucket, which is what makes the incremental view's bucket-local
    recompute exact."""
    wd = Window.partitionBy("conv_id", "turn_idx").orderBy(
        F.col("valid_from_lsn").desc()
    )
    wall = Window.partitionBy("conv_id", "turn_idx")
    ranked = hist.select(
        "conv_id",
        "turn_idx",
        F.col("valid_from_lsn").alias("rejected_lsn"),
        F.col("role").alias("rejected_role"),
        F.col("text").alias("rejected_text"),
        "end_reason",
        F.row_number().over(wd).alias("_rn"),
        F.first("valid_from_lsn").over(wd).alias("chosen_lsn"),
        F.first("role").over(wd).alias("chosen_role"),
        F.first("text").over(wd).alias("chosen_text"),
        F.first("is_current").over(wd).alias("_latest_current"),
        F.count(F.lit(1)).over(wall).alias("n_versions"),
    )
    return ranked.where(
        (F.col("_rn") > 1)
        & F.col("_latest_current")
        & (F.col("end_reason") == "update")
    ).select(
        "conv_id",
        "turn_idx",
        "rejected_lsn",
        "rejected_role",
        "rejected_text",
        "chosen_lsn",
        "chosen_role",
        "chosen_text",
        "n_versions",
    )


_PAIRS_SCHEMA = (
    "conv_id string, turn_idx int, rejected_lsn long, rejected_role string, "
    "rejected_text string, chosen_lsn long, chosen_role string, "
    "chosen_text string, n_versions long"
)
_PAIRS_COLS = [c.split()[0] for c in _PAIRS_SCHEMA.split(", ")]
_VBUCKET = "_pbucket"


class PreferencePairsView:
    """Incrementally-maintained preference-pair table — the training
    dataset that stays fresh as the change log advances.

    A materialized view over an
    :class:`aqueduct_core_spark.operators.scd2.Scd2History` sink:
    ``refresh(history)`` recomputes pairs ONLY for the history buckets
    rewritten since the view's last refresh, so refresh cost is
    O(touched conversations' history), never O(corpus) — the
    :class:`~aqueduct_core_spark.operators.rollup.ConvRollup`
    dirty-group pattern applied to training-example extraction.

    Dirtiness needs no extra bookkeeping: the history's meta maps each
    bucket to the data dir that last rewrote it, and the view stores
    the mapping it refreshed from — a bucket is dirty iff the entries
    differ.  Bucket-local recompute is exact because the pairing is a
    pure per-(conv_id, turn_idx) function and a key's versions never
    span buckets (:func:`pairs_from_history`).

    Crash safety: pair data lands in a UNIQUELY-named generation dir
    (epoch + nonce) and the meta swap is atomic — a crash between the
    write and the swap leaves unreferenced debris that :meth:`expire`
    sweeps, never a referenced dir at risk.  The name must not be the
    epoch alone: the history's compliance ops (``erase``/``redact``/
    ``prune_closed_before``) rewrite bucket generations WITHOUT
    advancing the epoch, so a post-erase refresh at the same epoch
    would overwrite-destroy the previous refresh's dir while other
    buckets' mappings still reference it.  Re-delivered/no-op epochs
    make the refresh a no-op (the mapping diff is empty).
    """

    def __init__(self, spark: SparkSession, root: str):
        self.spark = spark
        self.root = root
        self._vm = VersionedMeta(root)

    # -- meta (shared CAS protocol — catalog/meta.py) ---------------------
    @property
    def _meta_path(self) -> str:
        return self._vm.path

    def _meta(self) -> dict:
        return self._vm.read()

    def _write_meta(self, meta: dict) -> None:
        self._vm.init(meta)

    @classmethod
    def create(cls, spark: SparkSession, root: str) -> "PreferencePairsView":
        os.makedirs(root, exist_ok=True)
        v = cls(spark, root)
        v._write_meta(
            {"epoch": -1, "num_buckets": None, "hist_dirs": {}, "bucket_dirs": {}}
        )
        return v

    def read(self) -> DataFrame:
        meta = self._meta()
        paths = [
            os.path.join(self.root, d, f"{_VBUCKET}={b}")
            for b, d in meta["bucket_dirs"].items()
        ]
        paths = [p for p in paths if os.path.isdir(p)]
        if not paths:
            return self.spark.createDataFrame([], _PAIRS_SCHEMA)
        return self.spark.read.parquet(*paths).select(*_PAIRS_COLS)

    def refresh(self, history) -> dict:
        """Bring the view up to date with the history sink.  Returns
        ``{mode, buckets_refreshed, epoch}``."""
        from aqueduct_core_spark.operators.scd2 import _BUCKET, _COLS

        hmeta = history._meta()
        meta = self._meta()
        if meta["num_buckets"] is None:
            meta["num_buckets"] = int(hmeta["num_buckets"])
        elif int(meta["num_buckets"]) != int(hmeta["num_buckets"]):
            raise ValueError(
                f"history bucket count changed: view has "
                f"{meta['num_buckets']}, history has {hmeta['num_buckets']}"
            )
        dirty = sorted(
            (b for b, d in hmeta["bucket_dirs"].items()
             if meta["hist_dirs"].get(b) != d),
            key=int,
        )
        if not dirty:
            return {"mode": "noop", "buckets_refreshed": 0, "epoch": meta["epoch"]}
        paths = [
            os.path.join(history.root, hmeta["bucket_dirs"][b], f"{_BUCKET}={b}")
            for b in dirty
        ]
        paths = [p for p in paths if os.path.isdir(p)]
        hist_df = (
            self.spark.read.parquet(*paths).select(*_COLS)
            if paths
            else self.spark.createDataFrame(
                [], "conv_id string, turn_idx int, valid_from_lsn long, "
                    "valid_to_lsn long, end_reason string, is_current boolean, "
                    "row_op string, role string, text string, tool string, "
                    "ts timestamp"
            )
        )
        pairs = pairs_from_history(hist_df).select(*_PAIRS_COLS)
        # unique generation name: a history erase/redact/prune rewrites
        # buckets at the SAME epoch, so the epoch alone would collide
        # with (and destroy) the still-referenced previous generation
        out_dir = f"data-he{int(hmeta['epoch'])}-{uuid.uuid4().hex[:8]}"
        bucket_col = F.pmod(F.hash(F.col("conv_id")), F.lit(int(meta["num_buckets"])))
        (
            pairs.withColumn(_VBUCKET, bucket_col)
            .repartition(len(dirty), F.col(_VBUCKET))
            .write.partitionBy(_VBUCKET)
            .parquet(os.path.join(self.root, out_dir))
        )
        meta["bucket_dirs"].update({b: out_dir for b in dirty})
        meta["hist_dirs"].update({b: hmeta["bucket_dirs"][b] for b in dirty})
        meta["epoch"] = int(hmeta["epoch"])
        # CAS (catalog/meta.py): a racing refresh loses loudly instead
        # of silently reverting the winner's bucket map
        self._vm.commit(meta, int(meta["version"]))
        return {
            "mode": "refreshed",
            "buckets_refreshed": len(dirty),
            "epoch": int(hmeta["epoch"]),
        }

    def expire(self, grace_s: float = 3600.0) -> list[str]:
        """Remove ``data-he*`` generation dirs no bucket references
        anymore — superseded generations and crash debris.  An
        unreferenced dir may also belong to an in-flight refresh whose
        CAS commit hasn't landed: dirs stamped with a history epoch
        ABOVE the view's are skipped structurally, and same-epoch dirs
        (a post-erase refresh reuses the epoch) only sweep once older
        than ``grace_s`` (pass 0 when refreshes are quiesced)."""
        import time as _time

        meta = self._meta()
        cur_epoch = int(meta["epoch"])
        live = set(meta["bucket_dirs"].values())
        now = _time.time()
        removed = []
        for d in os.listdir(self.root):
            if not d.startswith("data-he") or d in live:
                continue
            head = d.removeprefix("data-he").split("-", 1)[0]
            if head.isdigit() and int(head) > cur_epoch:
                continue  # in-flight refresh at a newer history epoch
            try:
                if now - os.path.getmtime(os.path.join(self.root, d)) < grace_s:
                    continue  # possibly a racing same-epoch refresh
            except FileNotFoundError:
                continue
            shutil.rmtree(os.path.join(self.root, d), ignore_errors=True)
            removed.append(d)
        self._vm.cleanup()
        return removed


_SFT_SCHEMA = (
    "conv_id string, turn_idx int, n_context_turns bigint, "
    "context string, target string"
)


def sft_examples_view(
    spark: SparkSession,
    root: str,
    target_role: str,
    sep: str = "\n",
    min_context_turns: int = 1,
    num_buckets: int = 32,
    create: bool = True,
):
    """Incrementally-maintained SFT example table: a
    :class:`aqueduct_core_spark.operators.rollup.ConvView` whose
    transform is :func:`sft_examples` — legal because the extraction is
    conversation-local (the prefix window partitions by ``conv_id``),
    so dirty-conversation recompute is exact.  ``refresh(table)``
    matches the streaming loop's ``maintainers`` hook: pass the view in
    ``start_stream(maintainers=[view])`` and the SFT dataset follows
    the table per micro-batch, exactly-once by the table-version guard.
    ``create=False`` reopens an existing view."""
    from aqueduct_core_spark.operators.rollup import ConvView

    def _tf(state: DataFrame) -> DataFrame:
        return sft_examples(
            state.select("conv_id", "turn_idx", "role", "text"),
            target_role=target_role,
            sep=sep,
            min_context_turns=min_context_turns,
        )

    if create:
        return ConvView.create(spark, root, _tf, _SFT_SCHEMA, num_buckets)
    return ConvView(spark, root, _tf, _SFT_SCHEMA)


def edit_magnitude(pairs: DataFrame) -> DataFrame:
    """Edit-size analytics over (rejected, chosen) preference pairs:
    how BIG was each regeneration.  Per pair: the Levenshtein distance
    between the superseded and final text, the signed length delta, and
    the edit ratio (distance / longer length, 6-dp rounded) — the
    features that separate typo fixes from full rewrites when curating
    preference data (tiny-edit pairs teach noise; whole-rewrite pairs
    carry the strongest signal).

    Cost model: ``levenshtein`` is O(len_a·len_b) per pair JVM-side —
    fine for turn-sized texts; for pathological lengths cap the inputs
    upstream (``substring``) or pre-filter on ``abs(len_delta)``, which
    is O(1) and lower-bounds the distance.  No shuffle: a pure
    projection over the pairs frame.
    """
    from aqueduct_core_spark.functions.text import round6

    d = F.levenshtein("rejected_text", "chosen_text")
    denom = F.greatest(
        F.length("rejected_text"), F.length("chosen_text"), F.lit(1)
    )
    return pairs.select(
        "conv_id",
        "turn_idx",
        "rejected_lsn",
        "chosen_lsn",
        d.cast("long").alias("edit_distance"),
        (F.length("chosen_text") - F.length("rejected_text"))
        .cast("long")
        .alias("len_delta"),
        round6(d.cast("double") / denom).alias("edit_ratio"),
    )
