"""Incremental near-duplicate index: admission-control dedup at ingest.

The batch dedup operators (:mod:`aqueduct_core_spark.functions.dedup`)
answer "which documents in THIS corpus are near-duplicates of each
other" — an O(corpus) job every time.  A 100 TB training-data pipeline
asks a different question at ingest: *is this incoming batch a
near-duplicate of anything we already have?*  Re-sharding and
re-hashing the historical corpus per batch is the thing that doesn't
scale; the industry answer is a persisted MinHash/LSH **signature
index** maintained incrementally (the same structure the batch LSH
builds and throws away).

:class:`DedupIndex` persists (band, bucket, id) membership rows,
hash-partitioned into ``num_parts`` directory parts by
``pmod(bucket, num_parts)``:

- :meth:`add` signatures for a new batch — one append + one atomic
  meta swap; cost O(batch), never O(index).
- :meth:`check` an incoming batch against history — the incoming
  side's touched parts are computed first, so the index read is
  **pruned to the parts the batch can collide with** (a streaming-size
  batch touches few parts; the join key is 12 bytes, document text
  never shuffles).  Optional exact-Jaccard verification against a
  caller-supplied historical text source.
- :meth:`remove` / :meth:`compact` — tombstone-based retraction for
  mutable documents (a transcript grows new turns → its signature is
  retracted and re-added), with a scheduled rewrite folding tombstones
  in.

Duplicate (band, bucket, id) rows are harmless by construction
(candidates are ``distinct``-ed), which makes :meth:`add` safe under
at-least-once delivery — the crash-recovery story is "re-add the
batch", mirroring the engine's idempotent apply.

Parameters are stamped into the index meta at :meth:`create` and every
query validates against them — a build/query mismatch fails loud
instead of silently returning wrong candidates.
"""

from __future__ import annotations

import os
import shutil
import uuid

from pyspark.sql import DataFrame, SparkSession, functions as F

from aqueduct_core_spark.catalog.meta import VersionedMeta
from aqueduct_core_spark.functions.dedup import (
    hash64,
    minhash_signatures,
    word_shingles,
)

_PART = "_part"
#: membership rows carry the add-version ``v`` so a tombstone at
#: version T kills only rows with v <= T — a retract-then-re-add
#: (:meth:`DedupIndex.reindex`) leaves the re-added rows live.
_INDEX_SCHEMA = "band int, bucket bigint, id string, v int"
_TOMB_SCHEMA = "id string, v int"


class DedupIndex:
    """Persisted, incrementally-maintained LSH band-bucket index."""

    def __init__(self, spark: SparkSession, root: str):
        self.spark = spark
        self.root = root
        self._vm = VersionedMeta(root)

    # -- meta (shared CAS protocol — catalog/meta.py; the index's own
    # content-version counter doubles as the CAS version, so an add()
    # racing a remove() from the same version loses loudly instead of
    # silently dropping the winner's tombstones or file-list entries) --
    @property
    def _meta_path(self) -> str:
        return self._vm.path

    def _meta(self) -> dict:
        return self._vm.read()

    def _write_meta(self, meta: dict) -> None:
        self._vm.init(meta)

    @classmethod
    def create(
        cls,
        spark: SparkSession,
        root: str,
        *,
        num_hashes: int = 64,
        bands: int = 16,
        shingle_k: int = 3,
        hash_method: str = "xxhash64",
        num_parts: int = 16,
    ) -> "DedupIndex":
        if num_hashes % bands:
            raise ValueError(f"bands ({bands}) must divide num_hashes ({num_hashes})")
        os.makedirs(root, exist_ok=True)
        ix = cls(spark, root)
        ix._write_meta(
            {
                "num_hashes": num_hashes,
                "bands": bands,
                "shingle_k": shingle_k,
                "hash_method": hash_method,
                "num_parts": num_parts,
                "version": 0,
                "n_docs": 0,
                "files": {},  # part -> [relative parquet paths]
                "tombstones": [],  # relative parquet paths of removed ids
            }
        )
        return ix

    @classmethod
    def load(cls, spark: SparkSession, root: str) -> "DedupIndex":
        ix = cls(spark, root)
        ix._meta()  # raises if absent
        return ix

    # -- signature plumbing ---------------------------------------------
    def _buckets(self, docs: DataFrame, text_col: str, id_col: str) -> DataFrame:
        """(band, bucket, id) membership rows for a batch — the same
        signature + banding the batch path uses, via
        ``lsh_candidate_pairs``'s bucket projection inlined."""
        m = self._meta()
        sigs = minhash_signatures(
            docs,
            text_col=text_col,
            id_col=id_col,
            num_hashes=m["num_hashes"],
            shingle_k=m["shingle_k"],
            hash_method=m["hash_method"],
        )
        rpb = m["num_hashes"] // m["bands"]
        return sigs.select(
            "id",
            F.explode(
                F.array(
                    *[
                        F.struct(
                            F.lit(b).alias("band"),
                            hash64(
                                F.concat_ws(
                                    ",",
                                    *[
                                        F.col("sig")[b * rpb + r].cast("string")
                                        for r in range(rpb)
                                    ],
                                ),
                                method=m["hash_method"],
                            ).alias("bucket"),
                        )
                        for b in range(m["bands"])
                    ]
                )
            ).alias("bb"),
        ).select(
            F.col("bb.band").alias("band"),
            F.col("bb.bucket").alias("bucket"),
            # ids are stored as strings regardless of source type — one
            # stable on-disk schema across heterogeneous id columns
            F.col("id").cast("string").alias("id"),
        )

    def _read_parts(self, parts: list[int] | None = None) -> DataFrame:
        """Manifest-pinned read of the index rows, pruned to ``parts``."""
        meta = self._meta()
        files = []
        for p, fl in meta["files"].items():
            if parts is None or int(p) in parts:
                files.extend(os.path.join(self.root, f) for f in fl)
        if not files:
            return self.spark.createDataFrame([], _INDEX_SCHEMA)
        df = self.spark.read.schema(_INDEX_SCHEMA).parquet(*files)
        return self._minus_tombstones(df, meta)

    def _minus_tombstones(self, df: DataFrame, meta: dict) -> DataFrame:
        if not meta["tombstones"]:
            return df
        dead = (
            self.spark.read.schema(_TOMB_SCHEMA)
            .parquet(*[os.path.join(self.root, t) for t in meta["tombstones"]])
            .groupBy("id")
            .agg(F.max("v").alias("_dead_v"))
        )
        return (
            df.join(F.broadcast(dead), on="id", how="left")
            .where(F.col("_dead_v").isNull() | (F.col("v") > F.col("_dead_v")))
            .drop("_dead_v")
        )

    # -- maintenance ------------------------------------------------------
    def _stage_add(
        self,
        meta: dict,
        docs: DataFrame,
        text_col: str,
        id_col: str,
        buckets: DataFrame | None = None,
    ) -> int:
        """Write a batch's membership rows under a fresh label dir and
        fold the file list + ``n_docs`` estimate into ``meta`` (no
        commit — the caller publishes).  Rows are stamped with the
        version the commit WILL publish (``meta["version"] + 1``), so
        a same-commit tombstone at the base version never kills them.
        Returns the number of files added (0 for an empty batch)."""
        n_new = docs.select(id_col).distinct().count()
        if n_new == 0:
            return 0
        n_parts = meta["num_parts"]
        rows = (
            (buckets if buckets is not None else self._buckets(docs, text_col, id_col))
            .withColumn("v", F.lit(meta["version"] + 1).cast("int"))
            .withColumn(_PART, F.pmod(F.col("bucket"), F.lit(n_parts)).cast("int"))
        )
        label = f"add-v{meta['version'] + 1}-{uuid.uuid4().hex[:8]}"
        out_dir = os.path.join(self.root, label)
        (
            rows.repartition(n_parts, F.col(_PART))
            .write.partitionBy(_PART)
            .parquet(out_dir)
        )
        added = 0
        for d in os.listdir(out_dir):
            if not d.startswith(f"{_PART}="):
                continue
            p = d.split("=", 1)[1]
            rel = [
                os.path.join(label, d, f)
                for f in os.listdir(os.path.join(out_dir, d))
                if f.endswith(".parquet")
            ]
            meta["files"].setdefault(p, []).extend(rel)
            added += len(rel)
        # running estimate (re-adds double-count, removes subtract
        # blindly); compact() resets it to the exact live count
        meta["n_docs"] += n_new
        return added

    def _stage_remove(self, meta: dict, ids: DataFrame, id_col: str) -> int:
        """Write a tombstone file for ``ids`` and fold it into ``meta``
        (no commit).  Tombstones carry the base version: they kill rows
        with ``v <= base`` — everything visible when the caller read the
        meta — and spare rows a same-commit :meth:`_stage_add` stamps
        with ``base + 1``.  Returns the number of tombstone files (0
        for an empty id set)."""
        tomb = ids.select(F.col(id_col).cast("string").alias("id")).distinct()
        n_gone = tomb.count()
        if n_gone == 0:
            return 0
        label = f"rm-v{meta['version'] + 1}-{uuid.uuid4().hex[:8]}"
        out_dir = os.path.join(self.root, label)
        (
            tomb.withColumn("v", F.lit(meta["version"]).cast("int"))
            .coalesce(1)
            .write.parquet(out_dir)
        )
        rel = [
            os.path.join(label, f)
            for f in os.listdir(out_dir)
            if f.endswith(".parquet")
        ]
        meta["tombstones"].extend(rel)
        meta["n_docs"] = max(0, int(meta["n_docs"]) - n_gone)
        return len(rel)

    def add(self, docs: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> dict:
        """Index a batch of documents: O(batch) signature work, one
        part-partitioned append, one CAS meta commit.  Idempotent
        under re-delivery (duplicate membership rows collapse in
        :meth:`check`'s distinct).  An empty batch is a no-op — no
        file, no commit (a per-epoch maintainer must not grow the
        file list on idle epochs)."""
        meta = self._meta()
        added = self._stage_add(meta, docs, text_col, id_col)
        if added == 0:
            return {"version": meta["version"], "files_added": 0}
        meta = self._vm.commit(meta, int(meta["version"]))
        return {"version": meta["version"], "files_added": added}

    def ingest(
        self,
        docs: DataFrame,
        text_col: str = "text",
        id_col: str = "doc_id",
        corpus: DataFrame | None = None,
        threshold: float = 0.0,
    ) -> tuple[DataFrame, dict]:
        """:meth:`check` + :meth:`add` in ONE signature pass — the
        admission-control cadence (gate the incoming batch against
        history, then index it) pays shingling + minhash + banding once
        instead of twice: the checkpointed bucket frame feeds both the
        candidate join and the part-partitioned append.

        Returns ``(pairs, add_metrics)``.  ``pairs`` is evaluated
        against the PRE-add index state (a batch never matches itself
        through the index; intra-batch duplicates are the batch
        pipeline's own job) and stays valid after the add — it reads
        the pre-add file list, and index files are only ever deleted by
        :meth:`compact`."""
        meta = self._meta()
        inc = self._buckets(docs, text_col, id_col).localCheckpoint(eager=True)
        pairs = self._candidates(
            meta, inc, docs, text_col, id_col, corpus, threshold
        )
        added = self._stage_add(meta, docs, text_col, id_col, buckets=inc)
        if added == 0:
            return pairs, {"version": meta["version"], "files_added": 0}
        meta = self._vm.commit(meta, int(meta["version"]))
        return pairs, {"version": meta["version"], "files_added": added}

    def remove(self, ids: DataFrame, id_col: str = "doc_id") -> dict:
        """Retract documents (tombstone append): their membership rows
        stop matching at :meth:`check` immediately; the bytes are
        reclaimed by the next :meth:`compact`.  An empty id set is a
        no-op — a per-epoch maintainer polling a feed with no deletes
        must not append an empty tombstone file every epoch (the
        tombstone list would grow without bound between compactions
        for zero retractions)."""
        meta = self._meta()
        n_files = self._stage_remove(meta, ids, id_col)
        if n_files == 0:
            return {"version": meta["version"], "tombstone_files": 0}
        meta = self._vm.commit(meta, int(meta["version"]))
        return {"version": meta["version"], "tombstone_files": n_files}

    def reindex(self, docs: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> dict:
        """Replace mutable documents' signatures (retract + re-add) —
        the transcript case: a conversation grew new turns, its
        conversation-level document changed.  ONE CAS commit publishes
        the tombstones and the re-added rows together: a conflict (or a
        crash) leaves the index exactly as it was — the retraction can
        never land without its re-add, which would make live documents
        invisible to :meth:`check` until a manual repair."""
        meta = self._meta()
        tomb_files = self._stage_remove(meta, docs.select(id_col), id_col)
        added = self._stage_add(meta, docs, text_col, id_col)
        if tomb_files == 0 and added == 0:
            return {"version": meta["version"], "files_added": 0,
                    "tombstone_files": 0}
        meta = self._vm.commit(meta, int(meta["version"]))
        return {"version": meta["version"], "files_added": added,
                "tombstone_files": tomb_files}

    def compact(self) -> dict:
        """Fold tombstones in and collapse duplicate membership rows:
        full rewrite of the index (run on a maintenance schedule, like
        ``fold_deltas``), one CAS meta commit, then physical reclamation
        of every superseded or orphaned label dir and stale CAS claims.
        Resets ``n_docs`` to the exact live count (the running add/
        remove estimate drifts under reindex re-delivery).

        Operational contract (same as ``fold_deltas`` /
        ``remove_orphan_files``): quiesce concurrent :meth:`check`
        queries — physical deletion lands right after the commit, so a
        reader that planned its scan against the pre-compact file list
        loses its files mid-query.  Compliance flows rely on this
        immediacy (``erase_everywhere`` expects the removed ids' bytes
        gone when compact returns)."""
        meta = self._meta()
        # sweep-candidate snapshot BEFORE the rewrite/commit: a racing
        # add()/remove() that reads the post-compact meta creates its
        # label dir strictly after this listing (its dir write follows
        # its meta read), so it can never be swept; a racer holding the
        # PRE-compact meta is doomed to MetaCommitConflict anyway, and
        # losing its staged dir to the sweep is harmless
        candidates = [
            d for d in os.listdir(self.root)
            if d.startswith(("add-", "rm-", "compact-"))
        ]
        live = self._read_parts(None).distinct().withColumn(
            _PART, F.pmod(F.col("bucket"), F.lit(meta["num_parts"])).cast("int")
        )
        label = f"compact-v{meta['version'] + 1}-{uuid.uuid4().hex[:8]}"
        out_dir = os.path.join(self.root, label)
        (
            live.repartition(meta["num_parts"], F.col(_PART))
            .write.partitionBy(_PART)
            .parquet(out_dir)
        )
        n_docs = self.spark.read.parquet(out_dir).select("id").distinct().count()
        files: dict[str, list[str]] = {}
        for d in os.listdir(out_dir):
            if not d.startswith(f"{_PART}="):
                continue
            p = d.split("=", 1)[1]
            files[p] = [
                os.path.join(label, d, f)
                for f in os.listdir(os.path.join(out_dir, d))
                if f.endswith(".parquet")
            ]
        base = int(meta["version"])
        meta.update({"files": files, "tombstones": [], "n_docs": n_docs})
        meta = self._vm.commit(meta, base)
        # physical reclamation: every label dir that existed when this
        # compact started, except the one we just committed — covers
        # superseded labels AND orphans left by crashed or CAS-losing
        # writers (their dirs were never referenced, so nothing else
        # sweeps them).  Bounded to the pre-compact snapshot so a
        # racing post-commit add()'s fresh dir is never collateral.
        for d in candidates:
            if d == label:
                continue
            shutil.rmtree(os.path.join(self.root, d), ignore_errors=True)
        self._vm.cleanup()
        return {"version": meta["version"], "parts": len(files),
                "n_docs": n_docs}

    # -- query ------------------------------------------------------------
    def touched_parts(self, incoming_buckets: DataFrame) -> list[int]:
        """Index parts an incoming batch can collide with — the prune
        set for :meth:`check`'s read (collect is bounded by
        ``num_parts``)."""
        n = self._meta()["num_parts"]
        return sorted(
            r["p"]
            for r in incoming_buckets.select(
                F.pmod(F.col("bucket"), F.lit(n)).cast("int").alias("p")
            )
            .distinct()
            .collect()
        )

    def check(
        self,
        docs: DataFrame,
        text_col: str = "text",
        id_col: str = "doc_id",
        corpus: DataFrame | None = None,
        threshold: float = 0.0,
    ) -> DataFrame:
        """Candidate near-duplicates of an incoming batch against the
        index: ``(id_in, id_indexed)`` distinct pairs, self-matches
        excluded (an id may legitimately be on both sides during
        re-delivery).

        With ``corpus`` (the historical ``(id, text)`` source, e.g. the
        documents table or :func:`conversation_documents` of the
        transcript table) and a ``threshold``, candidates are
        exact-Jaccard verified — the LSH-then-verify contract of
        :func:`aqueduct_core_spark.functions.dedup.minhash_dedup`, but
        incremental: only the candidates' texts are ever compared.
        """
        m = self._meta()
        # materialize the batch's signatures once: touched_parts()
        # collects over them AND the candidate join reads them — an
        # unpersisted plan would pay shingling + minhash + banding
        # twice (localCheckpoint rather than persist/unpersist: the
        # returned frame is lazy, so an unpersist here would land
        # before the caller ever runs the join)
        inc = self._buckets(docs, text_col, id_col).localCheckpoint(eager=True)
        return self._candidates(m, inc, docs, text_col, id_col, corpus, threshold)

    def _candidates(
        self,
        m: dict,
        inc: DataFrame,
        docs: DataFrame,
        text_col: str,
        id_col: str,
        corpus: DataFrame | None,
        threshold: float,
    ) -> DataFrame:
        """Candidate (+ optionally verified) pairs of a checkpointed
        bucket frame ``inc`` against the index state described by ``m``
        — the shared body of :meth:`check` and :meth:`ingest`."""
        parts = self.touched_parts(inc)
        idx = self._read_parts(parts)
        pairs = (
            inc.alias("i")
            .join(
                idx.alias("x"),
                (F.col("i.band") == F.col("x.band"))
                & (F.col("i.bucket") == F.col("x.bucket"))
                & (F.col("i.id") != F.col("x.id")),
            )
            .select(F.col("i.id").alias("id_in"), F.col("x.id").alias("id_indexed"))
            .distinct()
        )
        if corpus is None or threshold <= 0:
            return pairs
        k = m["shingle_k"]
        in_sh = docs.select(
            F.col(id_col).cast("string").alias("id_in"),
            word_shingles(F.col(text_col), k).alias("_sh_in"),
        )
        hist_sh = corpus.select(
            F.col(id_col).cast("string").alias("id_indexed"),
            word_shingles(F.col(text_col), k).alias("_sh_x"),
        )
        inter = F.size(F.array_intersect("_sh_in", "_sh_x"))
        union = F.size(F.array_union("_sh_in", "_sh_x"))
        jac = F.floor(inter / union * 1e6 + F.lit(0.5)) / 1e6
        return (
            pairs.join(in_sh, on="id_in")
            .join(hist_sh, on="id_indexed")
            .withColumn("jaccard", jac)
            .where(F.col("jaccard") >= threshold)
            .select("id_in", "id_indexed", "jaccard")
        )


def conversation_documents(state: DataFrame) -> DataFrame:
    """Conversation-level documents from transcript state: turns
    concatenated in stable ``turn_idx`` order — the unit the dedup
    index tracks for a transcripts corpus.  One groupBy, text moves
    once."""
    ordered = F.array_join(
        F.transform(
            F.array_sort(
                F.collect_list(F.struct(F.col("turn_idx"), F.col("text")))
            ),
            lambda s: F.coalesce(s["text"], F.lit("")),
        ),
        " ",
    )
    return state.groupBy(F.col("conv_id").alias("doc_id")).agg(ordered.alias("text"))


def sync_index_from_feed(index: DedupIndex, table, cursor) -> dict:
    """Keep a :class:`DedupIndex` of conversation-level documents
    current with a transcript table, incrementally: poll the table
    feed (:class:`~aqueduct_core_spark.streaming.feed.FeedCursor`),
    re-derive ONLY the changed conversations' documents from current
    state, retract their old signatures and add the new ones.  Index
    maintenance cost per epoch is O(changed conversations), never
    O(corpus)."""
    synced = 0
    while True:
        feed = cursor.poll()
        if feed is None:
            return {"batches": synced}
        dirty = feed.select("conv_id").distinct()
        docs = conversation_documents(
            table.read().join(dirty, on="conv_id", how="leftsemi")
        )
        index.reindex(docs)
        # conversations fully deleted since last poll have no state rows:
        gone = dirty.join(
            docs.select(F.col("doc_id").alias("conv_id")), on="conv_id", how="left_anti"
        ).select(F.col("conv_id").alias("doc_id"))
        index.remove(gone)
        cursor.commit()
        synced += 1


class DedupIndexMaintainer:
    """Adapter that lets a :class:`DedupIndex` ride the streaming apply
    loop (``start_stream(maintainers=[...])``): after each committed
    epoch, :meth:`refresh` drains the table's change feed into the
    index via :func:`sync_index_from_feed`, so admission-control dedup
    always sees the corpus as of the last commit.  A replayed (skipped)
    epoch leaves the table version unchanged, so the cursor polls
    nothing and the refresh no-ops — maintenance inherits the engine's
    exactly-once story the same way the rollup does.  Cost per epoch is
    O(changed conversations); pass a persisted-``state_path`` cursor so
    a restarted stream resumes index maintenance where it acknowledged."""

    name = "dedup_index"

    def __init__(self, index: DedupIndex, cursor) -> None:
        self.index = index
        self.cursor = cursor

    def refresh(self, table) -> dict:
        return sync_index_from_feed(self.index, table, self.cursor)
