"""Persisted incremental IVF-forest ANN index (functions/ann_index.py).

The contract: an incrementally-grown index answers identically to a
one-shot build with the same frozen codebooks — across batches,
retractions, re-adds and process restarts (load from disk).
"""

import numpy as np
import pytest
from pyspark.sql import functions as F

from aqueduct_core_spark.functions.ann_index import ForestIndex
from aqueduct_core_spark.functions.similarity import (
    forest_index,
    forest_topk,
    forest_train,
)


@pytest.fixture(scope="module")
def embs(spark):
    rng = np.random.RandomState(5)
    base = rng.standard_normal((300, 16))
    base[1:30] = base[0] * 0.6 + base[1:30] * 0.8  # plant a neighborhood
    return spark.createDataFrame(
        [(i, base[i].astype(float).tolist()) for i in range(300)],
        ["vec_id", "embedding"],
    )


@pytest.fixture(scope="module")
def cbs(spark, embs):
    return forest_train(embs, 16, n_tables=4, n_cells=8)


def _topk_tuples(df):
    return [(r.vec_id, r.sim) for r in df.collect()]


def test_incremental_equals_one_shot(spark, embs, cbs, tmp_path):
    ix = ForestIndex.create(spark, str(tmp_path / "ix"), cbs, num_parts=8)
    ix.add(embs.where(F.col("vec_id") < 150))
    ix.add(embs.where(F.col("vec_id") >= 150))
    q = list(embs.where("vec_id = 0").first()["embedding"])
    got = _topk_tuples(ix.topk(q, k=15))
    ref = _topk_tuples(
        forest_topk(forest_index(embs, cbs), q, cbs, k=15, vectors=embs)
    )
    assert got == ref and len(got) == 15


def test_remove_then_readd_roundtrips(spark, embs, cbs, tmp_path):
    ix = ForestIndex.create(spark, str(tmp_path / "ix"), cbs, num_parts=8)
    ix.add(embs)
    q = list(embs.where("vec_id = 0").first()["embedding"])
    before = _topk_tuples(ix.topk(q, k=15))
    # retract two vectors that ARE in the current answer (not the query)
    victims = [v for v, _ in before if v != 0][:2]
    assert len(victims) == 2

    ix.remove(embs.where(F.col("vec_id").isin(victims)).select("vec_id"))
    gone = _topk_tuples(ix.topk(q, k=15))
    assert all(v not in victims for v, _ in gone)

    # re-add: higher-version rows must survive the tombstone
    ix.add(embs.where(F.col("vec_id").isin(victims)))
    assert _topk_tuples(ix.topk(q, k=15)) == before


def test_load_from_disk_and_frozen_codebooks(spark, embs, cbs, tmp_path):
    root = str(tmp_path / "ix")
    ForestIndex.create(spark, root, cbs, num_parts=8).add(embs)
    ix2 = ForestIndex.load(spark, root)  # fresh handle, meta from disk
    assert ix2.codebooks() == cbs
    q = list(embs.where("vec_id = 0").first()["embedding"])
    ref = _topk_tuples(
        forest_topk(forest_index(embs, cbs), q, cbs, k=10, vectors=embs)
    )
    assert _topk_tuples(ix2.topk(q, k=10)) == ref


def test_empty_add_and_remove_are_no_ops(spark, embs, cbs, tmp_path):
    ix = ForestIndex.create(spark, str(tmp_path / "ix"), cbs, num_parts=8)
    v0 = ix._meta()["version"]
    out = ix.add(embs.where(F.lit(False)))
    assert out == {"version": v0, "files_added": 0}
    out = ix.remove(embs.where(F.lit(False)).select("vec_id"))
    assert out == {"version": v0, "tombstone_files": 0}
    assert ix._meta()["version"] == v0  # no empty commits


def test_topk_reads_only_probed_parts(spark, embs, cbs, tmp_path):
    """Part pruning is real: the probe's explicit MEMBERSHIP file list
    covers only the probed (tbl, cell) hash parts, a strict subset of
    the index; the only other inputs are the (id, vec) store files the
    rerank join reads (each vector stored once — the narrow layout)."""
    ix = ForestIndex.create(spark, str(tmp_path / "ix"), cbs, num_parts=16)
    ix.add(embs)
    q = list(embs.where("vec_id = 0").first()["embedding"])
    from aqueduct_core_spark.functions.similarity import forest_probe_cells

    kcells = ix._meta()["n_cells"]
    parts = {
        (t * kcells + c) % 16
        for t, c in forest_probe_cells(q, cbs, 2 * len(cbs))
    }
    meta = ix._meta()
    assert 0 < len(parts) < len(meta["files"])  # pruning not vacuous
    scanned = ix.topk(q, k=10).inputFiles()
    allowed = set(meta["vec_files"])
    for p in parts:
        allowed.update(meta["files"].get(str(p), []))
    assert scanned
    membership_scanned = 0
    for f in scanned:
        assert any(f.endswith(rel) for rel in allowed), f
        if not any(f.endswith(rel) for rel in meta["vec_files"]):
            membership_scanned += 1
    assert membership_scanned  # the probe did read (pruned) membership


def test_topk_direct_is_bit_identical_and_jobless(spark, embs, cbs, tmp_path):
    """The zero-Spark-job serving probe returns the SAME (vec_id, sim)
    tuples as the Spark plan — including after retraction + re-add
    (version resolve) — and schedules no Spark jobs at all."""
    ix = ForestIndex.create(spark, str(tmp_path / "ix"), cbs, num_parts=8)
    ix.add(embs.where(F.col("vec_id") < 150))
    ix.add(embs.where(F.col("vec_id") >= 150))
    q = list(embs.where("vec_id = 0").first()["embedding"])
    ref = _topk_tuples(ix.topk(q, k=15))
    victims = [v for v, _ in ref if v != 0][:2]
    ix.remove(embs.where(F.col("vec_id").isin(victims)).select("vec_id"))
    ix.add(embs.where(F.col("vec_id").isin(victims)))  # re-add survives
    ref2 = _topk_tuples(ix.topk(q, k=15))

    before = spark.sparkContext.statusTracker().getJobIdsForGroup(None)
    got = ix.topk_direct(q, k=15)
    after = spark.sparkContext.statusTracker().getJobIdsForGroup(None)
    assert list(map(tuple, got.itertuples(index=False))) == ref2
    assert ref2 == ref  # remove→re-add round-trips
    assert before == after  # zero Spark jobs on the direct path


def test_load_rejects_legacy_wide_layout(spark, embs, cbs, tmp_path):
    """A pre-split index (no vec_files in meta) must fail loud on load
    — reading it under the narrow schema would silently rerank nothing."""
    root = str(tmp_path / "ix")
    ix = ForestIndex.create(spark, root, cbs, num_parts=8)
    ix.add(embs.where(F.col("vec_id") < 50))
    meta = ix._meta()
    del meta["vec_files"]
    ix._vm.commit(meta, int(meta["version"]))
    with pytest.raises(ValueError, match="legacy wide layout"):
        ForestIndex.load(spark, root)


def test_float_source_store_is_half_size_and_bit_identical(spark, embs, cbs, tmp_path):
    """A float32-typed corpus stores float32 vectors (≈half the store
    bytes) and — because f32→f64 widening is exact — answers both the
    Spark and the direct probe IDENTICALLY to a double store of the
    same (f32-representable) values.  A double-typed add into a
    float-typed index fails loud (narrowing would change results)."""
    import os

    embs_f = embs.select("vec_id", F.col("embedding").cast("array<float>").alias("embedding"))
    # double-store reference over the SAME f32-representable values
    embs_wide = embs_f.select("vec_id", F.col("embedding").cast("array<double>").alias("embedding"))

    ix_f = ForestIndex.create(spark, str(tmp_path / "ixf"), cbs, num_parts=8)
    ix_f.add(embs_f)
    ix_d = ForestIndex.create(spark, str(tmp_path / "ixd"), cbs, num_parts=8)
    ix_d.add(embs_wide)
    assert ix_f._meta()["vec_dtype"] == "float"
    assert ix_d._meta()["vec_dtype"] == "double"

    q = [float(x) for x in embs_f.where("vec_id = 0").first()["embedding"]]
    assert _topk_tuples(ix_f.topk(q, k=15)) == _topk_tuples(ix_d.topk(q, k=15))
    got_f = ix_f.topk_direct(q, k=15)
    assert list(map(tuple, got_f.itertuples(index=False))) == _topk_tuples(ix_f.topk(q, k=15))

    def store_bytes(ix):
        return sum(
            os.path.getsize(os.path.join(ix.root, f))
            for f in ix._meta()["vec_files"]
        )

    # toy 16-dim vectors: parquet footer/dictionary overhead dominates,
    # so the byte ratio lands near 0.7 rather than the asymptotic 0.5
    # (the sf0.1 bench measures the real ratio)
    assert store_bytes(ix_f) < 0.8 * store_bytes(ix_d)

    with pytest.raises(ValueError, match="float32"):
        ix_f.add(embs_wide.where(F.col("vec_id") < 5))


# --- PQ sidecar: persisted IVF-PQ with zero-job ADC serving ---


def test_pq_sidecar_rerank_paths_bit_identical(spark, embs, cbs, tmp_path):
    """An index created with PQ codebooks maintains a (id, codes, v)
    sidecar through adds/removes/re-adds; `rerank=` probes run the
    persisted IVF-PQ plan.  Contracts: (a) a rerank budget covering
    every candidate is tuple-identical to the plain forest probe (the
    ADC cut is the only approximation added); (b) the zero-job direct
    probe with the same tight budget is tuple-identical to the Spark
    plan — and still schedules no jobs."""
    from aqueduct_core_spark.functions.similarity import pq_train

    pcbs = pq_train(embs, dim=16, n_sub=8, n_codes=16)
    ix = ForestIndex.create(
        spark, str(tmp_path / "ix"), cbs, num_parts=8, pq_codebooks=pcbs
    )
    ix.add(embs.where(F.col("vec_id") < 150))
    ix.add(embs.where(F.col("vec_id") >= 150))
    q = list(embs.where("vec_id = 0").first()["embedding"])
    victims = [2, 4]
    ix.remove(embs.where(F.col("vec_id").isin(victims)).select("vec_id"))
    ix.add(embs.where(F.col("vec_id").isin(victims)))

    # (a) full-budget IVF-PQ == plain forest probe
    assert _topk_tuples(ix.topk(q, k=15, rerank=10**6)) == _topk_tuples(
        ix.topk(q, k=15)
    )
    # (b) tight budget: Spark plan == zero-job direct, no jobs scheduled
    want = _topk_tuples(ix.topk(q, k=15, rerank=40))
    before = spark.sparkContext.statusTracker().getJobIdsForGroup(None)
    got = ix.topk_direct(q, k=15, rerank=40)
    after = spark.sparkContext.statusTracker().getJobIdsForGroup(None)
    assert list(map(tuple, got.itertuples(index=False))) == want
    assert before == after
    # the tight cut is a real cut (differs from the uncut answer is NOT
    # required — but the budget must bound the rerank set)
    assert len(want) == 15


def test_pq_sidecar_absent_fails_loud(spark, embs, cbs, tmp_path):
    ix = ForestIndex.create(spark, str(tmp_path / "ix"), cbs, num_parts=8)
    ix.add(embs.where(F.col("vec_id") < 50))
    q = list(embs.where("vec_id = 0").first()["embedding"])
    with pytest.raises(ValueError, match="PQ sidecar"):
        ix.topk(q, k=5, rerank=10)
    with pytest.raises(ValueError, match="PQ sidecar"):
        ix.topk_direct(q, k=5, rerank=10)
