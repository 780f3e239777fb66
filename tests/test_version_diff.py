"""version_diff: row-level semantic diff between snapshot versions.

The delta-based feed (``changes_between``) fails loud across folds /
rewrites / erasures; a diff of two pinned reads is always well-defined
and manifest-pruned to the buckets whose file lists differ.
"""

import pyspark.sql.functions as F
import pytest

from aqueduct_core_spark.catalog.table import ParquetTranscriptTable
from aqueduct_core_spark.config import EngineConfig
from aqueduct_core_spark.generator import generate_changes
from aqueduct_core_spark.operators.antientropy import version_diff
from aqueduct_core_spark.operators.compact import fold_deltas
from aqueduct_core_spark.streaming.pipeline import replay


def _rows(df):
    return sorted(map(tuple, df.collect()))


@pytest.fixture()
def two_version_table(spark, tmp_path):
    root = str(tmp_path / "transcripts")
    table = ParquetTranscriptTable.create(spark, root, num_buckets=8)
    log = generate_changes(spark, n_convs=100, seed=23)
    split = int(log.agg(F.max("lsn")).collect()[0][0]) // 2
    cfg = EngineConfig(num_buckets=8)
    replay(table, log.where(F.col("lsn") < split), cfg,
           start_epoch=0, start_lsn=0, lsn_bounds=(0, split - 1))
    v_mid = table.catalog.current_version()
    replay(table, log.where(F.col("lsn") >= split), cfg)
    return table, log, split, v_mid


def test_version_diff_matches_state_semantics(spark, two_version_table):
    table, log, split, v_mid = two_version_table
    diff = version_diff(table, v_mid).cache()

    from aqueduct_core_spark.schema import LSN_COLUMN

    mid = {(r[0], r[1]): r[2] for r in
           table.read_internal(version=v_mid)
           .select("conv_id", "turn_idx", LSN_COLUMN).collect()}
    cur = {(r[0], r[1]): r[2] for r in
           table.read_internal()
           .select("conv_id", "turn_idx", LSN_COLUMN).collect()}

    expected = {}
    for k in set(mid) | set(cur):
        if k not in mid:
            expected[k] = ("added", None, cur[k])
        elif k not in cur:
            expected[k] = ("removed", mid[k], None)
        elif mid[k] != cur[k]:
            expected[k] = ("changed", mid[k], cur[k])
    got = {(r[0], r[1]): (r[2], r[3], r[4]) for r in diff.collect()}
    assert got == expected
    assert expected  # non-trivial workload


def test_version_diff_self_is_empty_and_prunes_everything(spark, two_version_table):
    table, _, _, v_mid = two_version_table
    v = table.catalog.current_version()
    assert version_diff(table, v, v).count() == 0
    # identical manifests → zero changed buckets → both reads are
    # pruned to an empty bucket list (cheap plan, no table scan)
    assert version_diff(table, v_mid, v_mid).count() == 0


def test_version_diff_survives_a_fold(spark, two_version_table):
    """A fold re-lists files without changing content: the diff answer
    must be identical before and after (changes_between would fail)."""
    table, _, _, v_mid = two_version_table
    before = _rows(version_diff(table, v_mid))
    assert fold_deltas(table)["folded"]
    after = _rows(version_diff(table, v_mid))
    assert after == before
    # and a fold-to-fold diff is empty even though every file changed
    v_folded = table.catalog.current_version()
    assert version_diff(table, v_folded - 1, v_folded).count() == 0
