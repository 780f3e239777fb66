"""Log/turn integrity audits and embedding decontamination.

Planted-defect tests: each audit must find exactly the defects the
fixture plants and nothing else, and the decontamination flag must
fire exactly on the planted near-duplicate of a benchmark vector.
"""

from __future__ import annotations

import datetime as dt

import pyspark.sql.functions as F
import pyspark.sql.types as T

from aqueduct_core_spark.verify import log_audit, turn_integrity

TS = dt.datetime(2026, 1, 1, 12, 0, 0)


def _log(spark, rows):
    return spark.createDataFrame(
        [(int(lsn), cid, t) for lsn, cid, t in rows],
        T.StructType(
            [
                T.StructField("lsn", T.LongType(), False),
                T.StructField("conv_id", T.StringType(), False),
                T.StructField("turn_idx", T.IntegerType(), True),
            ]
        ),
    )


def test_log_audit_clean(spark):
    df = _log(spark, [(i, "c", 0) for i in range(5, 10)])
    row = log_audit(df).collect()[0]
    assert row.n_events == 5 and row.n_lsns == 5
    assert row.dup_lsns == 0 and row.missing_lsns == 0
    assert row.min_lsn == 5 and row.max_lsn == 9


def test_log_audit_holes_and_dups(spark):
    # lsns 1,2,2,5 → one duplicate, holes {3,4}
    df = _log(spark, [(1, "c", 0), (2, "c", 1), (2, "c", 1), (5, "c", 2)])
    row = log_audit(df).collect()[0]
    assert row.n_events == 4 and row.n_lsns == 3
    assert row.dup_lsns == 1
    assert row.null_lsns == 0
    assert row.missing_lsns == 2


def test_log_audit_null_lsns_not_counted_as_dups(spark):
    # a feed with NULL offsets is a different defect class than
    # re-delivered offsets — it must report null_lsns, not dup_lsns
    # (ADVICE r3: count(*) - count(DISTINCT lsn) counted every NULL
    # as a duplicate)
    schema = T.StructType(
        [
            T.StructField("lsn", T.LongType(), True),
            T.StructField("conv_id", T.StringType(), False),
            T.StructField("turn_idx", T.IntegerType(), True),
        ]
    )
    df = spark.createDataFrame(
        [(1, "c", 0), (None, "c", 1), (None, "c", 2), (4, "c", 3)], schema
    )
    row = log_audit(df).collect()[0]
    assert row.n_events == 4 and row.n_lsns == 2
    assert row.dup_lsns == 0
    assert row.null_lsns == 2
    assert row.missing_lsns == 2  # holes {2,3} inside [1,4]


def test_turn_integrity_flags_only_defects(spark):
    state = _log(
        spark,
        # ok: dense 0..2
        [(1, "ok", 0), (2, "ok", 1), (3, "ok", 2)]
        # hole: turn 1 missing
        + [(4, "hole", 0), (5, "hole", 2)]
        # offset: starts at 1 (dense but no turn 0)
        + [(6, "offset", 1), (7, "offset", 2)],
    )
    got = {r.conv_id: r for r in turn_integrity(state).collect()}
    assert set(got) == {"hole", "offset"}
    assert got["hole"].missing_turns == 1 and got["hole"].min_turn == 0
    assert got["offset"].missing_turns == 0 and got["offset"].min_turn == 1


def test_decontaminate_embeddings_flags_planted_dup(spark):
    from aqueduct_core_spark.functions.similarity import (
        decontaminate_embeddings,
    )

    dim = 8
    bench_vec = [1.0, 0.0, 1.0, 0.0, 1.0, 0.0, 1.0, 0.0]
    # corpus: one near-copy of the benchmark vector, one orthogonal
    near = [0.9, 0.1, 1.1, 0.0, 0.9, 0.0, 1.0, 0.1]
    orth = [0.0, 1.0, 0.0, -1.0, 0.0, 1.0, 0.0, -1.0]
    schema = T.StructType(
        [
            T.StructField("vec_id", T.LongType(), False),
            T.StructField("embedding", T.ArrayType(T.FloatType()), False),
        ]
    )
    corpus = spark.createDataFrame([(1, near), (2, orth)], schema)
    bench = spark.createDataFrame([(100, bench_vec)], schema)
    got = {
        r.vec_id: r
        for r in decontaminate_embeddings(
            corpus, bench, threshold=0.8, dim=dim
        ).collect()
    }
    assert got[1].contaminated and got[1].bench_id == 100
    assert got[1].max_sim > 0.95
    assert not got[2].contaminated
    assert abs(got[2].max_sim) < 0.01


def test_decontaminate_tiebreak_smallest_bench_id(spark):
    from aqueduct_core_spark.functions.similarity import (
        decontaminate_embeddings,
    )

    v = [1.0, 0.0, 0.0, 0.0]
    schema = T.StructType(
        [
            T.StructField("vec_id", T.LongType(), False),
            T.StructField("embedding", T.ArrayType(T.FloatType()), False),
        ]
    )
    corpus = spark.createDataFrame([(1, v)], schema)
    # two identical benchmark vectors → equal sim; smaller id must win
    bench = spark.createDataFrame([(20, v), (10, v)], schema)
    row = decontaminate_embeddings(corpus, bench, threshold=0.5, dim=4).collect()[0]
    assert row.bench_id == 10 and row.contaminated


def test_decontaminate_zero_norm_benchmark_ignored(spark):
    # ADVICE r3: a zero-norm benchmark vector yields NaN cosine, and NaN
    # sorts above every number in Spark's struct max — it must NOT
    # become every corpus row's nearest match / mask real contamination
    from aqueduct_core_spark.functions.similarity import (
        decontaminate_embeddings,
    )

    v = [1.0, 0.0, 0.0, 0.0]
    zero = [0.0, 0.0, 0.0, 0.0]
    schema = T.StructType(
        [
            T.StructField("vec_id", T.LongType(), False),
            T.StructField("embedding", T.ArrayType(T.FloatType()), False),
        ]
    )
    corpus = spark.createDataFrame([(1, v), (2, zero)], schema)
    bench = spark.createDataFrame([(5, zero), (10, v)], schema)
    got = {
        r.vec_id: r
        for r in decontaminate_embeddings(
            corpus, bench, threshold=0.5, dim=4
        ).collect()
    }
    # real contamination still detected, attributed to the REAL vector
    assert got[1].contaminated and got[1].bench_id == 10
    assert abs(got[1].max_sim - 1.0) < 1e-6
    # zero-norm corpus vector: no defined cosine → NULL max_sim, not
    # contaminated, and the row is still present (one row per vector)
    assert got[2].max_sim is None and got[2].contaminated is False


def test_turn_runs_islands(spark):
    from aqueduct_core_spark.operators.temporal import turn_runs

    state = _log(
        spark,
        # conv "a": turns 0-1 same key, 2 different, 3-5 same again
        [(1, "a", 0), (2, "a", 1), (3, "a", 2), (4, "a", 3), (5, "a", 4), (6, "a", 5)]
        # conv "b": all distinct keys → no runs
        + [(7, "b", 0), (8, "b", 1)],
    ).withColumn(
        "k",
        F.when(F.col("conv_id") == "b", F.concat(F.lit("u"), F.col("turn_idx")))
        .when(F.col("turn_idx") <= 1, F.lit("x"))
        .when(F.col("turn_idx") == 2, F.lit("y"))
        .otherwise(F.lit("x")),
    )
    got = turn_runs(state, "k", min_run=2).collect()
    assert [(r.conv_id, r.key, r.from_turn, r.to_turn, r.run_len) for r in got] == [
        ("a", "x", 0, 1, 2),
        ("a", "x", 3, 5, 3),
    ]


def test_turn_runs_null_keys_are_a_run(spark):
    from aqueduct_core_spark.operators.temporal import turn_runs

    state = _log(spark, [(1, "a", 0), (2, "a", 1), (3, "a", 2)]).withColumn(
        "k", F.lit(None).cast("string")
    )
    got = turn_runs(state, "k", min_run=2).collect()
    assert len(got) == 1 and got[0].run_len == 3 and got[0].key is None


def _offsets(spark, rows):
    import datetime as dt

    from aqueduct_core_spark.schema import OFFSETS_SCHEMA

    return spark.createDataFrame(
        [
            (int(e), int(lsn), 10, 0, pl, TS, "UP_TO_DATE")
            for e, lsn, pl in rows
        ],
        OFFSETS_SCHEMA,
    )


def _pl(buckets):
    import json

    return json.dumps({"scope": "batch", "buckets": buckets})


def test_epoch_lineage_audit_healthy_replay(spark, tmp_path):
    from aqueduct_core_spark.catalog.table import ParquetTranscriptTable
    from aqueduct_core_spark.config import EngineConfig
    from aqueduct_core_spark.generator import generate_changes
    from aqueduct_core_spark.streaming.monitor import epoch_lineage_audit
    from aqueduct_core_spark.streaming.pipeline import replay

    work = str(tmp_path)
    generate_changes(spark, n_convs=60, seed=7).write.parquet(f"{work}/log")
    table = ParquetTranscriptTable.create(spark, f"{work}/t", num_buckets=4)
    log = spark.read.parquet(f"{work}/log")
    replay(
        table,
        log,
        EngineConfig(num_buckets=4, max_events_per_trigger=500),
    )
    assert table.last_committed_epoch() >= 1  # multi-epoch replay
    assert epoch_lineage_audit(table).count() == 0


def test_epoch_lineage_audit_detects_violations(spark):
    from aqueduct_core_spark.streaming.monitor import epoch_lineage_audit

    healthy = _offsets(
        spark,
        [
            (0, 100, _pl({"3": {"keys": 5, "min_lsn": 1, "max_lsn": 100}})),
            (1, 200, _pl({"1": {"keys": 5, "min_lsn": 101, "max_lsn": 200}})),
        ],
    )
    assert epoch_lineage_audit(healthy).count() == 0

    bad = _offsets(
        spark,
        [
            (0, 100, _pl({"3": {"keys": 5, "min_lsn": 1, "max_lsn": 100}})),
            # watermark went backwards AND lineage dips below epoch 0
            (1, 90, _pl({"1": {"keys": 5, "min_lsn": 50, "max_lsn": 90}})),
            # lineage claims beyond its own watermark
            (2, 300, _pl({"1": {"keys": 5, "min_lsn": 201, "max_lsn": 400}})),
            # duplicate epoch row
            (2, 300, None),
        ],
    )
    reasons = sorted(
        r.reason for r in epoch_lineage_audit(bad).collect()
    )
    assert reasons == [
        "duplicate_epoch_row",
        "lineage_below_prev_watermark",
        "lineage_beyond_watermark",
        "watermark_regression",
    ]


def test_turn_latency_gaps_and_negative_signal(spark):
    from aqueduct_core_spark.operators.temporal import turn_latency

    rows = [
        # conv "a": ts gaps of +60s then -30s (out-of-order final edit)
        ("a", 0, TS),
        ("a", 1, TS + dt.timedelta(seconds=60)),
        ("a", 2, TS + dt.timedelta(seconds=30)),
        # conv "b": single turn → no gaps, absent from output
        ("b", 0, TS),
    ]
    schema = T.StructType(
        [
            T.StructField("conv_id", T.StringType(), False),
            T.StructField("turn_idx", T.IntegerType(), False),
            T.StructField("ts", T.TimestampType(), False),
        ]
    )
    got = {r.conv_id: r for r in turn_latency(
        spark.createDataFrame(rows, schema)
    ).collect()}
    assert set(got) == {"a"}
    a = got["a"]
    assert a.n_gaps == 2
    assert a.min_gap_s == -30.0 and a.max_gap_s == 60.0
    assert a.mean_gap_s == 15.0


def test_edit_magnitude_planted_pair(spark):
    from aqueduct_core_spark.functions.examples import edit_magnitude

    schema = T.StructType(
        [
            T.StructField("conv_id", T.StringType(), False),
            T.StructField("turn_idx", T.IntegerType(), False),
            T.StructField("rejected_lsn", T.LongType(), False),
            T.StructField("rejected_role", T.StringType(), False),
            T.StructField("rejected_text", T.StringType(), False),
            T.StructField("chosen_lsn", T.LongType(), False),
            T.StructField("chosen_role", T.StringType(), False),
            T.StructField("chosen_text", T.StringType(), False),
            T.StructField("n_versions", T.LongType(), False),
        ]
    )
    pairs = spark.createDataFrame(
        [
            # one substitution: kitten → sitten? use classic kitten/sitting = 3
            ("a", 0, 1, "r", "kitten", 9, "r", "sitting", 2),
            # identical texts → zero edit
            ("a", 1, 2, "r", "same", 8, "r", "same", 2),
        ],
        schema,
    )
    got = {(r.conv_id, r.turn_idx): r for r in edit_magnitude(pairs).collect()}
    k = got[("a", 0)]
    assert k.edit_distance == 3 and k.len_delta == 1
    assert abs(k.edit_ratio - 3 / 7) < 1e-6
    z = got[("a", 1)]
    assert z.edit_distance == 0 and z.len_delta == 0 and z.edit_ratio == 0.0


def test_op_transitions_matrix(spark):
    from aqueduct_core_spark.verify import op_transitions

    rows = [
        # key (c,0): I → U → D   (all strict)
        (1, "c", 0, "I"), (2, "c", 0, "U"), (3, "c", 0, "D"),
        # key (c,1): U first (update before insert) then I after... I→I
        (4, "c", 1, "U"), (5, "c", 1, "I"), (6, "c", 1, "I"),
        # conversation-level row must be ignored
        (7, "c", None, "D"),
    ]
    df = spark.createDataFrame(
        rows,
        T.StructType(
            [
                T.StructField("lsn", T.LongType(), False),
                T.StructField("conv_id", T.StringType(), False),
                T.StructField("turn_idx", T.IntegerType(), True),
                T.StructField("op", T.StringType(), False),
            ]
        ),
    )
    got = {(r.prev_op, r.op): r for r in op_transitions(df).collect()}
    assert got[("START", "I")].protocol_ok and got[("START", "I")].n_events == 1
    assert got[("I", "U")].protocol_ok
    assert got[("U", "D")].protocol_ok
    assert not got[("START", "U")].protocol_ok  # update before insert
    assert not got[("I", "I")].protocol_ok      # double insert
    assert got[("U", "I")].protocol_ok is False  # re-insert without delete
    assert sum(r.n_events for r in got.values()) == 6  # conv-level row excluded


def test_epoch_audit_query_flags_every_planted_class(spark):
    """The driver-row query (cdc_epoch_audit) forges all four violation
    classes into a synthetic offsets table; the audit must flag each —
    including the cascades the forgeries imply (the dup row shifts the
    real epoch-2 row's prev-watermark; the regressed epoch-4 watermark
    puts its own lineage maxima beyond it)."""
    import sys

    sys.path.insert(0, "/root/repo")
    import __spark_entry__ as e

    rows = e.queries()["cdc_epoch_audit"](
        spark, "/root/testdata/sf0.01"
    ).collect()
    reasons = {r.reason for r in rows}
    assert reasons == {
        "duplicate_epoch_row",
        "watermark_regression",
        "lineage_beyond_watermark",
        "lineage_below_prev_watermark",
    }
    assert len(rows) > 4  # cascades present, not just 1 row per class
