"""applyInPandasWithState per-conversation progress operator:
running totals match a straight-line pandas reduction; checkpointed
state survives a second availableNow pass (restart semantics)."""

import glob
import os

import pandas as pd

from aqueduct_core_spark.generator import generate_changes_pdf
from aqueduct_core_spark.streaming.stateful import (
    latest_progress,
    run_progress_available_now,
)
from tests.test_merge import to_spark


def _write_segments(spark, tmp_path, pdf, cuts, start_i=0):
    d = str(tmp_path / "flat")
    os.makedirs(d, exist_ok=True)
    for i, (a, b) in enumerate(zip(cuts, cuts[1:])):
        seg = str(tmp_path / f"seg-{start_i + i}")
        to_spark(spark, pdf.iloc[a:b]).coalesce(1).write.parquet(seg, mode="overwrite")
        for f in glob.glob(os.path.join(seg, "*.parquet")):
            os.rename(f, os.path.join(d, f"{start_i + i:04d}.parquet"))
    return d


def _expected(pdf: pd.DataFrame) -> pd.DataFrame:
    g = pdf.groupby("conv_id")
    return pd.DataFrame(
        {
            "events": g.size(),
            "max_lsn": g["lsn"].max(),
            "turns": g["turn_idx"].nunique(),
            "last_ts": g["ts"].max(),
        }
    ).reset_index()


def test_progress_matches_pandas_reduction(spark, tmp_path):
    pdf = generate_changes_pdf(12, seed=42)
    n = len(pdf)
    flat = _write_segments(spark, tmp_path, pdf, [0, n // 2, n])
    out = str(tmp_path / "out")
    run_progress_available_now(spark, flat, str(tmp_path / "ckpt"), out)

    got = latest_progress(spark, out).toPandas().sort_values("conv_id", ignore_index=True)
    exp = _expected(pdf).sort_values("conv_id", ignore_index=True)
    assert list(got["conv_id"]) == list(exp["conv_id"])
    assert list(got["events"]) == list(exp["events"])
    assert list(got["max_lsn"]) == list(exp["max_lsn"])
    assert list(got["turns"]) == list(exp["turns"])
    assert list(pd.to_datetime(got["last_ts"])) == list(pd.to_datetime(exp["last_ts"]))


def test_progress_state_survives_restart(spark, tmp_path):
    """Drain half the log, then the rest through the SAME checkpoint:
    counts continue from checkpointed state instead of resetting."""
    pdf = generate_changes_pdf(12, seed=42)
    n = len(pdf)
    flat = _write_segments(spark, tmp_path, pdf.iloc[: n // 2], [0, n // 2])
    out = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")
    run_progress_available_now(spark, flat, ckpt, out)

    _write_segments(spark, tmp_path, pdf.iloc[n // 2 :].reset_index(drop=True),
                    [0, n - n // 2], start_i=1)
    run_progress_available_now(spark, flat, ckpt, out)

    got = latest_progress(spark, out).toPandas().sort_values("conv_id", ignore_index=True)
    exp = _expected(pdf).sort_values("conv_id", ignore_index=True)
    assert list(got["events"]) == list(exp["events"])
    assert list(got["max_lsn"]) == list(exp["max_lsn"])
    assert list(got["turns"]) == list(exp["turns"])
