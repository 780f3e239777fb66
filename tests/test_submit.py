"""Deployment-shape proof: the engine runs under ``spark-submit
--py-files <package zip>`` — the north-rule cluster launch mode — in a
separate JVM/process from the test session, and verifies its own final
state with the consistency checksum."""

import json
import os
import shutil
import subprocess
import zipfile

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _zip_package(dest: str) -> str:
    zip_path = os.path.join(dest, "aqueduct_core_spark.zip")
    pkg = os.path.join(REPO, "aqueduct_core_spark")
    with zipfile.ZipFile(zip_path, "w", zipfile.ZIP_DEFLATED) as z:
        for root, _dirs, files in os.walk(pkg):
            if "__pycache__" in root:
                continue
            for f in files:
                if f.endswith(".pyc"):
                    continue
                full = os.path.join(root, f)
                z.write(full, os.path.relpath(full, REPO))
    return zip_path


@pytest.mark.skipif(shutil.which("spark-submit") is None,
                    reason="spark-submit not on PATH")
def test_spark_submit_py_files_replay(tmp_path):
    zip_path = _zip_package(str(tmp_path))
    env = {k: v for k, v in os.environ.items() if k != "PYTHONPATH"}
    out = subprocess.run(
        [
            "spark-submit",
            "--master", "local[4]",
            "--conf", "spark.sql.shuffle.partitions=4",
            "--conf", "spark.sql.session.timeZone=UTC",
            "--conf", "spark.ui.enabled=false",
            "--py-files", zip_path,
            os.path.join(REPO, "tools", "submit_replay.py"),
            "--changes", str(tmp_path / "changes"),
            "--table", str(tmp_path / "transcripts"),
            "--generate-convs", "100",
            "--buckets", "4",
        ],
        capture_output=True,
        text=True,
        timeout=420,
        cwd=str(tmp_path),  # NOT the repo root: the zip must be the import source
        env=env,
    )
    assert out.returncode == 0, out.stdout[-2000:] + out.stderr[-2000:]
    line = [l for l in out.stdout.splitlines() if l.startswith("{")][-1]
    m = json.loads(line)
    assert m["state_ok"] is True
    assert m["events"] > 0 and m["final_rows"] > 0
    assert m["mode"] == "replay"
