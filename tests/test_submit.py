"""spark-submit --py-files packaging smoke (north rule: 'ships via
spark-submit --py-files to multi-executor clusters').

Packages the engine into dist/yaschva_spark.zip, then runs
scripts/submit_job.py in a FRESH spark-submit process whose only access to
the engine is the shipped zip (cwd is a temp dir; the repo is not on
PYTHONPATH), and checks the printed job result."""

from __future__ import annotations

import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_spark_submit_pyfiles(tmp_path):
    subprocess.run(
        ["bash", os.path.join(REPO, "scripts", "make_pyfiles.sh")],
        check=True, capture_output=True, cwd=REPO,
    )
    zip_path = os.path.join(REPO, "dist", "yaschva_spark.zip")
    assert os.path.exists(zip_path)

    env = {k: v for k, v in os.environ.items() if k != "PYTHONPATH"}
    env["PYSPARK_PYTHON"] = sys.executable
    out = subprocess.run(
        [
            "spark-submit",
            "--master", "local[4]",
            "--conf", "spark.ui.enabled=false",
            "--conf", "spark.sql.shuffle.partitions=8",
            "--py-files", zip_path,
            os.path.join(REPO, "scripts", "submit_job.py"),
            "--rows", "5000",
            "--out", str(tmp_path / "out"),
        ],
        capture_output=True, text=True, env=env, cwd=str(tmp_path), timeout=600,
    )
    assert out.returncode == 0, out.stderr[-3000:]
    result = json.loads(
        [ln for ln in out.stdout.splitlines() if ln.startswith("{")][-1]
    )
    assert result["n_rows"] >= 5000  # includes injected duplicates
    assert result["n_violations"] > 0
    assert result["buckets"] == 8
