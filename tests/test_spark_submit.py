"""Packaging smoke: the production job must run under real ``spark-submit
--py-files logspark.zip`` (north_rule packaging requirement), not just
in-process imports. Builds the zip, generates a small corpus, submits, and
checks the per-sink output + checkpoint rows.
"""

from __future__ import annotations

import glob
import os
import shutil
import subprocess
import sys
import zipfile

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _build_zip(path: str) -> str:
    zpath = os.path.join(path, "logspark.zip")
    with zipfile.ZipFile(zpath, "w") as z:
        for f in glob.glob(os.path.join(REPO, "logspark", "*.py")):
            z.write(f, os.path.join("logspark", os.path.basename(f)))
    return zpath


@pytest.mark.slow
def test_spark_submit_job(spark, small_corpus, tmp_path):
    spark_submit = shutil.which("spark-submit")
    if spark_submit is None:
        pytest.skip("spark-submit not on PATH")
    inp = str(tmp_path / "corpus")
    small_corpus.write.mode("overwrite").parquet(inp)
    zpath = _build_zip(str(tmp_path))
    out, ck = str(tmp_path / "sinks"), str(tmp_path / "ctrl")
    env = dict(os.environ, PYSPARK_PYTHON=sys.executable, SPARK_GRAFT_CPUS="4")
    res = subprocess.run(
        [
            spark_submit,
            "--master",
            "local[4]",
            "--py-files",
            zpath,
            os.path.join(REPO, "logspark", "job.py"),
            "--input",
            inp,
            "--output",
            out,
            "--checkpoint",
            ck,
            "--partitions",
            "8",
            "--run-id",
            "submit-smoke",
        ],
        capture_output=True,
        text=True,
        timeout=420,
        env=env,
    )
    assert res.returncode == 0, res.stdout[-2000:] + res.stderr[-2000:]
    assert "run_id=submit-smoke" in res.stdout
    written = spark.read.parquet(out)
    assert written.count() == small_corpus.count()
    sinks_seen = {r["sink"] for r in written.select("sink").distinct().collect()}
    assert {"visits", "errors"} <= sinks_seen
    ctrl = spark.read.parquet(ck)
    assert ctrl.count() > 0
