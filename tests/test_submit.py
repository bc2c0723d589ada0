"""End-to-end spark-submit --py-files test (the north rule's deployment
contract): package the library as a zip, launch submit_main.py in a REAL
spark-submit subprocess, and check the pipeline output + resume skip."""

from __future__ import annotations

import json
import os
import shutil
import subprocess
import sys
import zipfile

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

SPARK_SUBMIT = shutil.which("spark-submit")


def _zip_package(dest: str) -> str:
    zpath = os.path.join(dest, "packs_spark.zip")
    pkg = os.path.join(REPO, "packs_spark")
    with zipfile.ZipFile(zpath, "w") as z:
        for root, _, files in os.walk(pkg):
            for f in files:
                if f.endswith(".py"):
                    full = os.path.join(root, f)
                    z.write(full, os.path.relpath(full, REPO))
    return zpath


@pytest.mark.skipif(SPARK_SUBMIT is None, reason="spark-submit not on PATH")
def test_spark_submit_py_files_end_to_end(spark, tmp_path):
    # tiny input written by the library's own generator
    from packs_spark.pipeline.generate import write_pages_parquet

    src = str(tmp_path / "pages.parquet")
    write_pages_parquet(src, 2000, seed=3, n_hosts=50)
    out = str(tmp_path / "table")
    zpath = _zip_package(str(tmp_path))

    def submit():
        cmd = [
            SPARK_SUBMIT,
            "--master", "local[4]",
            "--conf", "spark.ui.enabled=false",
            "--conf", "spark.sql.shuffle.partitions=8",
            "--py-files", zpath,
            os.path.join(REPO, "submit_main.py"),
            "--input", src,
            "--output", out,
            "--buckets", "8",
            "--run-id", "submit-test",
        ]
        env = dict(os.environ)
        env.pop("PYTHONPATH", None)  # the zip must be self-sufficient
        r = subprocess.run(
            cmd, capture_output=True, text=True, timeout=420, env=env,
            cwd=str(tmp_path),  # NOT the repo root: no implicit package import
        )
        assert r.returncode == 0, r.stderr[-4000:]
        line = [l for l in r.stdout.splitlines() if l.startswith("{")][-1]
        return json.loads(line)

    stats = submit()
    assert stats["run_id"] == "submit-test"
    assert stats["written"] == 8 and stats["skipped"] == 0

    got = spark.read.parquet(out)
    assert got.count() == 2000
    assert {"url", "keep", "text_scrubbed", "bucket"} <= set(got.columns)

    # second submit resumes: every bucket already committed
    stats2 = submit()
    assert stats2["written"] == 0 and stats2["skipped"] == 8
