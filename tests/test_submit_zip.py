"""Zip-only packaging isolation: spark-submit --py-files must work
with NOTHING importable from the checkout — the deployment path a
real cluster uses (scripts/package.sh + scripts/submit_pipeline.py).

The test stages the zip + entry script into a temp dir and launches
spark-submit from there with a scrubbed PYTHONPATH, so every
`ufuzzy_spark.*` (and `fixtures.*`) import must resolve from inside
dist/ufuzzy_spark.zip. A module missing from package.sh's zip recipe
fails here and nowhere else in the suite.
"""

import os
import shutil
import subprocess
from pathlib import Path

import pytest

REPO = Path(__file__).resolve().parent.parent


def test_spark_submit_zip_only_import_isolation(tmp_path):
    if shutil.which("spark-submit") is None:
        pytest.skip("spark-submit not on PATH")

    build = subprocess.run(
        ["bash", str(REPO / "scripts" / "package.sh")],
        capture_output=True,
        text=True,
    )
    assert build.returncode == 0, build.stderr

    stage = tmp_path / "stage"
    stage.mkdir()
    shutil.copy(REPO / "dist" / "ufuzzy_spark.zip", stage / "ufuzzy_spark.zip")
    shutil.copy(
        REPO / "scripts" / "submit_pipeline.py", stage / "submit_pipeline.py"
    )

    env = {k: v for k, v in os.environ.items() if k != "PYTHONPATH"}
    out_dir = stage / "out"
    run = subprocess.run(
        [
            "spark-submit",
            "--master", "local[8]",
            "--conf", "spark.sql.shuffle.partitions=16",
            "--conf", "spark.ui.enabled=false",
            "--py-files", str(stage / "ufuzzy_spark.zip"),
            str(stage / "submit_pipeline.py"),
            "--rows", "400",
            "--output", str(out_dir),
        ],
        cwd=stage,
        env=env,
        capture_output=True,
        text=True,
        timeout=400,
    )
    assert run.returncode == 0, run.stdout[-2000:] + run.stderr[-2000:]

    import duckdb

    n = duckdb.sql(
        f"SELECT count(*) AS docs, count(DISTINCT cluster_id) AS clusters "
        f"FROM '{out_dir}/clusters/*.parquet'"
    ).fetchone()
    assert n[0] > 0 and 0 < n[1] <= n[0]
