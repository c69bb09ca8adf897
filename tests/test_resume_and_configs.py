"""M4 resume equivalence + M2 config-fidelity e2e runs."""

import shutil

import pyspark.sql.functions as F
import pytest

from ufuzzy_spark.config import MatchConfig, PipelineConfig
from ufuzzy_spark.pipeline import run_pipeline


def _cluster_set(res):
    return {
        (r.url, r.cluster_id)
        for r in res.clusters.select("url", "cluster_id").collect()
    }


def test_kill_resume_equivalence(spark, fixture_dir, tmp_path):
    """North-rule resumability: interrupt after stage k, rerun ->
    byte-identical final clusters. Simulated by deleting downstream
    stage checkpoints and rerunning against the same dir."""
    ckpt = str(tmp_path / "ckpt")
    pages = spark.read.parquet(str(fixture_dir / "pages.parquet"))

    full = run_pipeline(spark, pages, checkpoint_dir=ckpt)
    expected = _cluster_set(full)

    # "kill after signatures": drop everything downstream
    for stage in ("candidate_pairs", "verified_pairs", "clusters"):
        shutil.rmtree(tmp_path / "ckpt" / stage, ignore_errors=True)
        (tmp_path / "ckpt" / f"{stage}.lineage.json").unlink(missing_ok=True)

    resumed = run_pipeline(spark, pages, checkpoint_dir=ckpt)
    assert _cluster_set(resumed) == expected
    # upstream stages must have been reused, downstream recomputed
    assert resumed.metrics["stages"]["signatures"]["resumed"] is True
    assert resumed.metrics["stages"]["verified_pairs"]["resumed"] is False


def test_config_drift_forces_recompute(spark, fixture_dir, tmp_path):
    ckpt = str(tmp_path / "ckpt2")
    pages = spark.read.parquet(str(fixture_dir / "pages.parquet"))
    run_pipeline(spark, pages, checkpoint_dir=ckpt)

    drifted = run_pipeline(
        spark,
        pages,
        pcfg=PipelineConfig(shingle_k=7),
        checkpoint_dir=ckpt,
    )
    assert all(
        m["resumed"] is False for m in drifted.metrics["stages"].values()
    )


def test_single_error_config_e2e_recall(spark, fixture_dir):
    """M2: the SingleError (intraMode=1) MatchConfig end-to-end —
    the fuzzy regex fallback path of the verify UDF. Labels in the
    golden pairs were computed at the DEFAULT config, so recompute
    oracle labels at this config via the shared PairVerifier and
    check pipeline recall against them."""
    from ufuzzy_spark.pairdup import PairVerifier, normalize_text

    pcfg = PipelineConfig(match=MatchConfig(intraMode=1))
    pages = spark.read.parquet(str(fixture_dir / "pages.parquet"))
    pairs = spark.read.parquet(str(fixture_dir / "dup_pairs_oracle.parquet"))

    res = run_pipeline(spark, pages, pcfg=pcfg)
    cmap = dict(
        (r.url, r.cluster_id)
        for r in res.clusters.select("url", "cluster_id").collect()
    )

    texts = dict(
        (r.url, r.text) for r in pages.select("url", "text").collect()
    )
    pv = PairVerifier(pcfg)

    # sample for runtime: every labeled pair re-labeled at this config
    rows = pairs.select("url_a", "url_b").collect()
    total = hit = 0
    for r in rows:
        a, b = texts.get(r.url_a), texts.get(r.url_b)
        if a is None or b is None:
            continue
        if pv.verify(normalize_text(a), normalize_text(b)).is_dup:
            total += 1
            if cmap.get(r.url_a) == cmap.get(r.url_b):
                hit += 1
    assert total > 50
    recall = hit / total
    assert recall >= 0.99, f"SingleError-config recall {recall:.4f} ({hit}/{total})"


def test_zip_only_import_isolation(tmp_path):
    """The --py-files zip must be importable WITHOUT the repo checkout
    on sys.path (north-rule packaging; submit_pipeline.py's repo-root
    insert must be a convenience, not a requirement)."""
    import subprocess
    import sys
    from pathlib import Path

    repo = Path(__file__).resolve().parent.parent
    subprocess.run(
        ["bash", str(repo / "scripts" / "package.sh")],
        check=True,
        capture_output=True,
    )
    zip_path = repo / "dist" / "ufuzzy_spark.zip"
    probe = (
        "import sys; sys.path = [p for p in sys.path if 'repo' not in p]; "
        f"sys.path.insert(0, {str(zip_path)!r}); "
        "import ufuzzy_spark.pipeline, ufuzzy_spark.oracle, "
        "ufuzzy_spark.operators.lsh, ufuzzy_spark.operators.suffix_array, "
        "ufuzzy_spark.streaming.incremental, fixtures.gen; "
        "from ufuzzy_spark.config import MatchConfig; "
        "from ufuzzy_spark.oracle import UFuzzyOracle; "
        "assert UFuzzyOracle(MatchConfig()).filter(['a cat'], 'cat') == [0]; "
        "print('zip-import-ok')"
    )
    out = subprocess.run(
        [sys.executable, "-c", probe],
        capture_output=True,
        text=True,
        cwd=str(tmp_path),  # neutral cwd: no implicit repo imports
    )
    assert out.returncode == 0, out.stderr
    assert "zip-import-ok" in out.stdout
