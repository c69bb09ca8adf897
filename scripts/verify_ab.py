"""Stage-level A/B for the verify fast path (VERDICT r2 #3).

Compares the per-pair `t in other` scan loop against the batch-level
vectorized path (pairdup.PairVerifier.verify_batch) on a real corpus,
using checkpoint-dir lineage wall_ms for the verified_pairs stage —
the only perf signal CLAUDE.md trusts (single-run totals at local[16]
carry ±20% noise; stage deltas are attributable). Keep rule: >= 1.3x.

Usage: python scripts/verify_ab.py [--input PATH] [--cores 16] [--reps 2]
"""

from __future__ import annotations

import argparse
import json
import os
import shutil
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def run_once(tag: str, batch: bool, input_path: str, cores: int) -> dict:
    os.environ["UFZ_VERIFY_BATCH"] = "1" if batch else "0"
    from ufuzzy_spark.pipeline import run_pipeline
    from ufuzzy_spark.session import get_spark

    spark = get_spark(
        f"verify-ab-{tag}",
        master=f"local[{cores}]",
        extra_conf={"spark.ui.enabled": "false"},
    )
    ck = f"/tmp/ufz_verify_ab_{tag}"
    shutil.rmtree(ck, ignore_errors=True)
    try:
        pages = spark.read.parquet(input_path)
        res = run_pipeline(spark, pages, checkpoint_dir=ck, resume=False)
        n_clusters = res.clusters.select("cluster_id").distinct().count()
        n_dups = res.verified_pairs.where("is_dup").count()
        stage = res.metrics["stages"]["verified_pairs"]
        return {
            "tag": tag,
            "batch": batch,
            "verify_wall_ms": stage["wall_ms"],
            "verify_rows": stage["rows"],
            "n_dups": n_dups,
            "n_clusters": n_clusters,
        }
    finally:
        spark.stop()
        shutil.rmtree(ck, ignore_errors=True)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument(
        "--input", default="/tmp/ufz_bench_300000/pages.parquet"
    )
    ap.add_argument("--cores", type=int, default=16)
    ap.add_argument("--reps", type=int, default=2)
    args = ap.parse_args()

    runs = []
    for rep in range(args.reps):
        # alternate legs so slow drift hits both sides equally
        runs.append(run_once(f"loop{rep}", False, args.input, args.cores))
        runs.append(run_once(f"batch{rep}", True, args.input, args.cores))
        print(json.dumps(runs[-2]))
        print(json.dumps(runs[-1]))

    loop_ms = [r["verify_wall_ms"] for r in runs if not r["batch"]]
    batch_ms = [r["verify_wall_ms"] for r in runs if r["batch"]]
    # identical outputs are part of the contract
    keys = {(r["n_dups"], r["n_clusters"], r["verify_rows"]) for r in runs}
    summary = {
        "loop_ms": loop_ms,
        "batch_ms": batch_ms,
        "speedup_batch_over_loop": round(
            (sum(loop_ms) / len(loop_ms)) / (sum(batch_ms) / len(batch_ms)), 3
        ),
        "outputs_identical": len(keys) == 1,
        "keep_rule": ">=1.3x",
    }
    print(json.dumps(summary))


if __name__ == "__main__":
    main()
