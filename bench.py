"""Benchmark harness — driver contract.

Runs the headline dedup pipeline + representative operator queries at
$SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1) on
local[$SPARK_GRAFT_CPUS] and prints ONE JSON line:

    {"metric": ..., "value": N, "unit": "sec", "queries": {...}, "sf": ...}

`--two-level` additionally reruns the pipeline at local[8] vs
local[32] (the N vs 4N executor stand-in per the driver instruction)
and reports throughput + scaling efficiency; scripts/scaling_bench.py
wraps that for BENCH/BASELINE.md.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = os.environ.get("SPARK_GRAFT_CPUS", "32")


def docs_as_pages(spark, sf_dir: str):
    from pyspark.sql import functions as F

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    return docs.select(
        F.concat(F.lit("doc://"), F.format_string("%07d", "doc_id")).alias("url"),
        F.lit(None).cast("timestamp").alias("warc_ts"),
        F.encode("text", "UTF-8").alias("html"),
        F.col("text"),
        F.lit("en").alias("lang"),
    )


def run_suite(spark, sf_dir: str, skip_side_effecting: bool = False) -> dict:
    """Per-query wall seconds. Each query is forced with a count/write."""
    from ufuzzy_spark import entry_queries
    from ufuzzy_spark.pipeline import run_pipeline

    timings: dict[str, float] = {}

    def bench(name, fn):
        t0 = time.time()
        fn()
        timings[name] = round(time.time() - t0, 3)

    # headline: full near-dup pipeline over the documents corpus
    pages = docs_as_pages(spark, sf_dir)

    # warm Python UDF workers + JIT before timing (MEASUREMENT CHANGE
    # in round 3: r01/r02 charged cold spin-up to dedup_pipeline —
    # measured at up to 2x on its sub-minute sf0.1 wall; diffs of
    # dedup_pipeline across r02 -> r03 reflect this change too)
    res = run_pipeline(spark, pages.limit(500))
    res.clusters.count()
    res.unpersist()

    def pipeline_once():
        res = run_pipeline(spark, pages)
        res.clusters.count()
        res.unpersist()  # release fences so later queries bench clean

    bench("dedup_pipeline", pipeline_once)

    # EVERY driver entry query is benched (VERDICT r2 #4: nine keys
    # were historically missing, so r01/r02 perf diffs were blind on
    # them) — iterate the registry so new entries join automatically.
    q = entry_queries.queries()
    for name in q:
        if skip_side_effecting and name in SIDE_EFFECTING:
            continue
        bench(name, lambda n=name: q[n](spark, sf_dir).count())

    return timings


# Oracle queries that run whole pipelines (twice) at query time to
# PROVE an invariant — correct design for what they pin, but they are
# integration proofs, not operator benchmarks, and they dominated the
# r03 suite wall (55 of 145 s). They are still benched by default (the
# driver contract keeps every key) but reported as their own tier so
# round-over-round diffs of the operator queries aren't buried
# (VERDICT r3 next #6).
SIDE_EFFECTING = {"resume_lineage", "incremental_ingest"}


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf-dir", default=SF_DIR)
    ap.add_argument("--cpus", default=CPUS)
    ap.add_argument(
        "--skip-side-effecting",
        action="store_true",
        help="skip the pipeline-proof oracle queries (fast iteration "
        "tier; the driver default benches everything)",
    )
    args = ap.parse_args()

    from ufuzzy_spark.session import get_spark

    spark = get_spark(
        "ufuzzy-bench",
        master=f"local[{args.cpus}]",
        extra_conf={"spark.ui.enabled": "false"},
    )
    n_docs = spark.read.parquet(f"{args.sf_dir}/documents.parquet").count()

    from ufuzzy_spark.bench_util import loadavg, read_proc_stat, stat_delta

    stat0 = read_proc_stat()
    t0 = time.time()
    timings = run_suite(spark, args.sf_dir, args.skip_side_effecting)
    total = round(time.time() - t0, 3)
    host = stat_delta(stat0, read_proc_stat())
    side_wall = round(
        sum(t for n, t in timings.items() if n in SIDE_EFFECTING), 3
    )

    sf = args.sf_dir.rstrip("/").rsplit("sf", 1)[-1]
    print(
        json.dumps(
            {
                "metric": "ufuzzy_dedup_suite_wall",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "sf": float(sf),
                "docs": n_docs,
                "docs_per_sec_pipeline": round(
                    n_docs / timings["dedup_pipeline"], 1
                ),
                "cpus": int(args.cpus),
                # two-tier wall (VERDICT r3 next #6): operator queries
                # vs the pipeline-proof oracle queries
                "core_wall": round(total - side_wall, 3),
                "side_effecting_wall": side_wall,
                # host-load trace over the suite's own window (VERDICT
                # r4 next #8): regression triage can tell co-tenant
                # interference (steal) from real slowdowns without a
                # judge re-run
                "host": {
                    "steal_pct": host["steal_pct"],
                    "idle_pct": host["idle_pct"],
                    "iowait_pct": host["iowait_pct"],
                    "loadavg_end": loadavg(),
                },
            }
        )
    )


if __name__ == "__main__":
    main()
