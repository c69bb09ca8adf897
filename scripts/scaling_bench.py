"""Two-parallelism scaling benchmark — the north-rule evidence run.

Runs the SAME dedup job on the SAME input at local[N] and local[4N]
(sandbox stand-in for N vs 4N executors, per driver instruction) and
reports docs/sec at both plus scaling efficiency:

    eff = (throughput_4N / throughput_N) / 4          (target >= 0.8)

Each measurement gets its own SparkSession (stopped between runs) and
a small warmup run so Python UDF workers and JIT are warm — we are
measuring the job, not process spin-up. Results are appended to
BENCH/BASELINE.md.

Usage:
    python scripts/scaling_bench.py [--input DIR] [--rows 100000]
                                    [--low 8] [--high 32]
"""

from __future__ import annotations

import argparse
import datetime as dt
import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def measure(
    master_cores: int,
    input_path: str,
    warmup_path: str,
    local_dir: str | None = None,
) -> dict:
    from pyspark.sql import functions as F

    from ufuzzy_spark.bench_util import loadavg, read_proc_stat, stat_delta
    from ufuzzy_spark.pipeline import run_pipeline
    from ufuzzy_spark.session import get_spark

    conf = {"spark.ui.enabled": "false"}
    if local_dir:
        # shuffle/spill off the single shared virtio disk: on a real
        # cluster every executor brings its OWN local disk, so 4N
        # executors have 4x aggregate shuffle bandwidth; the sandbox
        # collapses all "executors" onto one device whose aggregate
        # write throughput is FLAT in writer count (measured: 711 MB/s
        # at 4 writers, 662 at 16 — BENCH/BASELINE.md). A tmpfs
        # local dir restores per-executor-local-storage semantics.
        conf["spark.local.dir"] = local_dir
    spark = get_spark(
        f"ufuzzy-scaling-{master_cores}",
        master=f"local[{master_cores}]",
        extra_conf=conf,
    )
    try:
        # warmup: spin up Python UDF workers + JIT on a small slice
        warm = spark.read.parquet(warmup_path)
        run_pipeline(spark, warm).clusters.count()

        pages = spark.read.parquet(input_path)
        n_docs = pages.count()
        stat0 = read_proc_stat()
        t0 = time.time()
        res = run_pipeline(spark, pages)
        n_clusters = res.clusters.select("cluster_id").distinct().count()
        wall = time.time() - t0
        host = stat_delta(stat0, read_proc_stat())
        return {
            "cores": master_cores,
            "docs": n_docs,
            "clusters": n_clusters,
            "wall_sec": round(wall, 2),
            "docs_per_sec": round(n_docs / wall, 1),
            # admissibility trace (VERDICT r4 next #1): co-tenant steal
            # over THIS leg's window — the interference that compressed
            # round-4's 4->16 ratios, now measured per draw
            "steal_pct": host["steal_pct"],
            "idle_pct": host["idle_pct"],
            "loadavg_end": loadavg(),
        }
    finally:
        spark.stop()


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--input", default=None)
    ap.add_argument("--rows", type=int, default=100_000)
    ap.add_argument("--low", type=int, default=8)
    ap.add_argument("--high", type=int, default=32)
    ap.add_argument("--out-md", default="BENCH/BASELINE.md")
    ap.add_argument(
        "--local-dir",
        default=None,
        help="spark.local.dir for shuffle/spill (tmpfs, e.g. "
        "/dev/shm/ufz_spark_local, stands in for per-executor disks)",
    )
    args = ap.parse_args()

    from fixtures.gen import write_fixtures

    if args.input:
        input_path = args.input
    else:
        bench_dir = Path(f"/tmp/ufz_bench_{args.rows}")
        if not (bench_dir / "pages.parquet").exists():
            write_fixtures(bench_dir, args.rows, label_pairs=False)
        input_path = str(bench_dir / "pages.parquet")

    warm_dir = Path("/tmp/ufz_bench_warmup")
    if not (warm_dir / "pages.parquet").exists():
        write_fixtures(warm_dir, 2000, label_pairs=False)
    warmup_path = str(warm_dir / "pages.parquet")

    if args.local_dir:
        Path(args.local_dir).mkdir(parents=True, exist_ok=True)
    low = measure(args.low, input_path, warmup_path, args.local_dir)
    high = measure(args.high, input_path, warmup_path, args.local_dir)

    ratio = high["docs_per_sec"] / low["docs_per_sec"]
    eff = ratio / (args.high / args.low)
    # stated admissibility rule (VERDICT r4 next #1): a draw is
    # admissible iff co-tenant steal stayed under 1% of all CPU
    # jiffies in BOTH legs — above that, the shared substrate is
    # interfering and the ratio measures the host, not the job.
    admissible = low["steal_pct"] < 1.0 and high["steal_pct"] < 1.0
    result = {
        "low": low,
        "high": high,
        "speedup": round(ratio, 3),
        "scaling_efficiency": round(eff, 3),
        "target": 0.8,
        "admissible": admissible,
        "ts": dt.datetime.now(dt.timezone.utc).isoformat(),
    }
    print(json.dumps(result))

    out = Path(args.out_md)
    out.parent.mkdir(parents=True, exist_ok=True)
    lines = [
        "",
        f"## Scaling run {result['ts']}",
        "",
        f"Input: {input_path} ({low['docs']} docs); same job "
        f"(`run_pipeline`), fresh SparkSession per level, warmed "
        f"Python workers. local[{args.low}] vs local[{args.high}] "
        f"stand in for N vs 4N executors (no real cluster in sandbox)."
        + (
            f" spark.local.dir={args.local_dir} (tmpfs — shuffle/spill "
            f"off the shared virtio disk, restoring per-executor-"
            f"local-storage semantics)."
            if args.local_dir
            else ""
        ),
        "",
        "| parallelism | wall (s) | docs/sec | clusters | steal % | idle % |",
        "|---|---|---|---|---|---|",
        f"| local[{args.low}] | {low['wall_sec']} | {low['docs_per_sec']} | {low['clusters']} | {low['steal_pct']} | {low['idle_pct']} |",
        f"| local[{args.high}] | {high['wall_sec']} | {high['docs_per_sec']} | {high['clusters']} | {high['steal_pct']} | {high['idle_pct']} |",
        "",
        f"**Speedup {args.low}->{args.high} cores: {result['speedup']}x; "
        f"scaling efficiency: {result['scaling_efficiency']} "
        f"(target >= 0.8). Admissible (steal < 1% both legs): "
        f"{'YES' if admissible else 'NO'}.**",
    ]
    with open(out, "a") as f:
        f.write("\n".join(lines) + "\n")
    print(f"appended to {out}")


if __name__ == "__main__":
    main()
