"""Measure the delta-vs-batch ingest crossover that sets
``incremental_dedup(batch_cutover_frac=...)``'s default.

For each snapshot fraction f, the corpus is hash-split (1-f)/f,
snapshot-1 state is built once (untimed), and snapshot 2 is absorbed
TWICE from copies of that identical state — once forced down the
O(new + touched) delta leg (``batch_cutover_frac=None``) and once
forced down the ``_batch_recompute`` leg (``batch_cutover_frac=0.0``)
— back-to-back in the same session, so the A/B difference is
attributable even when absolute walls carry co-tenant noise (the
per-leg /proc/stat steal trace is recorded regardless; see the
round-5 steal notes in BENCH/BASELINE.md). Cluster assignments are
asserted bit-equal between the two legs at every fraction.

Output: one JSON line per fraction plus a markdown table appended to
--out-md (the "cutover crossover" table cited by
ufuzzy_spark/streaming/incremental.py's docstring).

Usage:
    python scripts/cutover_crossover.py --rows 300000 --cores 16 \
        --fracs 0.1 0.25 0.33 0.5
"""

from __future__ import annotations

import argparse
import datetime as dt
import json
import shutil
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--rows", type=int, default=300_000)
    ap.add_argument("--cores", type=int, default=16)
    ap.add_argument("--input", default=None)
    ap.add_argument(
        "--fracs", type=float, nargs="+", default=[0.1, 0.25, 0.33, 0.5]
    )
    ap.add_argument("--state-dir", default="/dev/shm/ufz_xover_cat")
    ap.add_argument("--local-dir", default="/dev/shm/ufz_spark_local")
    ap.add_argument("--out-md", default="BENCH/BASELINE.md")
    args = ap.parse_args()

    from pyspark.sql import functions as F

    from fixtures.gen import write_fixtures
    from ufuzzy_spark.bench_util import read_proc_stat, stat_delta
    from ufuzzy_spark.catalog import LocalParquetCatalog
    from ufuzzy_spark.pipeline import run_pipeline
    from ufuzzy_spark.session import get_spark
    from ufuzzy_spark.streaming.incremental import incremental_dedup

    if args.input:
        input_path = args.input
    else:
        bench_dir = Path(f"/tmp/ufz_bench_{args.rows}")
        if not (bench_dir / "pages.parquet").exists():
            write_fixtures(bench_dir, args.rows, label_pairs=False)
        input_path = str(bench_dir / "pages.parquet")

    conf = {"spark.ui.enabled": "false"}
    if args.local_dir:
        Path(args.local_dir).mkdir(parents=True, exist_ok=True)
        conf["spark.local.dir"] = args.local_dir
    spark = get_spark(
        "ufuzzy-cutover-crossover",
        master=f"local[{args.cores}]",
        extra_conf=conf,
    )
    pages = spark.read.parquet(input_path)
    run_pipeline(spark, pages.limit(2000)).unpersist()  # warm workers

    def timed(fn):
        s0, t0 = read_proc_stat(), time.time()
        out = fn()
        return out, round(time.time() - t0, 2), stat_delta(s0, read_proc_stat())

    def ingest(src_state: str, snap2_df, cutover):
        run_dir = src_state + "_run"
        shutil.rmtree(run_dir, ignore_errors=True)
        shutil.copytree(src_state, run_dir)
        cat = LocalParquetCatalog(run_dir)
        stats: dict = {}
        inc, wall, host = timed(
            lambda: incremental_dedup(
                spark, cat, snap2_df, stats_out=stats,
                batch_cutover_frac=cutover,
            )
        )
        rows = {
            (r["url"], r["cluster_id"])
            for r in inc.select("url", "cluster_id").collect()
        }
        shutil.rmtree(run_dir, ignore_errors=True)
        return rows, wall, host, stats

    results = []
    for frac in args.fracs:
        # deterministic hash split at ~frac: pmod(xxhash64(url), 1000)
        cut = int(round(1000 * (1 - frac)))
        snap1 = pages.where(F.pmod(F.xxhash64("url"), F.lit(1000)) < cut)
        snap2 = pages.where(F.pmod(F.xxhash64("url"), F.lit(1000)) >= cut)
        n1, n2 = snap1.count(), snap2.count()

        shutil.rmtree(args.state_dir, ignore_errors=True)
        cat = LocalParquetCatalog(args.state_dir)
        incremental_dedup(spark, cat, snap1)  # untimed state build

        delta_rows, t_delta, h_delta, s_delta = ingest(
            args.state_dir, snap2, None
        )
        batch_rows, t_batch, h_batch, s_batch = ingest(
            args.state_dir, snap2, 0.0
        )
        assert s_delta.get("mode") == "delta", s_delta
        assert s_batch.get("mode") == "batch_recompute", s_batch
        if delta_rows != batch_rows:
            raise SystemExit(
                f"frac {frac}: delta and batch legs disagree "
                f"({len(delta_rows ^ batch_rows)} differing rows)"
            )
        rec = {
            "frac": frac,
            "snap1_docs": n1,
            "snap2_docs": n2,
            "t_delta_sec": t_delta,
            "t_batch_sec": t_batch,
            "delta_over_batch": round(t_delta / t_batch, 3),
            "touched_bucket_frac_denom_buckets": s_delta.get("touched_buckets"),
            "steal_pct": {
                "delta": h_delta["steal_pct"],
                "batch": h_batch["steal_pct"],
            },
            "clusters_equal": True,
        }
        print(json.dumps(rec))
        results.append(rec)
        shutil.rmtree(args.state_dir, ignore_errors=True)

    ts = dt.datetime.now(dt.timezone.utc).isoformat()
    lines = [
        f"\n## Cutover crossover {ts}\n\n",
        f"Input: {input_path} ({args.rows} docs); local[{args.cores}]"
        + (f", spark.local.dir={args.local_dir} (tmpfs)" if args.local_dir else "")
        + ". For each snapshot fraction, snapshot 2 is absorbed twice "
        "from copies of the same prepared state: forced delta leg vs "
        "forced `_batch_recompute` leg, back-to-back (A/B attributable; "
        "absolute walls carry the window's noise). Clusters bit-equal "
        "between legs at every fraction.\n\n",
        "| snap2 frac | snap2 docs | delta (s) | batch (s) | "
        "delta/batch | steal% (d/b) |\n|---|---|---|---|---|---|\n",
    ]
    for r in results:
        lines.append(
            f"| {r['frac']:.2f} | {r['snap2_docs']} | {r['t_delta_sec']} "
            f"| {r['t_batch_sec']} | **{r['delta_over_batch']}** "
            f"| {r['steal_pct']['delta']} / {r['steal_pct']['batch']} |\n"
        )
    with Path(args.out_md).open("a") as f:
        f.writelines(lines)
    print(f"appended to {args.out_md}")


if __name__ == "__main__":
    main()
