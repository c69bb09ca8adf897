"""Extra benchmarks for the optimization round (guide §1).

bench.py is FROZEN for measurement; this harness exists so individual
queries can be isolated (guide §1.4 noop sink), repeated, and their
``explain("formatted")`` plans captured to files under plans/.

Usage:
    python bench_extra.py --sf-dir /root/testdata/sf1.0 \
        --queries dup_clusters,ngram_jaccard --repeats 2 --mode count \
        --explain-dir plans/r06 --explain-suffix _before

``--mode count`` replicates bench.py's methodology (``.count()``);
``--mode noop`` forces every column (guide §1.4). One JSON line per
query goes to stdout; plans to files.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent))


def explain_formatted(df) -> str:
    jvm = df.sparkSession._jvm
    mode = jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
    return df._jdf.queryExecution().explainString(mode)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument(
        "--sf-dir",
        default=os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"),
    )
    ap.add_argument("--cpus", default=os.environ.get("SPARK_GRAFT_CPUS", "32"))
    ap.add_argument("--queries", default="", help="comma list; default: all")
    ap.add_argument("--repeats", type=int, default=1)
    ap.add_argument("--mode", choices=["count", "noop"], default="count")
    ap.add_argument("--explain-dir", default=None)
    ap.add_argument("--explain-suffix", default="")
    ap.add_argument(
        "--pipeline", action="store_true", help="also time dedup_pipeline"
    )
    args = ap.parse_args()

    from ufuzzy_spark import entry_queries
    from ufuzzy_spark.session import get_spark

    spark = get_spark(
        "ufuzzy-bench-extra",
        master=f"local[{args.cpus}]",
        extra_conf={"spark.ui.enabled": "false"},
    )
    sc = spark.sparkContext

    q = entry_queries.queries()
    names = [n for n in args.queries.split(",") if n] or list(q)

    out: dict[str, list[float]] = {}
    if args.pipeline:
        import bench

        pages = bench.docs_as_pages(spark, args.sf_dir)
        from ufuzzy_spark.pipeline import run_pipeline

        res = run_pipeline(spark, pages.limit(500))  # warm UDF workers
        res.clusters.count()
        res.unpersist()
        walls = []
        for _ in range(args.repeats):
            sc.setJobDescription("bench_extra: dedup_pipeline")
            t0 = time.time()
            res = run_pipeline(spark, pages)
            res.clusters.count()
            res.unpersist()
            walls.append(round(time.time() - t0, 3))
        out["dedup_pipeline"] = walls

    for name in names:
        if name not in q:
            print(f"# unknown query: {name}", file=sys.stderr)
            continue
        walls = []
        for rep in range(args.repeats):
            sc.setJobDescription(f"bench_extra: {name} [{rep}]")
            t0 = time.time()
            df = q[name](spark, args.sf_dir)
            if args.mode == "count":
                df.count()
            else:
                df.write.format("noop").mode("overwrite").save()
            walls.append(round(time.time() - t0, 3))
        out[name] = walls
        if args.explain_dir:
            d = Path(args.explain_dir)
            d.mkdir(parents=True, exist_ok=True)
            p = d / f"{name}{args.explain_suffix}.txt"
            p.write_text(explain_formatted(q[name](spark, args.sf_dir)))
        sc.setJobDescription(None)

    print(
        json.dumps(
            {
                "sf_dir": args.sf_dir,
                "mode": args.mode,
                "cpus": int(args.cpus),
                "queries": out,
            }
        )
    )


if __name__ == "__main__":
    main()
