"""SparkSession factory with the pipeline's scale posture baked in.

AQE (adaptive coalescing + skew-join splitting) is always on — the
north_rule requires skew handled explicitly; explicit salting/capping
in operators/lsh.py is the guarantee, AQE the runtime bonus
(SURVEY.md §4). Arrow is on for all pandas UDF exchanges.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(
    app_name: str = "ufuzzy_spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict | None = None,
) -> SparkSession:
    master = master or os.environ.get("SPARK_GRAFT_MASTER") or "local[%s]" % (
        os.environ.get("SPARK_GRAFT_CPUS", "*")
    )
    if shuffle_partitions is None:
        # local[N] -> N; local[*]/cluster -> 2x default parallelism
        inner = master[master.find("[") + 1 : master.find("]")] if "[" in master else ""
        shuffle_partitions = int(inner) if inner.isdigit() else 64

    b = (
        SparkSession.builder.appName(app_name)
        .master(master)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        # pin UTC: event windows / timestamp formatting must not depend
        # on the deployment host's zone (DuckDB oracle reads parquet
        # timestamps naively as UTC; ADVICE r1)
        .config("spark.sql.session.timeZone", "UTC")
        # adaptive execution: coalesce + skew-join split at runtime
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        # Arrow batches for every pandas UDF crossing
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "4096")
        # 32MB scan splits: a 100 TB corpus arrives as many files, but
        # sandbox single-file inputs must still split wide enough to
        # feed every core (row-group granular) — 128MB splits pin a
        # ~200MB file to 2 read tasks
        .config("spark.sql.files.maxPartitionBytes", "33554432")
        .config("spark.serializer", "org.apache.spark.serializer.KryoSerializer")
        .config("spark.ui.showConsoleProgress", "false")
        # local mode: the driver JVM IS the executor, so it holds the
        # broadcast relations, persisted chain blocks AND task memory;
        # the sandbox has 128 GiB, and 12g was sized before the r06
        # broadcast-attach paths. Deployments set SPARK_DRIVER_MEM (on
        # a real cluster the driver only needs the broadcasts).
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEM", "24g"))
    )
    for k, v in (extra_conf or {}).items():
        b = b.config(k, v)
    spark = b.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark
