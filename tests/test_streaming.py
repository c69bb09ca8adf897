"""Structured Streaming integration: incremental dedup as the
foreachBatch body of a file-stream query.

Dedup's global-clustering nature makes watermarked streaming state a
poor fit (SURVEY.md §2.2), so the streaming story is micro-batch:
each arriving snapshot runs ``incremental_dedup`` against catalog
state. This test drives a real ``readStream`` -> ``foreachBatch``
query over two parquet drops and checks the final clusters equal a
single batch run.
"""

import pytest


def test_foreach_batch_incremental_equals_batch(spark, tmp_path):
    from fixtures.gen import gen_corpus
    from ufuzzy_spark.catalog import LocalParquetCatalog
    from ufuzzy_spark.pipeline import run_pipeline
    from ufuzzy_spark.streaming.incremental import incremental_dedup

    pages, _ = gen_corpus(400, seed=9, label_pairs=False)
    full = spark.createDataFrame(pages)
    batch = {
        (r.url, r.cluster_id)
        for r in run_pipeline(spark, full)
        .clusters.select("url", "cluster_id")
        .collect()
    }

    # two parquet drops into a streamed directory
    half = len(pages) // 2
    in_dir = tmp_path / "stream_in"
    spark.createDataFrame(pages[:half]).coalesce(1).write.mode(
        "append"
    ).parquet(str(in_dir))
    spark.createDataFrame(pages[half:]).coalesce(1).write.mode(
        "append"
    ).parquet(str(in_dir))

    cat = LocalParquetCatalog(tmp_path / "cat")
    stream = (
        spark.readStream.schema(full.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(str(in_dir))
    )

    def body(df, epoch_id):
        incremental_dedup(spark, cat, df)

    q = (
        stream.writeStream.foreachBatch(body)
        .option("checkpointLocation", str(tmp_path / "stream_ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(300)

    inc = {
        (r.url, r.cluster_id)
        for r in cat.read(spark, "clusters").collect()
    }
    assert inc == batch
