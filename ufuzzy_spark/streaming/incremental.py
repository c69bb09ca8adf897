"""Incremental dedup over snapshot diffs — the scaling ingest path.

The reference's prefixCache demo reuses prior results when the query
extends a cached prefix (demos/compare.html:562-601); the pipeline
analog is incremental batch over catalog snapshots: when a new WARC
snapshot lands, only the NEW pages are normalized/signed, and
candidate generation joins new-signature bands against the persisted
band table (new x all), never re-pairing old x old
(SURVEY.md §2 #14, §3 entry point 3).

Batch-first by design: dedup's global-clustering nature makes
watermarked streaming state a poor fit (SURVEY.md §2.2 Streaming) —
the same function is the micro-batch body if driven by a
Structured Streaming foreachBatch sink.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ufuzzy_spark.catalog import LocalParquetCatalog
from ufuzzy_spark.config import PipelineConfig
from ufuzzy_spark.operators.components import connected_components
from ufuzzy_spark.operators.dedup import exact_dedup
from ufuzzy_spark.operators.lsh import postings_from_band_hashes
from ufuzzy_spark.operators.minhash import banded_signatures
from ufuzzy_spark.operators.normalize import normalize
from ufuzzy_spark.operators.verify import verify_pairs


def incremental_dedup(
    spark: SparkSession,
    catalog: LocalParquetCatalog,
    new_pages: DataFrame,
    pcfg: PipelineConfig | None = None,
) -> DataFrame:
    """Process only new pages against persisted state; returns the
    updated full clusters table (also written as a new snapshot).

    State tables in the catalog: ``bands`` (url, band_id, band_hash),
    ``normed`` (url, norm_text window), ``edges`` (url_a, url_b).
    """
    pcfg = pcfg or PipelineConfig()
    win = 2 * pcfg.verify_window_chars

    # persist+count fences (same discipline as pipeline.run_pipeline):
    # this function runs FIVE actions (CC iterations + four catalog
    # writes) over shared subplans — unfenced, the normalize and
    # signature UDF chains recompute once per action
    fences: list[DataFrame] = []

    def fence(df: DataFrame) -> DataFrame:
        df = df.persist()
        df.count()
        fences.append(df)
        return df

    new_normed = fence(
        normalize(new_pages.where(F.col("lang") == "en"), pcfg.match)
    )
    # exact-dup members don't proceed to LSH — keep their star edges
    # (cross-batch exact dups still pair via identical band hashes)
    new_exact_edges, new_reps = exact_dedup(new_normed)
    new_sigs = banded_signatures(new_reps, pcfg).select("url", "band_hashes")
    new_bands = fence(postings_from_band_hashes(new_sigs, pcfg))

    new_norm_slim = new_normed.select(
        "url", F.substring("norm_text", 1, win).alias("norm_text"), "warc_ts"
    )

    if catalog.exists("bands"):
        old_bands = catalog.read(spark, "bands")
        old_normed = catalog.read(spark, "normed")
        old_edges = catalog.read(spark, "edges")

        # candidates: new x (old ∪ new) via band equi-join — old x old
        # pairs were already evaluated in prior snapshots
        all_bands = old_bands.unionByName(new_bands)
        cand = (
            new_bands.withColumnRenamed("url", "url_n")
            .join(all_bands, ["band_id", "band_hash"])
            .where(F.col("url_n") != F.col("url"))
            .select(
                F.least("url_n", "url").alias("url_a"),
                F.greatest("url_n", "url").alias("url_b"),
            )
            .dropDuplicates(["url_a", "url_b"])
        )
        texts = old_normed.unionByName(new_norm_slim)
    else:
        old_edges = None
        cand = (
            new_bands.alias("a")
            .join(
                new_bands.alias("b"),
                ["band_id", "band_hash"],
            )
            .where(F.col("a.url") < F.col("b.url"))
            .select(
                F.col("a.url").alias("url_a"), F.col("b.url").alias("url_b")
            )
            .dropDuplicates(["url_a", "url_b"])
        )
        texts = new_norm_slim

    verified = verify_pairs(cand, texts, pcfg)
    new_edges = (
        verified.where("is_dup")
        .select("url_a", "url_b")
        .unionByName(new_exact_edges)
    )

    all_edges = new_edges
    if old_edges is not None:
        all_edges = old_edges.unionByName(new_edges).dropDuplicates(
            ["url_a", "url_b"]
        )
    # consumed by CC (iterative) AND the edges snapshot write
    all_edges = fence(all_edges)

    all_nodes = texts.select("url")
    clusters = connected_components(all_edges, all_nodes=all_nodes)

    # persist updated state as new snapshots
    catalog.write(
        new_bands if old_edges is None else old_bands.unionByName(new_bands),
        "bands",
    )
    catalog.write(texts, "normed")
    catalog.write(all_edges, "edges")
    catalog.write(clusters, "clusters")
    out = catalog.read(spark, "clusters")
    for df in fences:
        df.unpersist()
    return out
