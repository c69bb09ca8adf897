"""Incremental dedup over snapshot diffs — the scaling ingest path.

The reference's prefixCache demo reuses prior results when the query
extends a cached prefix (demos/compare.html:562-601); the pipeline
analog is memoizing the EXPENSIVE stages across snapshots while
guaranteeing the final clusters equal a single batch run over the
union (resume-equivalence — the prefixCache contract).

Design (round 3 — replaces the round-2 "new x all band join"):
the two Python-heavy stages are incremental, keyed by CONTENT hash so
the memo survives representative churn:

- ``sigs`` state: (content_hash, band_hashes, simhash) — the Arrow
  signature UDF runs only for never-seen texts, O(new distinct texts).
- ``verdicts`` state: (hash_lo, hash_hi, is_dup) — bounded-edit
  verification is a pure function of the two normalized windows, so
  each unordered text pair is verified exactly once, ever.

The cheap relational stages — exact-dedup rep election, the salted
capped candidate generation (lsh.candidate_pairs), connected
components, canonical election — are recomputed over cumulative state
with the SAME operators as pipeline.run_pipeline. That recompute is
what makes incremental == batch EXACT by construction: the round-2
"new x all band join" diverged from batch whenever a bucket crossed
pcfg.max_bucket_size, because the capped star-overflow expansion is
not incrementally decomposable (cap ranks shift when new members
interleave into an over-cap bucket).

Scale notes (100 TB): signatures + verification — the stages that
dominate wall time (per-doc Python/Arrow and per-pair scoring) — stay
O(new). The recomputed stages are compact JVM hash/shuffle work over
(long, long) band postings and (url, url) edges. All three state
tables are APPEND-ONLY by construction (normed grows by new docs,
sigs by new hashes, verdicts by new pairs), and each ingest WRITES
only its delta (catalog.append); catalog.read_all unions the deltas
back, and compaction is an occasional full write of the union.

Batch-first by design: dedup's global-clustering nature makes
watermarked streaming state a poor fit (SURVEY.md §2.2 Streaming) —
the same function is the micro-batch body if driven by a
Structured Streaming foreachBatch sink (tests/test_streaming.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ufuzzy_spark.catalog import LocalParquetCatalog
from ufuzzy_spark.config import PipelineConfig
from ufuzzy_spark.operators.components import (
    connected_components,
    elect_canonical,
)
from ufuzzy_spark.operators.dedup import exact_dedup
from ufuzzy_spark.operators.lsh import candidate_pairs, postings_from_band_hashes
from ufuzzy_spark.operators.minhash import banded_signatures
from ufuzzy_spark.operators.normalize import normalize
from ufuzzy_spark.operators.verify import verify_pairs

_SIGS_SCHEMA = "content_hash long, band_hashes array<bigint>, simhash long"
_VERDICTS_SCHEMA = "hash_lo long, hash_hi long, is_dup boolean"


def incremental_dedup(
    spark: SparkSession,
    catalog: LocalParquetCatalog,
    new_pages: DataFrame,
    pcfg: PipelineConfig | None = None,
    stats_out: dict | None = None,
) -> DataFrame:
    """Process a new snapshot against persisted state; returns the
    updated full clusters table (also written as a new snapshot),
    bit-equal to ``run_pipeline`` over the union of all snapshots.

    Contract: urls are unique ACROSS snapshots (they are the identity
    every state table and CC node keys on); a snapshot re-ingesting a
    known url raises rather than corrupting state. A catalog written
    by the pre-round-3 layout (bands/edges tables) also raises.

    State tables: ``normed`` (url, content_hash, norm_text window,
    n_chars, warc_ts), ``sigs`` (content_hash -> band hashes),
    ``verdicts`` (unordered content-hash pair -> is_dup).

    ``stats_out``, when given, is filled with:

    - ``cand_pairs``: candidate pairs this snapshot (capped generator
      over cumulative representatives — includes old x old pairs,
      which are relational-only and hit the verdict memo),
    - ``pairs_verified``: memo misses actually verified this snapshot,
    - ``old_x_old_reverified``: verified pairs whose BOTH urls predate
      this snapshot — 0 unless a new doc shifted cap ranks inside an
      already-over-cap bucket; the `incremental_ingest` driver entry
      pins 0 (the expensive stage never re-pairs old x old),
    - ``new_sigs_computed``: never-seen texts signed this snapshot.
    """
    pcfg = pcfg or PipelineConfig()
    win = 2 * pcfg.verify_window_chars

    # persist+count fences (same discipline as pipeline.run_pipeline):
    # this function runs many actions (CC iterations + catalog writes
    # + stat counts) over shared subplans — unfenced, the normalize
    # and signature UDF chains recompute once per action
    fences: list[DataFrame] = []

    def fence(df: DataFrame) -> DataFrame:
        df = df.persist()
        df.count()
        fences.append(df)
        return df

    new_normed = fence(
        normalize(new_pages.where(F.col("lang") == "en"), pcfg.match)
        .select("url", "warc_ts", "norm_text")
        .withColumn("content_hash", F.xxhash64("norm_text"))
    )

    # --- incremental stage 1: sign never-seen texts (Arrow UDF) ----- #
    if catalog.exists("sigs"):
        old_sigs = catalog.read_all(spark, "sigs")
        old_normed = catalog.read_all(spark, "normed")
        old_verdicts = catalog.read_all(spark, "verdicts")
        # urls are the identity every state table and CC node keys on;
        # a re-crawled url (same url, any content, a later snapshot)
        # would live twice in `normed` and bridge its old and new
        # content clusters — refuse loudly rather than corrupt state
        n_dup_urls = new_normed.join(
            old_normed.select("url"), "url", "left_semi"
        ).count()
        if n_dup_urls:
            raise ValueError(
                f"incremental_dedup: {n_dup_urls} url(s) in this snapshot "
                "were already ingested; urls must be unique across "
                "snapshots (dedupe or version the urls upstream)"
            )
    elif catalog.exists("bands") or catalog.exists("edges"):
        # a catalog written by the pre-round-3 incremental layout:
        # treating it as empty would silently drop every previously
        # ingested doc from the returned clusters
        raise ValueError(
            "incremental_dedup: catalog holds legacy state tables "
            "(bands/edges) from the old new-x-all layout; rebuild state "
            "by re-ingesting snapshots into a fresh catalog"
        )
    else:
        old_sigs = spark.createDataFrame([], _SIGS_SCHEMA)
        old_normed = None
        old_verdicts = spark.createDataFrame([], _VERDICTS_SCHEMA)

    first_per_hash = Window.partitionBy("content_hash").orderBy("url")
    sig_inputs = (
        new_normed.withColumn("rn", F.row_number().over(first_per_hash))
        .where("rn = 1")
        .join(old_sigs.select("content_hash"), "content_hash", "left_anti")
        # banded_signatures keys its output by the passthrough "url"
        # column — feed the content hash as that key so the sig table
        # is text-addressed (memo survives representative churn)
        .select(F.col("content_hash").alias("url"), "norm_text")
    )
    new_sigs = fence(
        banded_signatures(sig_inputs, pcfg).withColumnRenamed(
            "url", "content_hash"
        )
    )
    sigs_state = old_sigs.unionByName(new_sigs)
    if stats_out is not None:
        stats_out["new_sigs_computed"] = new_sigs.count()

    # cumulative slim doc state: verify window + election keys only
    # (full norm_text is never needed again — sigs are memoized)
    new_slim = new_normed.select(
        "url",
        "content_hash",
        F.substring("norm_text", 1, win).alias("norm_text"),
        F.length("norm_text").alias("n_chars"),
        "warc_ts",
    )
    all_normed = new_slim
    if old_normed is not None:
        all_normed = old_normed.unionByName(new_slim)
    all_normed = fence(all_normed)

    # --- recomputed relational stages (same operators as batch) ----- #
    # exact-dedup rep election over the CUMULATIVE corpus, grouping on
    # the stored full-text hash (state keeps the hash, not the text)
    exact_edges, reps_full = exact_dedup(all_normed, hash_col="content_hash")
    reps = reps_full.select("url", "content_hash")

    buckets = postings_from_band_hashes(
        reps.join(sigs_state, "content_hash").select("url", "band_hashes"),
        pcfg,
    )
    cand = fence(
        candidate_pairs(buckets, pcfg).join(
            reps.select(
                F.col("url").alias("url_a"),
                F.col("content_hash").alias("hash_a"),
            ),
            "url_a",
        ).join(
            reps.select(
                F.col("url").alias("url_b"),
                F.col("content_hash").alias("hash_b"),
            ),
            "url_b",
        ).select(
            "url_a",
            "url_b",
            F.least("hash_a", "hash_b").alias("hash_lo"),
            F.greatest("hash_a", "hash_b").alias("hash_hi"),
        )
    )
    if stats_out is not None:
        stats_out["cand_pairs"] = cand.count()

    # --- incremental stage 2: verify only memo misses ---------------- #
    to_verify = fence(
        cand.join(old_verdicts, ["hash_lo", "hash_hi"], "left_anti")
    )
    if stats_out is not None:
        new_urls = new_normed.select("url").distinct()
        stats_out["pairs_verified"] = to_verify.count()
        stats_out["old_x_old_reverified"] = (
            to_verify.join(
                new_urls.withColumnRenamed("url", "url_a"), "url_a", "left_anti"
            )
            .join(
                new_urls.withColumnRenamed("url", "url_b"), "url_b", "left_anti"
            )
            .count()
        )

    new_verdicts = fence(
        verify_pairs(to_verify.select("url_a", "url_b"), all_normed, pcfg)
        .join(to_verify, ["url_a", "url_b"])
        .select("hash_lo", "hash_hi", "is_dup")
    )
    verdicts_state = old_verdicts.unionByName(new_verdicts)

    dup_edges = (
        cand.join(verdicts_state, ["hash_lo", "hash_hi"])
        .where("is_dup")
        .select("url_a", "url_b")
    )
    all_edges = fence(exact_edges.unionByName(dup_edges))

    cc = connected_components(all_edges, all_nodes=all_normed.select("url"))
    # canonical election over the INGEST-TIME n_chars (full-text
    # length; the stored norm_text is only the verify window, so
    # length() over it would elect differently than batch)
    clusters = elect_canonical(cc, all_normed, n_chars_col="n_chars")

    # persist state as DELTA snapshots — the tables are append-only by
    # construction, so each ingest writes O(new) rows, not cumulative
    # state; read_all unions the deltas back (compaction = an
    # occasional full catalog.write of the union). clusters is an
    # OUTPUT table: always a full snapshot.
    if old_normed is None:
        catalog.write(new_sigs, "sigs")
        catalog.write(new_slim, "normed")
        catalog.write(new_verdicts, "verdicts")
    else:
        catalog.append(new_sigs, "sigs")
        catalog.append(new_slim, "normed")
        catalog.append(new_verdicts, "verdicts")
    catalog.write(clusters, "clusters")
    out = catalog.read(spark, "clusters")
    for df in fences:
        df.unpersist()
    return out
