"""Exact-duplicate pre-dedup — the cheapest, highest-mass pass.

Boilerplate/identical pages form mega-clusters that would explode LSH
buckets quadratically (SURVEY.md §7 risks); hashing them out first is
the staging trick the reference applies everywhere: run the cheap
high-selectivity pass before the expensive one (filter-before-info,
README.md:304-308; longest-term-first AND reduction, uFuzzy.mjs:814).

One shuffle (window over content hash). Emits:
- edges: (url_a=representative, url_b=member) exact-dup star edges
- reps:  one representative row per distinct content (the only rows
  that proceed to signature/LSH stages)
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def exact_dedup(
    normed: DataFrame, hash_col: str | None = None
) -> tuple[DataFrame, DataFrame]:
    """normed(url, norm_text, ...) -> (exact_edges, representatives).

    ``hash_col`` names a precomputed full-text hash column to group on
    (streaming/incremental.py stores xxhash64(norm_text) at ingest and
    keeps only a text window — re-hashing the window would elect
    different reps than batch); default computes it here.
    """
    if hash_col is None:
        hashed = normed.withColumn("content_hash", F.xxhash64("norm_text"))
    else:
        hashed = normed.withColumn("content_hash", F.col(hash_col))
    w = Window.partitionBy("content_hash").orderBy("url")
    ranked = hashed.withColumn("rep_url", F.first("url").over(w)).withColumn(
        "rn", F.row_number().over(w)
    )

    edges = (
        ranked.where(F.col("rn") > 1)
        .select(F.col("rep_url").alias("url_a"), F.col("url").alias("url_b"))
    )
    reps = ranked.where(F.col("rn") == 1).drop("rep_url", "rn")
    return edges, reps
