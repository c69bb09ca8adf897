"""Long exact-substring pair detection — the "suffix-array pass".

Finds doc pairs sharing an exact substring of >= min_exact_substring
chars (FIXTURES.md F2 `substring_long`; north_star "suffix-array pass
for long exact-substring dupes").

Instead of a distributed suffix array (global sort of all suffixes —
a full-corpus shuffle at 100 TB), we use winnowing fingerprints
(Schleimer, Wilkerson, Aiken: "Winnowing: Local Algorithms for
Document Fingerprinting", SIGMOD'03):

- rolling k-gram hashes (k = min_exact_substring) per doc
- keep the min hash of every w-size window (w = k//2)
- guarantee: any substring shared by two docs of length >= k + w - 1
  produces at least one shared fingerprint — detection is
  DETERMINISTIC, not probabilistic, while emitting only ~2/w of all
  gram hashes

The fingerprint -> doc postings table then reuses the same
single-shuffle bucket/pair machinery as MinHash LSH (operators/lsh.py),
so skew/cap behavior is uniform. Pair identity relies on 64-bit
content hashes (collision odds ~1e-19 per pair) — a recheck hook is
provided for audit runs.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import ArrayType, LongType

from ufuzzy_spark.config import PipelineConfig
from ufuzzy_spark.functions.hashing import kgram_hashes_positional
from ufuzzy_spark.operators.lsh import candidate_pairs


def winnow_fingerprints(text: str, k: int, w: int) -> np.ndarray:
    """Unique winnowing fingerprints of a string (numpy-vectorized)."""
    h = kgram_hashes_positional(text, k)
    if h.size == 0:
        return h
    if h.size <= w:
        return np.unique(h.min(keepdims=True))
    wins = np.lib.stride_tricks.sliding_window_view(h, w)
    return np.unique(wins.min(axis=1))


def make_winnow_udf(pcfg: PipelineConfig):
    k = pcfg.min_exact_substring
    w = max(2, k // 2)

    @F.pandas_udf(ArrayType(LongType()))
    def winnow_udf(texts: pd.Series) -> pd.Series:
        return pd.Series(
            [
                winnow_fingerprints(t if isinstance(t, str) else "", k, w)
                .view(np.int64)
                .tolist()
                for t in texts
            ]
        )

    return winnow_udf


def substring_pairs(
    normed: DataFrame, pcfg: PipelineConfig | None = None
) -> DataFrame:
    """normed(url, norm_text) -> (url_a, url_b) sharing a long exact
    substring. Same shuffle profile as LSH candidate generation."""
    pcfg = pcfg or PipelineConfig()
    wu = make_winnow_udf(pcfg)

    buckets = (
        normed.select("url", F.explode(wu(F.col("norm_text"))).alias("band_hash"))
        .withColumn("band_id", F.lit(3000))
        .select("url", "band_id", "band_hash")
    )
    return candidate_pairs(buckets, pcfg)
