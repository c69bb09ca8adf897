"""Verification stage — the reference's info() precision pass at scale.

Candidate pairs from LSH are recall-oriented (like filter(),
uFuzzy.mjs:394-418); this stage applies the EXACT bounded-edit pair
predicate (pairdup.PairVerifier — the same code that labels the
golden fixtures) and emits pair features, the dedup reinterpretation
of the reference's Info struct (dist/uFuzzy.d.ts:175-207).

Scale notes:
- texts are attached by two equi-joins on url; only the verification
  window (2 x verify_window_chars) is shuffled, not full documents
- the predicate runs in an Arrow-batched pandas UDF; per-term regexes
  are compiled once per executor and LRU-shared across pairs (the
  reference's compile-once pattern, uFuzzy.mjs:222-226)
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    BooleanType,
    DoubleType,
    IntegerType,
    StructField,
    StructType,
)

from ufuzzy_spark.config import MatchConfig, PipelineConfig

VERIFY_SCHEMA = StructType(
    [
        StructField("score", DoubleType()),
        StructField("is_dup", BooleanType()),
        StructField("terms_a", IntegerType()),
        StructField("terms_b", IntegerType()),
        StructField("matched_a", IntegerType()),
        StructField("matched_b", IntegerType()),
        StructField("exact", BooleanType()),
    ]
)

# per-executor verifier cache keyed by config hash (compile-once)
_VERIFIERS: dict = {}


def _get_verifier(pcfg_tuple):
    from ufuzzy_spark.pairdup import PairVerifier

    if pcfg_tuple not in _VERIFIERS:
        match_kw, pipe_kw = pcfg_tuple
        pcfg = PipelineConfig(match=MatchConfig(**dict(match_kw)), **dict(pipe_kw))
        _VERIFIERS[pcfg_tuple] = PairVerifier(pcfg)
    return _VERIFIERS[pcfg_tuple]


def _pcfg_tuple(pcfg: PipelineConfig):
    """Picklable, hashable config representation for executor closures."""
    from dataclasses import asdict

    d = asdict(pcfg)
    match = d.pop("match")
    match["intraSlice"] = tuple(match["intraSlice"])
    return (tuple(sorted(match.items())), tuple(sorted(d.items())))


def make_verify_udf(pcfg: PipelineConfig):
    import os

    key = _pcfg_tuple(pcfg)
    # A/B switch for the batch-level vectorized fast path (VERDICT r2
    # #3); captured driver-side into the closure so both paths ship
    # identical configs. Decision + measurement: BENCH/BASELINE.md.
    use_batch = os.environ.get("UFZ_VERIFY_BATCH", "0") == "1"

    @F.pandas_udf(VERIFY_SCHEMA)
    def verify_udf(norm_a: pd.Series, norm_b: pd.Series) -> pd.DataFrame:
        v = _get_verifier(key)
        a_clean = [a if isinstance(a, str) else "" for a in norm_a]
        b_clean = [b if isinstance(b, str) else "" for b in norm_b]
        if use_batch:
            rows = v.verify_batch(a_clean, b_clean)
        else:
            verify = v.verify  # bind once; the batch loop is the hot path
            rows = [verify(a, b) for a, b in zip(a_clean, b_clean)]
        cols = list(zip(*((r.score, r.is_dup, r.terms_a, r.terms_b,
                           r.matched_a, r.matched_b, r.exact) for r in rows)))
        if not cols:
            cols = [[] for _ in range(7)]
        names = ("score is_dup terms_a terms_b matched_a matched_b exact").split()
        return pd.DataFrame(dict(zip(names, cols)))

    return verify_udf


def verify_pairs(
    pairs: DataFrame,
    normed: DataFrame,
    pcfg: PipelineConfig | None = None,
    broadcast_texts: bool = False,
) -> DataFrame:
    """(url_a, url_b) x normed(url, norm_text) -> pair_features.

    Returns all columns of VERIFY_SCHEMA plus the pair key; callers
    filter ``is_dup`` (discard ≙ WHERE, uFuzzy.mjs:556-558).

    ``broadcast_texts``: the pair table is usually orders of magnitude
    larger than the doc table (hundreds of candidate pairs per doc),
    so the two attach joins otherwise shuffle the pair table twice —
    by url_a, then again by url_b (guide §8: the attach join sneaks
    the payload shuffle back in). Callers that have COUNTED the text
    side and know it is small opt in; the windows are ~1 KB/row, so
    the guard threshold lives with each caller (run_pipeline /
    incremental use <= 500k rows). Off by default: ``normed`` is
    data-dependent and a bare broadcast of an unbounded frame is the
    incremental.py `_maybe_broadcast` anti-pattern.
    """
    pcfg = pcfg or PipelineConfig()
    # ship only the verification window through the shuffle
    win = 2 * pcfg.verify_window_chars
    texts = normed.select(
        "url", F.substring("norm_text", 1, win).alias("norm_win")
    )
    if broadcast_texts:
        texts = F.broadcast(texts)

    joined = (
        pairs.join(
            texts.select(
                F.col("url").alias("url_a"), F.col("norm_win").alias("norm_a")
            ),
            "url_a",
        )
        .join(
            texts.select(
                F.col("url").alias("url_b"), F.col("norm_win").alias("norm_b")
            ),
            "url_b",
        )
    )

    vu = make_verify_udf(pcfg)
    # passthrough: any extra columns on `pairs` (e.g. the incremental
    # path's hash_lo/hash_hi) ride through, so callers don't pay a
    # join-back against the pair table to recover them
    return joined.withColumn("v", vu("norm_a", "norm_b")).select(
        *pairs.columns, "v.*"
    )
