"""Benchmark decontamination: flag training docs sharing token
n-grams with an evaluation set.

The standard training-data hygiene pass (GPT-3 appendix C / PaLM
style): any training document that shares at least one token n-gram
(n ≈ 8-13) with a benchmark document is flagged (for removal or
masking), so eval answers cannot leak into the training corpus.

Spark shape — built for the 100 TB side being TRAIN, not bench:

- the benchmark side is always small (eval suites are thousands of
  docs, not billions) -> its distinct gram set is BROADCAST; the
  training side never shuffles for the probe,
- per-doc gram construction is a narrow higher-order-function
  expression (``transform`` over ``sequence`` + ``slice`` +
  ``concat_ws``) — whole-stage-codegen'd, no Python,
- ``array_distinct`` BEFORE the explode bounds fan-out per doc and
  makes the final per-doc count a plain ``count`` (map-side partial
  agg on the only shuffle in the plan, keyed by doc id).

``hashed=True`` folds each gram to ``xxhash64`` before the join —
shrinks the broadcast table ~10x for big benchmarks (collision odds
~1e-19 per pair, same 64-bit-identity argument as operators/
substring.py). The entry query uses raw-string grams so the DuckDB
oracle is trivially exact.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def token_ngrams(tokens: Column, n: int) -> Column:
    """Distinct space-joined token n-grams of an array column, as a
    narrow expression. Empty array when the doc has < n tokens
    (guarded: Spark's ``sequence(1, 0)`` counts DOWN, so the
    unguarded form would emit junk grams)."""
    return F.when(
        F.size(tokens) >= n,
        F.array_distinct(
            F.transform(
                F.sequence(F.lit(1), F.size(tokens) - (n - 1)),
                lambda i: F.concat_ws(" ", F.slice(tokens, i, n)),
            )
        ),
    ).otherwise(F.array().cast("array<string>"))


def ngram_overlap(
    train: DataFrame,
    bench: DataFrame,
    id_col: str = "doc_id",
    tokens_col: str = "tokens",
    n: int = 8,
    hashed: bool = True,
) -> DataFrame:
    """(id_col, n_shared_grams) for every training doc sharing >= 1
    token n-gram with ANY benchmark doc. Inputs carry a tokenized
    array column (tokens_col); train ids are the output identity.

    Contaminated-doc REMOVAL is then one broadcast left-anti join of
    the corpus against this frame's ids — kept separate so callers
    can audit before dropping (the flag-then-filter convention)."""
    t_grams = train.select(
        id_col, F.explode(token_ngrams(F.col(tokens_col), n)).alias("gram")
    )
    b_grams = bench.select(
        F.explode(token_ngrams(F.col(tokens_col), n)).alias("gram")
    ).distinct()
    if hashed:
        t_grams = t_grams.select(id_col, F.xxhash64("gram").alias("gram"))
        b_grams = b_grams.select(F.xxhash64("gram").alias("gram")).distinct()
    return (
        t_grams.join(F.broadcast(b_grams), "gram")
        .groupBy(id_col)
        .agg(F.count(F.lit(1)).cast("long").alias("n_shared_grams"))
    )
