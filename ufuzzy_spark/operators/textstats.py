"""Intra-document repetition metrics (Gopher-style quality rules).

Rae et al. 2021 (Gopher, §A1.1) and the C4/MassiveText cleaning
stacks drop documents whose content is internally repetitious —
boilerplate loops, keyword stuffing, template spam. The standard
signals are duplicate-n-gram fractions and the mass of the single
most frequent token.

Every metric here is a NARROW higher-order-function expression over
the token array — ``transform`` / ``filter`` / ``array_distinct`` /
``aggregate`` — so the operator is whole-stage-codegen'd, shuffles
nothing, and scales per-row: exactly the shape a 100 TB quality pass
needs (one scan, one projection, filter pushdown preserved).
``top_token_frac`` costs O(distinct x n) comparisons per doc — for
natural-language docs distinct << n and both are page-bounded; the
alternative (explode + groupBy) would shuffle the whole corpus's
token stream to compute a per-doc mode.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ufuzzy_spark.operators.decontaminate import token_ngrams


def dup_ngram_frac(tokens: Column, n: int) -> Column:
    """Fraction of a doc's token n-grams that are repeats of an
    earlier n-gram: 1 - distinct/total (0 for docs with < n+1
    tokens — a single gram cannot repeat)."""
    total = F.size(tokens) - (n - 1)
    distinct = F.size(token_ngrams(tokens, n))
    return F.when(
        total > 0,
        F.round(
            F.lit(1.0) - distinct.cast("double") / total.cast("double"), 6
        ),
    ).otherwise(F.lit(0.0))


def top_token_frac(tokens: Column) -> Column:
    """Mass of the most frequent token: mode count / token count
    (0 for empty docs). Narrow per-row mode via transform-over-
    distinct, no shuffle."""
    counts = F.transform(
        F.array_distinct(tokens),
        lambda d: F.size(F.filter(tokens, lambda x: x == d)),
    )
    return F.when(
        F.size(tokens) > 0,
        F.round(
            F.array_max(counts).cast("double")
            / F.size(tokens).cast("double"),
            6,
        ),
    ).otherwise(F.lit(0.0))


def repetition_metrics(
    df: DataFrame, tokens_col: str = "tokens", id_col: str = "doc_id"
) -> DataFrame:
    """(id, frac_dup_2grams, frac_dup_3grams, top_token_frac) per doc
    — the Gopher repetition signals as one narrow projection."""
    t = F.col(tokens_col)
    return df.select(
        id_col,
        dup_ngram_frac(t, 2).alias("frac_dup_2grams"),
        dup_ngram_frac(t, 3).alias("frac_dup_3grams"),
        top_token_frac(t).alias("top_token_frac"),
    )
