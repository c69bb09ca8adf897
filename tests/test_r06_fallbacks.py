"""Parity pins for the r06 chain-rewrite fallback paths.

q_ngram_jaccard / q_verify_pairs_native use guarded broadcasts of
per-doc profile frames when the corpus is small, and fall back to the
skinny posting-join shapes above ``_BCAST_MAX_ROWS`` docs. Testdata
never crosses the threshold, so the fallback shapes are pinned here by
forcing the threshold to 0 and comparing against the broadcast path.
"""

import pandas as pd
import pytest

import ufuzzy_spark.entry_queries as eq

SF = "/root/testdata/sf0.01"


def _canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if pd.api.types.is_float_dtype(df[c]):
            df[c] = df[c].round(6)
    return df.sort_values(by=list(df.columns), ignore_index=True)


@pytest.mark.parametrize(
    "qname", ["ngram_jaccard", "verify_pairs_native", "pair_features"]
)
def test_fallback_path_matches_broadcast_path(spark, monkeypatch, qname):
    fn = eq.queries()[qname]
    fast = fn(spark, SF).toPandas()
    monkeypatch.setattr(eq, "_BCAST_MAX_ROWS", 0)
    slow = fn(spark, SF).toPandas()
    pd.testing.assert_frame_equal(_canon(fast), _canon(slow))
