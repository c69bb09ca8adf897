"""Signature stage — MinHash + SimHash via Arrow-vectorized pandas UDFs.

The reference's filter() is a cheap recall-oriented pre-pass
(uFuzzy.mjs:394-418, README.md:304-308); at scale that role is played
by signatures + LSH. No per-row Python: each UDF receives an Arrow
batch and runs the NumPy kernels in functions/hashing.py.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import ArrayType, LongType, StructField, StructType

from ufuzzy_spark.config import PipelineConfig
from ufuzzy_spark.functions.hashing import all_signatures


SIG_SCHEMA = StructType(
    [
        StructField("minhash", ArrayType(LongType())),
        StructField("bag_minhash", ArrayType(LongType())),
        StructField("simhash", LongType()),
    ]
)


def make_signatures_udf(pcfg: PipelineConfig):
    """ONE pandas UDF for all three signatures: a single Arrow
    crossing, one tokenization per doc, token hashes shared between
    bag-MinHash and SimHash (functions/hashing.all_signatures)."""
    k, num_perm, bag_perm = pcfg.shingle_k, pcfg.num_perm, pcfg.bag_num_perm

    @F.pandas_udf(SIG_SCHEMA)
    def signatures_udf(texts: pd.Series) -> pd.DataFrame:
        mh, bmh, sh = all_signatures(
            texts.fillna("").tolist(), k, num_perm, bag_perm
        )
        return pd.DataFrame(
            {
                "minhash": list(mh),
                "bag_minhash": list(bmh),
                "simhash": sh,
            }
        )

    return signatures_udf


def signatures(normed: DataFrame, pcfg: PipelineConfig | None = None) -> DataFrame:
    """normed(url, norm_text, ...) -> + minhash, bag_minhash, simhash.
    Narrow stage; one Arrow-batched UDF.

    Two MinHash families (SURVEY.md §7 recall risks):
    - ``minhash``: char shingles of ORIGINAL-order text — catches
      in-order bounded-edit classes (ins/sub/trn/del/case/diacritic/
      boundary) without degenerating on small-vocabulary corpora.
    - ``bag_minhash``: token-multiset expansion — order-invariant and
      frequency-aware; catches out-of-order dups (the reference's OOO
      semantics, uFuzzy.mjs:812-858) with bag-Jaccard 1.0.
    Plus ``simhash`` (64-bit) for the Hamming-ball branch.
    """
    pcfg = pcfg or PipelineConfig()
    su = make_signatures_udf(pcfg)
    # minimal projection: ONLY (url, norm_text) crosses the Arrow
    # exchange — dragging html/text/tokens through the Python worker
    # costs ~1.5x the whole stage
    return normed.select("url", su(F.col("norm_text")).alias("sig")).select(
        "url", "sig.minhash", "sig.bag_minhash", "sig.simhash"
    )
