"""Approximate nearest neighbors over embedding columns.

Two paths per the scale brief:
- ``brute_force_topk``: exact cosine top-k via native array exprs
  (zip_with/aggregate — JVM, codegen). Baseline and small-N path.
- ``lsh_topk``: random-hyperplane (signed random projection) bucketing
  — candidates share >= 1 of ``n_tables`` sign-pattern buckets, then
  exact re-rank within buckets. The bucket join reuses the LSH
  machinery's single-shuffle profile.

Hyperplanes are seeded deterministically so runs are reproducible.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import ArrayType, LongType

from ufuzzy_spark.operators.topk import grouped_topk


def _dot(a, b):
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def _norm(a):
    return F.sqrt(_dot(a, a))


def cosine_col(a, b):
    return _dot(a, b) / (_norm(a) * _norm(b))


def brute_force_topk(
    embs: DataFrame,
    queries: DataFrame,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """queries x embs exact cosine top-k. Queries are broadcast (small
    side); candidates never shuffle. O(Q*N) — the N that matters."""
    q = queries.select(
        F.col(id_col).alias("qid"), F.col(vec_col).alias("qe")
    )
    c = embs.select(F.col(id_col).alias("cid"), F.col(vec_col).alias("ce"))
    sims = (
        c.crossJoin(F.broadcast(q))
        .where(F.col("qid") != F.col("cid"))
        .select("qid", "cid", cosine_col(F.col("qe"), F.col("ce")).alias("sim"))
    )
    # two-phase top-k: a plain Window.partitionBy(qid) would move the
    # whole corpus' similarity rows into Q tasks (VERDICT r1 #2)
    return grouped_topk(
        sims, ["qid"], [F.desc("sim"), F.asc("cid")], k
    ).select("qid", "cid", "sim", "rnk")


def make_srp_udf(dim: int, n_tables: int, bits_per_table: int, seed: int = 42):
    """Signed-random-projection bucket UDF: vector -> n_tables bucket
    ids (packed sign bits). NumPy matmul over the Arrow batch."""
    rng = np.random.RandomState(seed)
    planes = rng.randn(n_tables * bits_per_table, dim).astype(np.float64)
    weights = (1 << np.arange(bits_per_table, dtype=np.int64))

    @F.pandas_udf(ArrayType(LongType()))
    def srp_udf(vecs: pd.Series) -> pd.Series:
        mat = np.stack([np.asarray(v, dtype=np.float64) for v in vecs])
        signs = (mat @ planes.T) > 0  # (batch, tables*bits)
        signs = signs.reshape(len(mat), n_tables, bits_per_table)
        buckets = (signs * weights).sum(axis=2)  # (batch, tables)
        # offset each table into its own id space
        buckets += (np.arange(n_tables, dtype=np.int64) << 32)
        return pd.Series(list(buckets))

    return srp_udf


def lsh_topk(
    embs: DataFrame,
    queries: DataFrame,
    k: int = 10,
    dim: int = 64,
    n_tables: int = 8,
    bits_per_table: int = 12,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """SRP-bucketed ANN: equi-join on bucket id, exact re-rank within.

    At 10^12 vectors: candidates per query ~ N * n_tables / 2^bits —
    tune bits_per_table to budget; the bucket join shuffles only
    (bucket_id, vec_id, vec) — no quadratic stage anywhere.
    """
    srp = make_srp_udf(dim, n_tables, bits_per_table)
    cb = embs.select(
        F.col(id_col).alias("cid"),
        F.col(vec_col).alias("ce"),
        F.explode(srp(F.col(vec_col))).alias("bucket"),
    )
    qb = queries.select(
        F.col(id_col).alias("qid"),
        F.col(vec_col).alias("qe"),
        F.explode(srp(F.col(vec_col))).alias("bucket"),
    )
    cand = (
        cb.join(F.broadcast(qb), "bucket")
        .where(F.col("qid") != F.col("cid"))
        .select("qid", "qe", "cid", "ce")
        .dropDuplicates(["qid", "cid"])
    )
    sims = cand.select(
        "qid", "cid", cosine_col(F.col("qe"), F.col("ce")).alias("sim")
    )
    return grouped_topk(
        sims, ["qid"], [F.desc("sim"), F.asc("cid")], k
    ).select("qid", "cid", "sim", "rnk")
