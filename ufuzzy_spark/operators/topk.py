"""Distributed top-k and bounded global ranking.

The reference ranks matches single-threaded and gates the whole
info/sort phase at ``infoThresh`` matches (uFuzzy.mjs:876-879) — at
Spark scale the equivalent discipline is: never give an unpartitioned
Window an unbounded input. These helpers keep every Window partitioned
and bound the one single-task step to k rows per group (or k rows
total), so the plan survives a 100x scale-up:

- phase 1 prunes each input partition to its local top-k with a
  Window partitioned by (group, spark_partition_id) — parallel,
  streaming sort, no driver involvement;
- phase 2 merges the <= k * P survivors per group, either with a
  Window partitioned by group (grouped_topk) or a single sorted-array
  aggregation (global_rank_asc — no Window at all).

Exactness: phase 1 only drops rows that can never be in the true
top-k (total order given by the sort keys), so the two-phase result
equals the single-pass result.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def partition_topk(
    df: DataFrame,
    order_cols: list[Column],
    k: int,
    group_cols: list[str] | None = None,
) -> DataFrame:
    """Keep at most k rows per (group x input-partition) — the
    parallel pruning phase. Output is a superset of the true top-k."""
    group_cols = group_cols or []
    w = Window.partitionBy(*group_cols, "_p").orderBy(*order_cols)
    return (
        df.withColumn("_p", F.spark_partition_id())
        .withColumn("_r", F.row_number().over(w))
        .where(F.col("_r") <= k)
        .drop("_p", "_r")
    )


def grouped_topk(
    df: DataFrame,
    group_cols: list[str],
    order_cols: list[Column],
    k: int,
    rank_col: str = "rnk",
) -> DataFrame:
    """Exact top-k per group with ranks, no unpartitioned Window.

    The final per-group Window sees <= k * shuffle_partitions rows."""
    pruned = partition_topk(df, order_cols, k, group_cols)
    w = Window.partitionBy(*group_cols).orderBy(*order_cols)
    return (
        pruned.withColumn(rank_col, F.row_number().over(w).cast("long"))
        .where(F.col(rank_col) <= k)
    )


def global_rank_asc(
    df: DataFrame,
    key_cols: list[str],
    k: int,
    rank_col: str = "rnk",
) -> DataFrame:
    """Exact global top-k ranking by ascending ``key_cols`` (the first
    key is the primary sort key; later keys break ties; the full key
    tuple must be a total order). Returns the key columns + rank.

    The merge is a sorted-array aggregation over <= k * P structs —
    a single bounded task, mirroring the reference's infoThresh cap on
    how many matches are ever ranked (uFuzzy.mjs:876-879). No Window
    appears in the merge at all.
    """
    pruned = partition_topk(df, [F.asc(c) for c in key_cols], k)
    arr = pruned.agg(
        F.slice(
            F.array_sort(F.collect_list(F.struct(*key_cols))), 1, k
        ).alias("arr")
    )
    exploded = arr.select(F.posexplode("arr").alias("_pos", "_s"))
    return exploded.select(
        *[F.col(f"_s.{c}").alias(c) for c in key_cols],
        (F.col("_pos") + 1).cast("long").alias(rank_col),
    )
