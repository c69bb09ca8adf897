"""Connected components over verified dup edges -> cluster ids.

Iterative min-label propagation with pointer jumping, driver-owned
loop (Catalyst cannot express iteration; SURVEY.md §4). Each round:

    label(v) <- min(label(v), min over neighbors u of label(u))   # hop
    label(v) <- min(label(v), label(label(v)))                    # jump

The hop alone is O(cluster diameter) rounds — fine for the star
shapes exact-dup groups form, but real web corpora also produce
near-dup CHAINS (template pages with successive edits): the sf0.1
documents table contains a component of diameter >= 11, measured as
12 rounds / ~37 s before the jump step was added (round 5). The jump
treats the label table itself as a second edge set — label(v) is
always the url of a node in v's component (min over a reachable
subset), so label(label(v)) stays in-component and chain distance
halves per round: O(log diameter) rounds total, the same device
GraphX/GraphFrames CC uses. Each round fences through
``localCheckpoint`` (lineage truncation), with a periodic ``_fence``
reset every ``_STATS_RESET_EVERY`` rounds to also drop the preserved
origin statistics whose BigInteger bit-length otherwise doubles per
self-join round (see ``_fence`` for the growth arithmetic).
Labels are the cluster's minimum url — deterministic and
shuffle-stable, matching the fixture convention (FIXTURES.md F4:
cluster_id = min url in cluster).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# RDD-rebuild cadence for the stats reset. Preserved stats bits grow
# ~2x per self-join round from a small base (tens of bits), so after k
# rounds a multiply costs O((b0 * 2^k)^~1.6) — measured harmless
# through k ~= 12 (sub-ms) and catastrophic by k ~= 17 (seconds/round,
# see _fence). Resetting every 6 rounds caps bits at ~64x base while
# paying the Row round-trip at most twice for any realistic diameter
# (pointer jumping needs log2(diameter) rounds: 6 covers diameter 64,
# 12 covers 4096).
_STATS_RESET_EVERY = 6


def _fence(df: DataFrame) -> DataFrame:
    """Materialize + truncate lineage + DROP Catalyst origin stats.

    ``Dataset.localCheckpoint`` truncates the plan but PRESERVES the
    source plan's estimated statistics (``LogicalRDD.originStats``).
    In an iterative self-join loop, estimated ``sizeInBytes`` is the
    PRODUCT of both join branches, so the preserved BigInteger's
    bit-length DOUBLES every round: measured on a 2k-node graph, rounds
    0-13 ran ~1 s each, then 2 -> 5 -> 13 -> 28 -> 80 -> 220 s with a
    constant logical plan, constant RDD lineage, and a constant 4 jobs
    per round; jstack pinned the wall at 100% CPU inside
    ``BigInteger.multiplyToomCook3`` under ``IterableOnceOps.product``
    (Catalyst size-only stats estimation multiplying megabyte-sized
    integers). Rebuilding the frame from its JVM row RDD resets stats
    to the leaf default — constant bit-length per round — while still
    truncating lineage; the RDD[Row] -> ``createDataFrame`` round-trip
    stays entirely JVM-side (no Python serialization), but it DOES pay
    an InternalRow <-> Row conversion over every row (~10% on the
    sf0.1 ingest bench), which is why the loop below uses it only
    every ``_STATS_RESET_EVERY`` rounds and plain ``localCheckpoint``
    in between — bit growth is exponential in ROUNDS SINCE RESET, so a
    periodic reset keeps multiplies trivial at amortized-zero cost.
    """
    spark = df.sparkSession
    jrdd = df._jdf.rdd()
    jrdd.localCheckpoint()
    jrdd.count()
    return DataFrame(
        spark._jsparkSession.createDataFrame(jrdd, df._jdf.schema()), spark
    )


def connected_components(
    edges: DataFrame,
    all_nodes: DataFrame | None = None,
    max_iter: int = 25,
) -> DataFrame:
    """edges(url_a, url_b) -> (url, cluster_id).

    ``all_nodes`` (one ``url`` column) optionally adds isolated docs,
    which come back as singleton clusters (cluster_id = own url).
    """
    # undirected adjacency, both directions — materialized once so the
    # iteration never recomputes the (expensive) upstream edge plan.
    # Plain localCheckpoint for the seeds: their preserved stats are a
    # CONSTANT base (upstream estimate bits) that only the iterated
    # self-join doubles — the periodic _fence below caps that growth,
    # and an RDD rebuild here would pay the Row round-trip over the
    # full edge set on every CC invocation for nothing
    sym = (
        edges.select(F.col("url_a").alias("src"), F.col("url_b").alias("dst"))
        .unionByName(
            edges.select(F.col("url_b").alias("src"), F.col("url_a").alias("dst"))
        )
        .localCheckpoint(eager=True)
    )

    labels = (
        sym.select(F.col("src").alias("url"))
        .distinct()
        .withColumn("label", F.col("url"))
        .localCheckpoint(eager=True)
    )

    converged = False
    for it in range(max_iter):
        # ONE join per round (r06): hop and jump fuse into the classic
        # label-doubling step L'(v) = min(L(v), min L(N(v)), L(L(v)))
        # by treating the label table itself as extra edges v -> L(v):
        # the neighbor-min over sym ∪ label-edges then includes
        # L(L(v)). Same fixpoint (component-min labels), still O(log
        # diameter) rounds, but the per-round cost drops from two
        # joins + a convergence join to one join + a checkpoint-local
        # scan — CC on a 1k-edge graph measured 10.3 s -> per-round
        # fixed overhead was the entire cost at small edge counts.
        lab_edges = labels.select(
            F.col("url").alias("src"), F.col("label").alias("dst")
        )
        nbr_min = (
            sym.unionByName(lab_edges)
            .join(labels.withColumnRenamed("url", "dst"), "dst")
            .groupBy("src")
            .agg(F.min("label").alias("nbr_label"))
            .withColumnRenamed("src", "url")
        )
        round_fence = (
            _fence
            if it % _STATS_RESET_EVERY == _STATS_RESET_EVERY - 1
            else lambda df: df.localCheckpoint(eager=True)
        )
        # labels only ever decrease, so carrying a per-row change flag
        # into the fenced frame makes the convergence check a narrow
        # filter+limit over the checkpoint — no join, no shuffle
        new_labels = round_fence(
            labels.join(nbr_min, "url", "left").select(
                "url",
                F.least(
                    F.col("label"), F.coalesce("nbr_label", F.col("label"))
                ).alias("label"),
                (
                    F.coalesce("nbr_label", F.col("label")) < F.col("label")
                ).alias("chg"),
            )
        )
        labels = new_labels.drop("chg")
        changed = new_labels.where("chg").limit(1).count()
        if changed == 0:
            converged = True
            break

    if not converged:
        # labels move one hop per round; a dup chain with diameter >
        # max_iter would exit the loop with inconsistent cluster ids,
        # and even-iteration exits skip the changed-check (ADVICE r1) —
        # spend one final job to verify before trusting the labels
        final_changed = (
            sym.join(labels.withColumnRenamed("url", "dst"), "dst")
            .groupBy("src")
            .agg(F.min("label").alias("nbr_label"))
            .join(labels.withColumnRenamed("url", "src"), "src")
            .where(F.col("nbr_label") < F.col("label"))
            .limit(1)
            .count()
        )
        if final_changed > 0:
            raise RuntimeError(
                f"connected_components did not converge in {max_iter} "
                "iterations (cluster diameter exceeds max_iter); "
                "raise max_iter"
            )

    out = labels.withColumnRenamed("label", "cluster_id")
    if all_nodes is not None:
        singletons = (
            all_nodes.select("url")
            .join(out, "url", "left_anti")
            .withColumn("cluster_id", F.col("url"))
        )
        out = out.unionByName(singletons)
    return out


def elect_canonical(
    clusters: DataFrame, normed: DataFrame, n_chars_col: str | None = None
) -> DataFrame:
    """Per-cluster canonical doc via the reference rank-comparator keys.

    The reference's sort (uFuzzy.mjs:74-110) ranks matches by match
    quality; for cluster canonicalization the analogous deterministic
    multi-key order is: longest normalized text DESC (most complete
    copy), earliest warc_ts ASC (first crawl), url ASC (tiebreak).

    ``n_chars_col`` names a precomputed full-text length column
    (streaming/incremental.py stores it at ingest and keeps only a
    text window — length() over the window would elect differently
    than batch); default computes length(norm_text) here.
    """
    from pyspark.sql import Window

    length_expr = (
        F.length("norm_text") if n_chars_col is None else F.col(n_chars_col)
    )
    enriched = clusters.join(
        normed.select("url", length_expr.alias("n_chars"), "warc_ts"),
        "url",
        "left",
    )
    w = Window.partitionBy("cluster_id").orderBy(
        F.desc("n_chars"), F.asc("warc_ts"), F.asc("url")
    )
    return (
        enriched.withColumn("rnk", F.row_number().over(w))
        .withColumn("is_canonical", F.col("rnk") == 1)
        .drop("rnk", "n_chars", "warc_ts")
    )
