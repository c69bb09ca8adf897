"""Corpus-level exact line deduplication (the C4 / CCNet boilerplate
pass).

Raffel et al. 2020 (C4, §2.2) and Wenzek et al. 2020 (CCNet, §3)
deduplicate web corpora at LINE granularity before document-level
near-dup: navigation bars, cookie banners, and license footers repeat
across millions of pages, and dropping every occurrence after the
first removes most boilerplate without touching unique prose. This is
the remaining dedup granularity between the repo's document-level
passes (MinHash/SimHash clusters) and its intra-document repetition
metrics (operators/textstats.py).

Scale shape (the part that must survive 100 TB):

* first-occurrence election is a ``groupBy(line_hash)`` with
  ``min(struct(id, pos))`` + ``count`` — both combine map-side, so a
  cookie banner occurring 10^9 times contributes ONE row per input
  partition to the shuffle, not 10^9 rows (the skew collapses in the
  partial aggregate, same argument as the LSH bucket counts in
  operators/lsh.py).
* the join back to line instances is a hash equi-join on the 64-bit
  line key; the probe side is skewed (every instance of the banner)
  but AQE skew-join splits it, and the build side is one row per
  DISTINCT line.
* reassembly is one ``groupBy(id)`` with ``collect_list`` — bounded
  by page size, the same per-doc bound every other operator assumes.

Eligibility (``min_tokens``) is a pure function of line CONTENT, so
all occurrences of a line are either all eligible or all kept — the
keep decision never depends on which occurrences a partition saw.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _word_count(col):
    return F.size(F.filter(F.split(col, r"\s+"), lambda t: t != F.lit("")))


def remove_duplicate_lines(
    df: DataFrame,
    id_col: str = "doc_id",
    lines_col: str = "lines",
    min_tokens: int = 5,
) -> DataFrame:
    """Drop every occurrence after the globally-first of each
    duplicated line with >= ``min_tokens`` whitespace tokens.

    ``df`` must carry ``id_col`` and an ``array<string>`` column of
    the document's lines in order. "Globally first" is the minimum
    ``(id, pos)`` over all occurrences — deterministic and
    engine-portable. Lines shorter than ``min_tokens`` are always
    kept (short fragments collide by chance, not by boilerplate).

    Total over its input: every doc yields exactly one output row.
    Null/empty ``lines`` arrays give ``(0, 0, "")``; a null ELEMENT
    is treated as an empty line (always kept, renders as ``""``).

    Returns ``(id, n_lines, n_removed, clean_text)`` where
    ``clean_text`` joins the kept lines with ``\\n`` in original
    order.
    """
    # posexplode_outer keeps empty/null-array docs as a (null, null)
    # marker row so they survive to the per-doc aggregate
    inst = (
        df.select(
            id_col, F.posexplode_outer(lines_col).alias("pos", "line")
        )
        .withColumn(
            "line",
            F.when(
                F.col("pos").isNotNull(), F.coalesce("line", F.lit(""))
            ),
        )
        .withColumn(
            "elig",
            F.col("pos").isNotNull()
            & (_word_count(F.col("line")) >= min_tokens),
        )
    )

    # 64-bit content key: the shuffle moves 8-byte keys, not page-
    # sized strings; a cross-line collision needs ~2^32 distinct
    # lines (accepted, same budget as every content-hash dedup here)
    first = (
        inst.where("elig")
        .groupBy(F.xxhash64("line").alias("lh"))
        .agg(F.min(F.struct(id_col, "pos")).alias("first"))
    )

    marked = (
        inst.join(first, F.xxhash64(inst["line"]) == first["lh"], "left")
        .withColumn(
            "keep",
            F.col("pos").isNotNull()
            & (
                ~F.col("elig")
                | (
                    (F.col("first")[id_col] == F.col(id_col))
                    & (F.col("first.pos") == F.col("pos"))
                )
            ),
        )
    )

    return marked.groupBy(id_col).agg(
        F.count("pos").cast("long").alias("n_lines"),
        F.sum(
            F.when(F.col("pos").isNotNull() & ~F.col("keep"), 1).otherwise(0)
        )
        .cast("long")
        .alias("n_removed"),
        F.array_join(
            F.transform(
                F.array_sort(
                    F.collect_list(
                        F.when(F.col("keep"), F.struct("pos", "line"))
                    )
                ),
                lambda s: s["line"],
            ),
            "\n",
        ).alias("clean_text"),
    )
