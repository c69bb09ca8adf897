"""LSH candidate generation — band hashing, bucketing, pair expansion.

The reference's inverted-index demo fuzzy-expands query terms over a
small vocabulary and intersects posting lists
(demos/inverted-index.html:73-111); LSH band buckets are exactly that
structure: postings keyed by signature fragments, candidate pair =
same-bucket co-occurrence (SURVEY.md §2 #13).

Scale design (one shuffle for the whole stage):
- explode bands (narrow), hash each band slice with xxhash64 (JVM)
- ONE shuffle: window over (band_id, band_hash) ordered by url
- in-bucket pair expansion is a narrow array transform (no self-join)
- buckets larger than max_bucket_size emit star edges (member ->
  bucket-min) instead of quadratic pairs — the reference's
  combinatorial cap + graceful degradation pattern
  (uFuzzy.mjs:763,830-833): bounded cost, connectivity preserved
- cross-band duplicate pairs collapse via dropDuplicates (the
  matchedIdxs Set analog, uFuzzy.mjs:839-857)

Skew: identical docs never reach LSH (exact-hash pre-dedup runs
first, operators/dedup.py), the bucket cap bounds any residual hot
key, and AQE skew-join splitting covers the verify-stage text joins.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ufuzzy_spark.config import PipelineConfig
from ufuzzy_spark.functions.hashing import BAG_BAND_ID_OFFSET


def band_buckets(
    sigs: DataFrame,
    pcfg: PipelineConfig | None = None,
    sig_col: str = "minhash",
    bands: int | None = None,
    rows: int | None = None,
    band_id_offset: int = 0,
) -> DataFrame:
    """sigs(url, <sig_col>) -> (url, band_id, band_hash). Narrow.

    ``band_id_offset`` keeps multiple signature families (char-shingle,
    token-bag, simhash chunks) in disjoint bucket-id spaces so their
    postings can union into one candidate join.
    """
    pcfg = pcfg or PipelineConfig()
    bands = bands if bands is not None else pcfg.bands
    rows = rows if rows is not None else pcfg.rows_per_band
    bands_expr = F.transform(
        F.sequence(F.lit(0), F.lit(bands - 1)),
        lambda b: F.struct(
            (b + band_id_offset).cast("int").alias("band_id"),
            F.xxhash64(b, F.slice(F.col(sig_col), b * rows + 1, rows)).alias(
                "band_hash"
            ),
        ),
    )
    return (
        sigs.select("url", F.explode(bands_expr).alias("band"))
        .select("url", "band.band_id", "band.band_hash")
    )


def all_buckets(sigs: DataFrame, pcfg: PipelineConfig | None = None) -> DataFrame:
    """Union of char-shingle and token-bag band postings."""
    pcfg = pcfg or PipelineConfig()
    char_b = band_buckets(sigs, pcfg, "minhash", pcfg.bands, pcfg.rows_per_band, 0)
    bag_b = band_buckets(
        sigs, pcfg, "bag_minhash", pcfg.bag_bands, pcfg.bag_rows,
        BAG_BAND_ID_OFFSET
    )
    return char_b.unionByName(bag_b)


def postings_from_band_hashes(
    banded: DataFrame, pcfg: PipelineConfig | None = None
) -> DataFrame:
    """(url, band_hashes) -> (url, band_id, band_hash). Narrow.

    The production posting generator: band hashes were already folded
    inside the signature UDF (minhash.banded_signatures), so this is a
    single posexplode — no signature slicing, no per-band hashing.
    Positions < pcfg.bands are char bands (band_id = pos); the rest
    are bag bands (band_id = BAG_BAND_ID_OFFSET + pos - bands), matching
    band_buckets' disjoint id spaces.
    """
    pcfg = pcfg or PipelineConfig()
    nb = pcfg.bands
    return banded.select(
        "url", F.posexplode("band_hashes").alias("pos", "band_hash")
    ).select(
        "url",
        F.when(F.col("pos") < nb, F.col("pos"))
        .otherwise(F.col("pos") - nb + BAG_BAND_ID_OFFSET)
        .cast("int")
        .alias("band_id"),
        "band_hash",
    )


def _pair_emissions(
    buckets: DataFrame, pcfg: PipelineConfig | None = None
) -> DataFrame:
    """Per-bucket pair emissions BEFORE cross-bucket dedup:
    (band_id, band_hash, url_a, url_b) with url_a < url_b.

    Within one (band_id, band_hash) every emitted pair is distinct (the
    quadratic pairs, bucket-star and salt-star url_b sets are disjoint
    by construction), so grouping the emissions by pair counts exactly
    the number of buckets generating it — the refcount basis for
    incremental ingest (streaming/incremental.py), while
    ``candidate_pairs`` keeps the original dedup'd contract.

    Skew (north rule: "salted for skew"): a hot band key would funnel
    every member into ONE window partition, so capping is two-phase:
    phase 1 ranks within (band, salt) — salt = hash(url) mod
    salt_buckets — bounding any single task to ~bucket_size/S rows and
    pre-dropping overflow so phase 2's global per-bucket window sees
    at most S*cap rows per key. AQE skew-join splitting then covers
    the residual joins (session.py).
    """
    pcfg = pcfg or PipelineConfig()
    cap = pcfg.max_bucket_size
    n_salt = pcfg.salt_buckets

    # phase 1: salted pre-cap (bounds the hottest key's partition).
    # Overflow within a salt group degrades to star edges against the
    # salt-group min; salt mins survive to phase 2, whose bucket star
    # connects them — overflow -> salt_min -> bucket_min keeps
    # connectivity with bounded (linear) work. The window (not a
    # collect_list) is deliberate: raw bucket sizes are unbounded and
    # the window sort spills.
    salted = buckets.withColumn(
        "salt", F.pmod(F.xxhash64("url"), F.lit(n_salt))
    )
    w_salt = Window.partitionBy("band_id", "band_hash", "salt").orderBy("url")
    w_salt_all = Window.partitionBy("band_id", "band_hash", "salt")
    salt_ranked = salted.withColumn("srn", F.row_number().over(w_salt)).withColumn(
        "salt_min", F.min("url").over(w_salt_all)
    )

    # SINGLE-BRANCH plan from here (was: three union branches that
    # recomputed the phase-1 window 3x and a phase-2 window 2x). Every
    # phase-1 row becomes one item; salt-overflow rows carry their
    # finished star edge and ride through phase 2 as SINGLETON groups
    # (subkey = own url), so no aggregation buffer is ever unbounded:
    # member groups hold <= n_salt * cap survivor urls, star groups
    # hold exactly one edge.
    items = salt_ranked.select(
        "band_id",
        "band_hash",
        F.when(F.col("srn") <= cap, F.lit("")).otherwise(F.col("url")).alias(
            "subkey"
        ),
        F.when(F.col("srn") <= cap, F.col("url")).alias("m_url"),
        F.when(
            (F.col("srn") > cap) & (F.col("salt_min") != F.col("url")),
            F.struct(
                F.col("salt_min").alias("url_a"), F.col("url").alias("url_b")
            ),
        ).alias("salt_star"),
    )
    grouped = items.groupBy("band_id", "band_hash", "subkey").agg(
        F.sort_array(F.collect_list("m_url")).alias("urls"),
        F.first("salt_star", ignorenulls=True).alias("salt_star"),
    )

    # phase 2 inside the group: survivors sorted ascending == the old
    # per-bucket row_number order; first `cap` expand quadratically,
    # the rest degrade to star edges on the bucket min (cap/degrade,
    # uFuzzy.mjs:830-833)
    kept = F.slice(F.col("urls"), 1, cap)
    pair_expr = F.flatten(
        F.transform(
            kept,
            lambda x, i: F.transform(
                F.slice(kept, i + 2, F.greatest(F.size(kept) - i - 1, F.lit(0))),
                lambda y: F.struct(x.alias("url_a"), y.alias("url_b")),
            ),
        )
    )
    over_expr = F.transform(
        F.slice(
            F.col("urls"),
            cap + 1,
            F.greatest(F.size("urls") - cap, F.lit(0)),
        ),
        lambda o: F.struct(
            F.element_at(F.col("urls"), 1).alias("url_a"), o.alias("url_b")
        ),
    )
    # each component is naturally empty when inapplicable (slices of
    # length 0 / a null-filtered singleton), so types always line up
    emit = F.concat(
        pair_expr,
        over_expr,
        F.filter(F.array(F.col("salt_star")), lambda s: s.isNotNull()),
    )
    return grouped.select(
        "band_id", "band_hash", F.explode(emit).alias("p")
    ).select("band_id", "band_hash", "p.url_a", "p.url_b")


def candidate_pairs(
    buckets: DataFrame, pcfg: PipelineConfig | None = None
) -> DataFrame:
    """(url, band_id, band_hash) -> distinct (url_a, url_b), url_a < url_b.

    Cross-band duplicate pairs collapse here (the matchedIdxs Set
    analog, uFuzzy.mjs:839-857); see ``_pair_emissions`` for the
    per-bucket expansion and the salted two-phase cap.
    """
    return (
        _pair_emissions(buckets, pcfg)
        .select("url_a", "url_b")
        .dropDuplicates(["url_a", "url_b"])
    )


def candidate_pair_counts(
    buckets: DataFrame, pcfg: PipelineConfig | None = None
) -> DataFrame:
    """(url, band_id, band_hash) -> (url_a, url_b, cnt) where cnt is
    the number of buckets generating the pair (bounded by
    bands + bag_bands — a pair shares at most one bucket per band).

    ``candidate_pairs`` equals exactly the cnt >= 1 pairs. The counts
    make the pair set incrementally maintainable: per-bucket emissions
    are a pure function of the bucket's member-url set, so re-counting
    only the buckets whose membership changed and applying the count
    difference as a delta reproduces the batch pair set without
    re-expanding untouched buckets (streaming/incremental.py).
    """
    return (
        _pair_emissions(buckets, pcfg)
        .groupBy("url_a", "url_b")
        .agg(F.count(F.lit(1)).cast("int").alias("cnt"))
    )


def simhash_chunk_buckets(
    sigs: DataFrame, pcfg: PipelineConfig | None = None
) -> DataFrame:
    """Hamming-ball postings from 64-bit SimHash via the band trick.

    Split the fingerprint into (max_hamming+1) chunks: any pair within
    Hamming distance max_hamming agrees exactly on >= 1 chunk
    (pigeonhole), so bucketing per chunk has recall 1.0 for the ball.
    Disjoint band-id space (1000+) so these postings union with the
    MinHash bands into one candidate join.
    """
    pcfg = pcfg or PipelineConfig()
    n_chunks = pcfg.simhash_max_hamming + 1
    bits_per = 64 // n_chunks

    mask = (1 << bits_per) - 1
    chunks_expr = F.expr(
        f"transform(sequence(0, {n_chunks - 1}), c -> struct("
        f"  cast(c + 1000 as int) as band_id,"
        f"  xxhash64(c, shiftrightunsigned(simhash, cast(c * {bits_per} as int))"
        f"            & cast({mask} as bigint)) as band_hash))"
    )
    return (
        sigs.select("url", F.explode(chunks_expr).alias("band"))
        .select("url", "band.band_id", "band.band_hash")
    )


def simhash_candidates(
    sigs: DataFrame, pcfg: PipelineConfig | None = None
) -> DataFrame:
    """SimHash Hamming-ball candidate pairs (same machinery as bands)."""
    pcfg = pcfg or PipelineConfig()
    return candidate_pairs(simhash_chunk_buckets(sigs, pcfg), pcfg)
