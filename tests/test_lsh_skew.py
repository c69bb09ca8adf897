"""LSH skew/cap behavior: salted two-phase capping must bound
quadratic blowup while preserving connectivity."""

import pyspark.sql.functions as F
import pytest

from ufuzzy_spark.config import PipelineConfig
from ufuzzy_spark.operators.lsh import candidate_pairs, simhash_candidates


def _mega_bucket(spark, n: int, band_id: int = 0, band_hash: int = 7):
    rows = [(f"u{i:05d}", band_id, band_hash) for i in range(n)]
    return spark.createDataFrame(rows, ["url", "band_id", "band_hash"])


def test_mega_bucket_pair_count_bounded(spark):
    pcfg = PipelineConfig(max_bucket_size=10, salt_buckets=4)
    n = 500
    pairs = candidate_pairs(_mega_bucket(spark, n), pcfg)
    cnt = pairs.count()
    # full quadratic would be n*(n-1)/2 = 124750; cap bounds it to
    # O(cap^2 + n) — quad within the capped head + linear stars
    assert cnt < 10 * 10 + n + 50, cnt


def test_mega_bucket_connectivity_preserved(spark):
    """Every member must stay reachable from the bucket component —
    overflow degrades to star edges (salt_min -> bucket_min chain)."""
    from ufuzzy_spark.operators.components import connected_components

    pcfg = PipelineConfig(max_bucket_size=5, salt_buckets=4)
    n = 200
    pairs = candidate_pairs(_mega_bucket(spark, n), pcfg)
    cc = connected_components(pairs)
    labels = cc.select("cluster_id").distinct().count()
    members = cc.count()
    assert members == n
    assert labels == 1  # one connected component


def test_normal_buckets_full_pairwise(spark):
    pcfg = PipelineConfig(max_bucket_size=50, salt_buckets=4)
    rows = (
        [("a1", 0, 1), ("a2", 0, 1), ("a3", 0, 1)]   # bucket of 3
        + [("b1", 0, 2), ("b2", 0, 2)]                # bucket of 2
        + [("c1", 0, 3)]                              # singleton
    )
    buckets = spark.createDataFrame(rows, ["url", "band_id", "band_hash"])
    pairs = {(r.url_a, r.url_b) for r in candidate_pairs(buckets, pcfg).collect()}
    assert pairs == {
        ("a1", "a2"), ("a1", "a3"), ("a2", "a3"), ("b1", "b2")
    }


def test_simhash_hamming_ball_recall(spark):
    """Pairs within Hamming distance <= max_hamming MUST bucket
    together (pigeonhole over fingerprint chunks)."""
    import numpy as np

    pcfg = PipelineConfig(simhash_max_hamming=3)
    base = np.int64(0x0123456789ABCDE)
    flip = lambda v, bits: np.int64(v ^ sum(1 << b for b in bits))
    rows = [
        ("near0", int(base)),
        ("near1", int(flip(base, [5]))),            # d=1
        ("near3", int(flip(base, [1, 20, 40]))),    # d=3
        ("far", int(flip(base, [1, 9, 17, 25, 33, 41, 49, 57]))),  # d=8
    ]
    sigs = spark.createDataFrame(rows, ["url", "simhash"])
    pairs = {(r.url_a, r.url_b) for r in simhash_candidates(sigs, pcfg).collect()}
    assert ("near0", "near1") in pairs
    assert ("near0", "near3") in pairs
    assert not any("far" in p for p in pairs if ("near0" in p))


def test_banded_udf_path_matches_legacy_band_buckets(spark, fixture_dir):
    """The r3 production path (band hashes folded inside the signature
    UDF, one posexplode) must produce the SAME candidate pairs as the
    legacy signatures + all_buckets JVM-slicing path: equal signature
    band slices give equal hashes under both schemes, so candidate
    sets differ only on ~2^-64 hash collisions."""
    from ufuzzy_spark.operators.lsh import (
        all_buckets,
        candidate_pairs,
        postings_from_band_hashes,
    )
    from ufuzzy_spark.operators.minhash import banded_signatures, signatures
    from ufuzzy_spark.operators.normalize import normalize

    pcfg = PipelineConfig()
    pages = spark.read.parquet(str(fixture_dir / "pages.parquet"))
    normed = normalize(pages.where("lang='en'")).select("url", "norm_text")

    legacy = candidate_pairs(all_buckets(signatures(normed, pcfg), pcfg), pcfg)
    banded = candidate_pairs(
        postings_from_band_hashes(banded_signatures(normed, pcfg), pcfg), pcfg
    )
    l = {(r.url_a, r.url_b) for r in legacy.collect()}
    b = {(r.url_a, r.url_b) for r in banded.collect()}
    assert l == b, (len(l), len(b), l ^ b)


def test_postings_band_id_spaces_match_legacy(spark, fixture_dir):
    """Posting positions must map to the same disjoint band-id spaces
    as band_buckets (char 0..bands-1, bag 2000..), and per-url posting
    counts must match."""
    from ufuzzy_spark.operators.lsh import postings_from_band_hashes
    from ufuzzy_spark.operators.minhash import banded_signatures
    from ufuzzy_spark.operators.normalize import normalize

    pcfg = PipelineConfig()
    pages = spark.read.parquet(str(fixture_dir / "pages.parquet"))
    normed = (
        normalize(pages.where("lang='en'"))
        .select("url", "norm_text")
        .limit(20)
    )
    posts = postings_from_band_hashes(banded_signatures(normed, pcfg), pcfg)
    ids = sorted(r.band_id for r in posts.select("band_id").distinct().collect())
    assert ids == list(range(pcfg.bands)) + [
        2000 + i for i in range(pcfg.bag_bands)
    ]
    per_url = posts.groupBy("url").count().collect()
    assert all(r["count"] == pcfg.bands + pcfg.bag_bands for r in per_url)
