"""Physical-plan pins — the scale properties .explain() must show.

These guard against regressions that only hurt at 100 TB: filters not
reaching the scan, full-schema reads for narrow projections,
accidental cartesian products, missed broadcasts.
"""

import pyspark.sql.functions as F
import pytest

from ufuzzy_spark.plans.explain import (
    codegen_stage_count,
    formatted_plan,
    has_broadcast_join,
    has_cartesian,
    pushed_filters,
    scan_read_schema,
)

SF_DIR = "/root/testdata/sf0.01"


def test_lang_filter_pushed_to_scan(spark, fixture_dir):
    pages = spark.read.parquet(str(fixture_dir / "pages.parquet"))
    plan = formatted_plan(pages.where("lang = 'en'").select("url"))
    pushed = pushed_filters(plan)
    assert pushed and any("lang" in p for p in pushed), plan


def test_projection_prunes_scan_schema(spark, fixture_dir):
    """A 2-column projection must not read html (the wide column)."""
    from ufuzzy_spark.operators.normalize import normalize

    pages = spark.read.parquet(str(fixture_dir / "pages.parquet"))
    out = normalize(pages.where("lang='en'")).select("url", "norm_text")
    plan = formatted_plan(out)
    schemas = scan_read_schema(plan)
    assert schemas and all("html" not in s and "warc_ts" not in s for s in schemas), (
        schemas
    )


def test_pipeline_has_no_cartesian_and_uses_codegen(spark, fixture_dir):
    from ufuzzy_spark.operators.dedup import exact_dedup
    from ufuzzy_spark.operators.lsh import (
        candidate_pairs,
        postings_from_band_hashes,
    )
    from ufuzzy_spark.operators.minhash import banded_signatures
    from ufuzzy_spark.operators.normalize import normalize

    pages = spark.read.parquet(str(fixture_dir / "pages.parquet"))
    normed = normalize(pages.where("lang='en'"))
    _, reps = exact_dedup(normed)
    sigs = banded_signatures(reps).select("url", "band_hashes")
    cands = candidate_pairs(postings_from_band_hashes(sigs))
    # AQE wraps everything in AdaptiveSparkPlan and hides codegen spans
    # until runtime — inspect the static plan with AQE off
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try:
        plan = formatted_plan(cands)
    finally:
        spark.conf.set("spark.sql.adaptive.enabled", "true")
    assert not has_cartesian(plan), plan
    assert codegen_stage_count(plan) >= 2, plan


def test_ann_broadcast_join(spark):
    from ufuzzy_spark.operators.ann import brute_force_topk

    embs = spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
    q = embs.where("vec_id < 3")
    plan = formatted_plan(brute_force_topk(embs, q, k=3))
    assert has_broadcast_join(plan), plan


def test_verify_join_not_cartesian(spark, fixture_dir):
    from ufuzzy_spark.operators.normalize import normalize
    from ufuzzy_spark.operators.verify import verify_pairs

    pages = spark.read.parquet(str(fixture_dir / "pages.parquet"))
    normed = normalize(pages.where("lang='en'"))
    pairs = normed.limit(10).select(
        F.col("url").alias("url_a"), F.col("url").alias("url_b")
    )
    plan = formatted_plan(verify_pairs(pairs, normed))
    assert not has_cartesian(plan), plan


def test_no_unpartitioned_windows_in_entry_plans(spark):
    """Every ranking in the driver queries must be two-phase/partitioned
    — an unpartitioned Window funnels all rows into one task at scale
    (VERDICT r1: rank_comparator, typeahead_rank, ann_cosine_topk)."""
    import __spark_entry__ as entry
    from ufuzzy_spark.plans.explain import unpartitioned_window_count

    # queries that run eager jobs at plan-construction time (iterative
    # CC checkpoints / lineage writes) are pinned by their own e2e tests
    eager = {"dup_clusters", "resume_lineage", "incremental_ingest"}
    for name, fn in entry.queries().items():
        if name in eager:
            continue
        plan = formatted_plan(fn(spark, SF_DIR))
        assert unpartitioned_window_count(plan) == 0, (
            f"{name}: unpartitioned Window in plan\n{plan}"
        )


def test_tpch_region_revenue_broadcasts_dims(spark):
    """nation/region dims must reach the plan as broadcast joins; the
    orders x customer fact join must not be a cartesian."""
    from ufuzzy_spark.entry_queries import q_tpch_region_revenue

    plan = formatted_plan(q_tpch_region_revenue(spark, SF_DIR))
    assert plan.count("BroadcastHashJoin") >= 2, plan
    assert not has_cartesian(plan), plan
