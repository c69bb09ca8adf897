"""Deterministic stratified / mixture sampling.

Training-mixture construction: given per-stratum target rates
(domain weights, language balance, quality tiers), keep each row with
probability rate(stratum) — but DETERMINISTICALLY, keyed on a stable
row id, so the sample is reproducible across runs, machines, and
engines, and a re-run over a grown corpus keeps every previously
selected row (the property that makes incremental mixture refreshes
append-only).

The selector is pure column arithmetic: u = md5(key) folded to a
uniform integer in [0, 1e6), row kept iff u < round(rate * 1e6).
md5 (not xxhash64) so the SAME sample is reproducible in any engine
with an md5 builtin — the Spark/DuckDB parity identity used across
this repo (entry_queries.py header):

    Spark : conv(substr(md5(s), 1, 15), 16, 10)::long
    DuckDB: ('0x' || substr(md5(s), 1, 15))::BIGINT

100 TB shape: a NARROW filter — no shuffle, no sort, no sampling
state; rates arrive as a broadcast map (one tiny dim table). The
filter sits directly over the scan, so column pruning and partition
pruning pass through untouched.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

_SCALE = 1_000_000


def _md5_uniform(key: Column, salt: str) -> Column:
    """Uniform int in [0, 1e6) from md5 of key+salt (engine-portable:
    15 hex digits < 2^60, always positive, so % == pmod)."""
    s = F.concat(key.cast("string"), F.lit(salt))
    return (
        F.conv(F.substring(F.md5(s), 1, 15), 16, 10).cast("long") % _SCALE
    )


def threshold(rate: float) -> int:
    """Integer keep-threshold for a rate — exposed so oracle SQL can
    embed the exact same literal."""
    if not 0.0 <= rate <= 1.0:
        raise ValueError(f"rate {rate} outside [0, 1]")
    return int(round(rate * _SCALE))


def stratified_sample(
    df: DataFrame,
    rates: dict[str, float],
    stratum_col: str = "lang",
    key_col: str = "doc_id",
    salt: str = "",
    default_rate: float = 0.0,
) -> DataFrame:
    """Rows of ``df`` kept at their stratum's rate, deterministically
    keyed on ``key_col`` (+ ``salt`` to draw independent samples from
    the same corpus). Strata missing from ``rates`` fall back to
    ``default_rate`` (0 = drop — refuse-silently is wrong for data
    but right for sampling: an unknown stratum contributes nothing
    rather than an unweighted everything)."""
    thr = F.create_map(
        *[x for s, r in sorted(rates.items()) for x in (F.lit(s), F.lit(threshold(r)))]
    )
    u = _md5_uniform(F.col(key_col), salt)
    return df.where(
        u
        < F.coalesce(
            F.element_at(thr, F.col(stratum_col)),
            F.lit(threshold(default_rate)),
        )
    )
