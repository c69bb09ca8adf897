"""Emulate the driver's correctness gate: every queries() entry vs its
oracle_sql() under DuckDB at sf0.01 — row count, schema (column
names), and order-insensitive exact values must match.
"""

import duckdb
import pandas as pd
import pytest

import __spark_entry__ as entry

SF_DIR = "/root/testdata/sf0.01"
TABLES = (
    "region nation customer supplier part orders lineitem events "
    "documents embeddings"
).split()


@pytest.fixture(scope="module")
def con():
    c = duckdb.connect()
    for t in TABLES:
        c.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{SF_DIR}/{t}.parquet'"
        )
    return c


def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if pd.api.types.is_datetime64_any_dtype(df[c]):
            # engines disagree on ns-vs-us precision only
            df[c] = df[c].astype("datetime64[us]").astype(str)
        elif df[c].dtype == object:
            df[c] = df[c].astype(str)
        elif pd.api.types.is_float_dtype(df[c]):
            df[c] = df[c].round(6)
        elif pd.api.types.is_integer_dtype(df[c]):
            df[c] = df[c].astype("int64")
    return df.sort_values(by=list(df.columns), ignore_index=True)


QUERIES = sorted(entry.queries().keys())


@pytest.mark.parametrize("name", QUERIES)
def test_query_matches_oracle(spark, con, name):
    q = entry.queries()[name]
    oracles = entry.oracle_sql()
    sdf = q(spark, SF_DIR).toPandas()
    assert len(sdf) > 0 or name in ("lsh_candidate_pairs",), f"{name}: empty result"

    if name not in oracles:
        pytest.skip(f"{name}: rows-only check (no SQL oracle)")

    ddf = con.execute(oracles[name]).df()
    assert sorted(sdf.columns) == sorted(ddf.columns), (
        f"{name}: columns {sorted(sdf.columns)} != {sorted(ddf.columns)}"
    )
    assert len(sdf) == len(ddf), f"{name}: rows {len(sdf)} != {len(ddf)}"

    a, b = canon(sdf), canon(ddf)
    if not a.equals(b):
        diff_mask = (a != b).any(axis=1)
        raise AssertionError(
            f"{name}: value mismatch\nspark:\n{a[diff_mask].head(5)}\n"
            f"duckdb:\n{b[diff_mask].head(5)}"
        )


def test_single_error_fixture_fresh():
    """The checked-in precomputed expected table for the single_error
    entry must match a live regeneration from the Python oracle."""
    import sys
    from pathlib import Path

    sys.path.insert(0, str(Path(__file__).resolve().parent.parent / "scripts"))
    from gen_single_error_fixture import OUT, expected_rows

    live = pd.DataFrame(expected_rows())
    stored = pd.read_parquet(OUT)
    keys = ["corpus_key", "needle", "doc_id"]
    pd.testing.assert_frame_equal(
        live.sort_values(keys, ignore_index=True),
        stored.sort_values(keys, ignore_index=True),
    )
