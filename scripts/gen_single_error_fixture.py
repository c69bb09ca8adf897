"""Precompute the SingleError (intraMode=1) expected match set.

DuckDB's RE2 cannot run the mode's anti-greedy lookahead patterns
(uFuzzy.mjs:296-299), so the driver oracle for the `single_error`
entry is this table, computed by the Python oracle — which is itself
differential-tested against the real reference via node
(tests/js_ref_harness.cjs). tests/test_entry_parity.py regenerates it
in-memory and fails if the checked-in parquet is stale.

The driver's correctness gate runs at sf0.01, so the fixture is
pinned to /root/testdata/sf0.01 (documents differ per sf).
"""

from __future__ import annotations

from pathlib import Path

import pyarrow as pa
import pyarrow.parquet as pq

SF_DIR = "/root/testdata/sf0.01"
NEEDLES = ["strem", "windwo"]  # 1-deletion typos of corpus terms
OUT = Path(__file__).resolve().parent.parent / "fixtures" / "single_error_expected.parquet"


def expected_rows(sf_dir: str = SF_DIR) -> list[dict]:
    import duckdb

    from ufuzzy_spark.config import MatchConfig
    from ufuzzy_spark.latinize import latinize
    from ufuzzy_spark.oracle import UFuzzyOracle

    docs = duckdb.sql(
        f"SELECT doc_id, text FROM '{sf_dir}/documents.parquet' ORDER BY doc_id"
    ).fetchall()
    uf = UFuzzyOracle(MatchConfig(intraMode=1))
    rows = []
    for needle in NEEDLES:
        pat = uf.prep_query(needle)[0]
        for doc_id, text in docs:
            if pat.search(latinize(text).lower()):
                rows.append({"needle": needle, "doc_id": doc_id})
    return rows


def main() -> None:
    rows = expected_rows()
    OUT.parent.mkdir(exist_ok=True)
    pq.write_table(
        pa.Table.from_pylist(
            rows,
            schema=pa.schema([("needle", pa.string()), ("doc_id", pa.int64())]),
        ),
        OUT,
    )
    print(f"wrote {len(rows)} rows -> {OUT}")


if __name__ == "__main__":
    import sys

    sys.path.insert(0, str(Path(__file__).resolve().parent.parent))
    main()
