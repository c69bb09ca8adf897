"""Precompute the SingleError (intraMode=1) expected match set.

DuckDB's RE2 cannot run the mode's anti-greedy lookahead patterns
(uFuzzy.mjs:296-299), so the driver oracle for the `single_error`
entry is this table, computed by the Python oracle — which is itself
differential-tested against the real reference via node
(tests/js_ref_harness.cjs). tests/test_entry_parity.py regenerates it
in-memory and fails if the checked-in parquet is stale.

The fixture is keyed by CORPUS CONTENT, not by path or sf (ADVICE
r2): every row carries corpus_key = md5 of the documents table's
(doc_id, md5(text)) sequence, and the oracle SQL filters on the key
recomputed from whatever `documents` view the driver registered. All
three testdata scale factors are precomputed; an unknown corpus
selects ZERO oracle rows and the parity gate fails loudly instead of
silently comparing against the wrong corpus.
"""

from __future__ import annotations

from pathlib import Path

import pyarrow as pa
import pyarrow.parquet as pq

SF_DIRS = [
    "/root/testdata/sf0.001",
    "/root/testdata/sf0.01",
    "/root/testdata/sf0.1",
]
NEEDLES = ["strem", "windwo"]  # 1-deletion typos of corpus terms
OUT = Path(__file__).resolve().parent.parent / "fixtures" / "single_error_expected.parquet"

# MUST stay textually in sync with the subquery in the single_error
# oracle SQL (ufuzzy_spark/entry_queries.py) — both sides compute the
# same corpus fingerprint.
CORPUS_KEY_SQL = (
    "SELECT md5(string_agg(doc_id::VARCHAR || ':' || md5(text), ','"
    " ORDER BY doc_id)) FROM {src}"
)


def corpus_key(con, src: str) -> str:
    return con.sql(CORPUS_KEY_SQL.format(src=src)).fetchone()[0]


def expected_rows(sf_dirs: list[str] | None = None) -> list[dict]:
    import duckdb

    from ufuzzy_spark.config import MatchConfig
    from ufuzzy_spark.latinize import latinize
    from ufuzzy_spark.oracle import UFuzzyOracle

    uf = UFuzzyOracle(MatchConfig(intraMode=1))
    pats = [(nd, uf.prep_query(nd)[0]) for nd in NEEDLES]
    con = duckdb.connect()
    rows = []
    for sf_dir in sf_dirs or SF_DIRS:
        src = f"'{sf_dir}/documents.parquet'"
        key = corpus_key(con, src)
        docs = con.sql(
            f"SELECT doc_id, text FROM {src} ORDER BY doc_id"
        ).fetchall()
        for needle, pat in pats:
            for doc_id, text in docs:
                if pat.search(latinize(text).lower()):
                    rows.append(
                        {"corpus_key": key, "needle": needle, "doc_id": doc_id}
                    )
    return rows


def main() -> None:
    rows = expected_rows()
    OUT.parent.mkdir(exist_ok=True)
    pq.write_table(
        pa.Table.from_pylist(
            rows,
            schema=pa.schema(
                [
                    ("corpus_key", pa.string()),
                    ("needle", pa.string()),
                    ("doc_id", pa.int64()),
                ]
            ),
        ),
        OUT,
    )
    print(f"wrote {len(rows)} rows -> {OUT}")


if __name__ == "__main__":
    import sys

    sys.path.insert(0, str(Path(__file__).resolve().parent.parent))
    main()
