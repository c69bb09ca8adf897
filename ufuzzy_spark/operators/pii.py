"""PII scrubbing for web-scale training corpora.

Every published LLM data pipeline redacts personally identifiable
strings before training (e.g. the BigScience ROOTS and Dolma cleaning
stacks); the workhorse pass is regex substitution of the three
high-volume classes — email addresses, IPv4 addresses, phone-shaped
digit runs — with typed placeholder tokens, plus per-document hit
counts for downstream filtering/audit.

Scale shape: one narrow projection per document — three
``regexp_replace`` + three ``regexp_extract_all`` expressions, all
JVM-side inside whole-stage codegen. No shuffle, no UDF, no state;
filter pushdown and column pruning pass straight through. This is
the cheapest possible 100 TB pass (a single scan).

The patterns are deliberately RE2-safe (no lookaround, no
backreferences) so the identical pattern text runs under Java regex
(Spark) and RE2 (DuckDB oracle / Go-based scrubbers) with identical
match sets — the same portability contract as the repo's LSH oracle
hashes. Replacement ORDER is part of the contract: emails first
(their local part may contain digits), then IPv4 (dotted digit runs
would otherwise be eaten by the looser phone pattern), then phones
over the already-scrubbed text. Counts are stage-wise: each class is
counted on the text AFTER the previous class was replaced.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

EMAIL_RE = r"[A-Za-z0-9._%+\-]+@[A-Za-z0-9.\-]+\.[A-Za-z]{2,}"
IPV4_RE = r"\b(?:\d{1,3}\.){3}\d{1,3}\b"
PHONE_RE = r"\+?\d[\d\-. ()]{6,}\d"

EMAIL_TOK = "<EMAIL>"
IPV4_TOK = "<IP>"
PHONE_TOK = "<PHONE>"


def _n_matches(col: Column, pat: str) -> Column:
    return F.size(F.regexp_extract_all(col, F.lit(pat), F.lit(0))).cast(
        "long"
    )


def scrub_pii(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Redact emails, IPv4s, and phone-shaped digit runs from
    ``text_col``.

    Returns ``(id, n_emails, n_ipv4, n_phones, clean_len,
    clean_md5)`` — the scrubbed text is fingerprinted rather than
    carried so the output stays audit-sized; callers that need the
    scrubbed text itself use :func:`scrub_col` in their own
    projection.
    """
    t0 = F.col(text_col)
    t1 = F.regexp_replace(t0, EMAIL_RE, EMAIL_TOK)
    t2 = F.regexp_replace(t1, IPV4_RE, IPV4_TOK)
    t3 = F.regexp_replace(t2, PHONE_RE, PHONE_TOK)
    return df.select(
        id_col,
        _n_matches(t0, EMAIL_RE).alias("n_emails"),
        _n_matches(t1, IPV4_RE).alias("n_ipv4"),
        _n_matches(t2, PHONE_RE).alias("n_phones"),
        F.length(t3).cast("long").alias("clean_len"),
        F.md5(t3).alias("clean_md5"),
    )


def scrub_col(text: Column) -> Column:
    """The scrubbed-text expression itself (email -> IPv4 -> phone,
    in contract order), for pipelines that keep the clean text."""
    t = F.regexp_replace(text, EMAIL_RE, EMAIL_TOK)
    t = F.regexp_replace(t, IPV4_RE, IPV4_TOK)
    return F.regexp_replace(t, PHONE_RE, PHONE_TOK)
