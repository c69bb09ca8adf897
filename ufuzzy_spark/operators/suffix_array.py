"""Grouped suffix-array pass for long exact-substring duplicates.

The north-star names a suffix-array pass for long exact-substring
dupes (BASELINE.json north_star; SURVEY.md §7 M3). Two implementations
cover the two scale regimes:

- operators/substring.py (winnowing): GLOBAL, sampled — fingerprints
  ~2/w of k-grams with a deterministic >= k+w-1 guarantee and reuses
  the capped LSH pair machinery. This is the 10^12-doc path: nothing
  quadratic, one shuffle.
- THIS module: per-GROUP, exhaustive — inside each co-grouped set of
  documents (an LSH bucket, a domain, a cluster under review) it
  builds one suffix array over the concatenated text (prefix-doubling
  via np.lexsort, O(n log n)) + Kasai LCP, and emits EVERY doc pair
  sharing a common substring >= min_len. Runs as applyInPandas: each
  group is one Arrow batch on one executor, so group size bounds
  memory, not corpus size.

Reference analog: the haystack linear scan with exact quoted terms
(uFuzzy.mjs:229-234,410-413) finds literal substrings one needle at a
time; the suffix array answers "which documents share ANY long
literal run" for a whole group at once.

Like the LSH bucket cap (operators/lsh.py), a run of suffixes sharing
a >= min_len prefix across many docs would emit a quadratic pair set;
runs bigger than ``max_run_docs`` degrade to star edges around the
smallest url — connectivity preserved, quadratic cost dropped.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import StringType, StructField, StructType

PAIRS_SCHEMA = StructType(
    [
        StructField("url_a", StringType()),
        StructField("url_b", StringType()),
    ]
)


def build_suffix_array(
    codes: np.ndarray, keep_levels: bool = False
) -> np.ndarray | tuple[np.ndarray, list[tuple[int, np.ndarray]]]:
    """Suffix array by prefix doubling over int codes (O(n log^2 n)
    with np.lexsort doing the heavy lifting per round).

    With ``keep_levels`` also returns [(width, rank_w)] — rank_w[i]
    identifies the first ``width`` chars of suffix i — which
    ``adjacent_lcp`` descends to compute the LCP array in log(n)
    vectorized passes instead of Kasai's per-character Python loop
    (ADVICE r2: the interpreter loop dominated large groups).
    """
    n = len(codes)
    if n == 0:
        empty = np.empty(0, dtype=np.int64)
        return (empty, []) if keep_levels else empty
    if keep_levels and n >= 2**31:
        # levels are downcast to int32 to halve the sparse table; a
        # group beyond 2^31 chars would silently wrap ranks and emit
        # wrong LCPs (wrong pairs) instead of failing (ADVICE r3)
        raise ValueError(
            f"build_suffix_array: group of {n} chars exceeds the int32 "
            "rank-level range; split the group before the suffix pass"
        )
    # COPY: the rank/tmp buffer swap below would otherwise alias and
    # mutate the caller's codes array in place (np.asarray is a no-op
    # on an int64 input)
    rank = np.array(codes, dtype=np.int64)
    tmp = np.empty(n, dtype=np.int64)
    levels: list[tuple[int, np.ndarray]] = []
    if keep_levels:
        # width-1 ranks: dense re-rank of the raw codes
        uniq, r0 = np.unique(rank, return_inverse=True)
        levels.append((1, r0.astype(np.int64)))
    k = 1
    while True:
        # sort by (rank[i], rank[i+k]); out-of-range second key must
        # sort BEFORE and never EQUAL any real rank — on the first
        # round `rank` is the raw codes, so a literal -1 fill would
        # collide with a caller's -1 code and merge distinct suffixes
        # (wrong LCPs downstream); rank.min()-1 is collision-free for
        # any int64 code alphabet
        second = np.full(n, rank.min() - 1, dtype=np.int64)
        second[: n - k] = rank[k:]
        order = np.lexsort((second, rank))
        # re-rank: same (first, second) pair -> same rank
        tmp[order[0]] = 0
        prev = order[:-1]
        cur = order[1:]
        newgrp = (rank[cur] != rank[prev]) | (second[cur] != second[prev])
        tmp[cur] = np.cumsum(newgrp)
        rank, tmp = tmp.copy(), rank
        if keep_levels:
            # COPY (and downcast): tmp becomes the scratch buffer next
            # round — storing `rank` itself would let the in-place
            # re-rank writes of the next iteration corrupt this level
            # (same aliasing class as the np.asarray note above).
            # int32 halves the sparse table: total level memory is
            # ~4*n*log2(n) bytes per group (one applyInPandas task), so
            # group text size, not corpus size, bounds it — a 1M-char
            # group holds ~80 MB of levels.
            levels.append((2 * k, rank.astype(np.int32)))
        if rank[order[-1]] == n - 1:
            return (order, levels) if keep_levels else order
        k *= 2


def adjacent_lcp(
    sa: np.ndarray, levels: list[tuple[int, np.ndarray]]
) -> np.ndarray:
    """LCP array (lcp[i] = lcp(sa[i-1], sa[i])) from the prefix-
    doubling rank levels: descend widths w = ..., 4, 2, 1 and extend
    every adjacent pair whose next-w ranks agree — log(n) vectorized
    passes over (n-1) pairs, no per-character Python (vs kasai_lcp,
    kept as the differential reference). Separator sentinels are
    unique, so no suffix is a prefix of another and rank_w equality
    exactly means "first w chars equal"."""
    n = len(sa)
    lcp = np.zeros(n, dtype=np.int64)
    if n < 2:
        return lcp
    i = sa[:-1].copy()
    j = sa[1:].copy()
    acc = np.zeros(n - 1, dtype=np.int64)
    for w, rk in sorted(levels, key=lambda t: -t[0]):
        ok = (i < n) & (j < n)
        eq = ok & (rk[np.minimum(i, n - 1)] == rk[np.minimum(j, n - 1)])
        if eq.any():
            acc[eq] += w
            i[eq] += w
            j[eq] += w
    lcp[1:] = acc
    return lcp


def kasai_lcp(codes: np.ndarray, sa: np.ndarray) -> np.ndarray:
    """LCP array (lcp[i] = lcp(sa[i-1], sa[i])), Kasai's algorithm."""
    n = len(sa)
    lcp = np.zeros(n, dtype=np.int64)
    rank = np.empty(n, dtype=np.int64)
    rank[sa] = np.arange(n)
    h = 0
    for i in range(n):
        r = rank[i]
        if r > 0:
            j = sa[r - 1]
            while i + h < n and j + h < n and codes[i + h] == codes[j + h]:
                h += 1
            lcp[r] = h
            if h > 0:
                h -= 1
        else:
            h = 0
    return lcp


def group_substring_pairs(
    urls: list[str], texts: list[str], min_len: int, max_run_docs: int = 50
) -> set[tuple[str, str]]:
    """All (url_a < url_b) pairs in one group sharing a common
    substring of length >= min_len. Pure function (testable sans
    Spark)."""
    # concatenate with unique negative separators so no run crosses docs
    parts = []
    doc_of = []
    for di, t in enumerate(texts):
        parts.append(np.frombuffer(t.encode("utf-32-le"), dtype=np.uint32))
        doc_of.append(np.full(len(t), di, dtype=np.int64))
    if not parts:
        return set()
    seps = [np.array([0], dtype=np.uint32) for _ in parts]  # cannot occur in text
    codes = np.concatenate(
        [x for pair in zip(parts, seps) for x in pair]
    ).astype(np.int64)
    # make separators distinct and below all real codepoints
    sep_pos = np.cumsum([len(p) + 1 for p in parts]) - 1
    codes[sep_pos] = -np.arange(2, len(parts) + 2)
    docs = np.concatenate(
        [x for pair in zip(doc_of, [np.array([-1])] * len(parts)) for x in pair]
    )

    sa, levels = build_suffix_array(codes, keep_levels=True)
    lcp = adjacent_lcp(sa, levels)
    sa_docs = docs[sa]

    pairs: set[tuple[str, str]] = set()
    # maximal runs of consecutive SA entries with adjacent LCP >= min_len:
    # every doc pair within a run shares a >= min_len substring
    i = 1
    n = len(sa)
    while i < n:
        if lcp[i] >= min_len:
            j = i
            run_docs = {sa_docs[i - 1]} if sa_docs[i - 1] >= 0 else set()
            while j < n and lcp[j] >= min_len:
                if sa_docs[j] >= 0:
                    run_docs.add(sa_docs[j])
                j += 1
            run_docs.discard(-1)
            ds = sorted(run_docs)
            if len(ds) > 1:
                if len(ds) > max_run_docs:
                    # star degradation around the smallest url
                    hub = min(ds, key=lambda d: urls[d])
                    for d in ds:
                        if d != hub:
                            a, b = sorted((urls[hub], urls[d]))
                            pairs.add((a, b))
                else:
                    for x in range(len(ds)):
                        for y in range(x + 1, len(ds)):
                            a, b = sorted((urls[ds[x]], urls[ds[y]]))
                            pairs.add((a, b))
            i = j
        else:
            i += 1
    return pairs


def suffix_array_pairs(
    normed: DataFrame,
    groups: DataFrame,
    min_len: int = 64,
    max_run_docs: int = 50,
    text_col: str = "norm_text",
) -> DataFrame:
    """Exhaustive long-exact-substring pairs WITHIN groups.

    ``groups``: (url, group_id) — any co-grouping (LSH bucket, domain,
    cluster). Docs in different groups are never compared (that is the
    winnowing pass's job). One applyInPandas task per group; shuffle
    carries only (group_id, url, text).
    """
    joined = groups.join(normed.select("url", text_col), "url").select(
        "group_id", "url", F.col(text_col).alias("text")
    )

    def run(pdf: pd.DataFrame) -> pd.DataFrame:
        pairs = group_substring_pairs(
            pdf["url"].tolist(), pdf["text"].tolist(), min_len, max_run_docs
        )
        if not pairs:
            return pd.DataFrame({"url_a": [], "url_b": []})
        a, b = zip(*sorted(pairs))
        return pd.DataFrame({"url_a": list(a), "url_b": list(b)})

    return (
        joined.groupBy("group_id")
        .applyInPandas(run, PAIRS_SCHEMA)
        .dropDuplicates(["url_a", "url_b"])
    )
