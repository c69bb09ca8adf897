"""Vectorized NumPy hashing kernels for signature UDFs.

All uint64 arithmetic relies on NumPy's wrapping overflow semantics
(mod 2^64). splitmix64 is the public-domain finalizer (Steele et al.,
"Fast Splittable Pseudorandom Number Generators", OOPSLA'14) — a
well-mixed 64-bit bijection; xor-shifting a base hash with per-perm
seeds then finalizing gives the MinHash permutation family without
128-bit modular math.
"""

from __future__ import annotations

import numpy as np

_GOLDEN = np.uint64(0x9E3779B97F4A7C15)
_MIX1 = np.uint64(0xBF58476D1CE4E5B9)
_MIX2 = np.uint64(0x94D049BB133111EB)

U64_MAX = np.uint64(0xFFFFFFFFFFFFFFFF)


def splitmix64(x: np.ndarray, out: np.ndarray | None = None) -> np.ndarray:
    """Vectorized splitmix64 finalizer over uint64 arrays.

    In-place on ``out`` (or a fresh copy) to minimize temporaries —
    this runs over (shingles x num_perm) matrices in the hot path.
    """
    old = np.seterr(over="ignore")
    try:
        if out is None:
            out = x.astype(np.uint64, copy=True)
        elif out is not x:
            np.copyto(out, x)
        x = out
        x += _GOLDEN
        x ^= x >> np.uint64(30)
        x *= _MIX1
        x ^= x >> np.uint64(27)
        x *= _MIX2
        x ^= x >> np.uint64(31)
        return x
    finally:
        np.seterr(**old)


def perm_seeds(num_perm: int, seed: int = 42) -> np.ndarray:
    """Deterministic per-permutation seeds for the MinHash family."""
    rng = np.random.RandomState(seed)
    lo = rng.randint(0, 2**32, size=num_perm, dtype=np.uint64)
    hi = rng.randint(0, 2**32, size=num_perm, dtype=np.uint64)
    return (hi << np.uint64(32)) | lo


def kgram_hashes(text: str, k: int) -> np.ndarray:
    """Unique rolling k-gram content hashes of a UTF-8 string.

    Polynomial rolling hash (base 257) over bytes, computed with a
    single vectorized windowed dot product, then splitmix-finalized.
    Short strings (< k bytes) hash as a single gram.
    """
    b = np.frombuffer(text.encode("utf-8"), dtype=np.uint8).astype(np.uint64)
    if b.size == 0:
        return np.zeros(0, dtype=np.uint64)
    if b.size < k:
        k = b.size
    old = np.seterr(over="ignore")
    try:
        pows = np.empty(k, dtype=np.uint64)
        pows[-1] = 1
        for i in range(k - 2, -1, -1):
            pows[i] = pows[i + 1] * np.uint64(257)
        win = np.lib.stride_tricks.sliding_window_view(b, k)
        h = (win * pows).sum(axis=1, dtype=np.uint64)
        return np.unique(splitmix64(h))
    finally:
        np.seterr(**old)


def kgram_hashes_positional(text: str, k: int) -> np.ndarray:
    """Rolling k-gram hashes in POSITIONAL order (for winnowing —
    window minima need original gram order, unlike the MinHash path
    which dedups)."""
    b = np.frombuffer(text.encode("utf-8"), dtype=np.uint8).astype(np.uint64)
    if b.size == 0:
        return np.zeros(0, dtype=np.uint64)
    if b.size < k:
        k = b.size
    old = np.seterr(over="ignore")
    try:
        pows = np.empty(k, dtype=np.uint64)
        pows[-1] = 1
        for i in range(k - 2, -1, -1):
            pows[i] = pows[i + 1] * np.uint64(257)
        win = np.lib.stride_tricks.sliding_window_view(b, k)
        return splitmix64((win * pows).sum(axis=1, dtype=np.uint64))
    finally:
        np.seterr(**old)


def token_hashes(tokens: list[str]) -> np.ndarray:
    """Content hashes of a token list (for SimHash features)."""
    if not tokens:
        return np.zeros(0, dtype=np.uint64)
    out = np.empty(len(tokens), dtype=np.uint64)
    old = np.seterr(over="ignore")
    try:
        for i, t in enumerate(tokens):
            b = np.frombuffer(t.encode("utf-8"), dtype=np.uint8).astype(np.uint64)
            acc = np.uint64(0)
            # Horner fold — tokens are short, loop cost negligible
            for v in b:
                acc = acc * np.uint64(257) + v
            out[i] = acc
        return splitmix64(out)
    finally:
        np.seterr(**old)


def bag_hashes(tokens: list[str]) -> np.ndarray:
    """Multiset-expansion hashes of a token list: element i-th
    occurrence of token t hashes as mix(h(t) ^ mix(i)).

    Two docs with the same token MULTISET — e.g. word-order permuted
    near-dups (the reference's out-of-order semantics,
    uFuzzy.mjs:812-858) — get identical hash sets (bag Jaccard 1.0),
    while docs merely sharing vocabulary keep sum(min(counts)) /
    sum(max(counts)) — the frequency-aware similarity plain set
    signatures lose on small-vocabulary corpora.
    """
    if not tokens:
        return np.zeros(0, dtype=np.uint64)
    th = token_hashes(tokens)
    order = np.argsort(th, kind="stable")
    sorted_h = th[order]
    # occurrence index within equal-hash runs (vectorized cumcount)
    starts = np.flatnonzero(np.r_[True, sorted_h[1:] != sorted_h[:-1]])
    occ = np.arange(sorted_h.size) - np.repeat(starts, np.diff(np.r_[starts, sorted_h.size]))
    return np.unique(splitmix64(sorted_h ^ splitmix64(occ.astype(np.uint64))))


def minhash_from_hash_sets(
    hash_sets, num_perm: int, seed: int = 42, chunk_shingles: int = 1 << 14
) -> np.ndarray:
    """MinHash signatures from per-doc uint64 hash-set arrays.

    Returns int64 array of shape (len(hash_sets), num_perm).

    Batched segment-min: all docs' hashes are concatenated and the
    (hashes x num_perm) mix matrix is processed in bounded-size chunks
    with ``np.minimum.reduceat`` — no per-doc Python in the inner
    loop, memory bounded by chunk_shingles*num_perm*8.
    """
    seeds = perm_seeds(num_perm, seed)
    n = len(hash_sets)
    sigs = np.full((n, num_perm), U64_MAX, dtype=np.uint64)

    all_h: list[np.ndarray] = []
    doc_ids: list[np.ndarray] = []
    for i, h in enumerate(hash_sets):
        if h.size:
            all_h.append(h)
            doc_ids.append(np.full(h.size, i, dtype=np.int64))
    if not all_h:
        return sigs.view(np.int64)

    H = np.concatenate(all_h)
    D = np.concatenate(doc_ids)

    old = np.seterr(over="ignore")
    try:
        buf = np.empty((min(chunk_shingles, H.size), num_perm), dtype=np.uint64)
        for lo in range(0, H.size, chunk_shingles):
            hi = min(lo + chunk_shingles, H.size)
            h_chunk = H[lo:hi]
            d_chunk = D[lo:hi]
            # (chunk, num_perm) mix then per-doc segment min
            out = buf[: hi - lo]
            np.bitwise_xor(h_chunk[:, None], seeds[None, :], out=out)
            mixed = splitmix64(out, out=out)
            # segment boundaries within the chunk (doc ids are sorted)
            starts = np.flatnonzero(np.r_[True, d_chunk[1:] != d_chunk[:-1]])
            mins = np.minimum.reduceat(mixed, starts, axis=0)
            docs = d_chunk[starts]
            # docs are unique within a chunk (one segment per doc), so
            # fancy-index assignment is safe; cross-chunk spill of one
            # doc is handled by the running minimum across iterations
            sigs[docs] = np.minimum(sigs[docs], mins)
    finally:
        np.seterr(**old)

    return sigs.view(np.int64)


def minhash_signatures(
    texts, k: int, num_perm: int, seed: int = 42, chunk_shingles: int = 1 << 14
) -> np.ndarray:
    """Char-k-gram MinHash signatures for an iterable of strings."""
    return minhash_from_hash_sets(
        [kgram_hashes(t if isinstance(t, str) else "", k) for t in texts],
        num_perm,
        seed,
        chunk_shingles,
    )


def bag_minhash_signatures(
    token_lists, num_perm: int, seed: int = 42, chunk_shingles: int = 1 << 14
) -> np.ndarray:
    """Token-bag MinHash signatures (order-invariant, frequency-aware)."""
    return minhash_from_hash_sets(
        [bag_hashes(list(t) if t is not None else []) for t in token_lists],
        num_perm,
        seed,
        chunk_shingles,
    )


def simhash_fingerprints(token_lists, bits: int = 64) -> np.ndarray:
    """64-bit SimHash over token content hashes (Charikar 2002).

    Returns int64 array of shape (len(token_lists),).
    """
    assert bits == 64, "only 64-bit simhash supported"
    n = len(token_lists)
    out = np.zeros(n, dtype=np.int64)
    shifts = np.arange(64, dtype=np.uint64)
    for i, toks in enumerate(token_lists):
        h = token_hashes(list(toks) if toks is not None else [])
        if h.size == 0:
            continue
        bits_mat = (h[:, None] >> shifts[None, :]) & np.uint64(1)
        counts = bits_mat.sum(axis=0, dtype=np.int64)
        fp = np.uint64(0)
        majority = counts * 2 >= h.size
        fp = (majority.astype(np.uint64) << shifts).sum(dtype=np.uint64)
        out[i] = np.int64(fp.astype(np.uint64).view(np.int64))
    return out


def hamming64(a: np.ndarray, b: np.ndarray) -> np.ndarray:
    """Vectorized Hamming distance between int64 simhash columns."""
    x = (a.view(np.uint64) ^ b.view(np.uint64))
    # popcount via unpackbits on the byte view
    return np.unpackbits(x.view(np.uint8).reshape(-1, 8), axis=1).sum(axis=1)
