"""NumPy hashing kernels: MinHash accuracy, bag semantics, winnowing
guarantee, simhash/hamming."""

import numpy as np

from ufuzzy_spark.functions.hashing import (
    bag_hashes,
    bag_minhash_signatures,
    hamming64,
    kgram_hashes,
    kgram_hashes_positional,
    minhash_signatures,
    simhash_fingerprints,
    splitmix64,
)
from ufuzzy_spark.operators.substring import winnow_fingerprints


def _jac(a, b):
    return len(np.intersect1d(a, b)) / len(np.union1d(a, b))


def test_splitmix64_bijective_and_deterministic():
    x = np.arange(10_000, dtype=np.uint64)
    y = splitmix64(x)
    assert len(np.unique(y)) == len(x)
    assert (splitmix64(x) == y).all()


def test_minhash_estimates_jaccard():
    a = "the quick brown fox jumps over the lazy dog " * 20
    b = a.replace("quick", "quack").replace("lazy", "lozy")
    sigs = minhash_signatures([a, b], k=5, num_perm=256)
    est = (sigs[0] == sigs[1]).mean()
    true = _jac(kgram_hashes(a, 5), kgram_hashes(b, 5))
    assert abs(est - true) < 0.1


def test_minhash_identical_and_disjoint():
    a, b = "abcdefgh" * 30, "zyxwvuts" * 30
    sigs = minhash_signatures([a, a, b], k=5, num_perm=64)
    assert (sigs[0] == sigs[1]).all()
    assert (sigs[0] == sigs[2]).mean() < 0.05


def test_bag_hashes_order_invariant_frequency_aware():
    toks = "a b c a b a".split()
    perm = "c a a a b b".split()
    assert (np.sort(bag_hashes(toks)) == np.sort(bag_hashes(perm))).all()
    # different multiplicity -> different set
    assert len(bag_hashes("a a b".split())) == 3
    assert _jac(bag_hashes("a a b".split()), bag_hashes("a b b".split())) == 0.5


def test_bag_minhash_ooo_duplicate_is_identical():
    import random

    rng = random.Random(3)
    doc = ("alpha beta gamma delta epsilon zeta " * 15).split()
    shuffled = doc[:]
    rng.shuffle(shuffled)
    sigs = bag_minhash_signatures([doc, shuffled], num_perm=32)
    assert (sigs[0] == sigs[1]).all()


def test_winnowing_guarantee_shared_substring():
    """Any shared substring of length >= k + w - 1 must yield a shared
    fingerprint (Schleimer et al. guarantee), k=64 w=32."""
    import random

    rng = random.Random(5)
    shared = "".join(rng.choice("abcdefgh ") for _ in range(120))
    doc_a = "".join(rng.choice("qrstuv ") for _ in range(300)) + shared
    doc_b = shared + "".join(rng.choice("wxyz ") for _ in range(300))
    fa = winnow_fingerprints(doc_a, 64, 32)
    fb = winnow_fingerprints(doc_b, 64, 32)
    assert len(np.intersect1d(fa, fb)) >= 1
    # unrelated docs share nothing
    doc_c = "".join(rng.choice("0123456 ") for _ in range(400))
    assert len(np.intersect1d(fa, winnow_fingerprints(doc_c, 64, 32))) == 0


def test_positional_kgrams_preserve_order():
    h1 = kgram_hashes_positional("abcdef", 3)
    h2 = kgram_hashes_positional("bcdefa", 3)
    assert h1.size == 4
    # same grams shifted: positional arrays differ, sets overlap
    assert len(np.intersect1d(h1, h2)) == 3


def test_simhash_near_dup_small_hamming():
    a = ("one two three four five six seven eight " * 10).split()
    b = list(a)
    b[3] = "foor"  # one token changed
    c = ("nine ten eleven twelve " * 20).split()
    fps = simhash_fingerprints([a, b, c])
    d_ab = hamming64(fps[0:1], fps[1:2])[0]
    d_ac = hamming64(fps[0:1], fps[2:3])[0]
    assert d_ab < 10 < d_ac


def test_empty_inputs():
    assert kgram_hashes("", 5).size == 0
    assert bag_hashes([]).size == 0
    assert minhash_signatures([""], 5, 16).shape == (1, 16)
    assert simhash_fingerprints([[]])[0] == 0
