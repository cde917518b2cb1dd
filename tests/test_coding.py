"""Golden tests of the LSH coding spec (SURVEY §7.2 step 3: same seed ⇒
same codes; independent bit-by-bit reimplementation as the oracle;
MSB-first order pinned per reference CodingQuickCheck)."""

import numpy as np
import pytest

from fspann_query_system_spark.lsh.coding import (code_family, code_single,
                                                  code_vectors, hamming_words,
                                                  with_hamming)
from fspann_query_system_spark.lsh.params import LshConfig, fit_params, family_seed


def slow_reference_code(v, alpha, r, omega, lam):
    """Independent scalar reimplementation of the coding spec."""
    m = alpha.shape[0]
    H = [int(np.floor((np.dot(alpha[j], v) + r[j]) / omega[j])) for j in range(m)]
    bits = []
    for plane in range(lam - 1, -1, -1):          # MSB plane first
        for j in range(m):
            hj = (H[j] ^ 0x80000000) & 0xFFFFFFFF
            bits.append((hj >> plane) & 1)
    key = 0
    for pos in range(min(63, len(bits))):
        if bits[pos]:
            key |= 1 << (62 - pos)
    words = []
    for w in range((len(bits) + 63) // 64):
        word = 0
        for b, bit in enumerate(bits[w * 64:(w + 1) * 64]):
            if bit:
                word |= 1 << (63 - b)
        if word >= 1 << 63:
            word -= 1 << 64
        words.append(word)
    return key, words, bits


@pytest.fixture(scope="module")
def fitted():
    rng = np.random.default_rng(1)
    sample = rng.normal(0, 1, (500, 16))
    cfg = LshConfig(dim=16, m=6, lam=3, tables=2, divisions=2, seed=13)
    return sample, cfg, fit_params(sample, cfg)


def test_vectorized_matches_scalar_spec(fitted):
    sample, cfg, params = fitted
    V = sample[:50]
    for (t, d), (alpha, r, omega) in params.families.items():
        keys, words = code_family(V, alpha, r, omega, cfg.lam)
        for i in range(len(V)):
            k_ref, w_ref, _ = slow_reference_code(V[i], alpha, r, omega, cfg.lam)
            assert keys[i] == k_ref, (t, d, i)
            assert words[i].tolist() == w_ref, (t, d, i)


def test_msb_first_bit_order(fitted):
    """CodingQuickCheck analog: code bit 0 == bit (lam-1) of shifted H[0]."""
    sample, cfg, params = fitted
    alpha, r, omega = params.families[(0, 0)]
    v = sample[0]
    _, _, bits = slow_reference_code(v, alpha, r, omega, cfg.lam)
    h0 = int(np.floor((np.dot(alpha[0], v) + r[0]) / omega[0]))
    expected_bit0 = (((h0 ^ 0x80000000) & 0xFFFFFFFF) >> (cfg.lam - 1)) & 1
    assert bits[0] == expected_bit0


def test_key_is_63_bit_truncation_of_code(fitted):
    sample, cfg, params = fitted
    alpha, r, omega = params.families[(0, 0)]
    keys, words = code_family(sample[:20], alpha, r, omega, cfg.lam)
    assert (keys >= 0).all()
    nbits = cfg.m * cfg.lam  # 18 < 63: key must equal full code >> (63-18)
    w0 = words[:, 0].astype(np.int64).view(np.uint64)
    assert ((w0 >> np.uint64(64 - nbits)).astype(np.int64)
            == (keys >> (63 - nbits))).all()


def test_determinism_across_fits(fitted):
    sample, cfg, _ = fitted
    p1 = fit_params(sample, cfg)
    p2 = fit_params(sample, cfg)
    for k in p1.families:
        for a, b in zip(p1.families[k], p2.families[k]):
            assert np.array_equal(a, b)
    assert family_seed(13, 1, 1) == 13 + 1_000_003 + 1


def test_hamming_words_matches_bits(fitted):
    sample, cfg, params = fitted
    alpha, r, omega = params.families[(0, 0)]
    _, words = code_family(sample[:10], alpha, r, omega, cfg.lam)
    for i in range(9):
        a, b = words[i], words[i + 1]
        expected = bin(int(a[0]) + 2**64 if a[0] < 0 else int(a[0])).count("1")  # noqa
    # direct xor-popcount check against python ints
    for i in range(9):
        x = (int(words[i][0]) ^ int(words[i + 1][0])) & (2**64 - 1)
        assert hamming_words(words[i], words[i + 1]) == bin(x).count("1")


def test_code_vectors_df_matches_kernel(spark, fitted):
    sample, cfg, params = fitted
    df = spark.createDataFrame(
        [(i, sample[i].tolist()) for i in range(30)], "id LONG, vector ARRAY<DOUBLE>")
    out = code_vectors(df, params).collect()
    assert len(out) == 30 * cfg.tables * cfg.divisions
    by_key = {(r.id, r.table, r.division): r for r in out}
    for i in [0, 7, 29]:
        single = code_single(sample[i], params)
        for (t, d), (key, words) in single.items():
            row = by_key[(i, t, d)]
            assert row.code_key == key
            assert row.code_bits == words.tolist()


def test_native_hamming_expr(spark, fitted):
    sample, cfg, params = fitted
    alpha, r, omega = params.families[(0, 0)]
    _, words = code_family(sample[:20], alpha, r, omega, cfg.lam)
    rows = [(words[i].tolist(), words[i + 1].tolist()) for i in range(19)]
    df = spark.createDataFrame(rows, "a ARRAY<LONG>, b ARRAY<LONG>")
    got = [r.hamming for r in with_hamming(df, "a", "b").collect()]
    want = [int(hamming_words(np.array(a), np.array(b))) for a, b in rows]
    assert got == want


def test_wide_code_spans_two_words(spark):
    """SURVEY §7.4 hard part: m=26, lam=3 = 78 bits > 63.  Full code must
    span 2 words, key must be the MSB-first 63-bit truncation, hamming
    must count ALL 78 bits (not just the key's 63)."""
    rng = np.random.default_rng(3)
    dim, m, lam = 8, 26, 3
    alpha = rng.normal(size=(m, dim))
    r = rng.uniform(0, 1, m)
    omega = np.full(m, 1.0)
    V = rng.normal(0, 2, (25, dim))
    keys, words = code_family(V, alpha, r, omega, lam)
    assert words.shape[1] == 2
    for i in range(len(V)):
        k_ref, w_ref, bits = slow_reference_code(V[i], alpha, r, omega, lam)
        assert keys[i] == k_ref, i
        assert words[i].tolist() == w_ref, i
        assert len(bits) == 78
    # hamming over full width: flip a bit in the SECOND word only — key
    # unchanged, hamming must still see it
    a = words[0].copy()
    b = a.copy()
    b[1] ^= 1 << 50                     # bit 78-? inside word 2's used range
    assert hamming_words(a, b) == 1
    # native expr agrees on 2-word codes
    df = spark.createDataFrame([(a.tolist(), b.tolist())], "a ARRAY<LONG>, b ARRAY<LONG>")
    assert with_hamming(df, "a", "b").collect()[0].hamming == 1


def test_coding_property_random_families():
    """Property check across random family shapes: vectorized kernel ==
    scalar spec for every (m, lam) corner incl. >63-bit codes."""
    rng = np.random.default_rng(11)
    for m, lam in [(1, 1), (8, 2), (21, 3), (31, 2), (24, 3), (16, 4)]:
        dim = int(rng.integers(2, 24))
        alpha = rng.normal(size=(m, dim))
        r = rng.uniform(0, 1, m)
        omega = rng.uniform(0.5, 3.0, m)
        V = rng.normal(0, 3, (8, dim))
        keys, words = code_family(V, alpha, r, omega, lam)
        assert words.shape[1] == (m * lam + 63) // 64
        for i in range(len(V)):
            k_ref, w_ref, _ = slow_reference_code(V[i], alpha, r, omega, lam)
            assert keys[i] == k_ref, (m, lam, i)
            assert words[i].tolist() == w_ref, (m, lam, i)
