"""Property-based tests (hypothesis) for the pure-Python kernels: the
crypto record layer and the LSH coding spec.  JVM-free → fast shrinkage."""

import numpy as np
import pytest
from hypothesis import given, settings, strategies as st

from fspann_query_system_spark.crypto.aes import (encrypt_record,
                                                  decrypt_record,
                                                  vector_to_bytes,
                                                  bytes_to_vector)
from fspann_query_system_spark.crypto.keys import derive_session_key
from fspann_query_system_spark.lsh.coding import code_family, hamming_words

from test_coding import slow_reference_code

KEY = derive_session_key(b"\x01" * 32, 1)

vec_st = st.lists(st.floats(min_value=-1e6, max_value=1e6,
                            allow_nan=False, width=64),
                  min_size=1, max_size=64)


@settings(max_examples=60, deadline=None)
@given(vec=vec_st, pid=st.integers(min_value=0, max_value=2**40),
       ver=st.integers(min_value=1, max_value=100))
def test_crypto_roundtrip_property(vec, pid, ver):
    key = derive_session_key(b"\x01" * 32, ver)
    iv, ct = encrypt_record(key, str(pid), ver, np.array(vec))
    out = decrypt_record(key, str(pid), ver, len(vec), iv, ct)
    assert out.tolist() == vec


@settings(max_examples=30, deadline=None)
@given(vec=vec_st, pid=st.integers(min_value=0, max_value=2**40))
def test_crypto_aad_binding_property(vec, pid):
    """Any AAD component change (id, version, dim) must fail decryption —
    the no-fallback rule (AesGcmCryptoService.decryptFromPoint:137-152)."""
    iv, ct = encrypt_record(KEY, str(pid), 1, np.array(vec))
    with pytest.raises(Exception):
        decrypt_record(KEY, str(pid + 1), 1, len(vec), iv, ct)
    with pytest.raises(Exception):
        decrypt_record(KEY, str(pid), 2, len(vec), iv, ct)
    with pytest.raises(Exception):
        decrypt_record(derive_session_key(b"\x02" * 32, 1), str(pid), 1,
                       len(vec), iv, ct)


@settings(max_examples=40, deadline=None)
@given(data=st.data(),
       m=st.integers(min_value=1, max_value=32),
       lam=st.integers(min_value=1, max_value=4),
       dim=st.integers(min_value=1, max_value=16))
def test_coding_matches_scalar_spec_property(data, m, lam, dim):
    seed = data.draw(st.integers(min_value=0, max_value=2**31))
    rng = np.random.default_rng(seed)
    alpha = rng.normal(size=(m, dim))
    r = rng.uniform(0, 1, m)
    omega = rng.uniform(0.25, 4.0, m)
    V = rng.normal(0, 2, (4, dim))
    keys, words = code_family(V, alpha, r, omega, lam)
    assert words.shape[1] == (m * lam + 63) // 64
    for i in range(len(V)):
        k_ref, w_ref, bits = slow_reference_code(V[i], alpha, r, omega, lam)
        assert keys[i] == k_ref
        assert words[i].tolist() == w_ref
    # hamming symmetry + identity over the full (possibly >63-bit) width
    assert hamming_words(words[0], words[0]) == 0
    assert hamming_words(words[0], words[1]) == hamming_words(words[1], words[0])


@settings(max_examples=60, deadline=None)
@given(vec=vec_st)
def test_vector_serialization_roundtrip(vec):
    assert bytes_to_vector(vector_to_bytes(np.array(vec))).tolist() == vec
