"""Parity tests: native C++ sketch kernel vs the numpy implementation."""

import numpy as np
import pytest

from pyani_plus_tpu.native import have_native, sketch_codes_native
from pyani_plus_tpu.ops.kmers import canonical_kmer_hashes
from pyani_plus_tpu.ops.minhash import max_hash_for_scaled

pytestmark = pytest.mark.skipif(not have_native(), reason="no C++ toolchain")


def test_unfiltered_parity() -> None:
    rng = np.random.default_rng(5)
    codes = rng.integers(0, 4, 50_000).astype(np.uint8)
    codes[rng.random(codes.size) < 0.01] = 4  # sprinkle Ns
    native = sketch_codes_native(codes, 31, 2**64 - 1)
    numpy_h = canonical_kmer_hashes(codes, 31)
    assert np.array_equal(native, numpy_h)


def test_scaled_filter_parity() -> None:
    rng = np.random.default_rng(6)
    codes = rng.integers(0, 4, 200_000).astype(np.uint8)
    max_hash = max_hash_for_scaled(1000)
    native = sketch_codes_native(codes, 31, max_hash)
    numpy_h = canonical_kmer_hashes(codes, 31)
    numpy_h = numpy_h[numpy_h <= np.uint64(max_hash)]
    assert np.array_equal(native, numpy_h)


def test_short_and_empty() -> None:
    assert sketch_codes_native(np.zeros(10, np.uint8), 31, 2**64 - 1).size == 0
    assert sketch_codes_native(np.zeros(0, np.uint8), 31, 2**64 - 1).size == 0


def test_k16_parity() -> None:
    rng = np.random.default_rng(7)
    codes = rng.integers(0, 4, 30_000).astype(np.uint8)
    native = sketch_codes_native(codes, 16, 2**64 - 1)
    numpy_h = canonical_kmer_hashes(codes, 16)
    assert np.array_equal(native, numpy_h)


def _py_suffix_array(text: np.ndarray) -> np.ndarray:
    n = text.size
    return np.asarray(
        sorted(range(n), key=lambda i: tuple(text[i:].tolist())), dtype=np.int64
    )


def test_suffix_array_native_parity(monkeypatch) -> None:
    from pyani_plus_tpu import native
    from pyani_plus_tpu.ops.suffix import lcp_array, suffix_array

    rng = np.random.default_rng(11)
    for n in (1, 2, 5, 97, 2000):
        text = rng.integers(0, 4, n).astype(np.int64)
        got_native = suffix_array(text)
        # pin the numpy prefix-doubling path for the same input
        monkeypatch.setattr(native, "suffix_array_native", lambda _t: None)
        monkeypatch.setattr(native, "kasai_lcp_native", lambda _t, _s: None)
        got_numpy = suffix_array(text)
        monkeypatch.undo()
        assert np.array_equal(got_native, got_numpy), n
        if n <= 100:
            assert np.array_equal(got_native, _py_suffix_array(text)), n
        # LCP parity on the same SA
        lcp_native = lcp_array(text, got_native)
        monkeypatch.setattr(native, "kasai_lcp_native", lambda _t, _s: None)
        lcp_numpy = lcp_array(text, got_native)
        monkeypatch.undo()
        assert np.array_equal(lcp_native, lcp_numpy), n


def test_suffix_array_native_sentinels() -> None:
    # Mixed large symbols as used by maximal_matches (separators, unique Ns)
    from pyani_plus_tpu.ops.suffix import lcp_array, suffix_array

    text = np.array([0, 1, 2, 3, 96, 2, 1, 0, 100, 101, 0, 1, 2, 97], np.int64)
    sa = suffix_array(text)
    assert np.array_equal(sa, _py_suffix_array(text))
    lcp = lcp_array(text, sa)
    # brute-force LCP check
    for r in range(1, text.size):
        i, j = sa[r - 1], sa[r]
        h = 0
        while i + h < text.size and j + h < text.size and text[i + h] == text[j + h]:
            h += 1
        assert lcp[r] == h, r


def test_band_dp_native_parity() -> None:
    from pyani_plus_tpu.ops.extend import _band_dp

    rng = np.random.default_rng(12)
    for trial in range(30):
        m = int(rng.integers(1, 120))
        n = int(rng.integers(1, 120))
        a = rng.integers(0, 4, m).astype(np.uint8)
        b = a[:n].copy() if rng.random() < 0.5 and n <= m else rng.integers(
            0, 4, n
        ).astype(np.uint8)
        # sprinkle Ns (code 4) which never match
        a[rng.random(m) < 0.05] = 4
        band = int(rng.integers(1, 20))
        for free_end in (False, True):
            got = _band_dp(a, b, band=band, free_end=free_end)
            want = _band_dp(a, b, band=band, free_end=free_end, force_numpy=True)
            assert got == want, (trial, band, free_end)
