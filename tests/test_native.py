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
