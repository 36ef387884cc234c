"""Unit tests for the fastANI/MashMap statistical kernels.

These pin the exact round-3 semantics study results (CLAUDE.md fastANI
notes): the integer-quantised CI gate, the relaxed L1 hit threshold,
the scipy-free binomial quantile, and the reference-bin dedup -- each
with the concrete values the fixture study established.
"""

import math

import pytest

from pyani_plus_tpu.ops.fastani_map import (
    FragmentMapping,
    _binom_ppf,
    estimate_minimum_hits_relaxed,
    identity_upper_bound,
    j2md,
    md2j,
    n_window_steps,
    ref_bin_filter,
)


def test_md2j_j2md_roundtrip_many_points() -> None:
    for k in (12, 14, 16):
        for d in (0.001, 0.01, 0.05, 0.1, 0.2, 0.3):
            assert math.isclose(j2md(md2j(d, k), k), d, rel_tol=1e-12)


def test_j2md_boundaries() -> None:
    assert j2md(0.0, 16) == 1.0
    assert j2md(1.0, 16) == 0.0
    assert md2j(0.0, 16) == 1.0


def test_window_steps_default_geometry() -> None:
    # fastANI's countMinimizerWindows for a 3000 bp fragment, k=16, w=24
    assert n_window_steps(3000, 16, 24) == 2962


def test_ci_gate_quantisation_admits_two_not_one() -> None:
    """The ceil quantisation admits shared=2 at s~238 while rejecting
    shared=1 -- the exact behaviour the fixture retained counts need."""
    s, k = 238, 16
    assert identity_upper_bound(2, s, k) >= 80.0
    assert identity_upper_bound(1, s, k) < 80.0


def test_ci_gate_monotone_in_shared() -> None:
    s, k = 300, 16
    bounds = [identity_upper_bound(m, s, k) for m in range(0, 50, 5)]
    assert bounds == sorted(bounds)
    assert identity_upper_bound(s, s, k) == 100.0


def test_ci_gate_exceeds_point_estimate() -> None:
    """The upper bound is never below the point estimate (that slack is
    why fastANI keeps sub-threshold fragments on divergent genomes)."""
    s, k = 238, 16
    for shared in (5, 20, 60, 120):
        point = 100.0 * (1.0 - j2md(shared / s, k))
        assert identity_upper_bound(shared, s, k) >= point


def test_binom_ppf_matches_definition() -> None:
    """Smallest m with CDF(m) >= q, by brute-force CDF evaluation."""
    for n, p, q in ((100, 0.02, 0.1), (238, 0.021, 0.1), (50, 0.5, 0.9)):
        got = _binom_ppf(q, n, p)
        cdf = 0.0
        for m in range(n + 1):
            cdf += math.comb(n, m) * p**m * (1 - p) ** (n - m)
            if cdf >= q:
                assert got == m
                break


def test_binom_ppf_edges() -> None:
    assert _binom_ppf(0.1, 0, 0.3) == 0
    assert _binom_ppf(0.1, 10, 0.0) == 0
    assert _binom_ppf(0.1, 10, 1.0) == 10


def test_minimum_hits_relaxed_never_exceeds_strict() -> None:
    for s in (100, 238, 1000):
        for tau in (75.0, 80.0, 85.0):
            j = md2j(1.0 - tau / 100.0, 16)
            strict = math.ceil(s * j)
            relaxed = estimate_minimum_hits_relaxed(s, 16, tau)
            assert 1 <= relaxed <= max(1, strict)


def _mapping(frag_id, seq_id, wpos, identity):
    return FragmentMapping(
        fragment_id=frag_id,
        ref_seq_id=seq_id,
        ref_step=wpos + 23,  # ref_wpos(w=24) == wpos
        shared=10,
        sketch_size=100,
        identity=identity,
    )


def test_ref_bin_filter_keeps_best_per_bin() -> None:
    """Two fragments landing in the same (seq, wpos//fragLen) bin keep
    only the higher identity; ties keep the lowest fragment id."""
    w, fragsize = 24, 3000
    maps = [
        _mapping(0, 0, 100, 95.0),
        _mapping(1, 0, 200, 97.0),  # same bin as frag 0, higher identity
        _mapping(2, 0, 3100, 90.0),  # next bin
        _mapping(3, 1, 100, 80.0),  # other sequence, own bin
        _mapping(4, 0, 3200, 90.0),  # tie with frag 2 -> frag 2 kept
    ]
    kept = ref_bin_filter(maps, fragsize=fragsize, w=w)
    assert [m.fragment_id for m in kept] == [1, 2, 3]


def test_ref_bin_filter_empty() -> None:
    assert ref_bin_filter([]) == []
