"""Native (C++) host-side kernels, loaded via ctypes with lazy build.

The TPU owns the scoring math; these cover host-bound ingestion hot
loops (sketch hashing). Build happens on first use with g++ and is
cached next to the sources; absence of a compiler degrades gracefully
to the numpy implementations.
"""

from __future__ import annotations

import ctypes
import logging
import subprocess
from pathlib import Path

import numpy as np

_DIR = Path(__file__).parent
_SO = _DIR / "libsketch.so"
_SRC = _DIR / "sketch.cpp"
_ALIGN_SO = _DIR / "libalign.so"
_ALIGN_SRC = _DIR / "align.cpp"
_SUFFIX_SO = _DIR / "libsuffix.so"
_SUFFIX_SRC = _DIR / "suffix.cpp"
_BAND_SO = _DIR / "libband.so"
_BAND_SRC = _DIR / "band.cpp"

_lib = None
_tried = False
_align_lib = None
_align_tried = False


def _build(src: Path, so: Path) -> None:
    if not so.is_file() or so.stat().st_mtime < src.stat().st_mtime:
        subprocess.run(
            ["g++", "-O3", "-shared", "-fPIC", "-std=c++17", str(src), "-o", str(so)],
            check=True,
            capture_output=True,
        )


def _load():
    global _lib, _tried
    if _lib is not None or _tried:
        return _lib
    _tried = True
    try:
        _build(_SRC, _SO)
        lib = ctypes.CDLL(str(_SO))
        lib.sketch_codes.restype = ctypes.c_int64
        lib.sketch_codes.argtypes = [
            ctypes.POINTER(ctypes.c_uint8),
            ctypes.c_int64,
            ctypes.c_int,
            ctypes.c_uint64,
            ctypes.c_uint32,
            ctypes.POINTER(ctypes.c_uint64),
            ctypes.c_int64,
        ]
        lib.hash_codes.restype = ctypes.c_int64
        lib.hash_codes.argtypes = lib.sketch_codes.argtypes[:4] + [
            ctypes.POINTER(ctypes.c_uint64),
            ctypes.c_int64,
        ]
        _lib = lib
    except Exception as exc:  # pragma: no cover - no compiler
        logging.getLogger(__package__).debug("native sketch unavailable: %s", exc)
        _lib = None
    return _lib


def have_native() -> bool:
    return _load() is not None


def sketch_codes_native(
    codes: np.ndarray, k: int, max_hash: int, seed: int = 42
) -> np.ndarray | None:
    """Retained canonical-kmer hashes (<= max_hash), or None if unavailable.

    Output is in window order, NOT deduped/sorted (same contract as
    ops.kmers.canonical_kmer_hashes + filter).
    """
    lib = _load()
    if lib is None:
        return None
    codes = np.ascontiguousarray(codes, dtype=np.uint8)
    n = codes.size
    if n < k:
        return np.empty(0, np.uint64)
    # Capacity: generous bound on retained hashes
    if max_hash >= 2**63:
        cap = n
    else:
        expected = int(n * (max_hash / 2.0**64) * 4) + 4096
        cap = min(n, expected)
    out = np.empty(cap, dtype=np.uint64)
    count = lib.sketch_codes(
        codes.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        n,
        k,
        ctypes.c_uint64(max_hash),
        seed,
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint64)),
        cap,
    )
    if count == cap and cap < n:  # pragma: no cover - undersized capacity
        out = np.empty(n, dtype=np.uint64)
        count = lib.sketch_codes(
            codes.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
            n,
            k,
            ctypes.c_uint64(max_hash),
            seed,
            out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint64)),
            n,
        )
    return out[:count].copy()


def _load_align():
    global _align_lib, _align_tried
    if _align_lib is not None or _align_tried:
        return _align_lib
    _align_tried = True
    try:
        _build(_ALIGN_SRC, _ALIGN_SO)
        lib = ctypes.CDLL(str(_ALIGN_SO))
        lib.local_align_stats.restype = ctypes.c_int
        lib.local_align_stats.argtypes = [
            ctypes.POINTER(ctypes.c_uint8),
            ctypes.c_int64,
            ctypes.POINTER(ctypes.c_uint8),
            ctypes.c_int64,
            ctypes.c_int,
            ctypes.c_int,
            ctypes.c_int,
            ctypes.c_int,
            ctypes.POINTER(ctypes.c_int64),
        ]
        lib.local_align_score.restype = ctypes.c_int32
        lib.local_align_score.argtypes = lib.local_align_stats.argtypes[:8]
        _align_lib = lib
    except Exception as exc:  # pragma: no cover - no compiler
        logging.getLogger(__package__).debug("native align unavailable: %s", exc)
        _align_lib = None
    return _align_lib


def local_align_stats_native(  # noqa: PLR0913
    query: np.ndarray,
    subject: np.ndarray,
    reward: int,
    penalty: int,
    gap_open: int,
    gap_extend: int,
):
    """Native local alignment stats tuple, or None if unavailable.

    Returns (score, length, matches, mismatches, gaps, gap_opens,
    q_start, q_end, s_start, s_end) or False when no positive alignment.
    """
    lib = _load_align()
    if lib is None:
        return None
    query = np.ascontiguousarray(query, dtype=np.uint8)
    subject = np.ascontiguousarray(subject, dtype=np.uint8)
    out = np.zeros(10, dtype=np.int64)
    ok = lib.local_align_stats(
        query.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        query.size,
        subject.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        subject.size,
        reward,
        penalty,
        gap_open,
        gap_extend,
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
    )
    if not ok:
        return False
    return tuple(int(v) for v in out)


def local_align_score_native(  # noqa: PLR0913
    query: np.ndarray,
    subject: np.ndarray,
    reward: int,
    penalty: int,
    gap_open: int,
    gap_extend: int,
) -> int | None:
    """Best local alignment score only (no traceback), or None."""
    lib = _load_align()
    if lib is None:
        return None
    query = np.ascontiguousarray(query, dtype=np.uint8)
    subject = np.ascontiguousarray(subject, dtype=np.uint8)
    return int(
        lib.local_align_score(
            query.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
            query.size,
            subject.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
            subject.size,
            reward,
            penalty,
            gap_open,
            gap_extend,
        )
    )


_suffix_lib = None
_suffix_tried = False


def _load_suffix():
    global _suffix_lib, _suffix_tried
    if _suffix_lib is not None or _suffix_tried:
        return _suffix_lib
    _suffix_tried = True
    try:
        _build(_SUFFIX_SRC, _SUFFIX_SO)
        lib = ctypes.CDLL(str(_SUFFIX_SO))
        lib.kasai_lcp.restype = None
        lib.kasai_lcp.argtypes = [
            ctypes.POINTER(ctypes.c_int64),
            ctypes.POINTER(ctypes.c_int64),
            ctypes.c_int64,
            ctypes.POINTER(ctypes.c_int64),
        ]
        lib.suffix_array_pd.restype = None
        lib.suffix_array_pd.argtypes = [
            ctypes.POINTER(ctypes.c_int64),
            ctypes.c_int64,
            ctypes.POINTER(ctypes.c_int64),
        ]
        _suffix_lib = lib
    except Exception as exc:  # pragma: no cover - no compiler
        logging.getLogger(__package__).debug("native suffix unavailable: %s", exc)
        _suffix_lib = None
    return _suffix_lib


def kasai_lcp_native(text: np.ndarray, sa: np.ndarray):
    """Kasai LCP array via C++, or None if unavailable."""
    lib = _load_suffix()
    if lib is None:
        return None
    text = np.ascontiguousarray(text, dtype=np.int64)
    sa = np.ascontiguousarray(sa, dtype=np.int64)
    lcp = np.zeros(text.size, dtype=np.int64)
    lib.kasai_lcp(
        text.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
        sa.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
        text.size,
        lcp.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
    )
    return lcp


_band_lib = None
_band_tried = False


def _load_band():
    global _band_lib, _band_tried
    if _band_lib is not None or _band_tried:
        return _band_lib
    _band_tried = True
    try:
        _build(_BAND_SRC, _BAND_SO)
        lib = ctypes.CDLL(str(_BAND_SO))
        lib.band_affine.restype = None
        lib.band_affine.argtypes = [
            ctypes.POINTER(ctypes.c_uint8),
            ctypes.c_int64,
            ctypes.POINTER(ctypes.c_uint8),
            ctypes.c_int64,
            ctypes.c_int64,
            ctypes.c_int,
            ctypes.c_int,
            ctypes.c_int,
            ctypes.c_int,
            ctypes.c_int,
            ctypes.c_int64,
            ctypes.POINTER(ctypes.c_int64),
        ]
        _band_lib = lib
    except Exception as exc:  # pragma: no cover - no compiler
        logging.getLogger(__package__).debug("native band unavailable: %s", exc)
        _band_lib = None
    return _band_lib


def band_dp_native(  # noqa: PLR0913
    a: np.ndarray,
    b: np.ndarray,
    band: int,
    free_end: bool,
    match: int,
    mismatch: int,
    gap_open: int,
    gap_extend: int,
    stop_rows: int = 0,
):
    """Native affine banded DP -> (i, j, score, errors, gapcols), or None."""
    lib = _load_band()
    if lib is None:
        return None
    a = np.ascontiguousarray(a, dtype=np.uint8)
    b = np.ascontiguousarray(b, dtype=np.uint8)
    out = np.zeros(5, dtype=np.int64)
    lib.band_affine(
        a.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        a.size,
        b.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        b.size,
        band,
        1 if free_end else 0,
        match,
        mismatch,
        gap_open,
        gap_extend,
        stop_rows,
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
    )
    return tuple(int(v) for v in out)


def suffix_array_native(text: np.ndarray):
    """Suffix array via native prefix doubling, or None if unavailable."""
    lib = _load_suffix()
    if lib is None:
        return None
    text = np.ascontiguousarray(text, dtype=np.int64)
    sa = np.zeros(text.size, dtype=np.int64)
    lib.suffix_array_pd(
        text.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
        text.size,
        sa.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
    )
    return sa


_MM2_SO = _DIR / "libmm2.so"
_MM2_SRC = _DIR / "mm2.cpp"
_mm2_lib = None
_mm2_tried = False


def _load_mm2():
    global _mm2_lib, _mm2_tried
    if _mm2_lib is not None or _mm2_tried:
        return _mm2_lib
    _mm2_tried = True
    try:
        _build(_MM2_SRC, _MM2_SO)
        lib = ctypes.CDLL(str(_MM2_SO))
        lib.mm2_sketch.restype = ctypes.c_int64
        lib.mm2_sketch.argtypes = [
            ctypes.POINTER(ctypes.c_uint8),
            ctypes.c_int64,
            ctypes.c_int,
            ctypes.c_int,
            ctypes.POINTER(ctypes.c_uint64),
            ctypes.POINTER(ctypes.c_int32),
            ctypes.POINTER(ctypes.c_uint8),
        ]
        lib.mm2_chain_dp.restype = None
        lib.mm2_chain_dp.argtypes = [
            ctypes.POINTER(ctypes.c_int64),
            ctypes.POINTER(ctypes.c_int32),
            ctypes.c_int64,
            ctypes.c_int32,
            ctypes.c_int32,
            ctypes.c_int32,
            ctypes.c_int32,
            ctypes.c_int32,
            ctypes.c_int32,
            ctypes.c_float,
            ctypes.POINTER(ctypes.c_int32),
            ctypes.POINTER(ctypes.c_int64),
        ]
        _mm2_lib = lib
    except Exception as exc:  # pragma: no cover - no compiler
        logging.getLogger(__package__).debug("native mm2 unavailable: %s", exc)
        _mm2_lib = None
    return _mm2_lib


def mm2_sketch_native(codes: np.ndarray, k: int, w: int):
    """minimap2 mm_sketch -> (hashes, end_positions, strands), or None."""
    lib = _load_mm2()
    if lib is None:
        return None
    codes = np.ascontiguousarray(codes, dtype=np.uint8)
    n = codes.size
    out_h = np.empty(n, dtype=np.uint64)
    out_p = np.empty(n, dtype=np.int32)
    out_s = np.empty(n, dtype=np.uint8)
    count = lib.mm2_sketch(
        codes.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        n,
        k,
        w,
        out_h.ctypes.data_as(ctypes.POINTER(ctypes.c_uint64)),
        out_p.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        out_s.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
    )
    return out_h[:count], out_p[:count], out_s[:count]


def mm2_chain_dp_native(  # noqa: PLR0913
    ax: np.ndarray,
    ay: np.ndarray,
    q_span: int,
    max_dist_x: int,
    max_dist_y: int,
    bw: int,
    max_skip: int = 25,
    max_iter: int = 5000,
):
    """minimap2 mm_chain_dp scores -> (f, p), or None."""
    lib = _load_mm2()
    if lib is None:
        return None
    ax = np.ascontiguousarray(ax, dtype=np.int64)
    ay = np.ascontiguousarray(ay, dtype=np.int32)
    n = ax.size
    f = np.zeros(n, dtype=np.int32)
    p = np.full(n, -1, dtype=np.int64)
    lib.mm2_chain_dp(
        ax.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
        ay.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        n,
        q_span,
        max_dist_x,
        max_dist_y,
        bw,
        max_skip,
        max_iter,
        float(q_span),
        f.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        p.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
    )
    return f, p
