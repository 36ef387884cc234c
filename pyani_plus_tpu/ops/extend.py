"""Banded anchored alignment: gap filling and end extension for ANIm.

Replaces nucmer's postnuc stage (SURVEY.md section 2.2): clusters of
maximal matches become alignments by (a) aligning the regions between
consecutive anchors and (b) extending outward from the terminal anchors
to the best-scoring stop. Both run in a diagonal band around the
anchor-to-anchor diagonal with nucmer-like scoring (match +3, mismatch
-7, gap -7 per column -- linear model; parity vs the reference .delta
fixtures is measured in tests and refined empirically).

The DP is anchored at the origin; for gap filling the end cell is also
anchored, for extension the end is free and the maximum-score cell
wins. Errors = mismatch + gap columns on the optimal path. Each row is
vectorised over the band (left-gap closure via prefix cummax), so cost
is O(rows x band) numpy work.
"""

from __future__ import annotations

import numpy as np

MATCH = 3
MISMATCH = -7
GAP = -7  # per gap column (linear model)

NEG = -(10**9)


def _band_dp(  # noqa: PLR0915
    a: np.ndarray,
    b: np.ndarray,
    band: int,
    *,
    free_end: bool,
    match: int = MATCH,
    mismatch: int = MISMATCH,
    gap: int = GAP,
    force_numpy: bool = False,
) -> tuple[int, int, int, int, int]:
    """Banded anchored DP -> (best_i, best_j, best_score, errors, gapcols).

    Dispatches to the bit-identical native C++ kernel when available
    (parity-tested); force_numpy pins the numpy path.
    """
    m, n = int(a.size), int(b.size)
    if m == 0 and n == 0:
        return 0, 0, 0, 0, 0
    if m == 0:
        return 0, n, gap * n, n, n
    if n == 0:
        return m, 0, gap * m, m, m
    if not force_numpy:
        from pyani_plus_tpu.native import band_dp_native

        native = band_dp_native(a, b, band, free_end, match, mismatch, gap)
        if native is not None:
            return native

    width = 2 * band + 1
    offs = np.arange(width)

    if free_end:
        # Extension follows the unit diagonal: both sequences advance at
        # the same rate (indels bounded by the band), regardless of how
        # long the remaining tails are.
        def center(i: int) -> int:
            return i

    else:

        def center(i: int) -> int:
            return (i * n) // m

    c0 = center(0)
    js0 = offs + (c0 - band)
    valid0 = (js0 >= 0) & (js0 <= n)
    score = np.where(valid0, gap * np.abs(js0), NEG).astype(np.int64)
    err = np.where(valid0, np.abs(js0), 0).astype(np.int64)
    gaps_arr = err.copy()  # row-0 errors are all gap columns
    best = (0, 0, 0, 0, 0)
    if free_end:
        k = int(np.argmax(score))
        if score[k] > best[2]:
            best = (0, int(js0[k]), int(score[k]), int(err[k]), int(gaps_arr[k]))

    a16 = a.astype(np.int16)
    b16 = b.astype(np.int16)

    for i in range(1, m + 1):
        ci, cp = center(i), center(i - 1)
        shift = ci - cp
        js = offs + (ci - band)
        valid = (js >= 0) & (js <= n)

        def shifted(arr, offset, fill):
            idx = offs + shift - offset
            ok = (idx >= 0) & (idx < width)
            out = np.full(width, fill, dtype=arr.dtype)
            out[ok] = arr[idx[ok]]
            return out

        diag_s = shifted(score, 1, NEG)
        diag_e = shifted(err, 1, 0)
        diag_g = shifted(gaps_arr, 1, 0)
        up_s = shifted(score, 0, NEG)
        up_e = shifted(err, 0, 0)
        up_g = shifted(gaps_arr, 0, 0)

        in_b = valid & (js >= 1)
        bj = np.clip(js - 1, 0, n - 1)
        sub_ok = in_b & (b16[bj] == a16[i - 1]) & (a16[i - 1] < 4) & (b16[bj] < 4)
        d = np.where(in_b, diag_s + np.where(sub_ok, match, mismatch), NEG)
        u = up_s + gap

        base = np.maximum(d, u)
        take_d = d >= u
        base_err = np.where(take_d, diag_e + (~sub_ok), up_e + 1)
        base_gap = np.where(take_d, diag_g, up_g + 1)

        # Left-gap closure within the row: score[k] = max_{k'<k} base[k'] +
        # gap*(k-k'). Linear gap -> prefix cummax of (base[k'] - gap*k').
        key = base - gap * offs  # gap negative: -gap*k grows with k
        run_max = np.maximum.accumulate(key)
        is_new = key >= run_max  # first occurrence of each running max
        src = np.maximum.accumulate(np.where(is_new, offs, -1))
        left_prev_max = np.concatenate(([NEG], run_max[:-1].astype(np.int64)))
        left_src = np.concatenate(([-1], src[:-1]))
        left = left_prev_max + gap * offs
        use_left = (left > base) & (left_src >= 0)
        new_score = np.where(use_left, left, base)
        safe_src = np.clip(left_src, 0, width - 1)
        new_err = np.where(
            use_left, base_err[safe_src] + (offs - safe_src), base_err
        )
        new_gap = np.where(
            use_left, base_gap[safe_src] + (offs - safe_src), base_gap
        )
        new_score = np.where(valid, new_score, NEG)
        score = new_score
        err = np.where(valid, new_err, 0)
        gaps_arr = np.where(valid, new_gap, 0)
        if free_end:
            k = int(np.argmax(score))
            # On score ties prefer the longer extension (more consumed
            # columns) -- matches nucmer's end behaviour at
            # mismatch-vs-gap ties.
            if score[k] > best[2] or (
                score[k] == best[2] and i + int(js[k]) > best[0] + best[1]
            ):
                best = (i, int(js[k]), int(score[k]), int(err[k]), int(gaps_arr[k]))

    if free_end:
        return best
    cm = center(m)
    k = n - (cm - band)
    if 0 <= k < width and score[k] > NEG // 2:
        return m, n, int(score[k]), int(err[k]), int(gaps_arr[k])
    return m, n, NEG, max(m, n), abs(m - n)  # pragma: no cover - band missed corner


def gap_errors(
    a: np.ndarray, b: np.ndarray, band: int | None = None
) -> tuple[int, int]:
    """(error columns, gap columns) of the end-anchored alignment of two
    gap segments."""
    if a.size == 0:
        return int(b.size), int(b.size)
    if b.size == 0:
        return int(a.size), int(a.size)
    if band is None:
        band = max(20, abs(int(a.size) - int(b.size)) + 20)
    band = int(min(band, max(a.size, b.size)))
    _, _, _, errors, gapcols = _band_dp(a, b, band, free_end=False)
    return int(errors), int(gapcols)


def extend_errors(
    a: np.ndarray, b: np.ndarray, band: int = 60, breaklen: int = 200
) -> tuple[int, int, int, int]:
    """Extend from the origin into a and b; return (a_len, b_len, errors,
    gap_columns) of the best-scoring extension (may be all zero).

    The useful search region is bounded by the shorter tail plus the
    breaklen slack (an extension cannot usefully outrun the nearer
    sequence end by more than the give-up distance).
    """
    if a.size == 0 or b.size == 0:
        return 0, 0, 0, 0
    limit = min(a.size, b.size) + breaklen
    a = a[:limit]
    b = b[:limit]
    band = int(min(band, max(a.size, b.size)))
    i, j, _score, errors, gapcols = _band_dp(a, b, band, free_end=True)
    return int(i), int(j), int(errors), int(gapcols)
