"""ANIminimap2: minimizer-chain alignment ANI (minimap2-equivalent).

Replaces ``minimap2 --secondary=no -x asm5|asm10|asm20`` (reference
invocation private_cli.py:1499-1549). Pipeline:

1. windowed minimizers of query and subject (asm20: k=19 w=10; asm5 and
   asm10: k=19 w=19 -- minimap2 preset parameters), both strands;
2. anchor hash-join + one *primary* monotone chain per (query seq,
   subject seq, strand) family (minimap2 --secondary=no keeps primary
   chains only; chains scoring indistinguishably from an alternative
   would get mapq 0 and are skipped, per animinimap2.py:99-101);
3. banded DP along the chain (inter-anchor fills + bounded end
   extension) giving matched-base counts, emitted as PAF-like records;
4. scoring per parse_minimap2_paf_file (animinimap2.py:65-139):
   identity = 2*sum(matches) / sum(ref_span+1 + qry_span+1), aligned
   bases by inclusive interval union on both axes; aln_length = query
   aligned bases; cov = aligned / genome length.

Exactness: structural (single-primary-chain) behaviour follows
minimap2; matched-base counts come from our optimal banded DP rather
than minimap2's heuristic extension, so identities track but are not
bit-identical (measured in tests).
"""

from __future__ import annotations

import numpy as np

from pyani_plus_tpu import __version__
from pyani_plus_tpu.genomes import Genome, complement_codes
from pyani_plus_tpu.methods import ComputeContext
from pyani_plus_tpu.ops.chaining import Alignment
from pyani_plus_tpu.ops.extend import extend_errors, gap_errors
from pyani_plus_tpu.ops.minimizers import window_minimizers

NAME = "ANIminimap2"
PROGRAM = "pyani-plus-tpu-minimap2"

DEFAULT_PRESET = "asm20"  # ref animinimap2.py:49
PRESET_PARAMS = {  # minimap2 asm presets: (k, w)
    "asm5": (19, 19),
    "asm10": (19, 19),
    "asm20": (19, 10),
}
MAX_CHAIN_GAP = 10000


def configuration(*, mode: str = DEFAULT_PRESET) -> dict:
    return {
        "method": NAME,
        "program": PROGRAM,
        "version": __version__,
        "mode": mode,
    }


def _anchors(
    ref_mins, qry_mins
) -> tuple[np.ndarray, np.ndarray]:
    """(ref_pos, qry_pos) pairs of shared minimizer hashes."""
    order = np.argsort(ref_mins.hashes, kind="stable")
    rh = ref_mins.hashes[order]
    rp = ref_mins.positions[order]
    lo = np.searchsorted(rh, qry_mins.hashes, side="left")
    hi = np.searchsorted(rh, qry_mins.hashes, side="right")
    counts = hi - lo
    total = int(counts.sum())
    if total == 0:
        return np.empty(0, np.int64), np.empty(0, np.int64)
    qp = np.repeat(qry_mins.positions, counts)
    offsets = np.concatenate(
        [np.arange(c) + start for c, start in zip(counts, lo) if c > 0]
    )
    return rp[offsets], qp

def _best_chain_anchors(
    r: np.ndarray, q: np.ndarray, k: int
) -> list[tuple[int, int]]:
    """Primary monotone anchor chain (minimap2-style DP chain score)."""
    if r.size == 0:
        return []
    order = np.lexsort((q, r))
    r_s, q_s = r[order], q[order]
    n = r_s.size
    score = np.full(n, 1.0)
    prev = np.full(n, -1, dtype=np.int64)
    for i in range(n):
        # bounded lookback window (minimap2 caps chaining iterations)
        for j in range(i - 1, max(-1, i - 50), -1):
            if r_s[j] >= r_s[i] or q_s[j] >= q_s[i]:
                continue
            gap_r = r_s[i] - r_s[j]
            gap_q = q_s[i] - q_s[j]
            if max(gap_r, gap_q) > MAX_CHAIN_GAP:
                continue
            # score: anchor gain minus log-ish gap cost
            gain = 1.0 - abs(gap_r - gap_q) / float(MAX_CHAIN_GAP)
            if score[j] + gain > score[i]:
                score[i] = score[j] + gain
                prev[i] = j
    end = int(np.argmax(score))
    chain = []
    while end != -1:
        chain.append((int(r_s[end]), int(q_s[end])))
        end = int(prev[end])
    return chain[::-1]


def _chain_alignment(
    ref: np.ndarray, qry: np.ndarray, chain: list[tuple[int, int]], k: int
) -> Alignment | None:
    """Banded alignment along the chain -> block with error/gap counts."""
    if not chain:
        return None
    errors = 0
    gapcols = 0
    rs, qs = chain[0]
    prev_re, prev_qe = rs + k, qs + k
    for ri, qi in chain[1:]:
        trim = max(prev_re - ri, prev_qe - qi, 0)
        ri_t, qi_t = ri + trim, qi + trim
        if trim >= k:
            prev_re = max(prev_re, ri + k)
            prev_qe = max(prev_qe, qi + k)
            continue
        g_err, g_gap = gap_errors(ref[prev_re:ri_t], qry[prev_qe:qi_t])
        errors += g_err
        gapcols += g_gap
        prev_re, prev_qe = ri + k, qi + k
    ext_l_r, ext_l_q, e_err, e_gap = extend_errors(
        ref[:rs][::-1].copy(), qry[:qs][::-1].copy()
    )
    errors += e_err
    gapcols += e_gap
    ext_r_r, ext_r_q, e_err, e_gap = extend_errors(
        ref[prev_re:].copy(), qry[prev_qe:].copy()
    )
    errors += e_err
    gapcols += e_gap
    return Alignment(
        ref_start=rs - ext_l_r,
        ref_end=prev_re + ext_r_r,
        qry_start=qs - ext_l_q,
        qry_end=prev_qe + ext_r_q,
        errors=errors,
        gap_columns=gapcols,
    )


def paf_records(
    ref: np.ndarray, qry: np.ndarray, preset: str
) -> list[Alignment]:
    """Primary chain alignment(s) of one query sequence vs one subject."""
    k, w = PRESET_PARAMS.get(preset, PRESET_PARAMS[DEFAULT_PRESET])
    ref_mins = window_minimizers(ref, k, w)
    qlen = qry.size
    records = []
    best_by_strand = []
    for reverse in (False, True):
        q_codes = complement_codes(qry)[::-1].copy() if reverse else qry
        qry_mins = window_minimizers(q_codes, k, w)
        if ref_mins.count == 0 or qry_mins.count == 0:
            continue
        r, q = _anchors(ref_mins, qry_mins)
        chain = _best_chain_anchors(r, q, k)
        if not chain:
            continue
        best_by_strand.append((len(chain), reverse, chain, q_codes))
    if not best_by_strand:
        return []
    best_by_strand.sort(reverse=True)
    n_anchors, reverse, chain, q_codes = best_by_strand[0]
    # mapq-0 analogue: ambiguous strand choice (both equally good) -> skip
    if (
        len(best_by_strand) > 1
        and best_by_strand[1][0] == n_anchors
        and n_anchors < 10
    ):
        return []
    block = _chain_alignment(ref, q_codes, chain, 19)
    if block is None:
        return []
    if reverse:
        qs, qe = block.qry_start, block.qry_end
        block = Alignment(
            ref_start=block.ref_start,
            ref_end=block.ref_end,
            qry_start=qlen - qe,
            qry_end=qlen - qs,
            errors=block.errors,
            reverse=True,
            gap_columns=block.gap_columns,
        )
    records.append(block)
    return records


def _interval_union_inclusive(intervals: list[tuple[int, int]]) -> int:
    """Union size with the reference's +1-per-merged-interval accounting
    (PAF half-open ends fed to an inclusive counter, animinimap2.py:136)."""
    if not intervals:
        return 0
    intervals = sorted(intervals)
    total = 0
    cur_s, cur_e = intervals[0]
    for s, e in intervals[1:]:
        if s <= cur_e:
            cur_e = max(cur_e, e)
        else:
            total += cur_e - cur_s + 1
            cur_s, cur_e = s, e
    total += cur_e - cur_s + 1
    return total


def compute_pair(query: Genome, subject: Genome, preset: str) -> dict:
    aligned = 0
    identical = 0
    qry_regions: dict[int, list] = {}
    ref_regions: dict[int, list] = {}
    for si, s_rec in enumerate(subject.records):
        for qi, q_rec in enumerate(query.records):
            for block in paf_records(s_rec.codes, q_rec.codes, preset):
                ref_span = block.ref_len + 1
                qry_span = block.qry_len + 1
                aligned += ref_span + qry_span
                identical += block.columns - block.errors
                ref_regions.setdefault(si, []).append(
                    (block.ref_start, block.ref_end)
                )
                qry_regions.setdefault(qi, []).append(
                    (block.qry_start, block.qry_end)
                )
    if not aligned:
        return {
            "identity": None,
            "aln_length": None,
            "sim_errors": None,
            "cov_query": None,
            "cov_subject": None,
        }
    identity = 2.0 * identical / aligned
    qry_aligned = sum(_interval_union_inclusive(v) for v in qry_regions.values())
    ref_aligned = sum(_interval_union_inclusive(v) for v in ref_regions.values())
    # Reference worker derivations (private_cli.py:1556-1567):
    # aln_length = query aligned bases, sim_errors stays None
    return {
        "identity": identity,
        "aln_length": qry_aligned,
        "sim_errors": None,
        "cov_query": qry_aligned / query.length,
        "cov_subject": ref_aligned / subject.length,
    }


def compute(ctx: ComputeContext) -> list[dict]:
    preset = ctx.config.get("mode") or DEFAULT_PRESET
    from pyani_plus_tpu.methods import run_pairwise

    return run_pairwise(
        ctx,
        lambda q, s: compute_pair(ctx.genomes[q], ctx.genomes[s], preset),
    )
