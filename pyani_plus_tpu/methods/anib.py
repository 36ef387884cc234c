"""ANIb: fragment + BLAST-equivalent alignment ANI (Goris et al. 2007).

Replaces makeblastdb/blastn (reference invocation private_cli.py:1335-1400,
scoring task=blastn: reward 2, penalty -3, gap 5/2, evalue 1e-15).

Pipeline per (query, subject) pair -- semantics per methods/anib.py in
the reference:

1. chop every query sequence into <=1020 bp pieces, tail included
   (anib.py:58-88);
2. per fragment, find the best local alignment against the subject:
   11-mer seed hash-join -> candidate diagonal bands (both strands) ->
   windowed Smith-Waterman with blastn scoring (ops/dp.py); E-value
   gate at 1e-15 via Karlin-Altschul (gapped 2/-3/5/2 params);
3. accept fragments with (length-gaps)/qlen > 0.7 and
   (length-gaps-mismatch)/qlen > 0.3 (anib.py:40-42);
4. identity = mean(pident)/100 with pident rounded to 3 decimals as
   blastn prints it; aln_length = sum(length-gaps);
   sim_errors = sum(mismatch+gaps); cov = aln_length / genome length
   (private_cli.py:1404-1416).
"""

from __future__ import annotations

import os
from math import exp, log

import numpy as np

from pyani_plus_tpu import __version__
from pyani_plus_tpu.genomes import Genome, complement_codes
from pyani_plus_tpu.methods import ComputeContext
from pyani_plus_tpu.ops.dp import AlignmentStats, local_align_stats
from pyani_plus_tpu.ops.seeds import SeedIndex, candidate_bands

NAME = "ANIb"
PROGRAM = "pyani-plus-tpu-anib"

FRAGSIZE = 1020  # ref anib.py:40
MIN_COVERAGE = 0.7
MIN_IDENTITY = 0.3
EVALUE = 1e-15
# Karlin-Altschul parameters for gapped blastn 2/-3, gap 5/2
KA_LAMBDA = 0.625
KA_K = 0.41

WINDOW_MARGIN = 150  # subject window slack around the seed band

# blastn's gapped X-drop (xdrop_gap 30 bits ~ 33 raw at lambda 0.625)
# abandons an extension crossing a run of Ns once the dip exceeds it:
# L consecutive ambiguous columns cost 3L raw, so runs of >= 12 can
# never be crossed and the HSP splits there. The reference's 28-N
# self-pair test depends on this: the N fragment's best HSP covers only
# 549/1020 < 0.7 and is dropped, leaving ANIb self-identity exactly 1.0
# (ref tests/test_self_vs_self.py:89). Shorter runs stay in-window and
# are crossed as mismatches, exactly like blastn.
N_BREAK_RUN = 12


def split_at_n_runs(
    codes: np.ndarray, min_run: int = N_BREAK_RUN
) -> list[tuple[int, np.ndarray]]:
    """(offset, piece) segments of codes split at non-ACGT runs >= min_run."""
    invalid = codes >= 4
    if not invalid.any():
        return [(0, codes)]
    # Run-length scan over the invalid mask.
    edges = np.flatnonzero(np.diff(invalid.astype(np.int8)))
    starts = np.concatenate(([0], edges + 1))
    ends = np.concatenate((edges + 1, [codes.size]))
    pieces: list[tuple[int, np.ndarray]] = []
    seg_start = 0
    for s, e in zip(starts, ends):
        if invalid[s] and e - s >= min_run:
            if s > seg_start:
                pieces.append((seg_start, codes[seg_start:s]))
            seg_start = e
    if codes.size > seg_start:
        pieces.append((seg_start, codes[seg_start:]))
    return pieces


def configuration(*, fragsize: int = FRAGSIZE) -> dict:
    return {
        "method": NAME,
        "program": PROGRAM,
        "version": __version__,
        "fragsize": fragsize,
    }


def fragment_genome(genome: Genome, fragsize: int) -> list[np.ndarray]:
    """Code-array fragments of <=fragsize, tails included (anib.py:58-88)."""
    fragments: list[np.ndarray] = []
    for rec in genome.records:
        for start in range(0, len(rec.codes), fragsize):
            fragments.append(rec.codes[start : start + fragsize])
    return fragments


def _min_score(qlen: int, subject_total: int, evalue: float = EVALUE) -> float:
    """Karlin-Altschul score threshold for the E-value cutoff."""
    search_space = max(qlen * subject_total, 1)
    return log(KA_K * search_space / evalue) / KA_LAMBDA


def fragment_candidates(
    frag: np.ndarray,
    subject_records: list[np.ndarray],
    seed_indexes: list[SeedIndex],
) -> list[tuple[np.ndarray, np.ndarray, int]]:
    """Candidate (strand_frag, window, w_lo) alignments of one fragment."""
    frag_rc = complement_codes(frag)[::-1].copy()
    candidates = []
    for codes, index in zip(subject_records, seed_indexes):
        for strand_frag in (frag, frag_rc):
            q_pos, s_pos = index.hits(strand_frag)
            for diag_lo, diag_hi, _count in candidate_bands(q_pos, s_pos):
                w_lo = max(0, diag_lo - WINDOW_MARGIN)
                w_hi = min(
                    codes.size, diag_hi + strand_frag.size + WINDOW_MARGIN
                )
                # Long-N runs are uncrossable for blastn (see N_BREAK_RUN):
                # enumerate the split pieces so the SW picks the best HSP
                # on either side, never a merged one.
                for _f_off, f_piece in split_at_n_runs(strand_frag):
                    for w_off, w_piece in split_at_n_runs(codes[w_lo:w_hi]):
                        candidates.append((f_piece, w_piece, w_lo + w_off))
    return candidates


def _score_host(pairs: list[tuple[np.ndarray, np.ndarray]]) -> list[int]:
    """Score-only pass per candidate via the native rolling-row DP."""
    from pyani_plus_tpu.native import local_align_score_native
    from pyani_plus_tpu.ops.dp import GAP_EXTEND, GAP_OPEN, PENALTY, REWARD

    scores = []
    for strand_frag, window in pairs:
        score = local_align_score_native(
            strand_frag, window, REWARD, PENALTY, GAP_OPEN, GAP_EXTEND
        )
        if score is None:  # pragma: no cover - no compiler
            stats = local_align_stats(strand_frag, window)
            score = 0 if stats is None else stats.score
        scores.append(int(score))
    return scores


DEVICE_BATCH = 128  # candidate pairs per device call (fixed compile shape)
MAX_DEVICE_WINDOW = 32768  # larger windows fall back to the host scorer


def use_device() -> bool:
    """Batched device scoring on by default off-CPU; env overridable."""
    flag = os.environ.get("PYANI_TPU_ANIB_DEVICE")
    if flag in ("0", "1"):
        return flag == "1"
    try:
        import jax

        return jax.default_backend() != "cpu"
    except Exception:  # pragma: no cover - no jax
        return False


def _score_device(pairs: list[tuple[np.ndarray, np.ndarray]]) -> list[int]:
    """Score all candidate (fragment, window) pairs in padded device batches.

    Pairs bucket by window length (next power of two, >=1024) so the jit
    kernel compiles for a handful of static (B, M, N) shapes; each bucket
    fills fixed-size batches of DEVICE_BATCH rows padded with PAD_CODE
    (never matches, so padding cannot change a local-alignment score --
    parity with the host scorer is tested). Oversized windows score on
    host.
    """
    from pyani_plus_tpu.ops.dp_jax import PAD_CODE, batch_local_align_scores

    scores = [0] * len(pairs)
    frag_m = max(f.size for f, _w in pairs)
    m = ((frag_m + 255) // 256) * 256
    buckets: dict[int, list[int]] = {}
    host_idx = []
    for i, (_f, w) in enumerate(pairs):
        n = 1024
        while n < w.size:
            n *= 2
        if n > MAX_DEVICE_WINDOW:
            host_idx.append(i)
        else:
            buckets.setdefault(n, []).append(i)
    for n, idxs in sorted(buckets.items()):
        for lo in range(0, len(idxs), DEVICE_BATCH):
            chunk = idxs[lo : lo + DEVICE_BATCH]
            q = np.full((DEVICE_BATCH, m), PAD_CODE, np.uint8)
            s = np.full((DEVICE_BATCH, n), PAD_CODE, np.uint8)
            for row, i in enumerate(chunk):
                frag, window = pairs[i]
                q[row, : frag.size] = frag
                s[row, : window.size] = window
            out = np.asarray(batch_local_align_scores(q, s))
            for row, i in enumerate(chunk):
                scores[i] = int(out[row])
    if host_idx:  # pragma: no cover - giant window corner
        for i, sc in zip(host_idx, _score_host([pairs[i] for i in host_idx])):
            scores[i] = sc
    return scores


def _best_stats(
    candidates: list[tuple[np.ndarray, np.ndarray, int]],
    scores: list[int] | None,
) -> AlignmentStats | None:
    """Exact stats DP on the winning candidate (first max on ties)."""
    if not candidates:
        return None
    if scores is not None and len(candidates) > 1:
        best_idx = max(range(len(candidates)), key=lambda i: scores[i])
    else:
        best_idx = 0
    strand_frag, window, w_lo = candidates[best_idx]
    stats = local_align_stats(strand_frag, window)
    if stats is None:
        return None
    return AlignmentStats(
        score=stats.score,
        length=stats.length,
        matches=stats.matches,
        mismatches=stats.mismatches,
        gaps=stats.gaps,
        gap_opens=stats.gap_opens,
        query_start=stats.query_start,
        query_end=stats.query_end,
        subject_start=w_lo + stats.subject_start,
        subject_end=w_lo + stats.subject_end,
    )


def best_fragment_alignment(
    frag: np.ndarray,
    subject_records: list[np.ndarray],
    seed_indexes: list[SeedIndex],
) -> AlignmentStats | None:
    """Best local alignment of one fragment over all subject sequences/strands."""
    candidates = fragment_candidates(frag, subject_records, seed_indexes)
    scores = None
    if len(candidates) > 1:
        scores = _score_host([(f, w) for f, w, _lo in candidates])
    return _best_stats(candidates, scores)


def compute_pair(
    query: Genome,
    subject: Genome,
    seed_indexes: list[SeedIndex],
    fragsize: int,
) -> tuple[float | None, int | None, int | None]:
    """(identity, aln_length, sim_errors) for one directed pair.

    Candidate windows for every fragment are enumerated first, then all
    fragments with more than one candidate are scored in one sweep --
    padded fixed-shape device batches when a TPU/GPU backend is up
    (ops/dp_jax.py), the native C++ rolling-row DP otherwise. The exact
    stats DP runs once per fragment on the winning window only, so the
    device path changes throughput, never results (same scores, same
    first-max tie rule).
    """
    subject_records = [rec.codes for rec in subject.records]
    frags = fragment_genome(query, fragsize)
    per_frag = [
        fragment_candidates(frag, subject_records, seed_indexes)
        for frag in frags
    ]
    flat: list[tuple[np.ndarray, np.ndarray]] = []
    spans = []  # (start, count) into flat per fragment, or None
    for cands in per_frag:
        if len(cands) > 1:
            spans.append((len(flat), len(cands)))
            flat.extend((f, w) for f, w, _lo in cands)
        else:
            spans.append(None)
    flat_scores = (
        (_score_device(flat) if use_device() else _score_host(flat))
        if flat
        else []
    )

    total_pid_100 = 0.0
    total_count = 0
    total_aln_length = 0
    total_sim_errors = 0
    for frag, cands, span in zip(frags, per_frag, spans):
        scores = None
        if span is not None:
            start, count = span
            scores = flat_scores[start : start + count]
        stats = _best_stats(cands, scores)
        if stats is None:
            continue
        if stats.score < _min_score(frag.size, subject.length):
            continue
        ani_alnlen = stats.length - stats.gaps
        ani_query_coverage = ani_alnlen / frag.size
        ani_pid = (ani_alnlen - stats.mismatches) / frag.size
        if ani_query_coverage > MIN_COVERAGE and ani_pid > MIN_IDENTITY:
            total_aln_length += ani_alnlen
            total_sim_errors += stats.mismatches + stats.gaps
            # blastn prints pident with 3 decimals; parse re-reads it
            total_pid_100 += float(f"{stats.pident:.3f}")
            total_count += 1
    if not total_count:
        return None, None, None
    return (
        total_pid_100 / (total_count * 100),
        total_aln_length,
        total_sim_errors,
    )


def compute(ctx: ComputeContext) -> list[dict]:
    fragsize = ctx.config.get("fragsize") or FRAGSIZE
    rows: list[dict] = []
    subjects = sorted({s for _q, s in ctx.pending})
    try:
        _compute_all(ctx, rows, subjects, fragsize)
    except KeyboardInterrupt:
        ctx.interrupted = True
        ctx.logger.error("Interrupted with %d completed comparisons", len(rows))
    return rows


def _compute_all(ctx, rows, subjects, fragsize):
    for subject_hash in subjects:
        subject = ctx.genomes[subject_hash]
        seed_indexes = [SeedIndex(rec.codes) for rec in subject.records]
        for query_hash in sorted(q for q, s in ctx.pending if s == subject_hash):
            query = ctx.genomes[query_hash]
            identity, aln_length, sim_errors = compute_pair(
                query, subject, seed_indexes, fragsize
            )
            rows.append(
                {
                    "query_hash": query_hash,
                    "subject_hash": subject_hash,
                    "identity": identity,
                    "aln_length": aln_length,
                    "sim_errors": sim_errors,
                    "cov_query": None
                    if aln_length is None
                    else aln_length / query.length,
                    "cov_subject": None
                    if aln_length is None
                    else aln_length / subject.length,
                }
            )
            ctx.tick()
            ctx.maybe_flush(rows)
