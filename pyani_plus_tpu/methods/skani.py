"""skani: sparse chained k-mer ANI + aligned-fraction estimation.

Replaces the skani Rust binary (``skani dist -r subject -q query
--fast|--medium|--slow|--small-genomes``, reference invocation
private_cli.py:2113-2126). skani's model: sample k-mers sparsely
(FracMinHash compression factor c), chain shared seeds into syntenic
blocks, estimate ANI from the fraction of the query's sampled k-mers
inside chained blocks that match the reference -- identity ~=
(matched/total)^(1/k) -- and report the aligned fraction of each genome.

Parameters follow skani: k=15; compression c per mode (fast 125,
medium 70, slow 30, small-genomes 30). Like skani, output is reported
at 2 decimal places in percent and pairs with too little homology give
no output (identity None, ref skani.py:33-85). Numeric parity with the
Rust implementation is approximate (same model, different chaining
details); the reference stores only identity/cov_query/cov_subject for
this method (private_cli.py:2090-2101).
"""

from __future__ import annotations

import numpy as np

from pyani_plus_tpu import __version__
from pyani_plus_tpu.genomes import Genome, decode_sequence
from pyani_plus_tpu.methods import ComputeContext
from pyani_plus_tpu.native import sketch_codes_native
from pyani_plus_tpu.ops.kmers import canonical_kmer_hashes

NAME = "skani"
PROGRAM = "pyani-plus-tpu-skani"

KMER = 15
MODE_C = {"fast": 125, "medium": 70, "slow": 30, "small-genomes": 30}
DEFAULT_MODE = "fast"
MIN_AF = 0.15  # skani's default screening threshold on aligned fraction
CHAIN_GAP = 5000  # max gap between chained seeds (bases)


def configuration(*, mode: str = DEFAULT_MODE) -> dict:
    return {
        "method": NAME,
        "program": PROGRAM,
        "version": __version__,
        "mode": mode,
    }


def _sampled_kmers(genome: Genome, c: int) -> tuple[np.ndarray, np.ndarray]:
    """(hashes, positions) of FracMinHash-sampled canonical k-mers."""
    max_hash = (2**64 - 1) // c
    hashes_all = []
    pos_all = []
    offset = 0
    for rec in genome.records:
        h = canonical_kmer_hashes(rec.codes, KMER)
        if h.size:
            keep = h <= np.uint64(max_hash)
            idx = np.nonzero(keep)[0]
            hashes_all.append(h[idx])
            pos_all.append(idx + offset)
        offset += len(rec) + 1
    if not hashes_all:
        return np.empty(0, np.uint64), np.empty(0, np.int64)
    return np.concatenate(hashes_all), np.concatenate(pos_all)


def _chained_blocks(
    q_pos: np.ndarray, s_pos: np.ndarray, gap: int
) -> list[tuple[int, int, int, int, int]]:
    """Greedy diagonal chaining of (q, s) seed matches into blocks.

    Returns (q_lo, q_hi, s_lo, s_hi, n_seeds) per block.
    """
    if q_pos.size == 0:
        return []
    order = np.lexsort((s_pos, q_pos))
    qs, ss = q_pos[order], s_pos[order]
    blocks = []
    bq_lo, bs_lo = int(qs[0]), int(ss[0])
    bq_hi, bs_hi = bq_lo, bs_lo
    count = 1
    for i in range(1, qs.size):
        dq = int(qs[i]) - bq_hi
        ds = int(ss[i]) - bs_hi
        if 0 <= dq <= gap and -gap <= ds <= gap:
            bq_hi, bs_hi = int(qs[i]), int(ss[i])
            count += 1
        else:
            blocks.append((bq_lo, bq_hi, bs_lo, bs_hi, count))
            bq_lo, bs_lo = int(qs[i]), int(ss[i])
            bq_hi, bs_hi = bq_lo, bs_lo
            count = 1
    blocks.append((bq_lo, bq_hi, bs_lo, bs_hi, count))
    return [b for b in blocks if b[4] >= 3]


def compute_pair(query: Genome, subject: Genome, mode: str) -> dict:
    c = MODE_C.get(mode, 125)
    q_hash, q_pos = _sampled_kmers(query, c)
    s_hash, s_pos = _sampled_kmers(subject, c)
    null = {
        "identity": None,
        "aln_length": None,
        "sim_errors": None,
        "cov_query": None,
        "cov_subject": None,
    }
    if q_hash.size == 0 or s_hash.size == 0:
        return null

    # Hash join (first occurrence per hash on the subject side)
    order = np.argsort(s_hash, kind="stable")
    sh, sp = s_hash[order], s_pos[order]
    lo = np.searchsorted(sh, q_hash, side="left")
    hi = np.searchsorted(sh, q_hash, side="right")
    has = hi > lo
    if not has.any():
        return null
    qm = q_pos[has]
    sm = sp[lo[has]]

    blocks = _chained_blocks(qm, sm, CHAIN_GAP)
    if not blocks:
        return null

    # Matched/total sampled kmers within the chained query regions
    matched = sum(b[4] for b in blocks)
    total = 0
    covered_q = 0
    covered_s = 0
    for q_lo, q_hi, s_lo, s_hi, _n in blocks:
        in_block = (q_pos >= q_lo) & (q_pos <= q_hi)
        total += int(in_block.sum())
        covered_q += q_hi - q_lo + KMER
        covered_s += abs(s_hi - s_lo) + KMER
    if total == 0:
        return null
    frac = min(1.0, matched / total)
    ani = frac ** (1.0 / KMER)

    af_query = min(1.0, covered_q / query.length)
    af_ref = min(1.0, covered_s / subject.length)
    if max(af_query, af_ref) < MIN_AF:
        return null  # skani reports nothing below its screen threshold

    # skani prints ANI and aligned fractions at 2 dp (percent)
    identity = float(f"{100 * ani:.2f}") / 100
    cov_query = float(f"{100 * af_query:.2f}") / 100
    cov_subject = float(f"{100 * af_ref:.2f}") / 100
    return {
        "identity": identity,
        "aln_length": None,
        "sim_errors": None,
        "cov_query": cov_query,
        "cov_subject": cov_subject,
    }


def compute(ctx: ComputeContext) -> list[dict]:
    mode = ctx.config.get("mode") or DEFAULT_MODE
    from pyani_plus_tpu.methods import run_pairwise

    return run_pairwise(
        ctx,
        lambda q, s: compute_pair(ctx.genomes[q], ctx.genomes[s], mode),
    )
