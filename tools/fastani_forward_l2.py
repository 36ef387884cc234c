"""Forward (code-literal) MashMap-v1 L2 slide reconstruction experiment.

VERDICT r4 item 2: stop forensic variant sweeps and write the L2 stage
the way the published MashMap algorithm states it -- L1 candidate
intervals from the minimizer-hit threshold, then an L2 slide whose
windows are ANCHORED AT REFERENCE INDEX ENTRIES with membership decided
by each entry's PICK POSITION (the wpos stored in the winnowed index),
not by pick-run intersection. The production evaluator
(ops/fastani_map.py) computes the exact window maximum over run
intersections, which provably cannot dip below J=1 on a self pair; the
fixtures show fastANI's own slide DOES dip (MIBY01000011 self =
99.9953), i.e. some window at the aligned position loses sketch hashes.
Point membership loses exactly the runs that started before the window
anchor -- the candidate mechanism this experiment tests.

Oracles (run as __main__):
  1. MIBY01000011 self pair -> fastANI prints 99.9953 (one fragment at
     reduced J, 6/6 retained after bin dedup);
  2. MIBY01000005 self pair -> prints 100 (at %.6g);
  3. bacterial self pairs -> print 100 (at %.6g, deficit < ~0.09 total);
  4. viral cross pairs -> retained counts / ANI vs fixture .fastani.

Usage:
    JAX_PLATFORMS=cpu python tools/fastani_forward_l2.py [--span N] [--set miby|viral|bacterial]
"""

from __future__ import annotations

import sys
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from pyani_plus_tpu.genomes import decode_sequence, load_genome
from pyani_plus_tpu.ops.fastani_map import (
    FRAG_LEN,
    KMER_SIZE,
    WINDOW_SIZE,
    FragmentMapping,
    RefIndex,
    _finish_mapping,
    n_window_steps,
    ref_bin_filter,
)
from pyani_plus_tpu.ops.minimizers import window_minimizers

FIXTURES = Path("/root/reference/tests/fixtures")
import os
EVAL_DELETIONS = os.environ.get("FWD_DELETIONS", "0") == "1"


class FwdIndex:
    """Per-sequence (hash, k-mer position) winnowed index.

    MashMap's MinimizerInfo.wpos is the position of the minimizing
    K-MER (not the pick-run's window-step start): the deque pushes
    (hash, kmer_pos) and addMinimizers records that pair when it
    changes. Window membership in the L2 slide is therefore decided by
    the k-mer position -- a pick run that STARTED before the window
    start is still a member when its minimizing k-mer lies inside.
    """

    def __init__(self, seqs: list[bytes], k: int, w: int) -> None:
        self.seqs: list[tuple[np.ndarray, np.ndarray]] = []
        for seq in seqs:
            mins = window_minimizers(seq, k, w)
            # positions strictly increase run to run
            self.seqs.append((mins.hashes, mins.positions))


def forward_map_fragment(  # noqa: PLR0913, C901
    query_hashes: np.ndarray,
    ref: "FwdIndex",
    span: int,  # window span in position units (Q.len = 3000 in MashMap)
    s: int,
    fragment_id: int,
) -> tuple[int, int, int]:
    """(best_shared, best_anchor_pos, best_seq) under the forward model.

    L1: hits = index entries whose hash is in the fragment sketch;
    candidate regions = maximal per-sequence hit groups with consecutive
    gaps < span. L2: windows anchored at EVERY index entry position in
    [rangeStart, rangeEnd]; membership = entries with position in
    [anchor, anchor + span); shared = |top-s union that is in both|.
    Plateau: the LAST anchor achieving the maximum is reported.
    """
    qh_sorted = np.sort(query_hashes)
    best_shared, best_anchor, best_seq = 0, -1, -1
    for sid, (seq_hash, seq_pos) in enumerate(ref.seqs):
        if seq_hash.size == 0:
            continue
        hit_mask = np.isin(seq_hash, qh_sorted)
        t_hits = seq_pos[hit_mask]
        if t_hits.size == 0:
            continue
        breaks = np.nonzero(np.diff(t_hits) >= span)[0]
        starts = np.concatenate(([0], breaks + 1))
        ends = np.concatenate((breaks, [t_hits.size - 1]))
        for a_i, b_i in zip(starts, ends):
            lo_p, hi_p = int(t_hits[a_i]), int(t_hits[b_i])
            e_lo = np.searchsorted(seq_pos, lo_p, side="left")
            e_hi = np.searchsorted(seq_pos, hi_p, side="right")
            anchors = seq_pos[e_lo:e_hi]
            if anchors.size == 0:
                continue
            if EVAL_DELETIONS:
                # evaluate at deletion events too: window starts just
                # past a leaving entry (exact max over ALL positions
                # under point membership)
                dele = seq_pos[
                    (seq_pos >= lo_p - span) & (seq_pos <= hi_p)
                ] + 1
                anchors = np.unique(np.concatenate([anchors, dele]))
                anchors = anchors[(anchors >= lo_p - span) & (anchors <= hi_p)]
            w_lo = np.searchsorted(seq_pos, anchors, side="left")
            w_hi = np.searchsorted(seq_pos, anchors + span, side="left")
            for pos_i in range(anchors.size):
                members = seq_hash[w_lo[pos_i] : w_hi[pos_i]]
                shared = _top_s_shared(qh_sorted, members, s)
                if shared > best_shared or (
                    shared == best_shared and shared > 0 and sid == best_seq
                ):
                    best_shared = shared
                    best_anchor = int(anchors[pos_i])
                    best_seq = sid
    return best_shared, best_anchor, best_seq


def _top_s_shared(qh_sorted: np.ndarray, members: np.ndarray, s: int) -> int:
    """|S_s(W(A) u B) n W(A) n B| with S_s = s smallest of the union."""
    if members.size == 0:
        return 0
    bu = np.unique(members)
    union = np.union1d(qh_sorted, bu)
    top = union[:s]
    in_q = np.isin(top, qh_sorted, assume_unique=True)
    in_b = np.isin(top, bu, assume_unique=True)
    return int((in_q & in_b).sum())


def run_pair(  # noqa: PLR0913
    query_path: Path,
    ref_path: Path,
    span: int = FRAG_LEN,
    fragsize: int = FRAG_LEN,
    k: int = KMER_SIZE,
    w: int = WINDOW_SIZE,
) -> tuple[float | None, int, int, list]:
    """(ani_pct, retained, total_frags, per_fragment detail)."""
    query = load_genome(query_path)
    ref_g = load_genome(ref_path)
    ref = FwdIndex([decode_sequence(r.codes) for r in ref_g.records], k, w)
    frags = []
    for rec in query.records:
        seq = decode_sequence(rec.codes)
        for st in range(0, len(seq) - fragsize + 1, fragsize):
            frags.append(seq[st : st + fragsize])
    mappings: list[FragmentMapping] = []
    detail = []
    for fid, frag in enumerate(frags):
        mins = window_minimizers(frag, k, w)
        if mins.count == 0:
            continue
        qh = np.unique(mins.hashes)
        s = int(qh.size)
        shared, anchor, sid = forward_map_fragment(qh, ref, span, s, fid)
        detail.append((fid, shared, s, anchor, sid))
        mp = _finish_mapping(shared, anchor + (w - 1), sid, s, k, 80.0, fid)
        if mp is not None:
            mappings.append(mp)
    kept = ref_bin_filter(mappings, fragsize, w)
    if not kept:
        return None, 0, len(frags), detail
    ani = float(np.mean([mp.identity for mp in kept]))
    return ani, len(kept), len(frags), detail


def main() -> None:
    span = FRAG_LEN
    which = "miby"
    args = sys.argv[1:]
    if "--span" in args:
        span = int(args[args.index("--span") + 1])
    if "--set" in args:
        which = args[args.index("--set") + 1]
    if which == "miby":
        for name in ("MIBY01000011.fasta", "MIBY01000005.fasta"):
            p = FIXTURES / name
            ani, kept, total, detail = run_pair(p, p, span=span)
            dips = [(fid, sh, s) for fid, sh, s, _a, _sid in detail if sh < s]
            print(
                f"{name} self span={span}: ANI={ani:.6g} kept={kept}/{total} "
                f"dips={dips}"
            )
    elif which == "viral":
        names = sorted(
            p for ext in (".fasta", ".fas", ".fna")
            for p in (FIXTURES / "viral_example").glob(f"*{ext}")
        )
        for q in names:
            for r in names:
                ani, kept, total, _ = run_pair(q, r, span=span)
                print(
                    f"{q.stem} vs {r.stem}: ANI={'None' if ani is None else f'{ani:.6g}'} "
                    f"kept={kept}/{total}"
                )
    elif which == "bacterial":
        for p in sorted((FIXTURES / "bacterial_example").glob("*.gz")):
            ani, kept, total, detail = run_pair(p, p, span=span)
            dipn = sum(1 for _f, sh, s, _a, _s2 in detail if sh < s)
            print(f"{p.name} self: ANI={ani:.6g} kept={kept}/{total} dip_frags={dipn}")


if __name__ == "__main__":
    main()
