"""ANIminimap2 junk-pair residue: inner-scan skip ORDER experiment.

VERDICT r4 item 8: the only remaining ANIminimap2 deviation sits on the
~11-15%-"identity" no-homology bacterial pairs (residual cap 6.6e-4
identity / 0.78% aln), and every kernel-semantic flag tested so far
(dq<=0 rejection, always-inner-scan, open window bound) is a no-op.
The repo's own named suspects are the dynamic-tree eviction schedule
and the SKIP-MARKING ORDER on sparse junk anchors. This experiment
measures the latter: minimap2's mg_chain_dp inner loop iterates
predecessors by DESCENDING INDEX (x-major); the production kernel
iterates the inner scan by DESCENDING Y (round-3 calibration). On
dense homologous anchors the two orders visit near-identical sets
before the skip counter trips; on sparse junk anchors they diverge.

Runs the four no-homology direction pairs under both orders
(native mm2.cpp RMQ flag bit 8) and prints per-pair identity/aln
residuals vs the fixture matrices.

Usage: JAX_PLATFORMS=cpu python tools/mm2_junk_residue_experiment.py
"""

from __future__ import annotations

import sys
from pathlib import Path

import pandas as pd

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from pyani_plus_tpu.genomes import load_genome
from pyani_plus_tpu.methods import animinimap2 as m2
from pyani_plus_tpu.ops import mm2 as mm2ops
from pyani_plus_tpu.utils import filename_stem

FIXTURES = Path("/root/reference/tests/fixtures/bacterial_example")

# the no-homology pairs (fixture identity ~0.11-0.15, aln ~1-4%)
JUNK = [
    ("NC_014100", "NC_002696"),
    ("NC_002696", "NC_014100"),
    ("NC_014100", "NC_011916"),
    ("NC_011916", "NC_014100"),
]


def main() -> None:
    names = {filename_stem(p.name): p for p in FIXTURES.glob("*.gz")}
    exp_i = pd.read_csv(
        FIXTURES / "matrices/ANIminimap2_identity.tsv", sep="\t", index_col=0
    )
    exp_a = pd.read_csv(
        FIXTURES / "matrices/ANIminimap2_aln_lengths.tsv", sep="\t", index_col=0
    )
    genomes = {s: load_genome(p) for s, p in names.items()}
    idx_cache: dict[str, tuple] = {}
    for flags, label in ((1, "desc-y (production)"), (1 | 8, "desc-index (mg_chain_dp order)")):
        mm2ops.RMQ_FLAGS = flags
        print(f"== inner scan {label} (flags={flags})")
        for qs, ss in JUNK:
            if ss not in idx_cache:
                idx_cache.clear()  # one index at a time (memory)
                idx_cache[ss] = m2.build_subject_index(genomes[ss], "asm20")
            res = m2.compute_pair(
                genomes[qs], genomes[ss], "asm20", subject_index=idx_cache[ss]
            )
            want_i = float(exp_i.loc[qs, ss])
            want_a = int(exp_a.loc[qs, ss])
            got_i = res["identity"] or 0.0
            got_a = res["aln_length"] or 0
            print(
                f"  {qs} vs {ss}: identity {got_i:.6f} (want {want_i:.6f}, "
                f"d={got_i - want_i:+.6f})  aln {got_a} (want {want_a}, "
                f"d={got_a - want_a:+d} = {100*(got_a-want_a)/want_a:+.2f}%)"
            )


if __name__ == "__main__":
    main()
