"""Block-level parity vs nucmer: every alignment bit-identical.

The fixture ``.filter`` files are ``nucmer | delta-filter`` output
(reference invocation private_cli.py:1194-1224 for ANIm ``--mum -1``,
:1664-1692 for dnadiff ``--maxmatch -m``). Each block records the
coordinates, total error count, and the full indel-column list, so
comparing (ref_start, ref_end, qry_start, qry_end, errors, n_indels)
pins our whole seed-chain-extend pipeline -- suffix-array MUM seeding,
mgaps clustering, affine-gap banded fill/extension, and the
delta-filter analogues -- against the real tool's alignments.
"""

from pathlib import Path

import pytest

from pyani_plus_tpu.genomes import load_genome
from pyani_plus_tpu.methods.anim import align_sequences
from pyani_plus_tpu.ops.chaining import many_to_many, one_to_one

FIXTURES = Path("/root/reference/tests/fixtures")
SETS = [
    (
        "viral_example",
        {
            "689d3fd6881db36b5e08329cf23cecdd": "MGV-GENOME-0264574.fas",
            "78975d5144a1cd12e98898d573cf6536": "MGV-GENOME-0266457.fna",
            "5584c7029328dc48d33f95f0a78f7e57": "OP073605.fasta",
        },
    ),
    (
        "bad_alignments",
        {
            "689d3fd6881db36b5e08329cf23cecdd": "MGV-GENOME-0264574.fas",
            "a30481565b45f6bbc6ce5260503067e0": "MGV-GENOME-0357962.fna",
        },
    ),
]


def parse_filter(path: Path) -> list[tuple[int, ...]]:
    """Delta blocks as (s1, e1, s2, e2, errors, indel_columns)."""
    out: list[list[int]] = []
    cur = None
    for ln in path.read_text().splitlines()[2:]:
        parts = ln.split()
        if len(parts) == 7:
            s1, e1, s2, e2, err, _sim, _stp = (int(x) for x in parts)
            cur = [s1, e1, s2, e2, err, 0]
            out.append(cur)
        elif len(parts) == 1 and cur is not None and int(parts[0]) != 0:
            cur[5] += 1
    return sorted(tuple(c) for c in out)


@pytest.mark.parametrize(
    ("subdir", "mode", "filt"),
    [("ANIm", "mum", one_to_one), ("dnadiff", "maxmatch", many_to_many)],
)
@pytest.mark.parametrize("fixset", [s[0] for s in SETS])
def test_blocks_bit_identical(fixset: str, subdir: str, mode: str, filt) -> None:
    files = dict(SETS)[fixset]
    fxdir = FIXTURES / fixset
    if not fxdir.is_dir():
        pytest.skip("reference fixtures not available")
    genomes = {h: load_genome(fxdir / fn) for h, fn in files.items()}
    for qh in sorted(files):
        for sh in sorted(files):
            expected = parse_filter(
                fxdir / "intermediates" / subdir / f"{qh}_vs_{sh}.filter"
            )
            ours = []
            for s_rec in genomes[sh].records:
                for q_rec in genomes[qh].records:
                    blocks = align_sequences(s_rec.codes, q_rec.codes, mode=mode)
                    for a in filt(blocks):
                        if a.reverse:
                            qc = (a.qry_end, a.qry_start + 1)
                        else:
                            qc = (a.qry_start + 1, a.qry_end)
                        ours.append(
                            (a.ref_start + 1, a.ref_end, *qc, a.errors, a.gap_columns)
                        )
            assert sorted(ours) == expected, f"{qh} vs {sh} ({subdir})"
