"""dnadiff/delta-filter unit pieces: qdiff feature walk, chain filters.

The qdiff feature classes (BRK/GAP/DUP/INV) and the delta-filter
one_to_one/many_to_many set algebra are the parts of the dnadiff recipe
that silently change AlignedBases when wrong -- the fixture-level tests
only see the aggregate, so these pin the walk rules directly
(reference semantics: show-diff -qH rows, dnadiff.py:70-79;
delta-filter -1/-m LIS per axis).
"""

from pyani_plus_tpu.methods.dnadiff import qdiff_features
from pyani_plus_tpu.ops.chaining import Alignment, many_to_many, one_to_one


def _aln(rs, re, qs, qe, errors=0, reverse=False):
    return Alignment(
        ref_start=rs, ref_end=re, qry_start=qs, qry_end=qe,
        errors=errors, reverse=reverse,
    )


def test_qdiff_empty_and_full_cover() -> None:
    assert qdiff_features([], 1000) == []
    assert qdiff_features([_aln(0, 1000, 0, 1000)], 1000) == []


def test_qdiff_brk_at_both_ends() -> None:
    feats = qdiff_features([_aln(100, 900, 50, 850)], 1000)
    assert feats == [("BRK", 50), ("BRK", 150)]


def test_qdiff_gap_between_blocks() -> None:
    feats = qdiff_features(
        [_aln(0, 400, 0, 400), _aln(500, 900, 450, 850)], 850
    )
    assert feats == [("GAP", 50)]


def test_qdiff_negative_gap_for_overlap() -> None:
    feats = qdiff_features(
        [_aln(0, 400, 0, 400), _aln(500, 900, 380, 780)], 780
    )
    assert feats == [("GAP", -20)]


def test_qdiff_dup_when_reference_rewinds() -> None:
    """Reference walking backwards while the query advances = DUP, whose
    gap parse_qdiff excludes from the gap total."""
    feats = qdiff_features(
        [_aln(0, 400, 0, 400), _aln(100, 300, 420, 620)], 620
    )
    assert feats == [("DUP", 20)]


def test_qdiff_inv_on_strand_flip() -> None:
    feats = qdiff_features(
        [_aln(0, 400, 0, 400), _aln(500, 900, 450, 850, reverse=True)], 850
    )
    assert feats == [("INV", 50)]


def _with_nested_repeat():
    # Three consistent blocks plus a NESTED repeat: its ref interval sits
    # strictly inside block a's, so the two cannot both lie on a
    # monotone (starts and ends non-decreasing) ref-axis chain -- the
    # delta-filter conflict case. On the query axis it chains fine after
    # block c.
    a = _aln(0, 100, 0, 100)
    b = _aln(100, 200, 100, 200)
    c = _aln(200, 300, 200, 300)
    nested = _aln(20, 80, 400, 460)
    return a, b, c, nested


def test_one_to_one_drops_nested_repeat_many_keeps_it() -> None:
    """-1 (intersection of axis chains) drops a ref-nested repeat that
    -m (union) keeps via its query-axis chain -- the exact reason dnadiff
    uses -m and reports more AlignedBases than ANIm."""
    a, b, c, nested = _with_nested_repeat()
    o2o = one_to_one([a, b, c, nested])
    m2m = many_to_many([a, b, c, nested])
    assert {id(x) for x in o2o} == {id(a), id(b), id(c)}
    assert {id(x) for x in m2m} == {id(a), id(b), id(c), id(nested)}


def test_chain_allows_overlap_but_not_nesting() -> None:
    """Overlapping blocks with non-decreasing starts AND ends co-chain
    (delta-filter default overlap tolerance); nesting never does."""
    big = _aln(0, 100, 0, 100)
    overlapping = _aln(50, 150, 50, 150)
    kept = one_to_one([big, overlapping])
    assert len(kept) == 2
    nested = _aln(20, 80, 20, 80)
    kept = one_to_one([big, nested])
    assert len(kept) == 1


def test_one_to_one_groups_by_sequence_keys() -> None:
    """With per-alignment (ref_id, qry_id) keys, chains are per
    sequence: a ref-nested pair only conflicts on the SAME contig."""
    a = _aln(0, 100, 0, 100)
    nested = _aln(20, 80, 400, 460)
    same = one_to_one([a, nested], keys=[(0, 0), (0, 0)])
    assert {id(x) for x in same} == {id(a)}
    different = one_to_one([a, nested], keys=[(0, 0), (1, 1)])
    assert len(different) == 2


def test_alignment_identity_and_columns() -> None:
    block = Alignment(
        ref_start=0, ref_end=100, qry_start=0, qry_end=98,
        errors=5, gap_columns=2,
    )
    assert block.columns == 100
    assert abs(block.identity - (198 - 10) / 198) < 1e-12
    assert block.char_errors == 5
    masked = Alignment(
        ref_start=0, ref_end=10, qry_start=0, qry_end=10,
        errors=3, nonid=1,
    )
    assert masked.char_errors == 1  # N-vs-N columns not char-different
