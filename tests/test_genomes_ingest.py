"""Genome ingest edge cases: encoding, gzip, hashing, directory checks.

Mirrors the reference's db_genome/utils ingest behaviour: MD5 is over
the DECOMPRESSED content (so .gz and plain forms of one genome share an
identity and cached comparisons survive re-compression), sequences
encode case-insensitively with every non-ACGT byte as an ambiguity
code, and directory scanning accepts exactly the reference's FASTA
extensions.
"""

import gzip
import logging
from pathlib import Path

import numpy as np
import pytest

from pyani_plus_tpu.genomes import (
    complement_codes,
    decode_sequence,
    encode_sequence,
    load_genome,
)
from pyani_plus_tpu.utils import (
    check_fasta,
    fasta_bytes_iterator,
    file_md5sum,
    filename_stem,
    str_md5sum,
)

LOGGER = logging.getLogger("test")


def test_encode_case_insensitive_and_ambiguity() -> None:
    codes = encode_sequence(b"ACGTacgtNRYSWn")
    assert codes[:4].tolist() == [0, 1, 2, 3]
    assert codes[4:8].tolist() == [0, 1, 2, 3]  # lowercase identical
    assert (codes[8:] >= 4).all()  # every ambiguity byte is >= 4


def test_decode_round_trip() -> None:
    assert decode_sequence(encode_sequence(b"ACGTN")) == b"ACGTN"


def test_complement_maps_acgt_and_preserves_ambiguity() -> None:
    codes = encode_sequence(b"ACGTN")
    comp = complement_codes(codes)
    assert decode_sequence(comp[:4]) == b"TGCA"
    assert comp[4] >= 4  # N complements to an ambiguity code


def test_load_genome_plain_and_gzip_same_content(tmp_path) -> None:
    """Identical sequences load identically from .fasta and .fasta.gz,
    with the SAME MD5: hashing is over decompressed content (reference
    utils.py:142-196), so re-compressing never invalidates cached
    comparisons."""
    text = ">rec1 first\nACGTACGTAC\n>rec2 second\nTTTTCCCC\n"
    plain = tmp_path / "g.fasta"
    plain.write_text(text)
    zipped = tmp_path / "g.fasta.gz"
    zipped.write_bytes(gzip.compress(text.encode()))
    g1 = load_genome(plain)
    g2 = load_genome(zipped)
    assert g1.length == g2.length == 18
    assert g1.n_sequences == g2.n_sequences == 2
    assert np.array_equal(g1.records[0].codes, g2.records[0].codes)
    assert g1.md5 == file_md5sum(plain)
    assert g2.md5 == file_md5sum(zipped)
    assert g1.md5 == g2.md5


def test_load_genome_description_is_first_title(tmp_path) -> None:
    f = tmp_path / "g.fasta"
    f.write_text(">chr1 some description here\nACGT\n>chr2\nACGT\n")
    g = load_genome(f)
    assert g.description == "chr1 some description here"
    assert g.records[0].identifier == b"chr1"


def test_load_genome_missing_file_errors(tmp_path) -> None:
    with pytest.raises(ValueError, match="not found"):
        load_genome(tmp_path / "nope.fasta")


def test_broken_symlink_named_in_error(tmp_path) -> None:
    link = tmp_path / "link.fasta"
    link.symlink_to(tmp_path / "gone.fasta")
    with pytest.raises(ValueError, match="broken symlink"):
        load_genome(link)


def test_load_genome_non_fasta_gzip_errors(tmp_path) -> None:
    """A gzip file whose content is not FASTA is rejected (the reference
    only applies the record check in its gzip branch)."""
    f = tmp_path / "bad.fasta.gz"
    f.write_bytes(gzip.compress(b"this is not fasta\n"))
    with pytest.raises(ValueError, match="FASTA"):
        load_genome(f)


def test_fasta_bytes_iterator_multi_record(tmp_path) -> None:
    f = tmp_path / "multi.fasta"
    f.write_text(">a x\nAC\nGT\n\n>b y\nTT\n")
    with f.open("rb") as handle:
        records = list(fasta_bytes_iterator(handle))
    assert records == [(b"a x", b"ACGT"), (b"b y", b"TT")]


def test_filename_stem_strips_gz_and_extension() -> None:
    assert filename_stem("NC_002696.fasta.gz") == "NC_002696"
    assert filename_stem("genome.fna") == "genome"
    assert filename_stem("a.b.fasta") == "a.b"


def test_str_md5sum_known_value() -> None:
    # md5("") is the canonical empty digest
    assert str_md5sum("") == "d41d8cd98f00b204e9800998ecf8427e"


def test_check_fasta_extensions_and_empty_dir(tmp_path) -> None:
    """Exactly the reference's FASTA extensions are collected; an empty
    directory is a hard error."""
    for name in ("a.fasta", "b.fas", "c.fna", "c.fna.gz"):
        (tmp_path / name).write_text(">x\nACGT\n")
    (tmp_path / "skip.txt").write_text("no")
    (tmp_path / "skip.fastq").write_text("@no\nACGT\n+\nIIII\n")
    found = {p.name for p in check_fasta(LOGGER, tmp_path)}
    assert found == {"a.fasta", "b.fas", "c.fna", "c.fna.gz"}
    empty = tmp_path / "empty"
    empty.mkdir()
    with pytest.raises(SystemExit):
        check_fasta(LOGGER, empty)


def test_check_fasta_missing_directory_errors(tmp_path) -> None:
    with pytest.raises(SystemExit):
        check_fasta(LOGGER, tmp_path / "nope")


def test_all_n_genome_loads_with_ambiguous_codes(tmp_path) -> None:
    f = tmp_path / "n.fasta"
    f.write_text(">n\n" + "N" * 100 + "\n")
    g = load_genome(f)
    assert g.length == 100
    assert (np.asarray(g.records[0].codes) >= 4).all()
