"""Tests for pyani_plus_tpu.utils: FASTA parsing, MD5 identity, stems.

Oracle values come from the reference's own doctests/fixtures
(pyani_plus/utils.py docstrings).
"""

from pathlib import Path

import pytest

from pyani_plus_tpu.utils import (
    fasta_bytes_iterator,
    file_md5sum,
    filename_stem,
    str_md5sum,
)


def test_fasta_bytes_iterator(viral_example: Path) -> None:
    with (viral_example / "OP073605.fasta").open("rb") as handle:
        records = list(fasta_bytes_iterator(handle))
    assert len(records) == 1
    title, seq = records[0]
    assert title == (
        b"OP073605.1 MAG: Bacteriophage sp. isolate 0984_12761, complete genome"
    )
    assert len(seq) == 57793


def test_fasta_bytes_iterator_requires_binary(viral_example: Path) -> None:
    with (viral_example / "OP073605.fasta").open() as handle:
        with pytest.raises(ValueError, match="binary mode"):
            list(fasta_bytes_iterator(handle))  # type: ignore[arg-type]


def test_filename_stem() -> None:
    assert filename_stem("/path/example.fna") == "example"
    assert filename_stem("relative/path/example.fna.gz") == "example"
    assert filename_stem("example.fasta") == "example"


def test_file_md5sum_plain(viral_example: Path) -> None:
    assert (
        file_md5sum(viral_example / "OP073605.fasta")
        == "5584c7029328dc48d33f95f0a78f7e57"
    )


def test_file_md5sum_gzip(bacterial_example: Path) -> None:
    # MD5 of the *decompressed* content (ref utils.py:159-168)
    assert (
        file_md5sum(bacterial_example / "NC_011916.fas.gz")
        == "9d72a8fb513cf9cc8cc6605a0ad4e837"
    )
    assert (
        file_md5sum(bacterial_example / "NC_002696.fasta.gz")
        == "f19cb07198a41a4406a22b2f57a6b5e7"
    )


def test_file_md5sum_missing(tmp_path: Path) -> None:
    with pytest.raises(ValueError, match="not found"):
        file_md5sum(tmp_path / "nope.fasta")


def test_str_md5sum() -> None:
    assert str_md5sum("") == "d41d8cd98f00b204e9800998ecf8427e"


def test_devmeter_busy_fraction_interval_union() -> None:
    """devmeter reports the union of in-flight windows over the wall
    window: overlapping dispatches don't double-count, and clipping at
    the window edges is honoured."""
    from pyani_plus_tpu.utils import devmeter

    w0 = devmeter.reset()
    # two overlapping intervals [w0+1, w0+3] and [w0+2, w0+4] -> union 3
    devmeter.record(w0 + 1.0, w0 + 3.0)
    devmeter.record(w0 + 2.0, w0 + 4.0)
    # disjoint [w0+6, w0+7] -> +1
    devmeter.record(w0 + 6.0, w0 + 7.0)
    # outside the window entirely -> ignored
    devmeter.record(w0 - 5.0, w0 - 4.0)
    frac = devmeter.busy_fraction(w0, w0 + 8.0)
    assert abs(frac - 4.0 / 8.0) < 1e-9, frac
    # reset clears
    w1 = devmeter.reset()
    assert devmeter.busy_fraction(w1, w1 + 1.0) == 0.0
