"""Tests for the external-alignment method.

Uses the same mock 3x11 MSA and expected matrices as the reference's
tests/test_external_alignment.py:38-112 (worked examples documented there).
"""

from pathlib import Path

import numpy as np
import pytest
from click.testing import CliRunner

from pyani_plus_tpu.cli.main import app
from pyani_plus_tpu.db import Database

# Same mock alignment as reference test_external_alignment.py:38-45:
# stems match the viral_example fixture filenames.
MOCK_ALIGNMENT = """\
>OP073605 mock 10bp fragment for 5584c7029328dc48d33f95f0a78f7e57
GACC-GGTTTT
>MGV-GENOME-0264574 mock 9bp fragment for 689d3fd6881db36b5e08329cf23cecdd
AACC-GG-TTT
>MGV-GENOME-0266457 mock 10bp fragment for 78975d5144a1cd12e98898d573cf6536
AACC-GGATTT
"""

# Expected matrices (hash-sorted order), reference test lines 101-112
EXPECTED_IDENTITY = np.array(
    [[1.0, 0.8, 0.8], [0.8, 1.0, 0.9], [0.8, 0.9, 1.0]]
)
EXPECTED_COV_QUERY = np.array(
    [[1.0, 0.9, 1.0], [1.0, 1.0, 1.0], [1.0, 0.9, 1.0]]
)


@pytest.fixture
def viral_dir():
    path = Path("/root/reference/tests/fixtures/viral_example")
    if not path.is_dir():
        pytest.skip("reference fixtures not available")
    return path


def test_mock_alignment_stem(viral_dir, tmp_path) -> None:
    alignment = tmp_path / "stems.fasta"
    alignment.write_text(MOCK_ALIGNMENT)
    db_path = tmp_path / "db.sqlite"
    runner = CliRunner()
    result = runner.invoke(
        app,
        [
            "external-alignment",
            str(viral_dir),
            "-d",
            str(db_path),
            "--create-db",
            "--alignment",
            str(alignment),
        ],
        catch_exceptions=False,
    )
    assert result.exit_code == 0, result.output
    with Database(db_path) as db:
        run = db.load_run(check_complete=True)
        identity = run.identities
        cov = run.cov_query
        # Index is hash-sorted: 5584... (OP073605), 689d... (0264574), 7897...
        assert np.allclose(identity.values, EXPECTED_IDENTITY)
        assert np.allclose(cov.values, EXPECTED_COV_QUERY)
        # aln_length for the self comparisons = ungapped lengths 10, 9, 10
        assert list(np.diag(run.aln_length.values)) == [10.0, 9.0, 10.0]


def test_alignment_md5_mismatch_on_resume(viral_dir, tmp_path) -> None:
    alignment = tmp_path / "stems.fasta"
    alignment.write_text(MOCK_ALIGNMENT)
    db_path = tmp_path / "db.sqlite"
    runner = CliRunner()
    result = runner.invoke(
        app,
        [
            "external-alignment",
            str(viral_dir),
            "-d",
            str(db_path),
            "--create-db",
            "--alignment",
            str(alignment),
        ],
        catch_exceptions=False,
    )
    assert result.exit_code == 0

    # Config extra records the alignment MD5 (ref public_cli.py:681)
    with Database(db_path) as db:
        config = db.load_run().configuration
        assert "md5=" in config.extra
        assert f"alignment={alignment.name}" in config.extra


def test_unmappable_name_errors(viral_dir, tmp_path) -> None:
    alignment = tmp_path / "bad.fasta"
    alignment.write_text(">unknown-genome\nACGT\n")
    runner = CliRunner()
    result = runner.invoke(
        app,
        [
            "external-alignment",
            str(viral_dir),
            "-d",
            str(tmp_path / "db.sqlite"),
            "--create-db",
            "--alignment",
            str(alignment),
        ],
    )
    assert result.exit_code != 0
