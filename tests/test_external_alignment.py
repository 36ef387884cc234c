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


MD5S = {
    "OP073605": "5584c7029328dc48d33f95f0a78f7e57",
    "MGV-GENOME-0264574": "689d3fd6881db36b5e08329cf23cecdd",
    "MGV-GENOME-0266457": "78975d5144a1cd12e98898d573cf6536",
}
FILENAMES = {
    "OP073605": "OP073605.fasta",
    "MGV-GENOME-0264574": "MGV-GENOME-0264574.fas",
    "MGV-GENOME-0266457": "MGV-GENOME-0266457.fna",
}


def _relabel(mapping) -> str:
    out = []
    for line in MOCK_ALIGNMENT.splitlines():
        if line.startswith(">"):
            stem = line[1:].split(None, 1)[0]
            out.append(f">{mapping[stem]}")
        else:
            out.append(line)
    return "\n".join(out) + "\n"


def _run_ext(tmp_path, viral_dir, alignment, *extra, db_name="db.sqlite"):
    db_path = tmp_path / db_name
    result = CliRunner().invoke(
        app,
        [
            "external-alignment",
            str(viral_dir),
            "-d",
            str(db_path),
            "--create-db",
            "--alignment",
            str(alignment),
            *extra,
        ],
    )
    return result, db_path


@pytest.mark.parametrize("label", ["md5", "filename"])
def test_mock_alignment_other_label_modes(viral_dir, tmp_path, label) -> None:
    """The md5 and filename labelling modes give the same matrices as
    stems (reference test_external_alignment.py:152-238)."""
    mapping = MD5S if label == "md5" else FILENAMES
    alignment = tmp_path / f"{label}.fasta"
    alignment.write_text(_relabel(mapping))
    result, db_path = _run_ext(
        tmp_path, viral_dir, alignment, "--label", label
    )
    assert result.exit_code == 0, result.output
    with Database(db_path) as db:
        run = db.load_run(check_complete=True)
        assert np.allclose(run.identities.values, EXPECTED_IDENTITY)
        assert np.allclose(run.cov_query.values, EXPECTED_COV_QUERY)


def test_alignment_length_mismatch_errors(viral_dir, tmp_path) -> None:
    """Rows of differing lengths are a hard error, naming both genomes."""
    broken = MOCK_ALIGNMENT.replace("AACC-GGATTT", "AACC-GGATTTGG")
    alignment = tmp_path / "broken.fasta"
    alignment.write_text(broken)
    result, _ = _run_ext(tmp_path, viral_dir, alignment)
    assert result.exit_code != 0
    assert "different lengths" in result.output


def test_alignment_missing_genome_errors(viral_dir, tmp_path) -> None:
    """An MSA lacking one of the FASTA genomes cannot be scored."""
    partial = "\n".join(MOCK_ALIGNMENT.splitlines()[:4]) + "\n"  # drop last
    alignment = tmp_path / "partial.fasta"
    alignment.write_text(partial)
    result, _ = _run_ext(tmp_path, viral_dir, alignment)
    assert result.exit_code != 0
    assert "Did not find" in result.output


def test_resume_rejects_modified_alignment(viral_dir, tmp_path) -> None:
    """resume must fail if the MSA content changed since the run was
    logged (MD5 recorded in the configuration extra)."""
    alignment = tmp_path / "stems.fasta"
    alignment.write_text(MOCK_ALIGNMENT)
    result, db_path = _run_ext(tmp_path, viral_dir, alignment)
    assert result.exit_code == 0, result.output
    # Delete one comparison so resume has pending work, then tamper.
    with Database(db_path) as db:
        db.execute_with_retries("DELETE FROM comparisons WHERE query_hash != subject_hash")
    alignment.write_text(MOCK_ALIGNMENT.replace("GACC", "TACC"))
    result = CliRunner().invoke(app, ["resume", "-d", str(db_path)])
    assert result.exit_code != 0


def test_resume_locates_moved_alignment_by_md5(viral_dir, tmp_path) -> None:
    """A moved-but-identical MSA is found again via its recorded MD5."""
    import shutil

    alignment = tmp_path / "original" / "stems.fasta"
    alignment.parent.mkdir()
    alignment.write_text(MOCK_ALIGNMENT)
    fasta_dir = tmp_path / "genomes"
    fasta_dir.mkdir()
    for name in FILENAMES.values():
        shutil.copy(viral_dir / name, fasta_dir / name)
    result, db_path = _run_ext(tmp_path, fasta_dir, alignment)
    assert result.exit_code == 0, result.output
    with Database(db_path) as db:
        db.execute_with_retries("DELETE FROM comparisons WHERE query_hash != subject_hash")
    # Move the MSA into the genome directory under a NEW name.
    (tmp_path / "original" / "stems.fasta").rename(fasta_dir / "renamed.aln")
    result = CliRunner().invoke(app, ["resume", "-d", str(db_path)])
    assert result.exit_code == 0, result.output
    with Database(db_path) as db:
        run = db.load_run(check_complete=True)
        assert np.allclose(run.identities.values, EXPECTED_IDENTITY)
