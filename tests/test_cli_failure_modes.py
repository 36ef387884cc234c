"""CLI failure-mode long tail, mirroring the reference's test_public_cli.py.

Covers the scenarios the reference exercises that earlier rounds had
thin: per-method resume with a mismatched recorded tool version, bad
FASTA-directory inputs (broken symlink, file-as-dir, empty dir, empty
FASTA files plain and gzipped), no-comparison runs through export/plot,
plot-run over all-null comparisons, and plot-run-comp failure modes
(reference test_public_cli.py:125-205, 371-608, 686-721, 1145-1820).
"""

from __future__ import annotations

import gzip
from pathlib import Path

import pytest
from click.testing import CliRunner

from pyani_plus_tpu.cli.main import app
from pyani_plus_tpu.db import Database

FIXTURES = Path("/root/reference/tests/fixtures")
BAD = FIXTURES / "bad_alignments"


@pytest.fixture()
def runner():
    return CliRunner()


@pytest.fixture(scope="module")
def tiny_dir(tmp_path_factory):
    """Two tiny related genomes: every method completes in seconds."""
    import numpy as np

    rng = np.random.default_rng(5)
    base = rng.integers(0, 4, 2400)
    bases = np.array(list("ACGT"))
    d = tmp_path_factory.mktemp("tiny_genomes")
    for i in range(2):
        codes = base.copy()
        mut = rng.random(codes.size) < 0.02 * i
        codes[mut] = (codes[mut] + 1) % 4
        (d / f"t{i}.fasta").write_text(
            f">t{i}\n" + "".join(bases[codes]) + "\n"
        )
    return d


# ---------------------------------------------------------------- inputs


def test_broken_symlink_input_errors(runner, tmp_path) -> None:
    d = tmp_path / "genomes"
    d.mkdir()
    (d / "broken.fa").symlink_to("/does/not/exist/example.fna")
    result = runner.invoke(
        app, ["sourmash", str(d), "-d", str(tmp_path / "x.db"), "--create-db"]
    )
    assert result.exit_code != 0
    assert "broken symlink" in result.output


def test_fasta_path_is_a_file_errors(runner, tmp_path) -> None:
    f = tmp_path / "not_a_dir.fasta"
    f.write_text(">x\nACGT\n")
    result = runner.invoke(
        app, ["sourmash", str(f), "-d", str(tmp_path / "x.db"), "--create-db"]
    )
    assert result.exit_code != 0
    # click's path validation rejects it before our own check can
    assert "is a file" in result.output or "is not a directory" in result.output


def test_empty_fasta_directory_errors(runner, tmp_path) -> None:
    d = tmp_path / "empty"
    d.mkdir()
    result = runner.invoke(
        app, ["anim", str(d), "-d", str(tmp_path / "x.db"), "--create-db"]
    )
    assert result.exit_code != 0
    assert "No FASTA input genomes" in result.output


@pytest.mark.parametrize("gz", [False, True])
def test_empty_fasta_file_errors(runner, tmp_path, gz) -> None:
    """An empty FASTA file (plain or gzipped) is rejected at ingest
    (reference test_anim_fasta_empty / test_anim_fasta_gz_empty)."""
    d = tmp_path / "with_empty"
    d.mkdir()
    if gz:
        with gzip.open(d / "empty.fasta.gz", "wb"):
            pass
    else:
        (d / "empty.fasta").touch()
    result = runner.invoke(
        app, ["anim", str(d), "-d", str(tmp_path / "x.db"), "--create-db"]
    )
    assert result.exit_code != 0
    assert "not recognised as a FASTA record" in result.output


# ------------------------------------------------- empty/missing-db paths


@pytest.mark.parametrize(
    "args",
    [
        ["delete-run", "--force"],
        ["resume"],
        ["export-run", "-o", "OUT"],
        ["plot-run", "-o", "OUT"],
        ["list-runs"],
    ],
)
def test_missing_database_errors(runner, tmp_path, args) -> None:
    argv = [
        a if a != "OUT" else str(tmp_path / "out") for a in args
    ] + ["-d", "/does/not/exist"]
    result = runner.invoke(app, argv)
    assert result.exit_code != 0
    assert "does not exist" in result.output


@pytest.mark.parametrize(
    "args",
    [
        ["delete-run", "--force"],
        ["resume"],
        ["export-run", "-o", "OUT"],
        ["plot-run", "-o", "OUT"],
    ],
)
def test_no_runs_database_errors(runner, tmp_path, args) -> None:
    db_path = tmp_path / "empty.sqlite"
    Database(db_path, create=True).close()
    argv = [
        a if a != "OUT" else str(tmp_path / "out") for a in args
    ] + ["-d", str(db_path)]
    result = runner.invoke(app, argv)
    assert result.exit_code != 0
    assert "contains no runs" in result.output
    # unknown explicit run id on the same empty database
    result = runner.invoke(app, [*argv, "--run-id", "1"])
    assert result.exit_code != 0
    assert "has no run-id 1" in result.output


def test_run_with_no_comparisons_export_and_plot(runner, tmp_path) -> None:
    """Runs that never computed anything fail export/plot with the
    reference's message (test_export_run_failures / test_plot_run_failures):
    unknown id first, then an explicit empty run, then the default latest."""
    db_path = tmp_path / "noruns.sqlite"
    db = Database(db_path, create=True)
    cfg = db.get_or_create_configuration("fastANI", "fastani", "1.2.3")
    for name in ("Trial A", "Trial B"):
        db.add_run(
            cfg.configuration_id, "pyani fastani ...", "/does/not/exist",
            "Empty", name, [],
        )
    db.close()
    out = tmp_path / "out"
    for cmd in ("export-run", "plot-run"):
        result = runner.invoke(
            app, [cmd, "-d", str(db_path), "-o", str(out), "--run-id", "3"]
        )
        assert result.exit_code != 0
        assert "has no run-id 3" in result.output
        result = runner.invoke(
            app, [cmd, "-d", str(db_path), "-o", str(out), "--run-id", "1"]
        )
        assert result.exit_code != 0
        assert "no comparisons" in result.output
        # defaults to the latest run (id 2)
        result = runner.invoke(
            app, [cmd, "-d", str(db_path), "-o", str(out)]
        )
        assert result.exit_code != 0
        assert "no comparisons" in result.output


# --------------------------------------------- per-method version mismatch


@pytest.mark.parametrize(
    "method", ["anim", "anib", "fastani", "animinimap2", "skani", "sourmash"]
)
def test_resume_version_mismatch_every_method(
    runner, tiny_dir, tmp_path, method
) -> None:
    """Resume re-validates the recorded program version per method
    (reference test_resume_partial_* family checks this for each)."""
    db_path = tmp_path / "v.db"
    result = runner.invoke(
        app,
        [method, str(tiny_dir), "-d", str(db_path), "--create-db",
         "--cache", str(tmp_path)],
        catch_exceptions=False,
    )
    assert result.exit_code == 0, result.output
    with Database(db_path) as db:
        db.conn.execute("UPDATE configurations SET version = '0.0.0-other'")
        db.conn.commit()
    result = runner.invoke(app, ["resume", "-d", str(db_path)])
    assert result.exit_code != 0
    assert "version" in result.output
    assert "cannot" in result.output.lower() or "resume" in result.output


# ----------------------------------------------------- nulls through plots


@pytest.fixture(scope="module")
def null_run_db(tmp_path_factory):
    """ANIm over the bad_alignments pair: the cross comparisons are NULL."""
    if not BAD.is_dir():
        pytest.skip("reference fixtures not available")
    tmp = tmp_path_factory.mktemp("nulls")
    db_path = tmp / "nulls.db"
    result = CliRunner().invoke(
        app,
        ["anim", str(BAD), "-d", str(db_path), "--create-db"],
        catch_exceptions=False,
    )
    assert result.exit_code == 0, result.output
    return db_path


def test_plot_run_with_null_comparisons(runner, null_run_db, tmp_path) -> None:
    """Null comparisons plot with a warning, not a crash (reference
    test_plot_skip_nulls): heatmaps/distributions still produced."""
    out = tmp_path / "plots"
    result = runner.invoke(
        app, ["plot-run", "-d", str(null_run_db), "-o", str(out)]
    )
    assert result.exit_code == 0, result.output
    assert "null" in result.output.lower()
    assert (out / "ANIm_identity_heatmap.tsv").is_file()
    assert (out / "ANIm_identity_dist.png").is_file()


def test_classify_with_null_coverage(runner, null_run_db, tmp_path) -> None:
    """classify on a run whose cross comparisons are NULL: no edges, one
    singleton clique per genome (reference test_classify_warnings)."""
    out = tmp_path / "cls"
    result = runner.invoke(
        app, ["classify", "-d", str(null_run_db), "-o", str(out)]
    )
    assert result.exit_code == 0, result.output
    tsv = out / "ANIm_classify.tsv"
    assert tsv.is_file()
    lines = tsv.read_text().strip().splitlines()
    # header + one singleton row per genome
    rows = [ln for ln in lines[1:] if ln.strip()]
    assert len(rows) >= 2, lines


# ------------------------------------------------------ plot-run-comp tail


def test_plot_run_comp_failures(runner, tmp_path) -> None:
    out = tmp_path / "out"
    result = runner.invoke(
        app,
        ["plot-run-comp", "-d", "/does/not/exist", "-o", str(out), "1,2"],
    )
    assert result.exit_code != 0
    assert "does not exist" in result.output

    db_path = tmp_path / "empty.sqlite"
    Database(db_path, create=True).close()
    result = runner.invoke(
        app, ["plot-run-comp", "-d", str(db_path), "-o", str(out), "1,2"]
    )
    assert result.exit_code != 0
    assert "run-id" in result.output or "contains no runs" in result.output


def test_plot_run_invalid_format_errors(runner, null_run_db, tmp_path) -> None:
    """--formats entries are validated against GRAPHICS_FORMATS at the
    CLI (clean CRITICAL + exit, not a matplotlib traceback)."""
    out = tmp_path / "plots"
    result = runner.invoke(
        app,
        ["plot-run", "-d", str(null_run_db), "-o", str(out),
         "--formats", "png,bogus"],
    )
    assert result.exit_code != 0
    assert "Unsupported plot format" in result.output
    assert "bogus" in result.output


def test_delete_run_by_id_keeps_other_runs(runner, tiny_dir, tmp_path) -> None:
    """delete-run --run-id removes one run; the other survives with its
    cached matrices (comparisons are content-addressed and shared)."""
    db_path = tmp_path / "two.db"
    for _ in range(2):
        result = runner.invoke(
            app,
            ["sourmash", str(tiny_dir), "-d", str(db_path), "--create-db",
             "--cache", str(tmp_path)],
            catch_exceptions=False,
        )
        assert result.exit_code == 0, result.output
    result = runner.invoke(
        app, ["delete-run", "-d", str(db_path), "--run-id", "1", "--force"]
    )
    assert result.exit_code == 0, result.output
    result = runner.invoke(app, ["list-runs", "-d", str(db_path)])
    assert result.exit_code == 0
    assert "sourm" in result.output  # rich may ellipsise the column
    out = tmp_path / "export2"
    result = runner.invoke(
        app, ["export-run", "-d", str(db_path), "-o", str(out), "--run-id", "2"]
    )
    assert result.exit_code == 0, result.output
    assert (out / "sourmash_identity.tsv").is_file()


def test_classify_tani_mode_with_nulls(runner, null_run_db, tmp_path) -> None:
    """classify --mode tANI on a run with NULL cross comparisons: NaN
    propagates through -ln(hadamard) and the nulls stay edge-less."""
    out = tmp_path / "cls_tani"
    result = runner.invoke(
        app,
        ["classify", "-d", str(null_run_db), "-o", str(out), "--mode", "tANI"],
    )
    assert result.exit_code == 0, result.output
    assert (out / "ANIm_classify.tsv").is_file()
