"""Reporting/maintenance CLI surface: labels, counts, confirmation, errors.

Deeper coverage of list-runs / delete-run / export-run / resume branches
than the happy paths in test_public_cli.py, mirroring the reference's
test_public_cli.py error sections.
"""

from pathlib import Path

import pandas as pd
import pytest
from click.testing import CliRunner

from pyani_plus_tpu.cli.main import app
from pyani_plus_tpu.db import Database

VIRAL = Path("/root/reference/tests/fixtures/viral_example")
STEMS = {"MGV-GENOME-0264574", "MGV-GENOME-0266457", "OP073605"}


@pytest.fixture(scope="module")
def viral():
    if not VIRAL.is_dir():
        pytest.skip("reference fixtures not available")
    return VIRAL


@pytest.fixture(scope="module")
def done_db(tmp_path_factory, viral):
    """One complete sourmash run in a module-scoped database."""
    tmp = tmp_path_factory.mktemp("report_cli")
    db_path = tmp / "db.sqlite"
    result = CliRunner().invoke(
        app,
        ["sourmash", str(viral), "-d", str(db_path), "--create-db",
         "--name", "my viral run"],
        catch_exceptions=False,
    )
    assert result.exit_code == 0, result.output
    return db_path


def test_export_run_label_modes(done_db, tmp_path) -> None:
    """stem (default), filename and md5 labelling of exported matrices."""
    runner = CliRunner()
    for label, expect in (
        ("stem", STEMS),
        ("filename", {"MGV-GENOME-0264574.fas", "MGV-GENOME-0266457.fna",
                      "OP073605.fasta"}),
        ("md5", {"5584c7029328dc48d33f95f0a78f7e57",
                 "689d3fd6881db36b5e08329cf23cecdd",
                 "78975d5144a1cd12e98898d573cf6536"}),
    ):
        outdir = tmp_path / label
        result = runner.invoke(
            app,
            ["export-run", "-d", str(done_db), "-o", str(outdir),
             "--label", label],
            catch_exceptions=False,
        )
        assert result.exit_code == 0, result.output
        matrix = pd.read_csv(
            outdir / "sourmash_identity.tsv", sep="\t", index_col=0
        )
        assert set(matrix.index) == expect, label


def test_export_run_unknown_run_id_errors(done_db, tmp_path) -> None:
    result = CliRunner().invoke(
        app,
        ["export-run", "-d", str(done_db), "-o", str(tmp_path / "x"),
         "--run-id", "99"],
    )
    assert result.exit_code != 0
    assert "no run-id 99" in result.output


def test_list_runs_shows_name_status_and_counts(done_db) -> None:
    result = CliRunner().invoke(
        app,
        ["list-runs", "-d", str(done_db)],
        catch_exceptions=False,
        env={"COLUMNS": "200"},
    )
    assert result.exit_code == 0
    plain = " ".join(result.output.split())  # rich wraps at 80 cols
    assert "viral" in plain
    assert "Done" in plain
    assert "sourmash" in plain
    assert "9" in plain  # 3 genomes -> 9 comparisons



def test_delete_run_requires_confirmation(done_db) -> None:
    """Without --force an interactive confirmation guards deletion;
    answering no leaves the run in place."""
    runner = CliRunner()
    result = runner.invoke(
        app, ["delete-run", "-d", str(done_db)], input="n\n"
    )
    with Database(done_db) as db:
        assert len(db.list_runs()) == 1  # still there
    result = runner.invoke(
        app, ["delete-run", "-d", str(done_db), "--run-id", "99", "--force"]
    )
    assert result.exit_code != 0  # unknown run id is an error


def test_resume_without_runs_errors(tmp_path) -> None:
    db_path = tmp_path / "empty.sqlite"
    with Database(db_path, create=True):
        pass
    result = CliRunner().invoke(app, ["resume", "-d", str(db_path)])
    assert result.exit_code != 0


def test_resume_unknown_run_id_errors(done_db) -> None:
    result = CliRunner().invoke(
        app, ["resume", "-d", str(done_db), "--run-id", "42"]
    )
    assert result.exit_code != 0


def test_classify_cov_min_gates_edges(done_db, tmp_path) -> None:
    """At an impossible coverage floor no edges survive: every genome
    ends up alone (singleton rows only)."""
    outdir = tmp_path / "strict"
    result = CliRunner().invoke(
        app,
        ["classify", "-d", str(done_db), "-o", str(outdir),
         "--cov-min", "1.1"],
        catch_exceptions=False,
    )
    assert result.exit_code == 0, result.output
    table = pd.read_csv(outdir / "sourmash_classify.tsv", sep="\t")
    assert (table["n_nodes"] == 1).all()
    assert len(table) == 3


def test_classify_defaults_find_viral_clique(done_db, tmp_path) -> None:
    """With default gates the two related MGV genomes form a clique."""
    outdir = tmp_path / "default"
    result = CliRunner().invoke(
        app,
        ["classify", "-d", str(done_db), "-o", str(outdir)],
        catch_exceptions=False,
    )
    assert result.exit_code == 0, result.output
    table = pd.read_csv(outdir / "sourmash_classify.tsv", sep="\t")
    assert (table["n_nodes"] >= 2).any()


def test_export_run_empty_outdir_created(done_db, tmp_path) -> None:
    """export-run creates the output directory when missing."""
    outdir = tmp_path / "brand" / "new"
    result = CliRunner().invoke(
        app,
        ["export-run", "-d", str(done_db), "-o", str(outdir)],
        catch_exceptions=False,
    )
    assert result.exit_code == 0, result.output
    assert (outdir / "sourmash_run_1.tsv").is_file()


def test_launch_requires_a_command() -> None:
    result = CliRunner().invoke(app, ["launch", "-n", "2"])
    assert result.exit_code != 0
    assert "No command given" in result.output


def test_version_flag() -> None:
    from pyani_plus_tpu import __version__

    result = CliRunner().invoke(app, ["--version"], catch_exceptions=False)
    assert result.exit_code == 0
    assert __version__ in result.output


BAD = Path("/root/reference/tests/fixtures/bad_alignments")


def test_plot_run_unknown_run_id_errors(done_db, tmp_path) -> None:
    result = CliRunner().invoke(
        app,
        ["plot-run", "-d", str(done_db), "-o", str(tmp_path),
         "--run-id", "999"],
    )
    assert result.exit_code != 0


def test_plot_run_empty_db_errors(tmp_path) -> None:
    """plot-run on a database with no runs fails cleanly (no traceback
    dump to the user -- the reference's log_sys_exit contract)."""
    db_path = tmp_path / "empty.sqlite"
    Database(db_path, create=True).close()
    result = CliRunner().invoke(
        app, ["plot-run", "-d", str(db_path), "-o", str(tmp_path)]
    )
    assert result.exit_code != 0


def test_classify_unknown_run_id_errors(done_db, tmp_path) -> None:
    result = CliRunner().invoke(
        app,
        ["classify", "-d", str(done_db), "-o", str(tmp_path),
         "--run-id", "999"],
    )
    assert result.exit_code != 0


@pytest.mark.skipif(not BAD.is_dir(), reason="fixtures missing")
def test_classify_all_null_run_yields_singletons(tmp_path) -> None:
    """classify over a run whose comparisons are all NULL (the
    bad_alignments set under an alignment method): NaN scores produce no
    edges, so the output degenerates to per-genome singletons -- the
    NULL-propagation contract end-to-end (ref classify.py:102)."""
    db_path = tmp_path / "null.sqlite"
    runner = CliRunner()
    result = runner.invoke(
        app,
        ["anim", str(BAD), "-d", str(db_path), "--create-db"],
        catch_exceptions=False,
    )
    assert result.exit_code == 0, result.output
    outdir = tmp_path / "cls"
    result = runner.invoke(
        app,
        ["classify", "-d", str(db_path), "-o", str(outdir)],
        catch_exceptions=False,
    )
    assert result.exit_code == 0, result.output
    tsv = outdir / "ANIm_classify.tsv"
    assert tsv.is_file()
    rows = [
        line.split("\t")
        for line in tsv.read_text().splitlines()[1:]
        if line.strip()
    ]
    # cross identities are NULL, so no multi-genome clique can form
    assert all(int(r[0]) == 1 for r in rows), rows
