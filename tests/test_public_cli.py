"""End-to-end public CLI tests: run, export, resume, classify, list, delete.

Follows the reference's test strategy layer 5 (tests/test_public_cli.py in
the reference): every command on the small fixture sets, fixture-matrix
comparison within atol 2e-8, resume-from-partial.
"""

from pathlib import Path

import numpy as np
import pandas as pd
import pytest
from click.testing import CliRunner

from pyani_plus_tpu.cli.main import app
from pyani_plus_tpu.db import Database

ATOL = 2e-8


@pytest.fixture
def runner() -> CliRunner:
    return CliRunner()


def _read(path: Path) -> pd.DataFrame:
    return (
        pd.read_csv(path, sep="\t", index_col=0).sort_index(axis=0).sort_index(axis=1)
    )


@pytest.fixture(scope="module")
def sourmash_run(tmp_path_factory, viral_example_mod):
    """One completed sourmash run over the viral set, exported."""
    tmp = tmp_path_factory.mktemp("sourmash_run")
    db_path = tmp / "db.sqlite"
    outdir = tmp / "out"
    outdir.mkdir()
    runner = CliRunner()
    result = runner.invoke(
        app,
        [
            "sourmash",
            str(viral_example_mod),
            "-d",
            str(db_path),
            "--create-db",
            "--scaled",
            "300",
        ],
        catch_exceptions=False,
    )
    assert result.exit_code == 0, result.output
    result = runner.invoke(
        app,
        ["export-run", "-d", str(db_path), "-o", str(outdir)],
        catch_exceptions=False,
    )
    assert result.exit_code == 0, result.output
    return db_path, outdir


@pytest.fixture(scope="module")
def viral_example_mod():
    path = Path("/root/reference/tests/fixtures/viral_example")
    if not path.is_dir():
        pytest.skip("reference fixtures not available")
    return path


def test_sourmash_run_matches_fixtures(sourmash_run, viral_example_mod) -> None:
    _db_path, outdir = sourmash_run
    for ours, theirs in (
        ("sourmash_identity.tsv", "sourmash_identity.tsv"),
        ("sourmash_query_cov.tsv", "sourmash_coverage.tsv"),
    ):
        got = _read(outdir / ours)
        expected = _read(viral_example_mod / "matrices" / theirs)
        assert np.nanmax(np.abs(got.values - expected.values)) < ATOL


def test_export_long_form(sourmash_run) -> None:
    _db_path, outdir = sourmash_run
    long_form = outdir / "sourmash_run_1.tsv"
    lines = long_form.read_text().splitlines()
    assert lines[0].startswith("#Query\tSubject\tIdentity")
    assert len(lines) == 1 + 9  # header + 3x3 comparisons
    # aln_length etc are NA for sourmash
    assert lines[1].split("\t")[7] == "NA"


def test_resume_noop_complete(runner, sourmash_run) -> None:
    db_path, _ = sourmash_run
    result = runner.invoke(
        app, ["resume", "-d", str(db_path)], catch_exceptions=False
    )
    assert result.exit_code == 0, result.output
    assert "resumed" in result.output


def test_resume_from_partial(runner, viral_example_mod, tmp_path) -> None:
    db_path = tmp_path / "partial.sqlite"
    result = runner.invoke(
        app,
        [
            "sourmash",
            str(viral_example_mod),
            "-d",
            str(db_path),
            "--create-db",
            "--scaled",
            "300",
        ],
        catch_exceptions=False,
    )
    assert result.exit_code == 0
    # Delete some comparisons to fake an interrupted run
    with Database(db_path) as db:
        db.execute_with_retries(
            "DELETE FROM comparisons WHERE comparison_id IN"
            " (SELECT comparison_id FROM comparisons LIMIT 4)"
        )
        db.execute_with_retries("UPDATE runs SET status='Worker interrupted'")
        run = db.load_run()
        assert run.comparisons_count() == 5
    result = runner.invoke(app, ["resume", "-d", str(db_path)], catch_exceptions=False)
    assert result.exit_code == 0, result.output
    with Database(db_path) as db:
        run = db.load_run()
        assert run.comparisons_count() == 9
        assert run.status == "Done"


def test_classify(runner, sourmash_run, tmp_path) -> None:
    db_path, _ = sourmash_run
    outdir = tmp_path / "classify"
    result = runner.invoke(
        app,
        ["classify", "-d", str(db_path), "-o", str(outdir), "--no-plot"],
        catch_exceptions=False,
    )
    assert result.exit_code == 0, result.output
    df = pd.read_csv(outdir / "sourmash_classify.tsv", sep="\t")
    assert list(df.columns) == [
        "n_nodes",
        "max_cov",
        "min_identity",
        "max_identity",
        "members",
    ]
    # Three similar genomes: the full 3-clique should be found
    assert 3 in set(df["n_nodes"])


def test_classify_tani_mode(runner, sourmash_run, tmp_path) -> None:
    db_path, _ = sourmash_run
    outdir = tmp_path / "classify_tani"
    result = runner.invoke(
        app,
        [
            "classify",
            "-d",
            str(db_path),
            "-o",
            str(outdir),
            "--mode",
            "tANI",
            "--no-plot",
        ],
        catch_exceptions=False,
    )
    assert result.exit_code == 0, result.output
    df = pd.read_csv(outdir / "sourmash_classify.tsv", sep="\t")
    assert "min_-tANI" in df.columns


def test_list_runs(runner, sourmash_run) -> None:
    db_path, _ = sourmash_run
    result = runner.invoke(app, ["list-runs", "-d", str(db_path)], catch_exceptions=False)
    assert result.exit_code == 0
    assert "Done" in result.output


def test_delete_run(runner, viral_example_mod, tmp_path) -> None:
    db_path = tmp_path / "del.sqlite"
    result = runner.invoke(
        app,
        [
            "sourmash",
            str(viral_example_mod),
            "-d",
            str(db_path),
            "--create-db",
            "--scaled",
            "300",
        ],
        catch_exceptions=False,
    )
    assert result.exit_code == 0
    result = runner.invoke(
        app, ["delete-run", "-d", str(db_path), "--force"], catch_exceptions=False
    )
    assert result.exit_code == 0
    with Database(db_path) as db:
        assert db.list_runs() == []
        # Comparisons are retained for reuse
        count = db.conn.execute("SELECT COUNT(*) FROM comparisons").fetchone()[0]
        assert count == 9


def test_missing_db_errors(runner, viral_example_mod, tmp_path) -> None:
    result = runner.invoke(
        app,
        ["sourmash", str(viral_example_mod), "-d", str(tmp_path / "no.sqlite")],
    )
    assert result.exit_code != 0
    assert "not using --create-db" in str(result.output) + str(result.exception)


def test_classify_with_plot(runner, sourmash_run, tmp_path) -> None:
    """Classify with plotting enabled writes the stacked classify figure."""
    db_path, _ = sourmash_run
    outdir = tmp_path / "classify_plot"
    result = runner.invoke(
        app,
        ["classify", "-d", str(db_path), "-o", str(outdir)],
        catch_exceptions=False,
    )
    assert result.exit_code == 0, result.output
    assert (outdir / "sourmash_classify.tsv").is_file()
    assert (outdir / "sourmash_classify_plot.png").is_file()


def test_plot_run(runner, sourmash_run, tmp_path) -> None:
    """plot-run writes scatter/dist/heatmap artefacts with reference names."""
    db_path, _ = sourmash_run
    outdir = tmp_path / "plots"
    result = runner.invoke(
        app,
        [
            "plot-run",
            "-d",
            str(db_path),
            "-o",
            str(outdir),
            "--formats",
            "tsv,png",
        ],
        catch_exceptions=False,
    )
    assert result.exit_code == 0, result.output
    for stem in (
        "sourmash_identity_heatmap.png",
        "sourmash_identity_heatmap.tsv",
        "sourmash_identity_dist.png",
        "sourmash_query_cov_scatter.png",
        "sourmash_query_cov_scatter.tsv",
        "sourmash_tANI_scatter.png",
        "sourmash_tANI_heatmap.png",
        "sourmash_hadamard_dist.png",
    ):
        assert (outdir / stem).is_file(), stem
    # The heatmap TSV is the matrix in dendrogram leaf order
    matrix = pd.read_csv(outdir / "sourmash_identity_heatmap.tsv", sep="\t", index_col=0)
    assert matrix.shape == (3, 3)


def test_plot_run_comp(runner, sourmash_run, viral_example_mod, tmp_path) -> None:
    """plot-run-comp writes scatter + diff grids and the per-pair TSV."""
    db_path, _ = sourmash_run
    # Second run, different configuration (scaled), same genomes
    result = runner.invoke(
        app,
        [
            "sourmash",
            str(viral_example_mod),
            "-d",
            str(db_path),
            "--scaled",
            "200",
        ],
        catch_exceptions=False,
    )
    assert result.exit_code == 0, result.output
    outdir = tmp_path / "comp"
    result = runner.invoke(
        app,
        [
            "plot-run-comp",
            "-d",
            str(db_path),
            "-o",
            str(outdir),
            "--run-ids",
            "1,2",
            "--formats",
            "tsv,png",
        ],
        catch_exceptions=False,
    )
    assert result.exit_code == 0, result.output
    assert (outdir / "sourmash_identity_1_vs_2.tsv").is_file()
    assert (outdir / "sourmash_identity_1_scatter_vs_others.png").is_file()
    assert (outdir / "sourmash_identity_1_diff_vs_others.png").is_file()
    pair = pd.read_csv(outdir / "sourmash_identity_1_vs_2.tsv", sep="\t")
    assert len(pair) == 9  # all 3x3 comparisons in common


def test_export_import_comparisons_roundtrip(runner, sourmash_run, tmp_path) -> None:
    """JSON batch export -> import into a fresh DB is lossless + idempotent.

    Mirrors the reference's export_json_db_entries / import_json_comparisons
    worker transport (private_cli.py:454-614).
    """
    import json

    db_path, _outdir = sourmash_run
    json_path = tmp_path / "batch.json"
    result = runner.invoke(
        app,
        ["export-comparisons", "-d", str(db_path), "-o", str(json_path)],
        catch_exceptions=False,
    )
    assert result.exit_code == 0, result.output
    payload = json.loads(json_path.read_text())
    assert set(payload) == {"configuration", "uname", "comparisons"}
    assert len(payload["comparisons"]) == 9

    from pyani_plus_tpu.db import Database

    # Import merges into an existing analysis: the target database must
    # already hold the configuration and genomes (reference contract),
    # as a real worker's would after log-configuration/log-genome.
    new_db = tmp_path / "fresh.sqlite"
    with Database(new_db, create=True) as db:
        config = payload["configuration"]
        db.get_or_create_configuration(
            method=config["method"],
            program=config["program"],
            version=config["version"],
            fragsize=config.get("fragsize"),
            mode=config.get("mode"),
            kmersize=config.get("kmersize"),
            minmatch=config.get("minmatch"),
            extra=config.get("extra"),
        )
        for comp in payload["comparisons"]:
            db.add_genome(comp["query_hash"], "x.fasta", 1, "seeded")
    for _ in range(2):  # second import is a no-op (INSERT OR IGNORE)
        result = runner.invoke(
            app,
            ["import-comparisons", "-d", str(new_db), str(json_path)],
            catch_exceptions=False,
        )
        assert result.exit_code == 0, result.output
    with Database(new_db) as db:
        rows = db.conn.execute("SELECT COUNT(*) FROM comparisons").fetchone()
        assert rows[0] == 9


def test_resume_missing_fasta_errors(runner, viral_example_mod, tmp_path) -> None:
    """Resume re-validates that every input FASTA still exists
    (reference public_cli.py:791-807)."""
    import shutil

    indir = tmp_path / "genomes"
    indir.mkdir()
    for p in sorted(viral_example_mod.glob("*.f*")):
        shutil.copy(p, indir / p.name)
    db_path = tmp_path / "db.sqlite"
    result = runner.invoke(
        app,
        ["sourmash", str(indir), "-d", str(db_path), "--create-db",
         "--scaled", "300"],
        catch_exceptions=False,
    )
    assert result.exit_code == 0, result.output
    with Database(db_path) as db:
        db.execute_with_retries("UPDATE runs SET status='Worker interrupted'")
    victim = next(indir.glob("*.f*"))
    victim.unlink()
    result = runner.invoke(app, ["resume", "-d", str(db_path)])
    assert result.exit_code != 0
    assert "Missing" in str(result.output) + str(result.exception)


def test_resume_version_mismatch_errors(runner, viral_example_mod, tmp_path) -> None:
    """Resume refuses when the recorded program version differs
    (reference public_cli.py:751-786 version equality check)."""
    db_path = tmp_path / "db.sqlite"
    result = runner.invoke(
        app,
        ["sourmash", str(viral_example_mod), "-d", str(db_path),
         "--create-db", "--scaled", "300"],
        catch_exceptions=False,
    )
    assert result.exit_code == 0, result.output
    with Database(db_path) as db:
        db.execute_with_retries("UPDATE runs SET status='Worker interrupted'")
        db.execute_with_retries(
            "UPDATE configurations SET version='0.0.0-ancient'"
        )
    result = runner.invoke(app, ["resume", "-d", str(db_path)])
    assert result.exit_code != 0
    assert "cannot" in (result.output or "").lower()


def test_export_run_incomplete_errors(runner, viral_example_mod, tmp_path) -> None:
    """export-run on a partial run must fail cleanly, not emit matrices
    (reference load_run completeness check, db_orm.py:921-975)."""
    db_path = tmp_path / "db.sqlite"
    result = runner.invoke(
        app,
        ["sourmash", str(viral_example_mod), "-d", str(db_path),
         "--create-db", "--scaled", "300"],
        catch_exceptions=False,
    )
    assert result.exit_code == 0, result.output
    with Database(db_path) as db:
        db.execute_with_retries(
            "DELETE FROM comparisons WHERE comparison_id IN"
            " (SELECT comparison_id FROM comparisons LIMIT 2)"
        )
        db.execute_with_retries("UPDATE runs SET status='Running'")
        # Drop the stale cached matrices so completeness is re-derived
        db.execute_with_retries(
            "UPDATE runs SET df_identity=NULL, df_cov_query=NULL,"
            " df_aln_length=NULL, df_sim_errors=NULL, df_hadamard=NULL"
        )
    outdir = tmp_path / "out"
    outdir.mkdir()
    result = runner.invoke(
        app, ["export-run", "-d", str(db_path), "-o", str(outdir)]
    )
    assert result.exit_code != 0
    assert not list(outdir.glob("*_identity.tsv"))


def test_list_runs_empty_db(runner, tmp_path) -> None:
    """list-runs on a fresh database shows no runs and exits 0."""
    db_path = tmp_path / "empty.sqlite"
    with Database(db_path, create=True):
        pass
    result = runner.invoke(app, ["list-runs", "-d", str(db_path)])
    assert result.exit_code == 0, result.output


def test_export_run_selects_run_id(runner, viral_example_mod, tmp_path) -> None:
    """--run-id exports the requested run, not the latest."""
    db_path = tmp_path / "db.sqlite"
    for scaled in ("300", "1000"):
        result = runner.invoke(
            app,
            ["sourmash", str(viral_example_mod), "-d", str(db_path),
             "--create-db", "--scaled", scaled],
            catch_exceptions=False,
        )
        assert result.exit_code == 0, result.output
    texts = {}
    for run_id in ("1", "2"):
        outdir = tmp_path / f"out{run_id}"
        outdir.mkdir()
        result = runner.invoke(
            app,
            ["export-run", "-d", str(db_path), "-o", str(outdir),
             "--run-id", run_id],
            catch_exceptions=False,
        )
        assert result.exit_code == 0, result.output
        texts[run_id] = (outdir / f"sourmash_run_{run_id}.tsv").read_text()
    # scaled=300 vs scaled=1000 runs produce different containment values
    assert texts["1"] != texts["2"]
