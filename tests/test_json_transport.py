"""import-comparisons validation, mirroring the reference's test_json.py.

The JSON batch transport is how workers ship results home without
touching a shared database; import must therefore refuse anything that
could silently corrupt a merge: unknown configurations, incomplete
records, malformed payloads (reference private_cli.py import error
contract, tests/test_json.py:36-230).
"""

import json
from pathlib import Path

import pytest
from click.testing import CliRunner

from pyani_plus_tpu.cli.main import app
from pyani_plus_tpu.db import Database

CONFIG = {
    "method": "guessing",
    "program": "guestimate",
    "version": "0.1.2beta3",
    "fragsize": 100,
    "kmersize": 51,
}
UNAME = {"system": "Linux", "release": "6.0", "machine": "x86_64"}


@pytest.fixture
def runner():
    return CliRunner()


def _invoke(runner, db, *json_files):
    return runner.invoke(
        app,
        ["import-comparisons", "-d", str(db), *map(str, json_files)],
        catch_exceptions=False,
    )


def _seeded_db(tmp_path, *, configs=True, genomes=True) -> Path:
    db_path = tmp_path / "import.sqlite"
    with Database(db_path, create=True) as db:
        if configs:
            db.get_or_create_configuration(
                CONFIG["method"],
                CONFIG["program"],
                CONFIG["version"],
                fragsize=CONFIG["fragsize"],
                kmersize=CONFIG["kmersize"],
            )
        if genomes:
            db.add_genome("689d3fd6881db36b5e08329cf23cecdd", "a.fas", 10, "a")
            db.add_genome("78975d5144a1cd12e98898d573cf6536", "b.fna", 10, "b")
    return db_path


def _payload(comparisons, config=CONFIG, uname=UNAME) -> str:
    return json.dumps(
        {"configuration": config, "uname": uname, "comparisons": comparisons}
    )


def test_missing_database_errors(runner, tmp_path) -> None:
    j = tmp_path / "x.json"
    j.touch()
    result = _invoke(runner, tmp_path / "nope.sqlite", j)
    assert result.exit_code != 0


def test_database_without_configurations_errors(runner, tmp_path) -> None:
    db_path = _seeded_db(tmp_path, configs=False, genomes=False)
    j = tmp_path / "x.json"
    j.touch()
    result = _invoke(runner, db_path, j)
    assert result.exit_code != 0
    assert "does not contain any configurations" in result.output


def test_database_without_genomes_errors(runner, tmp_path) -> None:
    db_path = _seeded_db(tmp_path, genomes=False)
    j = tmp_path / "x.json"
    j.touch()
    result = _invoke(runner, db_path, j)
    assert result.exit_code != 0
    assert "does not contain any genomes" in result.output


def test_empty_file_warns_and_continues(runner, tmp_path) -> None:
    db_path = _seeded_db(tmp_path)
    j = tmp_path / "x.json"
    j.touch()
    result = _invoke(runner, db_path, j)
    assert result.exit_code == 0, result.output
    assert "Imported 0 comparisons" in result.output


def test_invalid_json_errors(runner, tmp_path) -> None:
    db_path = _seeded_db(tmp_path)
    j = tmp_path / "x.json"
    j.write_text("[")
    result = _invoke(runner, db_path, j)
    assert result.exit_code != 0
    assert "invalid" in result.output


def test_unexpected_structure_errors(runner, tmp_path) -> None:
    db_path = _seeded_db(tmp_path)
    j = tmp_path / "x.json"
    j.write_text("[]")
    result = _invoke(runner, db_path, j)
    assert result.exit_code != 0
    assert "does not use the expected structure" in result.output


def test_unknown_configuration_errors(runner, tmp_path) -> None:
    """A configuration the database has never seen must NOT be created."""
    db_path = _seeded_db(tmp_path)
    j = tmp_path / "x.json"
    j.write_text(
        _payload(
            [],
            config={"method": "ANIm", "program": "nucmer", "version": "3.1"},
        )
    )
    result = _invoke(runner, db_path, j)
    assert result.exit_code != 0
    assert "configuration not in database" in result.output
    with Database(db_path) as db:
        count = db.conn.execute(
            "SELECT COUNT(*) FROM configurations"
        ).fetchone()[0]
    assert count == 1  # nothing new created


def test_incomplete_uname_errors(runner, tmp_path) -> None:
    db_path = _seeded_db(tmp_path)
    j = tmp_path / "x.json"
    j.write_text(_payload([], uname={"system": "Linux", "release": "6.0"}))
    result = _invoke(runner, db_path, j)
    assert result.exit_code != 0
    assert "uname incomplete" in result.output


def test_incomplete_configuration_errors(runner, tmp_path) -> None:
    db_path = _seeded_db(tmp_path)
    j = tmp_path / "x.json"
    j.write_text(_payload([], config={"method": "guessing"}))
    result = _invoke(runner, db_path, j)
    assert result.exit_code != 0
    assert "configuration incomplete" in result.output


def test_no_comparisons_is_warning_only(runner, tmp_path) -> None:
    db_path = _seeded_db(tmp_path)
    j = tmp_path / "x.json"
    j.write_text(_payload([]))
    result = _invoke(runner, db_path, j)
    assert result.exit_code == 0, result.output


def test_incomplete_comparison_errors(runner, tmp_path) -> None:
    db_path = _seeded_db(tmp_path)
    j = tmp_path / "x.json"
    j.write_text(
        _payload(
            [{"query_hash": "689d3fd6881db36b5e08329cf23cecdd", "identity": 0.99}]
        )
    )
    result = _invoke(runner, db_path, j)
    assert result.exit_code != 0
    assert "comparison(s) incomplete" in result.output


def test_valid_import_inserts(runner, tmp_path) -> None:
    db_path = _seeded_db(tmp_path)
    j = tmp_path / "x.json"
    j.write_text(
        _payload(
            [
                {
                    "query_hash": "689d3fd6881db36b5e08329cf23cecdd",
                    "subject_hash": "78975d5144a1cd12e98898d573cf6536",
                    "identity": 0.99,
                }
            ]
        )
    )
    result = _invoke(runner, db_path, j)
    assert result.exit_code == 0, result.output
    assert "Imported 1 comparisons" in result.output
    with Database(db_path) as db:
        row = db.conn.execute(
            "SELECT identity, uname_system FROM comparisons"
        ).fetchone()
    assert row["identity"] == 0.99
    assert row["uname_system"] == "Linux"


def test_multiple_files_one_bad_stops(runner, tmp_path) -> None:
    """A bad file aborts the command; earlier good files are kept
    (idempotence makes re-running after a fix safe)."""
    db_path = _seeded_db(tmp_path)
    good = tmp_path / "good.json"
    good.write_text(
        _payload(
            [
                {
                    "query_hash": "689d3fd6881db36b5e08329cf23cecdd",
                    "subject_hash": "689d3fd6881db36b5e08329cf23cecdd",
                    "identity": 1.0,
                }
            ]
        )
    )
    bad = tmp_path / "bad.json"
    bad.write_text("[")
    result = _invoke(runner, db_path, good, bad)
    assert result.exit_code != 0
    with Database(db_path) as db:
        count = db.conn.execute("SELECT COUNT(*) FROM comparisons").fetchone()[0]
    assert count == 1
