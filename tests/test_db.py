"""Tests for the content-addressed result store."""

import math

import numpy as np
import pytest

from pyani_plus_tpu.db import Database


def _make_db(tmp_path, n=2):
    db = Database(tmp_path / "test.sqlite", create=True)
    hashes = [f"{i:032x}" for i in range(n)]
    for i, h in enumerate(hashes):
        db.add_genome(h, f"/tmp/g{i}.fasta", 1000 + i, f"genome {i}")
    config = db.get_or_create_configuration(
        "sourmash", "prog", "1.0", kmersize=31, extra="scaled=1000"
    )
    run = db.add_run(
        config.configuration_id,
        "cmd",
        "/tmp",
        "Running",
        "test run",
        [(h, f"g{i}.fasta") for i, h in enumerate(hashes)],
    )
    return db, config, run, hashes


def test_configuration_idempotent(tmp_path) -> None:
    db = Database(tmp_path / "t.sqlite", create=True)
    c1 = db.get_or_create_configuration("ANIm", "p", "1", mode="mum")
    c2 = db.get_or_create_configuration("ANIm", "p", "1", mode="mum")
    c3 = db.get_or_create_configuration("ANIm", "p", "1", mode="maxmatch")
    assert c1.configuration_id == c2.configuration_id
    assert c1.configuration_id != c3.configuration_id


def test_missing_db_raises(tmp_path) -> None:
    with pytest.raises(FileNotFoundError):
        Database(tmp_path / "nope.sqlite")


def test_insert_or_ignore_dedupe(tmp_path) -> None:
    db, config, run, hashes = _make_db(tmp_path)
    rows = [
        {
            "query_hash": q,
            "subject_hash": s,
            "identity": 0.99,
            "cov_query": 0.9,
            "aln_length": 100,
            "sim_errors": 1,
            "cov_subject": 0.8,
        }
        for q in hashes
        for s in hashes
    ]
    db.insert_comparisons(rows, configuration_id=config.configuration_id)
    # Re-inserting the same pairs must not duplicate (INSERT OR IGNORE)
    db.insert_comparisons(rows, configuration_id=config.configuration_id)
    assert run.comparisons_count() == 4


def test_matrix_cache_and_tani(tmp_path) -> None:
    db, config, run, hashes = _make_db(tmp_path)
    rows = []
    for q in hashes:
        for s in hashes:
            rows.append(
                {
                    "query_hash": q,
                    "subject_hash": s,
                    "identity": 1.0 if q == s else 0.9,
                    "cov_query": 1.0 if q == s else 0.5,
                    "aln_length": 100,
                    "sim_errors": 0,
                    "cov_subject": None,
                }
            )
    db.insert_comparisons(rows, configuration_id=config.configuration_id)
    run = db.load_run(run.run_id, check_complete=True)
    identity = run.identities
    assert identity.shape == (2, 2)
    assert identity.values[0, 0] == 1.0
    hadamard = run.hadamard
    assert hadamard.values[0, 1] == pytest.approx(0.45)
    tani = run.tani
    assert tani.values[0, 0] == pytest.approx(0.0)
    assert tani.values[0, 1] == pytest.approx(-math.log(0.45))


def test_null_comparisons_are_nan(tmp_path) -> None:
    db, config, run, hashes = _make_db(tmp_path)
    rows = [
        {
            "query_hash": q,
            "subject_hash": s,
            "identity": None,
            "cov_query": None,
            "aln_length": None,
            "sim_errors": None,
            "cov_subject": None,
        }
        for q in hashes
        for s in hashes
    ]
    db.insert_comparisons(rows, configuration_id=config.configuration_id)
    run = db.load_run(run.run_id, check_complete=True)
    assert np.isnan(run.identities.values).all()
    assert np.isnan(run.tani.values).all()


def test_incomplete_run_check(tmp_path) -> None:
    db, config, run, hashes = _make_db(tmp_path)
    db.insert_comparisons(
        [
            {
                "query_hash": hashes[0],
                "subject_hash": hashes[0],
                "identity": 1.0,
                "cov_query": 1.0,
                "aln_length": 1,
                "sim_errors": 0,
                "cov_subject": 1.0,
            }
        ],
        configuration_id=config.configuration_id,
    )
    with pytest.raises(ValueError, match="only has 1 of"):
        db.load_run(run.run_id, check_complete=True)


def test_relabel_duplicate_stems(tmp_path) -> None:
    db = Database(tmp_path / "t.sqlite", create=True)
    db.add_genome("a" * 32, "/x/assembly.fasta", 10, "a")
    db.add_genome("b" * 32, "/x/assembly.fna", 10, "b")
    config = db.get_or_create_configuration("sourmash", "p", "1")
    run = db.add_run(
        config.configuration_id,
        "cmd",
        "/x",
        "Running",
        "r",
        [("a" * 32, "assembly.fasta"), ("b" * 32, "assembly.fna")],
    )
    rows = [
        {"query_hash": q, "subject_hash": s, "identity": 1.0, "cov_query": 1.0}
        for q in ("a" * 32, "b" * 32)
        for s in ("a" * 32, "b" * 32)
    ]
    db.insert_comparisons(rows, configuration_id=config.configuration_id)
    run = db.load_run(run.run_id, check_complete=True)
    with pytest.raises(ValueError, match="Duplicate filename stems"):
        run.relabelled_matrix(run.identities, "stem")
    with pytest.raises(ValueError, match="Unexpected label scheme"):
        run.relabelled_matrix(run.identities, "nope")


def test_existing_pairs_resume_semantics(tmp_path) -> None:
    db, config, run, hashes = _make_db(tmp_path)
    db.insert_comparisons(
        [
            {
                "query_hash": hashes[0],
                "subject_hash": hashes[1],
                "identity": 0.9,
                "cov_query": 0.9,
            }
        ],
        configuration_id=config.configuration_id,
    )
    done = db.existing_pairs(config.configuration_id, hashes)
    assert done == {(hashes[0], hashes[1])}
