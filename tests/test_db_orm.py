"""Deeper result-store semantics, mirroring the reference's test_orm.py.

The store must reproduce the reference data model exactly
(db_orm.py:103-466): content-MD5 keyed genomes, NULL-aware configuration
uniqueness, comparisons shared between runs and never recomputed,
JSON-cached matrices that persist across connections, and idempotent
merges (the invariant behind interrupt/resume and multi-host).
"""

import math
import sqlite3
from pathlib import Path

import numpy as np
import pytest

from pyani_plus_tpu.db import Database


def _seed(tmp_path, n=3, name="db.sqlite"):
    db = Database(tmp_path / name, create=True)
    hashes = [f"{i:032x}" for i in range(n)]
    for i, h in enumerate(hashes):
        db.add_genome(h, f"/data/g{i}.fasta", 1000 + i, f"genome {i}")
    config = db.get_or_create_configuration(
        "ANIm", "nucmer", "3.23", mode="mum"
    )
    run = db.add_run(
        config.configuration_id,
        "pyani-plus-tpu anim ...",
        "/data",
        "Running",
        "orm test",
        [(h, f"g{i}.fasta") for i, h in enumerate(hashes)],
    )
    return db, config, run, hashes


def _full_rows(hashes):
    rows = []
    for q in hashes:
        for s in hashes:
            rows.append(
                {
                    "query_hash": q,
                    "subject_hash": s,
                    "identity": 1.0 if q == s else 0.9,
                    "aln_length": 1000,
                    "sim_errors": 0 if q == s else 100,
                    "cov_query": 1.0 if q == s else 0.5,
                    "cov_subject": 1.0 if q == s else 0.5,
                }
            )
    return rows


def test_add_genome_keeps_first_metadata(tmp_path) -> None:
    """INSERT OR IGNORE: a hash collision keeps the original row."""
    db = Database(tmp_path / "a.sqlite", create=True)
    db.add_genome("abc", "/one.fasta", 10, "first")
    db.add_genome("abc", "/two.fasta", 99, "second")
    row = db.conn.execute("SELECT * FROM genomes WHERE genome_hash='abc'").fetchone()
    assert row["path"] == "/one.fasta"
    assert row["length"] == 10
    assert row["description"] == "first"


def test_configuration_null_fields_are_distinct(tmp_path) -> None:
    """NULL-valued parameters participate in uniqueness (IS matching)."""
    db = Database(tmp_path / "a.sqlite", create=True)
    c1 = db.get_or_create_configuration("fastANI", "p", "1", fragsize=None)
    c2 = db.get_or_create_configuration("fastANI", "p", "1", fragsize=3000)
    c3 = db.get_or_create_configuration("fastANI", "p", "1", fragsize=None)
    assert c1.configuration_id != c2.configuration_id
    assert c1.configuration_id == c3.configuration_id


def test_configuration_create_false_missing_raises(tmp_path) -> None:
    db = Database(tmp_path / "a.sqlite", create=True)
    with pytest.raises(ValueError, match="Configuration for nosuch not found"):
        db.get_or_create_configuration("nosuch", "p", "1", create=False)


def test_get_configuration_unknown_id_raises(tmp_path) -> None:
    db = Database(tmp_path / "a.sqlite", create=True)
    with pytest.raises(ValueError, match="Configuration 99 not found"):
        db.get_configuration(99)


def test_load_run_latest_and_missing(tmp_path) -> None:
    db, config, run1, hashes = _seed(tmp_path)
    run2 = db.add_run(
        config.configuration_id, "cmd2", "/data", "Running", "second", []
    )
    assert db.load_run().run_id == run2.run_id  # latest by default
    assert db.load_run(run1.run_id).name == "orm test"
    with pytest.raises(ValueError, match="no run-id 42"):
        db.load_run(42)


def test_load_run_empty_db_raises(tmp_path) -> None:
    db = Database(tmp_path / "a.sqlite", create=True)
    with pytest.raises(ValueError, match="contains no runs"):
        db.load_run()


def test_check_empty_and_check_complete(tmp_path) -> None:
    db, config, run, hashes = _seed(tmp_path)
    with pytest.raises(ValueError, match="has no comparisons"):
        db.load_run(run.run_id, check_empty=True)
    # one row is not enough for completeness: error names the counts
    db.insert_comparisons(
        _full_rows(hashes)[:1], configuration_id=config.configuration_id
    )
    with pytest.raises(ValueError, match=r"only has 1 of 3²=9"):
        db.load_run(run.run_id, check_complete=True)
    db.load_run(run.run_id, check_empty=True)  # no longer empty


def test_check_complete_caches_matrices_persistently(tmp_path) -> None:
    """check_complete triggers cache_comparisons; the JSON persists so a
    NEW connection sees the matrices without touching comparisons."""
    db, config, run, hashes = _seed(tmp_path)
    db.insert_comparisons(
        _full_rows(hashes), configuration_id=config.configuration_id
    )
    assert db.load_run(run.run_id).identities is None  # not cached yet
    db.load_run(run.run_id, check_complete=True)
    db.close()
    db2 = Database(tmp_path / "db.sqlite")
    reloaded = db2.load_run(run.run_id)
    matrix = reloaded.identities
    assert matrix is not None
    assert matrix.shape == (3, 3)
    assert float(matrix.iloc[0, 0]) == 1.0
    assert float(matrix.iloc[0, 1]) == 0.9


def test_comparisons_scoped_to_run_genomes(tmp_path) -> None:
    """A second run over a genome subset sees only its own pair block."""
    db, config, run, hashes = _seed(tmp_path)
    db.insert_comparisons(
        _full_rows(hashes), configuration_id=config.configuration_id
    )
    sub = db.add_run(
        config.configuration_id,
        "cmd-sub",
        "/data",
        "Running",
        "subset",
        [(hashes[0], "g0.fasta"), (hashes[1], "g1.fasta")],
    )
    assert run.comparisons_count() == 9
    assert sub.comparisons_count() == 4  # 2x2 block, shared rows
    done, null = sub.comparison_status_counts()
    assert (done, null) == (4, 0)


def test_status_counts_with_nulls(tmp_path) -> None:
    db, config, run, hashes = _seed(tmp_path, n=2)
    rows = _full_rows(hashes)
    for r in rows[2:]:
        r["identity"] = None
    db.insert_comparisons(rows, configuration_id=config.configuration_id)
    done, null = run.comparison_status_counts()
    assert (done, null) == (2, 2)


def test_delete_run_keeps_genomes_and_comparisons(tmp_path) -> None:
    """delete-run drops the run + associations only; computed results
    remain shared state (reference delete-run semantics)."""
    db, config, run, hashes = _seed(tmp_path)
    db.insert_comparisons(
        _full_rows(hashes), configuration_id=config.configuration_id
    )
    db.delete_run(run.run_id)
    assert db.list_runs() == []
    n_genomes = db.conn.execute("SELECT COUNT(*) FROM genomes").fetchone()[0]
    n_comp = db.conn.execute("SELECT COUNT(*) FROM comparisons").fetchone()[0]
    assert n_genomes == 3
    assert n_comp == 9


def test_insert_comparisons_idempotent_across_connections(tmp_path) -> None:
    """Re-inserting the same pairs from a second connection is a no-op
    (the uniqueness constraint absorbs duplicate work -- the multi-host
    merge invariant)."""
    db, config, run, hashes = _seed(tmp_path)
    rows = _full_rows(hashes)
    db.insert_comparisons(rows, configuration_id=config.configuration_id)
    other = Database(tmp_path / "db.sqlite")
    changed = [dict(r, identity=0.123) for r in rows]
    other.insert_comparisons(
        changed, configuration_id=config.configuration_id
    )
    other.close()
    vals = {
        row["identity"]
        for row in db.conn.execute("SELECT identity FROM comparisons")
    }
    assert vals == {1.0, 0.9}  # first write wins everywhere


def test_existing_pairs_empty_hash_list(tmp_path) -> None:
    db, config, run, hashes = _seed(tmp_path)
    assert db.existing_pairs(config.configuration_id, []) == set()


def test_existing_pairs_scoped_by_configuration(tmp_path) -> None:
    db, config, run, hashes = _seed(tmp_path, n=2)
    db.insert_comparisons(
        _full_rows(hashes), configuration_id=config.configuration_id
    )
    other = db.get_or_create_configuration("ANIb", "blastn", "2.16")
    assert len(db.existing_pairs(config.configuration_id, hashes)) == 4
    assert db.existing_pairs(other.configuration_id, hashes) == set()


def test_tani_matrix_values(tmp_path) -> None:
    """tANI = -ln(identity * cov_query); zero hadamard maps to NaN."""
    db, config, run, hashes = _seed(tmp_path, n=2)
    rows = _full_rows(hashes)
    rows[1]["identity"] = 0.0
    rows[1]["cov_query"] = 0.0
    db.insert_comparisons(rows, configuration_id=config.configuration_id)
    run = db.load_run(run.run_id, check_complete=True)
    tani = run.tani
    assert math.isclose(float(tani.iloc[0, 0]), 0.0, abs_tol=1e-12)
    assert np.isnan(float(tani.iloc[0, 1]))  # -ln(0) -> NaN by contract
    expected = -math.log(0.9 * 0.5)
    assert math.isclose(float(tani.iloc[1, 0]), expected, rel_tol=1e-12)


def test_relabelled_matrix_schemes(tmp_path) -> None:
    db, config, run, hashes = _seed(tmp_path, n=2)
    db.insert_comparisons(
        _full_rows(hashes), configuration_id=config.configuration_id
    )
    run = db.load_run(run.run_id, check_complete=True)
    matrix = run.identities
    assert list(run.relabelled_matrix(matrix, "md5").index) == hashes
    by_file = run.relabelled_matrix(matrix, "filename")
    assert sorted(by_file.index) == ["g0.fasta", "g1.fasta"]
    by_stem = run.relabelled_matrix(matrix, "stem")
    assert sorted(by_stem.index) == ["g0", "g1"]
    with pytest.raises(ValueError, match="Unexpected label scheme"):
        run.relabelled_matrix(matrix, "nonsense")


def test_set_status_persists(tmp_path) -> None:
    db, config, run, hashes = _seed(tmp_path)
    run.set_status("Done")
    db.close()
    db2 = Database(tmp_path / "db.sqlite")
    assert db2.load_run(run.run_id).status == "Done"


def test_run_hash_to_filename_and_order(tmp_path) -> None:
    """genome_hashes come back sorted (matrix index order contract)."""
    db = Database(tmp_path / "a.sqlite", create=True)
    config = db.get_or_create_configuration("sourmash", "p", "1")
    for h in ("zz", "aa"):
        db.add_genome(h, f"/{h}.fasta", 5, h)
    run = db.add_run(
        config.configuration_id,
        "cmd",
        "/data",
        "Running",
        "r",
        [("zz", "zz.fasta"), ("aa", "aa.fasta")],
    )
    assert run.genome_hashes == ["aa", "zz"]
    assert run.hash_to_filename == {"zz": "zz.fasta", "aa": "aa.fasta"}


def test_add_run_tolerates_duplicate_genome_rows(tmp_path) -> None:
    db = Database(tmp_path / "a.sqlite", create=True)
    config = db.get_or_create_configuration("sourmash", "p", "1")
    db.add_genome("aa", "/aa.fasta", 5, "aa")
    run = db.add_run(
        config.configuration_id,
        "cmd",
        "/data",
        "Running",
        "r",
        [("aa", "aa.fasta"), ("aa", "aa.fasta")],
    )
    assert run.genome_hashes == ["aa"]


def test_missing_database_is_filenotfound(tmp_path) -> None:
    with pytest.raises(FileNotFoundError, match="does not exist"):
        Database(tmp_path / "nope.sqlite")


def test_sqlite_row_level_uniqueness_direct(tmp_path) -> None:
    """The comparisons uniqueness constraint exists at the SQL level, not
    just in the helper (a raw duplicate INSERT without OR IGNORE fails)."""
    db, config, run, hashes = _seed(tmp_path, n=2)
    db.insert_comparisons(
        _full_rows(hashes)[:1], configuration_id=config.configuration_id
    )
    with pytest.raises(sqlite3.IntegrityError):
        db.conn.execute(
            "INSERT INTO comparisons (configuration_id, query_hash,"
            " subject_hash) VALUES (?, ?, ?)",
            (config.configuration_id, hashes[0], hashes[0]),
        )


# ---- reference test_orm.py depth: nullable round-trips, concurrent
# writers, cache rebuild after partial deletes (VERDICT r3 item 9)


def test_comparison_nullable_columns_roundtrip_each(tmp_path) -> None:
    """Every nullable comparison column survives a store round-trip on
    its own: one row per column with ONLY that field NULL, plus one row
    with every field NULL (the bad_alignments contract) -- mirroring the
    reference's per-column schema round-trips (tests/test_orm.py)."""
    db, config, run, hashes = _seed(tmp_path, n=3)
    fields = ["identity", "aln_length", "sim_errors", "cov_query", "cov_subject"]
    template = {
        "identity": 0.75,
        "aln_length": 1234,
        "sim_errors": 42,
        "cov_query": 0.5,
        "cov_subject": 0.25,
    }
    rows = []
    pairs = [(q, s) for q in hashes for s in hashes]
    for i, field in enumerate(fields):
        row = dict(template)
        row[field] = None
        q, s = pairs[i]
        rows.append({"query_hash": q, "subject_hash": s, **row})
    q, s = pairs[len(fields)]
    rows.append(
        {"query_hash": q, "subject_hash": s, **{f: None for f in fields}}
    )
    db.insert_comparisons(rows, configuration_id=config.configuration_id)
    got = {
        (r["query_hash"], r["subject_hash"]): r
        for r in db.load_run(run.run_id).comparisons()
    }
    for i, field in enumerate(fields):
        row = got[pairs[i]]
        assert row[field] is None, field
        for other in fields:
            if other != field:
                assert row[other] == template[other], (field, other)
    all_null = got[pairs[len(fields)]]
    assert all(all_null[f] is None for f in fields)


def test_configuration_uniqueness_all_five_generic_columns(tmp_path) -> None:
    """The 5 generic configuration columns (fragsize, mode, kmersize,
    minmatch, extra) each participate in uniqueness, NULL vs value
    included (ref db_orm.py:148-215)."""
    db = Database(tmp_path / "cfg.sqlite", create=True)
    base = {
        "fragsize": 1020,
        "mode": "mum",
        "kmersize": 16,
        "minmatch": 0.2,
        "extra": "scaled=1000",
    }
    first = db.get_or_create_configuration("m", "p", "1", **base)
    assert (
        db.get_or_create_configuration("m", "p", "1", **base).configuration_id
        == first.configuration_id
    )
    for field, variant in [
        ("fragsize", 1000),
        ("mode", "maxmatch"),
        ("kmersize", 17),
        ("minmatch", 0.3),
        ("extra", "scaled=300"),
        ("fragsize", None),
        ("mode", None),
        ("kmersize", None),
        ("minmatch", None),
        ("extra", None),
    ]:
        changed = dict(base)
        changed[field] = variant
        other = db.get_or_create_configuration("m", "p", "1", **changed)
        assert other.configuration_id != first.configuration_id, (field, variant)
        again = db.get_or_create_configuration("m", "p", "1", **changed)
        assert again.configuration_id == other.configuration_id


def test_concurrent_thread_writers_dedupe(tmp_path) -> None:
    """Several threads bulk-inserting the SAME rows through separate
    connections converge on exactly one row per pair (the INSERT OR
    IGNORE + busy-timeout discipline, ref db_orm.py:1044-1114)."""
    import threading

    db, config, run, hashes = _seed(tmp_path, n=4)
    db.close()
    rows = _full_rows(hashes)
    errors: list[Exception] = []

    def writer() -> None:
        try:
            mine = Database(tmp_path / "db.sqlite")
            for chunk_start in range(0, len(rows), 5):
                mine.insert_comparisons(
                    rows[chunk_start : chunk_start + 5],
                    configuration_id=config.configuration_id,
                )
            mine.close()
        except Exception as err:  # pragma: no cover - failure detail
            errors.append(err)

    threads = [threading.Thread(target=writer) for _ in range(4)]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    assert not errors
    check = Database(tmp_path / "db.sqlite")
    count = check.conn.execute("SELECT COUNT(*) FROM comparisons").fetchone()[0]
    assert count == len(hashes) ** 2
    reloaded = check.load_run(run.run_id, check_complete=True)
    assert reloaded.comparisons_count() == len(hashes) ** 2


def test_concurrent_process_writers_dedupe(tmp_path) -> None:
    """Two OS processes inserting overlapping row sets merge to exactly
    one row per pair (cross-process file locking, not just the GIL)."""
    import subprocess
    import sys

    db, config, run, hashes = _seed(tmp_path, n=4)
    db.close()
    script = f"""
import sys
sys.path.insert(0, {str(Path(__file__).resolve().parents[1])!r})
from pyani_plus_tpu.db import Database
hashes = {hashes!r}
rows = [
    {{"query_hash": q, "subject_hash": s, "identity": 0.9,
      "aln_length": 1000, "sim_errors": 100, "cov_query": 0.5,
      "cov_subject": 0.5}}
    for q in hashes for s in hashes
]
which = int(sys.argv[1])
db = Database({str(tmp_path / "db.sqlite")!r})
# overlapping halves: [0:12] and [6:16]
share = rows[:12] if which == 0 else rows[6:]
for start in range(0, len(share), 4):
    db.insert_comparisons(share[start:start+4], configuration_id={config.configuration_id})
db.close()
"""
    procs = [
        subprocess.Popen([sys.executable, "-c", script, str(i)])
        for i in range(2)
    ]
    for p in procs:
        assert p.wait(timeout=120) == 0
    check = Database(tmp_path / "db.sqlite")
    count = check.conn.execute("SELECT COUNT(*) FROM comparisons").fetchone()[0]
    assert count == len(hashes) ** 2


def test_matrix_cache_rebuild_after_partial_delete(tmp_path) -> None:
    """Deleting comparisons invalidates completeness; re-inserting and
    re-checking rebuilds the cached matrices with the NEW values (the
    cache is derived state, never authoritative)."""
    db, config, run, hashes = _seed(tmp_path)
    db.insert_comparisons(
        _full_rows(hashes), configuration_id=config.configuration_id
    )
    db.load_run(run.run_id, check_complete=True)
    before = db.load_run(run.run_id).identities
    assert float(before.iloc[0, 1]) == 0.9

    # partial delete -> completeness check must now fail
    db.execute_with_retries(
        "DELETE FROM comparisons WHERE comparison_id IN"
        " (SELECT comparison_id FROM comparisons LIMIT 4)"
    )
    with pytest.raises(ValueError, match="of 3²=9"):
        db.load_run(run.run_id, check_complete=True)

    # recompute with different values; rebuilt cache reflects them
    replacement = []
    for q in hashes:
        for s in hashes:
            replacement.append(
                {
                    "query_hash": q,
                    "subject_hash": s,
                    "identity": 1.0 if q == s else 0.8,
                    "aln_length": 2000,
                    "sim_errors": 0 if q == s else 400,
                    "cov_query": 1.0,
                    "cov_subject": 1.0,
                }
            )
    db.insert_comparisons(
        replacement, configuration_id=config.configuration_id
    )
    # load_run keeps an EXISTING cache (reference db_orm.py:958-973
    # only caches when absent) -- the stale values survive ...
    run2 = db.load_run(run.run_id, check_complete=True)
    stale = sorted(set(np.round(run2.identities.values.ravel(), 6)))
    assert stale == [0.9, 1.0]
    # ... until the run path's unconditional cache_comparisons()
    # (runner finalisation, ref public_cli.py:302-324) rebuilds from the
    # store: surviving originals keep their value (INSERT OR IGNORE
    # never overwrites), the 4 deleted slots now hold replacements
    run2.cache_comparisons()
    rebuilt = db.load_run(run.run_id).identities
    values = sorted(np.round(rebuilt.values.ravel(), 6))
    assert set(values) <= {0.8, 0.9, 1.0}
    assert 0.8 in values
