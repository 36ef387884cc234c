"""Multi-host pair-grid sharding: two workers, one store, idempotent merge."""

import os
import subprocess
import sys
from pathlib import Path

import pytest

from pyani_plus_tpu.db import Database

VIRAL = Path("/root/reference/tests/fixtures/viral_example")


@pytest.mark.skipif(not VIRAL.is_dir(), reason="reference fixtures missing")
def test_two_host_run_merges(tmp_path) -> None:
    """Two processes each own half the pair grid; store merges cleanly."""
    db_path = tmp_path / "db.sqlite"
    base_env = dict(os.environ)
    base_env["JAX_PLATFORMS"] = "cpu"
    # Sequential for determinism (simultaneous hosts can both observe a
    # partial grid and defer completion to `resume`; the merge semantics
    # under test are identical either way).
    for index in range(2):
        env = dict(base_env)
        env["PYANI_TPU_PROCESS_COUNT"] = "2"
        env["PYANI_TPU_PROCESS_INDEX"] = str(index)
        result = subprocess.run(
            [
                sys.executable,
                "-m",
                "pyani_plus_tpu.cli.main",
                "sourmash",
                str(VIRAL),
                "-d",
                str(db_path),
                "--create-db",
                "--scaled",
                "300",
            ],
            cwd="/root/repo",
            env=env,
            capture_output=True,
            timeout=300,
        )
        assert result.returncode == 0, result.stdout.decode()[-500:]
        with Database(db_path) as db:
            count = db.conn.execute(
                "SELECT COUNT(*) FROM comparisons"
            ).fetchone()[0]
        # Host 0 computed only its share; host 1 completes the grid
        assert count == (5 if index == 0 else 9) or count == (4 if index == 0 else 9)

    with Database(db_path) as db:
        # Both processes created a run row; every pair must be present
        count = db.conn.execute("SELECT COUNT(*) FROM comparisons").fetchone()[0]
        assert count == 9
        runs = db.list_runs()
        assert any(r.comparisons_count() == 9 for r in runs)
        # Whoever finished last cached matrices and marked Done
        assert any(r.status == "Done" for r in runs)
