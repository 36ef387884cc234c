"""Fault injection: SIGINT a live run, verify graceful recovery + resume.

Mirrors the reference's tests/test_interrupt.py strategy: start a real
worker process, interrupt it mid-run, assert a clean exit with partial
results persisted and the run marked "Worker interrupted", then resume
to completion.
"""

import os
import signal
import subprocess
import sys
import time
from pathlib import Path

import pytest

from pyani_plus_tpu.db import Database

VIRAL = Path("/root/reference/tests/fixtures/viral_example")


def _write_related_genomes(
    directory: Path, count: int = 8, length: int = 60_000
) -> None:
    """Synthetic ~1%-divergent genomes so the run lasts long enough to
    interrupt deterministically (the reference's interrupt test also
    uses generated genomes, tests/test_interrupt.py:41-57)."""
    import numpy as np

    rng = np.random.default_rng(42)
    base = rng.integers(0, 4, length).astype(np.uint8)
    alphabet = np.frombuffer(b"ACGT", dtype=np.uint8)
    for i in range(count):
        variant = base.copy()
        sites = rng.random(variant.size) < 0.01
        variant[sites] = (variant[sites] + rng.integers(1, 4)) % 4
        seq = alphabet[variant].tobytes()
        with (directory / f"genome_{i}.fasta").open("wb") as handle:
            handle.write(b">genome_%d synthetic\n" % i)
            for start in range(0, len(seq), 60):
                handle.write(seq[start : start + 60] + b"\n")


@pytest.mark.parametrize("method", ["anim", "fastani"])
def test_sigint_mid_run(method, tmp_path) -> None:
    """SIGINT fault injection per method (reference runs resume-from-
    partial for every method, test_public_cli.py:1145-1578; here the
    interrupt contract is exercised for an alignment method and a
    sketch method end-to-end)."""
    genomes_dir = tmp_path / "genomes"
    genomes_dir.mkdir()
    # fastANI pairs are much faster than ANIm pairs; use larger genomes
    # so the run reliably outlives the interrupt poll.
    _write_related_genomes(
        genomes_dir, length=60_000 if method == "anim" else 400_000
    )
    n_pairs = 64
    db_path = tmp_path / "db.sqlite"
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    proc = subprocess.Popen(
        [
            sys.executable,
            "-m",
            "pyani_plus_tpu.cli.main",
            method,
            str(genomes_dir),
            "-d",
            str(db_path),
            "--create-db",
        ],
        cwd="/root/repo",
        env=env,
        stdout=subprocess.PIPE,
        stderr=subprocess.STDOUT,
    )
    # Partial rows are persisted *at* interrupt time (the in-memory flush
    # window is 300 s). The run has grown fast enough that a fixed timer
    # races completion, so poll until the run row exists and at least a
    # couple of seconds of compute have elapsed, then interrupt.
    deadline = time.time() + 120
    started = None
    while time.time() < deadline and proc.poll() is None:
        if started is None and db_path.is_file():
            try:
                with Database(db_path) as db:
                    if db.load_run().status == "Running":
                        started = time.time()
            except Exception:
                pass
        if started is not None and time.time() - started > 2.0:
            break
        time.sleep(0.1)
    if proc.poll() is not None:
        pytest.skip("run finished before it could be interrupted")
    proc.send_signal(signal.SIGINT)
    out, _ = proc.communicate(timeout=120)
    # Graceful: partial results persisted, run resumable
    with Database(db_path) as db:
        run = db.load_run()
        assert run.status in {"Worker interrupted", "Done"}, (
            run.status,
            out.decode()[-500:],
        )
        partial = run.comparisons_count()
        assert partial >= 1
    if run.status == "Done":
        return  # raced completion; nothing left to resume

    result = subprocess.run(
        [
            sys.executable,
            "-m",
            "pyani_plus_tpu.cli.main",
            "resume",
            "-d",
            str(db_path),
        ],
        cwd="/root/repo",
        env=env,
        capture_output=True,
        timeout=600,
    )
    assert result.returncode == 0, result.stderr.decode()[-500:]
    with Database(db_path) as db:
        run = db.load_run()
        assert run.status == "Done"
        assert run.comparisons_count() == n_pairs
