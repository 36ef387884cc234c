"""Method-driver contracts: registry, flush windowing, interrupts, pools.

These pin the lifecycle rules the runner relies on (SURVEY.md layer 3):
every method module exposes the same minimal interface and records its
program/version into the configuration; run_pairwise preserves completed
work across interrupts; the incremental flush respects the 300 s window
and stays idempotent.
"""

import logging

import pytest

import pyani_plus_tpu.methods as methods_pkg
from pyani_plus_tpu.methods import (
    ComputeContext,
    get_method,
    method_names,
    run_pairwise,
)

LOGGER = logging.getLogger("test")


def _ctx(pending, **kwargs):
    return ComputeContext(
        logger=LOGGER,
        genomes={},
        query_hashes=[],
        subject_hashes=[],
        pending=set(pending),
        config={},
        **kwargs,
    )


def test_registry_names_match_reference_spelling() -> None:
    """Method names are the reference's exact matrix/configuration names."""
    assert set(method_names()) == {
        "sourmash",
        "fastANI",
        "ANIm",
        "ANIb",
        "ANIminimap2",
        "dnadiff",
        "skani",
        "external-alignment",
    }


def test_get_method_unknown_raises() -> None:
    with pytest.raises(ValueError, match="Unknown method 'nope'"):
        get_method("nope")


@pytest.mark.parametrize("name", method_names())
def test_every_method_module_interface(name) -> None:
    """NAME / configuration() / compute(ctx) on every module, with the
    configuration recording method+program+version (the tools.py
    replacement: versions live in the configuration row)."""
    module = get_method(name)
    assert module.NAME == name
    assert callable(module.compute)
    if name == "external-alignment":
        pytest.skip("configuration requires an alignment file")
    config = module.configuration()
    assert config["method"] == name
    assert config["program"].startswith("pyani-plus-tpu")
    assert config["version"]


def test_run_pairwise_sequential_order_and_progress(monkeypatch) -> None:
    monkeypatch.setenv("PYANI_TPU_PAIR_WORKERS", "1")  # pin the serial path
    pairs = [("a", "a"), ("a", "b"), ("b", "a"), ("b", "b")]
    seen = []
    ticks = []
    ctx = _ctx(pairs, progress=lambda n: ticks.append(n))
    rows = run_pairwise(ctx, lambda q, s: seen.append((q, s)) or {"identity": 1.0})
    assert seen == sorted(pairs)  # deterministic order
    assert len(rows) == 4
    assert sum(ticks) == 4
    assert all(r["query_hash"] == q and r["subject_hash"] == s
               for r, (q, s) in zip(rows, sorted(pairs)))
    assert not ctx.interrupted


def test_run_pairwise_interrupt_keeps_completed_rows(monkeypatch) -> None:
    """KeyboardInterrupt mid-run returns the completed rows and flags
    the context (the 'Worker interrupted' persistence contract)."""
    monkeypatch.setenv("PYANI_TPU_PAIR_WORKERS", "1")  # pin the serial path
    calls = []

    def fn(q, s):
        if len(calls) == 2:
            raise KeyboardInterrupt
        calls.append((q, s))
        return {"identity": 0.5}

    ctx = _ctx([("a", "a"), ("a", "b"), ("b", "a"), ("b", "b")])
    rows = run_pairwise(ctx, fn)
    assert ctx.interrupted
    assert len(rows) == 2


def test_run_pairwise_default_pool_is_available_cores(monkeypatch) -> None:
    """Host pair-parallelism defaults ON, sized to the host's cores (the
    reference's local executor runs `--cores all`); =1 opts back out."""
    import pyani_plus_tpu.utils as utils

    monkeypatch.delenv("PYANI_TPU_PAIR_WORKERS", raising=False)
    monkeypatch.setattr(utils, "available_cores", lambda: 3)
    pairs = [(f"g{i}", f"g{j}") for i in range(3) for j in range(3)]
    threads = set()

    def fn(q, s):
        import threading

        threads.add(threading.current_thread().name)
        return {"identity": 0.25}

    ctx = _ctx(pairs)
    rows = run_pairwise(ctx, fn)
    assert {(r["query_hash"], r["subject_hash"]) for r in rows} == set(pairs)
    # the pool path ran (worker threads, not the calling thread only)
    assert any("ThreadPoolExecutor" in name for name in threads)


def test_run_pairwise_thread_pool_matches_sequential(monkeypatch) -> None:
    monkeypatch.setenv("PYANI_TPU_PAIR_WORKERS", "3")
    pairs = [(f"g{i}", f"g{j}") for i in range(4) for j in range(4)]
    ctx = _ctx(pairs)
    rows = run_pairwise(ctx, lambda q, s: {"identity": hash((q, s)) % 100 / 100})
    assert {(r["query_hash"], r["subject_hash"]) for r in rows} == set(pairs)
    expected = {(q, s): hash((q, s)) % 100 / 100 for q, s in pairs}
    for r in rows:
        assert r["identity"] == expected[r["query_hash"], r["subject_hash"]]


def test_maybe_flush_respects_window(monkeypatch) -> None:
    """No flush before the window elapses; flush once it has."""
    flushed = []
    ctx = _ctx([], flush=flushed.append)
    monkeypatch.setattr(methods_pkg, "FLUSH_WINDOW", 3600.0)
    ctx.maybe_flush([{"x": 1}])  # first call only arms the timer
    ctx.maybe_flush([{"x": 1}, {"x": 2}])
    assert flushed == []
    monkeypatch.setattr(methods_pkg, "FLUSH_WINDOW", 0.0)
    rows = [{"x": 1}, {"x": 2}, {"x": 3}]
    ctx.maybe_flush(rows)
    assert flushed == [rows]


def test_maybe_flush_without_sink_is_noop() -> None:
    ctx = _ctx([])
    ctx.maybe_flush([{"x": 1}])  # must not raise


def test_index_fasta_directory_maps_md5(tmp_path) -> None:
    from pyani_plus_tpu.parallel.runner import index_fasta_directory
    from pyani_plus_tpu.utils import file_md5sum

    (tmp_path / "a.fasta").write_text(">a\nACGTACGT\n")
    (tmp_path / "b.fna").write_text(">b\nTTTTCCCC\n")
    (tmp_path / "notes.txt").write_text("not a genome")
    mapping = index_fasta_directory(LOGGER, tmp_path)
    assert {p.name for p in mapping.values()} == {"a.fasta", "b.fna"}
    for md5, path in mapping.items():
        assert md5 == file_md5sum(path)
