"""Run the package's embedded doctests (the reference runs pytest with
--doctest-modules over its package, pyproject.toml:55-62; here the
modules are enumerated explicitly so heavy optional imports stay
controlled and the expectation that examples EXIST is itself asserted).
"""

from __future__ import annotations

import doctest
import importlib

import pytest

# module name -> minimum number of doctest examples expected
MODULES = {
    "pyani_plus_tpu.utils": 4,
    "pyani_plus_tpu.genomes": 3,
    "pyani_plus_tpu.ops.minhash": 1,
    "pyani_plus_tpu.ops.fastani_map": 3,
    "pyani_plus_tpu.ops.seeds": 1,
    "pyani_plus_tpu.methods.anib": 1,
    "pyani_plus_tpu.methods.skani": 1,
    "pyani_plus_tpu.ops.mm2": 8,
}


@pytest.mark.parametrize("module_name", sorted(MODULES))
def test_module_doctests(module_name: str) -> None:
    module = importlib.import_module(module_name)
    results = doctest.testmod(module, verbose=False)
    assert results.failed == 0, f"{module_name}: {results.failed} failures"
    assert results.attempted >= MODULES[module_name], (
        f"{module_name}: expected >= {MODULES[module_name]} doctest "
        f"examples, found {results.attempted}"
    )
