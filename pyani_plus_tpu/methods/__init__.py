"""The ANI method registry: the framework's "model families".

Each method module implements one of the reference's eight comparison
methods (SURVEY.md section 2.3) as a TPU-native compute path. A method
exposes:

- ``NAME``                      -- the method string stored in configurations
- ``configuration(**params)``   -- dict of configuration column values
- ``compute(ctx)``              -- compute comparisons for the requested
                                   pairs, returning comparison dicts

Methods operate on in-memory :class:`~pyani_plus_tpu.genomes.Genome`
objects and return plain dicts matching the ``comparisons`` table columns;
the runner (pyani_plus_tpu.parallel) owns batching/sharding and the store.
"""

from __future__ import annotations

import logging
from dataclasses import dataclass, field
from pathlib import Path
from typing import Any, Callable

from pyani_plus_tpu.genomes import Genome


@dataclass
class ComputeContext:
    """Everything a method needs to compute a batch of pairs."""

    logger: logging.Logger
    genomes: dict[str, Genome]  # md5 -> Genome (all genomes in the run)
    query_hashes: list[str]
    subject_hashes: list[str]
    pending: set[tuple[str, str]]  # (query, subject) pairs still to compute
    config: dict[str, Any]  # configuration column values
    cache: Path | None = None
    extra_files: dict[str, Path] = field(default_factory=dict)
    progress: Callable[[int], None] | None = None  # called with #pairs done

    def tick(self, n: int = 1) -> None:
        if self.progress is not None:
            self.progress(n)


# Method name (as stored in configurations / matrix filenames, matching the
# reference's naming) -> implementing module.
_MODULES = {
    "sourmash": "sourmash",
    "fastANI": "fastani",
    "ANIm": "anim",
    "ANIb": "anib",
    "ANIminimap2": "animinimap2",
    "dnadiff": "dnadiff",
    "skani": "skani",
    "external-alignment": "external_alignment",
}


def method_names() -> list[str]:
    return list(_MODULES)


def get_method(name: str) -> Any:
    import importlib

    try:
        modname = _MODULES[name]
    except KeyError:
        msg = f"Unknown method {name!r}; known: {sorted(_MODULES)}"
        raise ValueError(msg) from None
    return importlib.import_module(f"pyani_plus_tpu.methods.{modname}")
