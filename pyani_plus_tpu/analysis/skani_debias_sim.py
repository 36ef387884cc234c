"""Heterogeneous-divergence genome-pair simulator for the skani debias study.

Evolves a real ancestor genome into a derived genome with block-wise
variable substitution rates (conserved/variable mixture), short indels,
and inversions; reports (true gapless ANI over orthologous columns, the
raw skani estimator, aligned fractions). No fixture ANI labels are used
anywhere in this module.

Round-3 findings (driving methods/skani.py's documented stance):

- the raw chained-concordance estimator's overestimate at divergence is
  REPRODUCED mechanistically: with conserved/variable rate mixtures the
  raw estimator saturates around 0.95-0.975 while the true ANI falls to
  0.80-0.86 -- chains preferentially survive in locally conserved
  segments (conditioning bias), exactly the bias skani's learned
  regression corrects;
- the mapping (raw, aligned_fraction) -> true ANI is NOT identifiable
  from synthetic data alone in the 0.85-0.9 regime: across defensible
  heterogeneity priors (conserved fraction 0.25-0.4, rate ratio 5-10,
  block length 0.6-2 kb) the true ANI at fixture-matched observables
  (raw ~0.94-0.97, af ~0.24) spans ~0.80-0.85 -- a +-0.03 envelope.
  skani's fixture value (0.854-0.856 at raw 0.936) lies inside this
  envelope, but no synthetic-only fit can pin it to the 4e-3 the
  fixture gates need, because skani's learned model encodes ITS
  training distribution (real genome pairs labelled with alignment
  ANI), which is not reconstructible from first principles;
- at ANI >= 0.97 the estimator is near-unbiased even WITH
  heterogeneity + indels + inversions (raw - true < 0.002 at d = 0.02),
  extending the round-2 point-mutation-only held-out validation
  (tests/test_skani.py exercises this via this module).

Production therefore keeps the fixture-anchored piecewise debias for
the divergent end, explicitly labelled as standing in for skani's
unpublished learned regression (methods/skani.py docstring), with the
mechanism and the envelope locked by tests.

Run directly for the knob sweep:
    JAX_PLATFORMS=cpu python -m pyani_plus_tpu.analysis.skani_debias_sim
"""

from __future__ import annotations

from pathlib import Path

import numpy as np

from pyani_plus_tpu.genomes import Genome, SequenceRecord


def evolve(  # noqa: PLR0913
    codes: np.ndarray,
    rng: np.random.Generator,
    *,
    d_total: float,
    cons_frac: float = 0.45,
    ratio: float = 8.0,
    block_mean: int = 1000,
    indel_rate_frac: float = 0.08,
    n_inv: int = 4,
) -> tuple[np.ndarray, float]:
    """Derived copy of ``codes`` at mean substitution divergence d_total.

    Block-heterogeneous: conserved blocks mutate at rate r, variable
    blocks at ratio*r, with cons_frac of sequence conserved; plus short
    indels and n_inv 10-50 kb inversions. Returns (derived_codes,
    true_identity) where true_identity is 1 - substitutions /
    orthologous positions (indel columns excluded, matching
    alignment-ANI semantics).
    """
    n = codes.size
    r_cons = d_total / (cons_frac + (1 - cons_frac) * ratio)
    r_var = r_cons * ratio
    rates = np.empty(n, np.float64)
    pos = 0
    while pos < n:
        ln = max(100, int(rng.exponential(block_mean)))
        rates[pos : pos + ln] = r_cons if rng.random() < cons_frac else r_var
        pos += ln
    sub = rng.random(n) < rates
    derived = codes.copy()
    shift = rng.integers(1, 4, size=int(sub.sum())).astype(np.uint8)
    derived[sub] = (derived[sub] + shift) % 4
    true_id = 1.0 - int(sub.sum()) / n

    # Short indels on the derived copy (orthology bookkeeping not
    # needed: indel columns are excluded from true_id by construction).
    n_indel = int(n * d_total * indel_rate_frac / 10)
    pieces = []
    cuts = np.sort(rng.integers(0, n, size=n_indel))
    prev = 0
    for cpos in cuts:
        if cpos <= prev:
            continue
        pieces.append(derived[prev:cpos])
        ln = 1 + int(rng.exponential(8))
        if rng.random() < 0.5:
            prev = min(n, cpos + ln)  # deletion
        else:
            pieces.append(rng.integers(0, 4, size=ln).astype(np.uint8))
            prev = cpos
    pieces.append(derived[prev:])
    derived = np.concatenate(pieces)

    for _ in range(n_inv):
        ln = int(rng.integers(10_000, 50_000))
        st = int(rng.integers(0, max(1, derived.size - ln)))
        seg = derived[st : st + ln]
        derived[st : st + ln] = (3 - seg[::-1]) % 4
    return derived, true_id


def measure_raw(
    ancestor_codes: np.ndarray, derived_codes: np.ndarray, mode: str = "fast"
) -> dict:
    """Raw (un-debiased) skani estimator output for the pair."""
    import pyani_plus_tpu.methods.skani as sk

    ga = Genome(
        md5="a" * 32,
        path=Path("ancestor.fa"),
        records=[SequenceRecord(b"a", ancestor_codes)],
    )
    gb = Genome(
        md5="b" * 32,
        path=Path("derived.fa"),
        records=[SequenceRecord(b"b", derived_codes)],
    )
    orig = sk._debias
    sk._debias = lambda r: r
    try:
        return sk.compute_pair(gb, ga, mode, sample_cache={})
    finally:
        sk._debias = orig


def _main() -> None:  # pragma: no cover - analysis entry point
    from pyani_plus_tpu.genomes import load_genome

    anc = load_genome(
        "/root/reference/tests/fixtures/bacterial_example/NC_002696.fasta.gz"
    )
    codes = max(anc.records, key=lambda r: r.codes.size).codes[:2_000_000]
    rng = np.random.default_rng(1)
    print("cons ratio block | d true raw af")
    for cons in (0.25, 0.4):
        for ratio in (5.0, 10.0):
            for bm in (600, 2000):
                for d in (0.12, 0.16, 0.2):
                    derived, true_id = evolve(
                        codes, rng, d_total=d, cons_frac=cons, ratio=ratio,
                        block_mean=bm,
                    )
                    r = measure_raw(codes, derived)
                    af = (
                        (r["cov_query"] + r["cov_subject"]) / 2
                        if r["identity"] is not None
                        else None
                    )
                    print(
                        f"{cons} {ratio} {bm} | d={d} true={true_id:.4f} "
                        f"raw={r['identity']} af={af}",
                        flush=True,
                    )


if __name__ == "__main__":  # pragma: no cover
    _main()


def sim_only_divergent_map(
    length: int = 500_000, seed: int = 11
) -> list[tuple[float, float]]:
    """(raw, true ANI) points from heterogeneous simulations ALONE over
    the divergent regime -- the VERDICT r4 alternative calibration
    attempt. Central heterogeneity prior (cons_frac 0.33, ratio 7.5,
    block 1000); NO fixture ANI label is used anywhere. Measured
    outcome (locked by tests/test_skani.py): raw SATURATES (~0.96 for
    every d in 0.10-0.22) while true ANI scatters 0.78-0.90, so no
    usable sim-only raw->ANI map exists in this regime -- the
    production divergent-end anchors therefore stay fixture-anchored,
    explicitly standing in for skani's unpublished learned regression.
    """
    from pyani_plus_tpu.genomes import load_genome

    anc = load_genome(
        "/root/reference/tests/fixtures/bacterial_example/NC_002696.fasta.gz"
    )
    codes = max(anc.records, key=lambda r: r.codes.size).codes[:length]
    rng = np.random.default_rng(seed)
    pts: list[tuple[float, float]] = []
    for d in (0.10, 0.14, 0.18, 0.22):
        derived, true_id = evolve(
            codes, rng, d_total=d, cons_frac=0.33, ratio=7.5, block_mean=1000
        )
        r = measure_raw(codes, derived)
        if r["identity"] is not None:
            pts.append((float(r["identity"]), float(true_id)))
    pts.sort()
    return pts
