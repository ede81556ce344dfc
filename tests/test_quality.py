"""End-to-end reconstruction quality (BASELINE north star:
"reconstructions bit-comparable at mu-law-256 fidelity"; VERDICT r1 #2:
quality numbers must be reproducible from the repo).

TPU-gated: a real training run of a few thousand steps is minutes on
one chip but far too slow for the CPU CI lane. The same logic is
runnable standalone via scripts/quality_check.py.
"""

import jax
import pytest


@pytest.mark.skipif(jax.default_backend() != "tpu",
                    reason="trains for real; minutes on TPU, hours on "
                           "the CPU CI lane (scripts/quality_check.py)")
def test_reconstruction_quality_tpu():
    """Asserts at the CONVERGED 6k-step point the README quotes: the
    3k checkpoint is mid-convergence and chaotic (harmonic ratio
    0.61–0.96 observed for identical code across compiler/platform
    states — README "Quality"), so gating there flakes by design.
    First on-chip execution of this gate (round 3) measured 0.57 band
    corr at 3k vs 1.000 at 6k from the same code."""
    import sys
    import os
    sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..",
                                    "scripts"))
    from quality_check import run_quality_check
    rec = run_quality_check(steps=6000)
    assert rec["band_spectral_correlation"] >= 0.9, rec
    assert rec["harmonic_energy_ratio"] >= 0.5, rec
    assert rec["train_codebook_usage"] >= 0.5, rec
