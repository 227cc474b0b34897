"""Derived aug-cc-pVDZ diffuse sets for C/N (scf/atomic.py optimize_aug).

Validation strategy (the test_018/test_019 derive-and-calibrate pattern):

1. **Calibration** — the anion-HF optimization must reproduce the
   oracle-pinned O diffuse exponents (s 0.07896 / p 0.06856, validated
   externally through the frozen aug-cc-pVDZ Psi4 energies of
   tests/test_007) before it is trusted for C/N.
2. **Consistency** — the shipped C/N _AUG_EXTRA digits equal the
   derivation output (locks basis.py to scf/atomic.py); the diffuse d
   is the O-calibrated even-tempered ratio times the valence d.
3. **Frozen regression** — NH3/aug-cc-pVDZ RHF + CCSD pins the whole
   pipeline (derived diffuse tables -> integrals -> SCF -> CC).

Reference match: the reference gets aug-cc-pVDZ from Psi4's data files
(/root/reference/pycc/hamiltonian.py:5) and exercises it in its
polarizability/optical-rotation tests (tests/test_036_lr.py).
"""

import numpy as np
import pytest

from pycc_tpu.scf import atomic
from pycc_tpu.scf.basis import _AUG_EXTRA, _CCPVDZ

O_RATIO = 0.3320 / 1.1850  # aug-d / valence-d, O row (both oracle-pinned)


def _exps(el):
    d = dict(_AUG_EXTRA[el])
    return {l: prims[0][0] for l, prims in d.items()}


def test_anion_optimization_reproduces_oxygen():
    s, p = atomic.optimize_aug("O", xatol=3e-3)
    assert abs(s / 0.07896 - 1) < 2e-2
    assert abs(p / 0.06856 - 1) < 2e-2


@pytest.mark.parametrize("el", ["C", "N"])
def test_shipped_cn_aug_match_derivation(el):
    s, p = atomic.optimize_aug(el, xatol=3e-3)
    got = _exps(el)
    assert abs(s / got["S"] - 1) < 2e-2, (el, s, got["S"])
    assert abs(p / got["P"] - 1) < 2e-2, (el, p, got["P"])
    # diffuse d: O-calibrated even-tempered transfer from the valence d
    dval = [sh for sh in _CCPVDZ[el] if sh[0] == "D"][0][1][0][0]
    assert abs(dval * O_RATIO / got["D"] - 1) < 1e-3


def test_nh3_aug_ccpvdz_ccsd():
    """NH3/aug-cc-pVDZ frozen regression: exercises the derived N diffuse
    set (and H's oracle-pinned one) through the full CC stack."""
    import contextlib
    import io

    import pycc_tpu
    from pycc_tpu.scf import run_rhf

    nh3 = ("N 0.0 0.0 0.1173\nH 0.0 0.9389 -0.2739\n"
           "H 0.8131 -0.4695 -0.2739\nH -0.8131 -0.4695 -0.2739\n"
           "symmetry c1")
    wfn = run_rhf(nh3, "aug-cc-pvdz", freeze_core=True)
    # frozen by this code (2026-08); the aug lowering vs cc-pVDZ
    # (-56.194128 -> -56.203681) is the expected ~10 mH diffuse gain
    assert abs(wfn.energy() - -56.203681352682) < 1e-10
    cc = pycc_tpu.ccwfn(wfn)
    with contextlib.redirect_stdout(io.StringIO()):
        ecc = cc.solve_cc(e_conv=1e-12, r_conv=1e-12)
    assert abs(float(ecc) - -0.214789145793) < 1e-10
