"""C/N cc-pVDZ validation: derivation calibration + frozen regressions.

No external quantum-chemistry package exists in this environment (the
reference pins everything to a live Psi4:
/root/reference/pycc/tests/test_035_eomccsd.py:114-163), so the C/N
cc-pVDZ tables cannot be transcribed; hand-entered digits shipped in
round 1 proved WRONG (CH4 RHF sat 61 mH above the in-primitive-space
variational bound; the N valence s exponents were a mis-copy of the
carbon pattern costing another 11.5 mH).  Round 2 replaced transcription
with DERIVATION (scf/atomic.py): the cc-pVDZ general contractions are by
construction the atomic-HF orbitals of the ground-state atom in the
primitive set.

The validation argument, in three legs:

1. **Calibration** — the identical derivation reproduces the O and H
   tables, which ARE externally pinned (frozen upstream-Psi4 CCSD oracles
   at 1e-11 in test_002/test_004 exercise every O/H basis digit), to
   every published digit.
2. **Consistency** — the shipped C/N tables equal the derivation output
   (this locks basis.py to scf/atomic.py; neither can drift alone).
3. **Frozen regressions** — CH4/NH3/benzene RHF+CCSD energies frozen
   below pin the whole pipeline (tables -> integrals -> SCF -> CC) at
   1e-10.
"""

import numpy as np
import pytest

from pycc_tpu.scf.atomic import solve_atom
from pycc_tpu.scf.basis import _CCPVDZ


def _table_vectors(sym):
    """(s-contraction-1, s-contraction-2, p-contraction) coefficient
    vectors from the shipped table, in primitive order."""
    shells = _CCPVDZ[sym]
    s_cons = [np.array([c for (_, c) in prims])
              for (l, prims) in shells if l == "S" and len(prims) > 1]
    p_cons = [np.array([c for (_, c) in prims])
              for (l, prims) in shells if l == "P" and len(prims) > 1]
    return s_cons, p_cons


@pytest.mark.parametrize("sym", ["O", "H"])
def test_derivation_reproduces_validated_tables(sym):
    out = solve_atom(sym)
    s_cons, p_cons = _table_vectors(sym)
    if sym == "H":
        # published H 1s contraction keeps the 3 tight primitives (the
        # diffuse one is a free function, so dropping it is span-neutral)
        assert np.abs(out["c"][0][:3] - s_cons[0]).max() < 5e-7
        return
    assert np.abs(out["c"][0][:8] - s_cons[0]).max() < 5e-7
    assert np.abs(out["c"][1][:8] - s_cons[1]).max() < 5e-7
    assert np.abs(out["w"][:3] - p_cons[0]).max() < 5e-7


@pytest.mark.parametrize("sym", ["C", "N"])
def test_cn_tables_equal_derivation_output(sym):
    out = solve_atom(sym)
    s_cons, p_cons = _table_vectors(sym)
    assert np.abs(out["c"][0] - s_cons[0]).max() < 5e-7
    assert np.abs(out["c"][1] - s_cons[1]).max() < 5e-7
    assert np.abs(out["w"] - p_cons[0]).max() < 5e-7


# -- frozen end-to-end regressions ------------------------------------------

# frozen by this code after the round-2 basis fix (see module docstring).
# External anchors: textbook CH4/cc-pVDZ RHF ~ -40.199, NH3 ~ -56.196,
# benzene ~ -230.72 -- the derived tables land within the few-mH
# basis-construction slop of each, where the round-1 tables were 65, 284,
# and 395 mH off respectively.
CH4_CCPVDZ_RHF = -40.194824155890
NH3_CCPVDZ_RHF = -56.194127814445
NH3_CCPVDZ_CCSD_CORR = -0.202993611010
BENZENE_STO3G_RHF = -227.887877635027
BENZENE_CCPVDZ_RHF = -230.696231969775

def test_ch4_ccpvdz_rhf():
    from pycc_tpu.scf import run_rhf
    r = 1.086
    a = r / np.sqrt(3.0)
    geom = (f"C 0 0 0\nH {a} {a} {a}\nH {a} {-a} {-a}\n"
            f"H {-a} {a} {-a}\nH {-a} {-a} {a}\nsymmetry c1")
    wfn = run_rhf(geom, "cc-pvdz")
    assert abs(wfn.energy() - CH4_CCPVDZ_RHF) < 1e-10


def test_nh3_ccpvdz_rhf_ccsd():
    """NH3/cc-pVDZ RHF + frozen-core CCSD: exercises the N tables end to
    end (including the D shell) through the full CC stack."""
    import contextlib
    import io

    import pycc_tpu
    from pycc_tpu.scf import run_rhf
    nh3 = ("N 0.0 0.0 0.1173\nH 0.0 0.9389 -0.2739\n"
           "H 0.8131 -0.4695 -0.2739\nH -0.8131 -0.4695 -0.2739\n"
           "symmetry c1")
    wfn = run_rhf(nh3, "cc-pvdz", freeze_core=True)
    assert abs(wfn.energy() - NH3_CCPVDZ_RHF) < 1e-10
    cc = pycc_tpu.ccwfn(wfn)
    with contextlib.redirect_stdout(io.StringIO()):
        ecc = cc.solve_cc(e_conv=1e-12, r_conv=1e-12)
    assert abs(float(ecc) - NH3_CCPVDZ_CCSD_CORR) < 1e-10


def test_rhf_benzene_sto3g():
    """Benzene (reference geometry) STO-3G RHF — the published value for
    this standard geometry is ~-227.89; the digits are this code's."""
    from pycc_tpu.data.molecules import moldict
    from pycc_tpu.scf import run_rhf
    wfn = run_rhf(moldict["benzene"], "sto-3g")
    assert abs(wfn.energy() - BENZENE_STO3G_RHF) < 1e-10


@pytest.mark.slow
def test_rhf_benzene_ccpvdz():
    """Benzene cc-pVDZ RHF (the BASELINE config-5 system; ~2.5 min on
    this one-core host)."""
    from pycc_tpu.data.molecules import moldict
    from pycc_tpu.scf import run_rhf
    wfn = run_rhf(moldict["benzene"], "cc-pvdz", freeze_core=True)
    assert abs(wfn.energy() - BENZENE_CCPVDZ_RHF) < 1e-9
