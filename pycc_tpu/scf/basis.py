"""Gaussian basis-set data and shell construction.

The reference framework (jattakumi/pycc) outsources all of this to Psi4
(`pycc/hamiltonian.py:5`, `pycc/ccwfn.py:9`); this environment has no Psi4,
so pycc_tpu ships its own host-side integral provider.  The numerical tables
below are the standard published Gaussian basis sets (Hehre/Stewart/Pople
STO-3G; Dunning cc-pVDZ / aug-cc-pVDZ / DZ; Pople 6-31G) exactly as
distributed by the Basis Set Exchange, restricted to the elements exercised
by the reference test-suite (H, He, O; see /root/reference/pycc/tests).

Shell data format: {element: [(ang_mom_letter, [(exponent, coeff), ...]), ...]}
SP shells are stored as separate S and P entries with shared exponents.

Validation status: H/He/O data (all bases) reproduce frozen Psi4/CFOUR/
published energies to 1e-11 or better (see tests/); C/N STO-3G reproduces
the published benzene RHF energy; C/N cc-pVDZ contractions are DERIVED by
atomic HF in the primitive sets (the defining construction of the basis),
with the procedure calibrated to reproduce the validated O/H tables to
every published digit — see the _CCPVDZ comment and
tests/test_018_cn_basis.py.
"""

import numpy as np

# ---------------------------------------------------------------------------
# Raw (exponent, contraction-coefficient) tables, unnormalized, as published.
# ---------------------------------------------------------------------------

_STO3G = {
    "H": [
        ("S", [(3.42525091, 0.15432897), (0.62391373, 0.53532814), (0.16885540, 0.44463454)]),
    ],
    "He": [
        ("S", [(6.36242139, 0.15432897), (1.15892300, 0.53532814), (0.31364979, 0.44463454)]),
    ],
    "O": [
        ("S", [(130.7093200, 0.15432897), (23.8088610, 0.53532814), (6.4436083, 0.44463454)]),
        ("S", [(5.0331513, -0.09996723), (1.1695961, 0.39951283), (0.3803890, 0.70011547)]),
        ("P", [(5.0331513, 0.15591627), (1.1695961, 0.60768372), (0.3803890, 0.39195739)]),
    ],
    "C": [
        ("S", [(71.6168370, 0.15432897), (13.0450960, 0.53532814), (3.5305122, 0.44463454)]),
        ("S", [(2.9412494, -0.09996723), (0.6834831, 0.39951283), (0.2222899, 0.70011547)]),
        ("P", [(2.9412494, 0.15591627), (0.6834831, 0.60768372), (0.2222899, 0.39195739)]),
    ],
    "N": [
        ("S", [(99.1061690, 0.15432897), (18.0523120, 0.53532814), (4.8856602, 0.44463454)]),
        ("S", [(3.7804559, -0.09996723), (0.8784966, 0.39951283), (0.2857144, 0.70011547)]),
        ("P", [(3.7804559, 0.15591627), (0.8784966, 0.60768372), (0.2857144, 0.39195739)]),
    ],
}

# Li/Be/S/Cl minimal-basis rows are DERIVED, not transcribed (scf/sto.py):
# in-repo universal STO-3G fits scaled by the Pople zeta factors.  The
# identical construction regenerates every H/He/C/N/O entry above to its
# last published digit (tests/test_019_sto_derived.py).
from .sto import sto3g_tables as _sto3g_tables  # noqa: E402

_STO3G.update(_sto3g_tables(["Li", "Be", "S", "Cl"]))

_CCPVDZ = {
    "H": [
        ("S", [(13.0100000, 0.0196850), (1.9620000, 0.1379770), (0.4446000, 0.4781480)]),
        ("S", [(0.1220000, 1.0)]),
        ("P", [(0.7270000, 1.0)]),
    ],
    "He": [
        ("S", [(38.3600000, 0.0238090), (5.7700000, 0.1548910), (1.2400000, 0.4699870)]),
        ("S", [(0.2976000, 1.0)]),
        ("P", [(1.2750000, 1.0)]),
    ],
    # C/N contractions DERIVED, not transcribed: the general contractions of
    # cc-pVDZ are by construction the atomic-HF orbitals of the ground-state
    # atom in the primitive set.  The coefficients below are the converged
    # 1s/2s/2p orbitals of an LS-coupled (3P/4S), spherically-equivalenced
    # atomic HF run in these primitives with this repo's integral engine
    # (tests/test_018_cn_basis.py documents the derivation + calibration: the
    # identical procedure reproduces the externally-validated O and H tables
    # to every published digit).  The previous hand-entered C/N coefficient
    # digits were wrong (CH4 RHF sat 61 mH above the in-primitive-space
    # variational bound; now 0.2 mH).  N's three valence s exponents are
    # energy-optimized (Dunning's construction) with the tight six fixed --
    # the hand-entered (2.752, 0.5373) pair was a mis-copy of the carbon
    # pattern, costing 11.5 mH on the N atom.
    "C": [
        ("S", [(6665.0000000, 0.0007045), (1000.0000000, 0.0051749), (228.0000000, 0.0281940),
               (64.7100000, 0.0955444), (21.0600000, 0.3055174), (6.4590000, 0.5008273),
               (2.5250000, 0.2041976), (0.5228000, 0.0200908), (0.1596000, -0.0054162)]),
        ("S", [(6665.0000000, -0.0001494), (1000.0000000, -0.0011164), (228.0000000, -0.0060155),
               (64.7100000, -0.0217116), (21.0600000, -0.0727424), (6.4590000, -0.1734036),
               (2.5250000, -0.0953917), (0.5228000, 0.5411063), (0.1596000, 0.5832570)]),
        ("S", [(0.1596000, 1.0)]),
        ("P", [(9.4390000, 0.0381034), (2.0020000, 0.2094016), (0.5456000, 0.5084883),
               (0.1517000, 0.4689816)]),
        ("P", [(0.1517000, 1.0)]),
        ("D", [(0.5500000, 1.0)]),
    ],
    "N": [
        ("S", [(9046.0000000, 0.0006918), (1357.0000000, 0.0054880), (309.3000000, 0.0266281),
               (87.7300000, 0.1092229), (25.5600000, 0.3397389), (8.2120000, 0.4907209),
               (2.9526390, 0.1784635), (0.7296900, 0.0038865), (0.2201670, 0.0002304)]),
        ("S", [(9046.0000000, -0.0001514), (1357.0000000, -0.0012270), (309.3000000, -0.0058513),
               (87.7300000, -0.0257416), (25.5600000, -0.0851347), (8.2120000, -0.1870048),
               (2.9526390, -0.0744966), (0.7296900, 0.5663605), (0.2201670, 0.5624495)]),
        ("S", [(0.2201670, 1.0)]),
        ("P", [(13.5500000, 0.0399217), (2.9170000, 0.2171829), (0.7973000, 0.5103467),
               (0.2185000, 0.4621712)]),
        ("P", [(0.2185000, 1.0)]),
        ("D", [(0.8170000, 1.0)]),
    ],
    "O": [
        ("S", [(11720.0000000, 0.0007100), (1759.0000000, 0.0054700), (400.8000000, 0.0278370),
               (113.7000000, 0.1048000), (37.0300000, 0.2830620), (13.2700000, 0.4487190),
               (5.0250000, 0.2709520), (1.0130000, 0.0154580)]),
        ("S", [(11720.0000000, -0.0001600), (1759.0000000, -0.0012630), (400.8000000, -0.0062670),
               (113.7000000, -0.0257160), (37.0300000, -0.0709240), (13.2700000, -0.1654110),
               (5.0250000, -0.1169550), (1.0130000, 0.5573680)]),
        ("S", [(0.3023000, 1.0)]),
        ("P", [(17.7000000, 0.0430180), (3.8540000, 0.2289130), (1.0460000, 0.5087280)]),
        ("P", [(0.2753000, 1.0)]),
        ("D", [(1.1850000, 1.0)]),
    ],
}

# aug-cc-pVDZ = cc-pVDZ + one diffuse function per angular momentum.
# H/He/O rows are oracle-validated (frozen aug-cc-pVDZ Psi4 energies,
# tests/test_007).  C/N rows are DERIVED by anion-HF optimization of the
# s/p exponents (scf/atomic.py optimize_aug — reproduces every published
# O digit) with the d transferred by the O-calibrated even-tempered
# ratio; frozen here, regression-pinned in tests/test_022_aug_cn.py.
_AUG_EXTRA = {
    "H": [("S", [(0.0297400, 1.0)]), ("P", [(0.1410000, 1.0)])],
    "He": [("S", [(0.0725500, 1.0)]), ("P", [(0.2473000, 1.0)])],
    "O": [("S", [(0.0789600, 1.0)]), ("P", [(0.0685600, 1.0)]), ("D", [(0.3320000, 1.0)])],
    "C": [("S", [(0.0464200, 1.0)]), ("P", [(0.0404100, 1.0)]), ("D", [(0.1540900, 1.0)])],
    "N": [("S", [(0.0602600, 1.0)]), ("P", [(0.0561200, 1.0)]), ("D", [(0.2289000, 1.0)])],
}

_631G = {
    "H": [
        ("S", [(18.7311370, 0.03349460), (2.8253937, 0.23472695), (0.6401217, 0.81375733)]),
        ("S", [(0.1612778, 1.0)]),
    ],
    "He": [
        ("S", [(38.4216340, 0.0237660), (5.7780300, 0.1546790), (1.2417740, 0.4696300)]),
        ("S", [(0.2979640, 1.0)]),
    ],
    "O": [
        ("S", [(5484.6717000, 0.0018311), (825.2349500, 0.0139501), (188.0469600, 0.0684451),
               (52.9645000, 0.2327143), (16.8975700, 0.4701930), (5.7996353, 0.3585209)]),
        ("S", [(15.5396160, -0.1107775), (3.5999336, -0.1480263), (1.0137618, 1.1307670)]),
        ("P", [(15.5396160, 0.0708743), (3.5999336, 0.3397528), (1.0137618, 0.7271586)]),
        ("S", [(0.2700058, 1.0)]),
        ("P", [(0.2700058, 1.0)]),
    ],
}

# Dunning DZ (as shipped by Psi4's DZ.gbs; H exponents scaled by 1.2**2)
_DZ = {
    "H": [
        ("S", [(19.2406000, 0.0328280), (2.8992000, 0.2312080), (0.6534000, 0.8172380)]),
        ("S", [(0.1776000, 1.0)]),
    ],
    "O": [
        ("S", [(7816.5400000, 0.0020310), (1175.8200000, 0.0154360), (273.1880000, 0.0737710),
               (81.1696000, 0.2476060), (27.1836000, 0.6118320), (3.4136000, 0.2412050)]),
        ("S", [(9.5322000, 1.0)]),
        ("S", [(0.9398000, 1.0)]),
        ("S", [(0.2846000, 1.0)]),
        ("P", [(35.1832000, 0.0195800), (7.9040000, 0.1241890), (2.3051000, 0.3947270),
               (0.7171000, 0.6273750)]),
        ("P", [(0.2137000, 1.0)]),
    ],
}


def _aug(base, extra):
    out = {}
    for el, shells in base.items():
        out[el] = list(shells) + list(extra.get(el, []))
    return out


# Canonical registry. puream: whether d/f shells are spherical (True) or
# cartesian (False) — matches Psi4's per-basis-file convention.
_REGISTRY = {
    "sto-3g": (_STO3G, False),
    "cc-pvdz": (_CCPVDZ, True),
    "aug-cc-pvdz": (_aug(_CCPVDZ, _AUG_EXTRA), True),
    "6-31g": (_631G, False),
    "dz": (_DZ, True),
}

_LVAL = {"S": 0, "P": 1, "D": 2, "F": 3, "G": 4}


def _double_factorial(n):
    if n <= 0:
        return 1.0
    out = 1.0
    while n > 0:
        out *= n
        n -= 2
    return out


class Shell:
    """One contracted shell on a center.

    exps/coefs hold the *normalized* contraction: primitive norms folded in
    and the contracted (l,0,0) cartesian component normalized to unity.
    """

    __slots__ = ("l", "center", "exps", "coefs", "atom_index", "pure")

    def __init__(self, l, center, exps, coefs, atom_index, pure):
        self.l = l
        self.center = np.asarray(center, dtype=float)
        exps = np.asarray(exps, dtype=float)
        coefs = np.asarray(coefs, dtype=float)
        # primitive normalization for the (l,0,0) cartesian component
        prim_norm = (2.0 * exps / np.pi) ** 0.75 * (4.0 * exps) ** (l / 2.0) \
            / np.sqrt(_double_factorial(2 * l - 1))
        coefs = coefs * prim_norm
        # contracted normalization
        ee = exps[:, None] + exps[None, :]
        s = np.pi ** 1.5 * _double_factorial(2 * l - 1) / 2.0 ** l / ee ** (l + 1.5)
        norm = (coefs[:, None] * coefs[None, :] * s).sum()
        coefs = coefs / np.sqrt(norm)
        self.exps = exps
        self.coefs = coefs
        self.atom_index = atom_index
        self.pure = pure and l >= 2

    @property
    def ncart(self):
        return (self.l + 1) * (self.l + 2) // 2

    @property
    def nfunc(self):
        return 2 * self.l + 1 if self.pure else self.ncart


class BasisSet:
    """A list of shells over a molecule, with AO indexing metadata."""

    def __init__(self, molecule, name):
        key = name.lower()
        if key not in _REGISTRY:
            raise ValueError("Unknown basis set: %s" % name)
        table, puream = _REGISTRY[key]
        self.name = key
        self.puream = puream
        self.shells = []
        for ai, (sym, _Z, xyz) in enumerate(molecule.atoms):
            if sym not in table:
                raise ValueError("Basis %s has no data for element %s" % (name, sym))
            for (lchar, prims) in table[sym]:
                exps = [p[0] for p in prims]
                coefs = [p[1] for p in prims]
                self.shells.append(Shell(_LVAL[lchar], xyz, exps, coefs, ai, puream))
        offs = []
        n = 0
        for sh in self.shells:
            offs.append(n)
            n += sh.nfunc
        self.offsets = offs
        self.nbf = n
        self.molecule = molecule

    def __len__(self):
        return len(self.shells)
