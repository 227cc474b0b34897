"""Host-side SCF layer: basis sets, integrals, RHF reference.

pycc_tpu's replacement for the Psi4 dependency of the reference framework.
"""

from .mol import Molecule
from .basis import BasisSet
from .rhf import run_rhf, RHFWavefunction
from . import integrals

__all__ = ["Molecule", "BasisSet", "run_rhf", "RHFWavefunction", "integrals"]
