"""Shared fixtures/utilities for the pycc_tpu test-suite.

Geometries are the reference test molecules
(/root/reference/pycc/data/molecules.py) needed to reproduce its frozen
energy oracles.
"""

import functools

from pycc_tpu.scf import run_rhf

H2O = """
O
H 1 1.1
H 1 1.1 2 104
symmetry c1
"""

H2O_TEACH = """
O  0.000000000000  -0.143225816552   0.000000000000
H  1.638036840407   1.136548822547  -0.000000000000
H -1.638036840407   1.136548822547  -0.000000000000
symmetry c1
units bohr
"""

HE = """
He
symmetry c1
"""

H2 = """
units au
H 0.0 0.0 0.0
H 0.0 0.0 1.4
symmetry c1
"""

H2_2 = """
H
H 1 0.75
H 2 1.5 1 90.0
H 3 0.75 2 90.0 1 60.0
symmetry c1
"""

MOLECULES = {"H2O": H2O, "H2O_Teach": H2O_TEACH, "He": HE, "H2": H2,
             "(H2)_2": H2_2}


@functools.lru_cache(maxsize=32)
def scf(molname, basis, freeze_core=True):
    if molname not in MOLECULES:
        from pycc_tpu.data.molecules import moldict
        return run_rhf(moldict[molname], basis, freeze_core=freeze_core)
    return run_rhf(MOLECULES[molname], basis, freeze_core=freeze_core)
