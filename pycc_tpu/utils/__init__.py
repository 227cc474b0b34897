from .synth import synthetic_hamiltonian, mp2_guess

__all__ = ["synthetic_hamiltonian", "mp2_guess"]
