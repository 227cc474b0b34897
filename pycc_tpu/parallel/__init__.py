from .mesh import make_mesh, shard_hamiltonian, shard_amps

__all__ = ["make_mesh", "shard_hamiltonian", "shard_amps"]
