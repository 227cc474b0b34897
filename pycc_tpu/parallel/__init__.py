from .mesh import (make_mesh, shard_amps, shard_blocks, shard_df,
                   shard_hamiltonian, shard_hbar)

__all__ = ["make_mesh", "shard_hamiltonian", "shard_amps", "shard_blocks",
           "shard_df", "shard_hbar"]
