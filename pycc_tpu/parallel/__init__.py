from .mesh import (make_mesh, shard_amps, shard_blocks, shard_df,
                   shard_hamiltonian, shard_hbar,
                   shard_pair_stacks)

__all__ = ["make_mesh", "shard_hamiltonian", "shard_amps", "shard_blocks",
           "shard_df", "shard_hbar", "shard_pair_stacks"]
