"""Tensor-contraction layer: einsum -> XLA dot_general graphs.

Replaces the reference's opt_einsum/torch dispatch backend
(/root/reference/pycc/utils.py:141-187).  Under jit every contraction
lowers to dot_general and is fused/tiled by XLA onto the MXU; there is no
per-call device migration — operands live where the mesh puts them.
"""

import jax.numpy as jnp


def contract(subscripts, *operands, precision=None):
    """einsum with an optimal contraction path.

    jnp.einsum lowers to lax.dot_general; `optimize` lets 3+-operand
    contractions pick the cheapest pairwise order at trace time.
    """
    return jnp.einsum(subscripts, *operands, optimize=True,
                      precision=precision)
