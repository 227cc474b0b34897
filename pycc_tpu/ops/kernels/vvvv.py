"""Pallas TPU kernel for the particle-particle-ladder contraction.

The hottest CCSD term is r2 += 0.5 * tau_ijef * <ab|ef>
(/root/reference/pycc/ccwfn.py:607): an (o^2, v^2) x (v^2, v^2)^T matmul.
This kernel tiles it onto the MXU with optional bfloat16 inputs and float32
accumulation (the mixed-precision mode that mirrors the reference's
SP option, but with f32 accumulate), double-buffered by the Pallas pipeline.

Used on TPU via `vvvv_pallas(tau2d, W2d)`; the XLA reshape-dot
(models.ccsd.vvvv_contract) remains the portable default.
"""

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _kernel(a_ref, b_ref, o_ref, acc_ref, *, nk):
    k = pl.program_id(2)

    @pl.when(k == 0)
    def _():
        acc_ref[:] = jnp.zeros_like(acc_ref)

    acc_ref[:] += jnp.dot(a_ref[:], b_ref[:].T,
                          preferred_element_type=jnp.float32)

    @pl.when(k == nk - 1)
    def _():
        o_ref[:] = acc_ref[:].astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("tm", "tn", "tk", "bf16",
                                             "interpret"))
def vvvv_pallas(A, B, tm=256, tn=256, tk=512, bf16=False, interpret=False):
    """C[m, n] = sum_k A[m, k] * B[n, k]  (i.e. A @ B.T), tiled on the MXU.

    A: (M, K) tau matrix (o^2, v^2); B: (N, K) ERI matrix (v^2, v^2).
    With bf16=True the operands are cast to bfloat16 and accumulated in
    float32 (mixed-precision perf mode)."""
    M, K = A.shape
    N = B.shape[0]
    tm = min(tm, M)
    tn = min(tn, N)
    tk = min(tk, K)
    assert M % tm == 0 and N % tn == 0 and K % tk == 0, (M, N, K, tm, tn, tk)
    out_dtype = A.dtype
    if bf16:
        A = A.astype(jnp.bfloat16)
        B = B.astype(jnp.bfloat16)
    nk = K // tk
    grid = (M // tm, N // tn, nk)
    return pl.pallas_call(
        functools.partial(_kernel, nk=nk),
        grid=grid,
        in_specs=[
            pl.BlockSpec((tm, tk), lambda i, j, k: (i, k)),
            pl.BlockSpec((tn, tk), lambda i, j, k: (j, k)),
        ],
        out_specs=pl.BlockSpec((tm, tn), lambda i, j, k: (i, j)),
        out_shape=jax.ShapeDtypeStruct((M, N), out_dtype),
        scratch_shapes=[pltpu.VMEM((tm, tn), jnp.float32)],
        interpret=interpret,
    )(A, B)
