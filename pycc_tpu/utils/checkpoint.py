"""Amplitude-pytree checkpointing for iterative solvers.

The reference checkpoints only RT propagation (pickles in rtcc.propagate,
/root/reference/pycc/rt/rtcc.py:439-556).  This generalizes checkpoint/
restore to any amplitude pytree (ground-state T, Lambda, response X/Y) as
compressed .npz archives, so long solves on preemptible hardware can resume.
"""

import numpy as np
import jax.numpy as jnp


def save_amps(path, **amps):
    """save_amps('ccsd.npz', t1=t1, t2=t2, niter=7)"""
    np.savez_compressed(path, **{k: np.asarray(v) for k, v in amps.items()})


def load_amps(path, as_jax=True):
    data = np.load(path, allow_pickle=False)
    if as_jax:
        return {k: jnp.asarray(data[k]) for k in data.files}
    return {k: data[k] for k in data.files}
