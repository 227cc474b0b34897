"""Amplitude-pytree checkpointing for iterative solvers.

The reference checkpoints only RT propagation (pickles in rtcc.propagate,
/root/reference/pycc/rt/rtcc.py:439-556).  This generalizes checkpoint/
restore to any amplitude pytree (ground-state T, Lambda, response X/Y) as
compressed .npz archives, so long solves on preemptible hardware can resume.
"""

import os

import numpy as np
import jax.numpy as jnp


def save_amps(path, **amps):
    """save_amps('ccsd.npz', t1=t1, t2=t2, niter=7)

    Atomic: writes to a sibling temp file and os.replace()s it in, so a
    kill mid-write (the failure mode checkpoints exist for) can never
    leave a truncated archive where the last good one was."""
    path = str(path)
    tmp = path + ".tmp"
    # write through a file handle: np.savez appends '.npz' to bare paths
    with open(tmp, "wb") as fh:
        np.savez_compressed(fh, **{k: np.asarray(v)
                                   for k, v in amps.items()})
    os.replace(tmp, path)


def load_amps(path, as_jax=True):
    data = np.load(path, allow_pickle=False)
    if as_jax:
        return {k: jnp.asarray(data[k]) for k in data.files}
    return {k: data[k] for k in data.files}
