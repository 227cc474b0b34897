"""Benchmark: CCSD amplitude-iteration throughput (driver metric).

Runs one jitted CCSD amplitude iteration (full residual + Jacobi/DIIS-free
update) on a synthetic Hamiltonian at (o, v) = (32, 128) in float32, on the
default JAX device (the real TPU chip when available, CPU otherwise), and
prints ONE JSON line:

  {"metric": ..., "value": ..., "unit": ..., "vs_baseline": ...}

vs_baseline compares against the reference-equivalent CPU path: the same
iteration executed in float64 through the XLA CPU backend on this host's
single core measured at (16, 64) = 6.596 s/iter and scaled by the exact
o^2 v^4 flop ratio (x64) to (32, 128) -> 422.1 s/iter.  (The reference
publishes no performance numbers of its own; BASELINE.json `published` is
empty, so the CPU path defines the baseline.)
"""

import json
import os
import sys
import time

sys.path.insert(0, "/root/repo")

CPU_BASELINE_S = 6.596 * 64.0  # (32^2*128^4)/(16^2*64^4) flop scaling

NO, NV = 32, 128


def synth_device(no, nv, key):
    import jax
    import jax.numpy as jnp
    k1, k2 = jax.random.split(key)
    nact = no + nv
    eps = jnp.concatenate([jnp.linspace(-2.0, -0.5, no),
                           jnp.linspace(0.3, 3.0, nv)]).astype(jnp.float32)
    F = jnp.diag(eps) + 0.0005 * jax.random.normal(k1, (nact, nact), jnp.float32)
    F = 0.5 * (F + F.T)
    A = 0.05 * jax.random.normal(k2, (nact,) * 4, jnp.float32)
    A = A + jnp.transpose(A, (1, 0, 2, 3))
    A = A + jnp.transpose(A, (0, 1, 3, 2))
    A = A + jnp.transpose(A, (2, 3, 0, 1))
    ERI = jnp.swapaxes(A, 1, 2)
    L = 2.0 * ERI - jnp.swapaxes(ERI, 2, 3)
    return F, ERI, L


def _run(no, nv):
    import jax
    # persistent compile cache: the axon remote compile of the full CCSD
    # residual graph takes ~10 min cold; cached runs start in seconds.
    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    import jax.numpy as jnp
    import pycc_tpu  # noqa: F401
    from pycc_tpu.models import ccsd as eqs
    from pycc_tpu.models.blocked import blocks_from_full, blocked_views

    build = jax.jit(lambda k: synth_device(no, nv, k))
    F, ERI, L = build(jax.random.PRNGKey(0))
    F.block_until_ready()

    eps = jnp.diag(F)
    Dia = eps[:no, None] - eps[None, no:]
    Dijab = (eps[:no, None, None, None] + eps[None, :no, None, None]
             - eps[None, None, no:, None] - eps[None, None, None, no:])
    t1 = jnp.zeros((no, nv), jnp.float32)
    t2 = ERI[:no, :no, no:, no:] / Dijab

    # blocked storage (models/blocked.py): 1.76x faster than full ERI+L on
    # TPU at this size (30.2 vs 53.2 ms/iter) -- lane-aligned blocks, no
    # padding waste, half the HBM traffic
    blocks = jax.jit(blocks_from_full, static_argnums=1)(ERI, no)
    del ERI, L

    # big arrays enter as jit ARGUMENTS (closure constants are serialized
    # into the axon remote-compile HTTP request -> 413 at larger sizes)
    @jax.jit
    def step(F, blocks, Dia, Dijab, t1, t2):
        bE, bL = blocked_views(blocks, no)
        r1, r2 = eqs.residuals_ccsd(F, bE, bL, t1, t2, no)
        return t1 + r1 / Dia, t2 + r2 / Dijab

    # warmup/compile
    a, b = step(F, blocks, Dia, Dijab, t1, t2)
    a.block_until_ready()

    n = 10
    t0 = time.time()
    for _ in range(n):
        a, b = step(F, blocks, Dia, Dijab, a, b)
    a.block_until_ready()
    dt = (time.time() - t0) / n

    return dt


def main():
    """Attempt the TPU run in a watchdogged subprocess (the axon tunnel can
    HANG, not just raise, when the worker is wedged); fall back to a
    flop-scaled CPU measurement so the driver always gets its JSON line."""
    import subprocess
    try:
        out = subprocess.run(
            [sys.executable, os.path.abspath(__file__), "--child"],
            capture_output=True, text=True, timeout=2400)
        for line in out.stdout.splitlines():
            if line.startswith("{"):
                print(line)
                return
        raise RuntimeError("child produced no metric: %s" % out.stderr[-400:])
    except Exception as exc:
        print("# TPU run failed (%s); falling back to CPU" % exc,
              file=sys.stderr)
        import jax
        jax.config.update("jax_platforms", "cpu")
        dt = _run(16, 64) * 64.0  # flop-scale to the (32,128) metric size
        print(json.dumps({
            "metric": "ccsd_iteration_o32_v128_f32_cpu_fallback_scaled",
            "value": round(dt, 6),
            "unit": "s/iter",
            "vs_baseline": round(CPU_BASELINE_S / dt, 2),
        }))


def _child():
    dt = _run(NO, NV)
    print(json.dumps({
        "metric": "ccsd_iteration_o32_v128_f32",
        "value": round(dt, 6),
        "unit": "s/iter",
        "vs_baseline": round(CPU_BASELINE_S / dt, 2),
    }))


if __name__ == "__main__":
    if "--child" in sys.argv:
        _child()
    else:
        main()
