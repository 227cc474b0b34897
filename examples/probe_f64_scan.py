"""AOT compile-probe the f64 refinement-stage programs at w10 scale.

Lowers each scan-residual program with jax.ShapeDtypeStruct arguments
(NO device arrays — the device and its HBM are untouched, so this is
safe to run while a capture iterates) and compiles it on the axon AOT
helper.  Two purposes:

  1. verdict: each program either fits (40,360) naux=3411 f64 HBM or
     OOMs here, BEFORE the capture relaunch burns its window;
  2. cache pre-seeding: the persistent compile cache is keyed on the
     HLO, so the relaunch cache-hits every program probed here.

Run: python examples/probe_f64_scan.py [no nv naux [dtype]]
"""

import sys
import time

sys.path.insert(0, "/root/repo")  # runnable from any cwd

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
jax.config.update("jax_enable_x64", True)

from pycc_tpu.models import dfccsd as q
from pycc_tpu.models.dfccsd import DFERI


def main():
    no = int(sys.argv[1]) if len(sys.argv) > 1 else 40
    nv = int(sys.argv[2]) if len(sys.argv) > 2 else 360
    naux = int(sys.argv[3]) if len(sys.argv) > 3 else 3411
    dt = jnp.dtype(sys.argv[4]) if len(sys.argv) > 4 else jnp.float64
    nact = no + nv

    def S(*shape):
        return jax.ShapeDtypeStruct(shape, dt)

    df = DFERI(Boo=S(naux, no, no), Bov=S(naux, no, nv),
               Bvv=S(naux, nv, nv))
    F = S(nact, nact)
    t1, t2 = S(no, nv), S(no, no, nv, nv)
    ovov = S(naux, no, nv)
    eri = S(no, no, nv, nv)

    nchunks = 4 if no * no * nv * nv > 5e7 else 1
    while no % nchunks:
        nchunks -= 1
    rows = no // nchunks
    max_elems = 12 * 10 ** 6 if dt == jnp.float64 else 6 * 10 ** 7
    ablk, bblk = q._sc_ladder_blocks(nv, max_elems, naux=naux)
    na, nb = nv // ablk, nv // bblk
    grid_chunks = 6 if no * no * nv * nv > 5e7 else 1
    per = -(-(na * nb) // min(grid_chunks, na * nb))
    i32 = jax.ShapeDtypeStruct((per,), jnp.dtype("int32"))
    mk = jax.ShapeDtypeStruct((per,), dt)

    oP = S(no, naux, nv)        # row-sliced P factors (i, P, a)
    K = S(naux, no, no)
    Wst = S(no, no, nv, nv)     # j-leading W stacks
    probes = [
        ("qf_energy", jax.jit(q.cc_energy_df_qf, static_argnums=(4, 5)),
         (F, df, t1, t2, no, True)),
        ("sc_integrals", q._sc_integrals, (df,), dict(no=no)),
        ("sc_f_rows", q._sc_f_rows, (F, df, t1, t2), dict(no=no)),
        ("sc_f_vv", q._sc_f_vv, (df, t1), dict(no=no)),
        ("sc_r1", q._sc_r1, (F, df, t1, t2, S(nv, nv), S(no, no),
                             S(no, nv)), dict(no=no)),
        ("sc_gem", q._sc_gem, (df, t1), dict(no=no)),
        ("sc_wmnij", q._sc_wmnij, (df, eri, t1, t2, K), dict(no=no)),
        ("ring_ej_mc", q._sc_ring_ej_mc,
         (df, t1, t2, oP, jax.ShapeDtypeStruct((), jnp.dtype("int32")),
          eri), dict(no=no, mc=q._div_chunk(
              no, (5 * q._SLAB // 2) // (no * nv * nv)))),
        ("ring_je_asm", q._sc_ring_je_asm,
         (df, t1, K, jax.ShapeDtypeStruct((), jnp.dtype("int32"))),
         dict(no=no, mc=q._div_chunk(
              no, (5 * q._SLAB // 2) // (no * nv * nv)))),
        ("ring_je_mc", q._sc_ring_je_mc,
         (df, t1, t2, jax.ShapeDtypeStruct((), jnp.dtype("int32")),
          S(no, q._div_chunk(no, (5 * q._SLAB // 2) // (no * nv * nv)),
            nv, nv), eri),
         dict(no=no, mc=q._div_chunk(
              no, (5 * q._SLAB // 2) // (no * nv * nv)))),
        ("sc_prows_a", q._sc_prows_a,
         (df, t1, t2, S(nv, nv), S(no, no),
          S(rows, nv), S(rows, no, nv, nv), S(rows, no, no, no),
          S(rows, naux, nv)), dict(no=no)),
        ("sc_prows_b", q._sc_prows_b,
         (ovov, ovov, S(rows, naux, nv), S(rows, naux, nv)),
         dict(no=no)),
        ("sc_ladder", q._sc_ladder,
         (df, t1, t2, eri, i32, i32, mk),
         dict(no=no, ablk=ablk, bblk=bblk)),
        ("rs_sym", q._rs_sym, (eri,)),
    ]
    for item in probes:
        name, fn, args = item[0], item[1], item[2]
        kw = item[3] if len(item) > 3 else {}
        t0 = time.time()
        try:
            lowered = fn.lower(*args, **kw)
            compiled = lowered.compile()
            dt_s = time.time() - t0
            try:
                mem = compiled.memory_analysis()
                peak = (getattr(mem, "temp_size_in_bytes", 0)
                        + getattr(mem, "argument_size_in_bytes", 0))
                extra = " temp=%.2fGB args=%.2fGB" % (
                    getattr(mem, "temp_size_in_bytes", 0) / 1e9,
                    getattr(mem, "argument_size_in_bytes", 0) / 1e9)
            except Exception:
                extra = ""
            print("PROBE %-14s OK   %6.1f s%s" % (name, dt_s, extra),
                  flush=True)
        except Exception as exc:
            msg = str(exc)
            if "Ran out of memory" in msg:
                import re
                m = re.search(r"Used ([0-9.]+[GM]) of", msg)
                msg = "HBM OOM (%s)" % (m.group(1) if m else "?")
            else:
                msg = msg.splitlines()[0][:140]
            print("PROBE %-14s FAIL %6.1f s  %s"
                  % (name, time.time() - t0, msg), flush=True)


if __name__ == "__main__":
    main()
