"""Pallas TPU kernel for the (T) triples energy: fused T3-slab pipeline.

RETIRED as a performance path (round 4): the remat-barrier +
pair-symmetric j-chunked XLA scan (triples._t_vikings_row_sym_jc) runs
the same (32,128) f32 evaluation in 10.8 s vs this kernel's 170.9 s.
Kept in-tree as an exact, CI-equality-tested scaffold documenting the
Mosaic lowering rules (see PERF.md "Pallas (T) kernel"); no further
tuning is planned.

The XLA slab path (triples._t_vikings_row) is HBM-bound: each per-(i,j)
T3 slab (no*v^3 f32) is materialized, its permuted combinations td/T are
materialized again, and every X-contraction re-reads them — ~2 GB of HBM
traffic per occupied pair dwarfs the ~1.3e11 flops (measured 60 s at
(o,v)=(32,128) on a v5e ~= 2 TFLOP/s).  This kernel never lets T3 touch
HBM: for one occupied row i it walks a (j, k, c-tile) grid, builds ONE
connected-T3 tile per cell in VMEM, divides by the denominator, and
accumulates the energy PROJECTIONS of the tile.  The td/T permutations
(a<->c)/(b<->c) are pushed onto the projections via index relabeling
(sum t3^P . G == sum t3 . G^{P^-1}) — the adjoint trick — so permuted
slabs are never formed either.

Projection outputs per row i (f32), finished on the host by
`t_row_finalize` with tiny contractions (identical algebra to
triples._t_vikings_row, cf. /root/reference/pycc/cctriples.py:103-142):

    X1a[j,a]  = sum_kyc t3[k,a,y,c] L[j,k,y,c]
    X1m[j,c]  = sum_kxy t3[k,x,y,c] L[j,k,y,x]        (the (ac) image)
    Z1[j,a,d] = sum_kyc t3[k,a,y,c] (2 Ev[d,k,y,c] - Ev[d,k,c,y])
    Z1m[j,c,d]= sum_kxy t3[k,x,y,c] Ev[d,k,y,x]       (the (ac) image)
    Z2a[j,a,b]= sum_kc  t3[k,a,b,c] Fov[k,c]
    Z2m[j,b,a]= sum_kx  t3[k,x,b,a] Fov[k,x]          (the (ac) image)
    X2l[j,l,a,b] = sum_kc (2 t3[k,a,b,c] - t3[k,a,c,b] - t3[k,c,b,a])
                   . Eo[j,k,l,c]

Layouts follow triples.slab_layouts: Wv = Wvvvo_o (o,v,v,v) used as
Wv[m][x,y,e]; O = Wovoo_t (o,o,o,v).  Integral/amplitude operands stream
in their given dtype (bf16 halves VMEM/bandwidth, f32 full precision —
the v5e has ~128 MB of VMEM, probed; Mosaic's small default budget is
raised via vmem_limit_bytes); the T3 tile and all projections accumulate
in float32.  The in-VMEM T3 tile layout is (a, ct, b) so the minor axis
is always a full lane-aligned v.  All dynamic slicing happens on REFS
(pl.ds) — Mosaic does not lower dynamic_slice on loaded values.
"""

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

F32 = jnp.float32


def _mm(a, b):
    """2-D matmul with f32 accumulation."""
    return jax.lax.dot_general(a, b, (((1,), (0,)), ((), ())),
                               preferred_element_type=F32)


def _t_row_kernel(Wi_r, Wj_r, Wk_r,
                  t2kj_r, t2jk_r, t2ji_r, t2ij_r, t2ik_r, t2ki_r,
                  t2i_r, t2j_r, t2k_r,
                  Ojk_r, Okj_r, Oij_r, Oji_r, Oki_r, Oik_r,
                  FB_r, esum_r, E2xy_r, Mzy_r,
                  Ljk_r, Evk_r, Eojk_r,
                  X1a_r, X1m_r, Z1_r, Z1m_r, Z2a_r, Z2m_r, X2l_r,
                  *, no, nv, cblk):
    j = pl.program_id(0)
    k = pl.program_id(1)
    ci = pl.program_id(2)
    c0 = ci * cblk
    cs = pl.ds(c0, cblk)

    @pl.when(jnp.logical_and(k == 0, ci == 0))
    def _init():
        for r in (X1a_r, X1m_r, Z1_r, Z1m_r, Z2a_r, Z2m_r, X2l_r):
            r[:] = jnp.zeros(r.shape, r.dtype)

    # ---- T3 tile (a, ct, b): twelve connected contractions -------------
    # v-terms: sum_e W[x, y, e] t2row[r, e] with axis labels (P, Q, R)
    # a permutation of (a, b, c); 'c'-labeled axes are ref-sliced to the
    # tile.  The dot output leads with the R axis so the minor stays v.
    def vterm(W_r, row_r, P, Q, R):
        Wsl = W_r[0, cs] if P == "c" else (
            W_r[0, :, cs] if Q == "c" else W_r[0])
        rows = row_r[0, 0, cs] if R == "c" else row_r[0, 0]
        pn = cblk if P == "c" else nv
        qn = cblk if Q == "c" else nv
        rn = cblk if R == "c" else nv
        M = _mm(rows, Wsl.reshape(pn * qn, nv).T).reshape(rn, pn, qn)
        order = {R: 0, P: 1, Q: 2}
        return jnp.transpose(M, (order["a"], order["c"], order["b"]))

    # o-terms: sum_m Ovec[m, V] t2slab[m, X, Y]
    def oterm(O_r, t2s_r, V, X, Y):
        Osl = O_r[0, 0, :, cs] if V == "c" else O_r[0, 0]
        if X == "c":
            sl = t2s_r[0, :, cs, :]
        elif Y == "c":
            sl = t2s_r[0, :, :, cs]
        else:
            sl = t2s_r[0]
        vn = cblk if V == "c" else nv
        xn = cblk if X == "c" else nv
        yn = cblk if Y == "c" else nv
        M = _mm(Osl.T, sl.reshape(no, xn * yn)).reshape(vn, xn, yn)
        order = {V: 0, X: 1, Y: 2}
        return jnp.transpose(M, (order["a"], order["c"], order["b"]))

    t3 = vterm(Wi_r, t2kj_r, "b", "a", "c")
    t3 += vterm(Wi_r, t2jk_r, "c", "a", "b")
    t3 += vterm(Wk_r, t2ji_r, "a", "c", "b")
    t3 += vterm(Wk_r, t2ij_r, "b", "c", "a")
    t3 += vterm(Wj_r, t2ik_r, "c", "b", "a")
    t3 += vterm(Wj_r, t2ki_r, "a", "b", "c")
    t3 -= oterm(Ojk_r, t2i_r, "c", "a", "b")
    t3 -= oterm(Okj_r, t2i_r, "b", "a", "c")
    t3 -= oterm(Oij_r, t2k_r, "b", "c", "a")
    t3 -= oterm(Oji_r, t2k_r, "a", "c", "b")
    t3 -= oterm(Oki_r, t2j_r, "a", "b", "c")
    t3 -= oterm(Oik_r, t2j_r, "c", "b", "a")

    # den[x, ct, y] = esum - ev[x] - ev[ct] - ev[y], assembled from
    # rank-2 operands only (Mosaic cannot reorient a lane vector, and
    # rank-1 / lane-1 values crash its layout pass)
    den = (esum_r[j, k]
           - E2xy_r[:][:, None, :]         # (v, 1, v): ev[x] + ev[y]
           - Mzy_r[cs, :][None, :, :])     # (1, ct, v): ev[ct]
    t3 = t3 / den

    # ---- projections ---------------------------------------------------
    Eo = Eojk_r[0, 0].astype(F32)        # (o, v)

    t3_flat_a = t3.reshape(nv, cblk * nv)          # (a, (ct b))
    t3_c_lead = jnp.transpose(t3, (1, 0, 2))       # (ct, a, b)

    # X1a partial [a, y] += sum_c t3[a,c,y] L[y,c]; finalize sums y
    Lsl = Ljk_r[0, 0, :, cs].astype(F32)           # (y, ct)
    X1a_r[0] += jnp.sum(t3 * Lsl.T[None, :, :], axis=1)
    # X1m partial [c, y] += sum_x t3[x,c,y] L[y,x]; finalize sums y
    Lf = Ljk_r[0, 0].astype(F32)                   # (y, x)
    X1m_r[0, cs, :] += jnp.sum(t3 * Lf.T[:, None, :], axis=0)
    # Z1[a,d] += sum_{y,c} t3[a,c,y] (2 Ev[d,y,c] - Ev[d,c,y])
    Ev1 = (2.0 * jnp.transpose(Evk_r[:, 0, :, cs], (2, 1, 0))
           - jnp.transpose(Evk_r[:, 0, cs, :], (1, 2, 0))).astype(F32)
    Z1_r[0] += _mm(t3_flat_a, Ev1.reshape(cblk * nv, nv))
    # Z1m[c,d] += sum_{x,y} t3[x,c,y] Ev[d,y,x]
    Ev3 = jnp.transpose(Evk_r[:, 0], (2, 1, 0)).astype(F32)  # (x, y, d)
    Z1m_r[0, cs, :] += _mm(t3_c_lead.reshape(cblk, nv * nv),
                           Ev3.reshape(nv * nv, nv))
    # Z2a[a,b] += sum_c t3[a,c,b] Fov[k,c]; FB[z,y] = Fov[k,z]
    FB = FB_r[0].astype(F32)                       # (z, y) = F[z]
    Z2a_r[0] += jnp.sum(t3 * FB_r[0, cs, :].astype(F32)[None, :, :], axis=1)
    # Z2m[b,a'] += sum_x t3[x,a',b] Fov[k,x]; F[x] = FB[x, y]
    Z2m_r[0, :, cs] += jnp.transpose(
        jnp.sum(t3 * FB[:, None, :], axis=0), (1, 0))
    # X2l[l,a,b]: direct 2*sum_c t3[a,c,b] Eo[l,c]
    X2l_r[0] += 2.0 * _mm(
        Eojk_r[0, 0, :, cs].astype(F32),
        t3_c_lead.reshape(cblk, nv * nv)).reshape(no, nv, nv)
    # (bc): X2l[l,a,b'] -= N1 with N1[l,a,ct] = sum_y Eo[l,y] t3[a,ct,y]
    N1 = _mm(Eo, t3.reshape(nv * cblk, nv).T).reshape(no, nv, cblk)
    X2l_r[0, :, :, cs] += -N1  # noqa: E501  (cblk == nv keeps minors lane-wide)
    # (ac): X2l[l, a in cs, b] -= N2[l,ct,y] = sum_x Eo[l,x] t3[x,ct,y]
    N2 = _mm(Eo, t3.reshape(nv, cblk * nv)).reshape(no, cblk, nv)
    X2l_r[0, :, cs, :] += -N2


def t_energy_row_pallas(i, Wvvvo_o, Wovoo_t, Evovv, Eooov, Loovv, Fov,
                        eps, t1, t2, no, cblk=None, interpret=False,
                        stream_dtype=jnp.float32):
    """Projection outputs for occupied row i; finalize with
    `t_row_finalize`.  `stream_dtype` controls the streamed operand
    precision (float32 full precision; bfloat16 halves VMEM/bandwidth)."""
    nv = t2.shape[-1]
    if cblk is None:
        cblk = nv   # full-cube tiles: the v5e's ~128 MB VMEM takes the
        # whole (v, v, v) f32 T3 cube at v=128, and full-width tiles keep
        # every in-kernel reshape lane-preserving (Mosaic rejects
        # reshapes that split the minor dim below 128)
    SD = stream_dtype
    Wv = Wvvvo_o.astype(SD)
    O = Wovoo_t.astype(SD)
    t2s = t2.astype(SD)
    # (no, no, v, v) pairwise t2 rows are just t2 itself under different
    # index maps; same for O
    Ev = Evovv.astype(SD)
    Eo = Eooov.astype(SD)
    L = Loovv.astype(SD)
    # FB[k][z, y] = Fov[k, z]: a rank-2 broadcast per k (rank-1 values
    # crash Mosaic's layout pass)
    Fv = jnp.broadcast_to(Fov.astype(F32)[:, :, None], (no, nv, nv))
    eps = eps.astype(F32)
    esum = (eps[i] + eps[:no, None] + eps[None, :no])  # (j, k)
    E2xy = eps[no:, None] + eps[None, no:]             # ev[x] + ev[y]
    Mzy = jnp.broadcast_to(eps[no:, None], (nv, nv))   # ev[z] per row
    nc = nv // cblk
    assert nc * cblk == nv

    grid = (no, no, nc)
    kernel = functools.partial(_t_row_kernel, no=no, nv=nv, cblk=cblk)

    # i-dependent operands are hoisted host-side (scalar-prefetch reads
    # inside index maps fail to legalize in this Mosaic version), so the
    # index maps use only the grid ids
    def im(*maps):
        def f(j, k, c):
            return tuple(j if m == "j" else k if m == "k" else
                         c if m == "c" else 0 for m in maps)
        return f

    Wi = Wv[i].reshape(1, nv, nv, nv)
    t2_rowi = t2s[i].reshape(no, 1, nv, nv)    # [j-slot, ...]
    t2_coli = t2s[:, i].reshape(no, 1, nv, nv)
    t2i_slab = t2s[i:i + 1]
    O_rowi = O[i].reshape(no, 1, no, nv)
    O_coli = O[:, i].reshape(no, 1, no, nv)

    o, v = no, nv
    grid_spec = pl.GridSpec(
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, v, v, v), im(0, 0, 0, 0)),      # Wi
            pl.BlockSpec((1, v, v, v), im("j", 0, 0, 0)),    # Wj
            pl.BlockSpec((1, v, v, v), im("k", 0, 0, 0)),    # Wk
            pl.BlockSpec((1, 1, v, v), im("k", "j", 0, 0)),  # t2[k,j]
            pl.BlockSpec((1, 1, v, v), im("j", "k", 0, 0)),  # t2[j,k]
            pl.BlockSpec((1, 1, v, v), im("j", 0, 0, 0)),    # t2[j,i]
            pl.BlockSpec((1, 1, v, v), im("j", 0, 0, 0)),    # t2[i,j]
            pl.BlockSpec((1, 1, v, v), im("k", 0, 0, 0)),    # t2[i,k]
            pl.BlockSpec((1, 1, v, v), im("k", 0, 0, 0)),    # t2[k,i]
            pl.BlockSpec((1, o, v, v), im(0, 0, 0, 0)),      # t2[i] slab
            pl.BlockSpec((1, o, v, v), im("j", 0, 0, 0)),    # t2[j] slab
            pl.BlockSpec((1, o, v, v), im("k", 0, 0, 0)),    # t2[k] slab
            pl.BlockSpec((1, 1, o, v), im("j", "k", 0, 0)),  # O[j,k]
            pl.BlockSpec((1, 1, o, v), im("k", "j", 0, 0)),  # O[k,j]
            pl.BlockSpec((1, 1, o, v), im("j", 0, 0, 0)),    # O[i,j]
            pl.BlockSpec((1, 1, o, v), im("j", 0, 0, 0)),    # O[j,i]
            pl.BlockSpec((1, 1, o, v), im("k", 0, 0, 0)),    # O[k,i]
            pl.BlockSpec((1, 1, o, v), im("k", 0, 0, 0)),    # O[i,k]
            pl.BlockSpec((1, v, v), im("k", 0, 0)),          # Fov[k] bcast
            pl.BlockSpec(memory_space=pltpu.SMEM),           # esum (full)
            pl.BlockSpec((v, v), im(0, 0)),                  # ev[x]+ev[y]
            pl.BlockSpec((v, v), im(0, 0)),                  # ev[z] rows
            pl.BlockSpec((1, 1, v, v), im("j", "k", 0, 0)),  # L[j,k]
            pl.BlockSpec((v, 1, v, v), im(0, "k", 0, 0)),    # Ev[:,k]
            pl.BlockSpec((1, 1, o, v), im("j", "k", 0, 0)),  # Eo[j,k]
        ],
        out_specs=[
            pl.BlockSpec((1, v, v), im("j", 0, 0)),          # X1a partial
            pl.BlockSpec((1, v, v), im("j", 0, 0)),          # X1m partial
            pl.BlockSpec((1, v, v), im("j", 0, 0)),          # Z1
            pl.BlockSpec((1, v, v), im("j", 0, 0)),          # Z1m
            pl.BlockSpec((1, v, v), im("j", 0, 0)),          # Z2a
            pl.BlockSpec((1, v, v), im("j", 0, 0)),          # Z2m
            pl.BlockSpec((1, o, v, v), im("j", 0, 0, 0)),    # X2l
        ],
    )
    # the repo runs with jax_enable_x64 on; x64 index maps emit i64
    # values this Mosaic build fails to legalize — trace the kernel in
    # 32-bit mode (all operands are explicitly typed anyway)
    with jax.enable_x64(False):
      outs = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        # the v5e has ~128 MB of VMEM; Mosaic's default budget is far
        # smaller and would reject the resident W cubes
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=130 * 1024 * 1024),
        out_shape=[
            jax.ShapeDtypeStruct((no, v, v), F32),
            jax.ShapeDtypeStruct((no, v, v), F32),
            jax.ShapeDtypeStruct((no, v, v), F32),
            jax.ShapeDtypeStruct((no, v, v), F32),
            jax.ShapeDtypeStruct((no, v, v), F32),
            jax.ShapeDtypeStruct((no, v, v), F32),
            jax.ShapeDtypeStruct((no, o, v, v), F32),
        ],
        interpret=interpret,
      )(Wi, Wv, Wv,
      t2s, t2s, t2_coli, t2_rowi, t2_rowi, t2_coli,
      t2i_slab, t2s, t2s,
      O, O, O_rowi, O_coli, O_coli, O_rowi,
      Fv, esum, E2xy, Mzy, L, Ev, Eo)
    return outs


def t_row_finalize(i, outs, t1, t2):
    """Scalar (T) energy for row i from the kernel projections."""
    X1a, X1m, Z1, Z1m, Z2a, Z2m, X2l = outs
    t2w = 4.0 * t2 - 2.0 * jnp.swapaxes(t2, 2, 3)
    X1 = jnp.sum(X1a - X1m, axis=2)             # (j, a): partials sum y
    X2 = (Z1 - Z1m) + (Z2a - jnp.swapaxes(Z2m, 1, 2))
    e = 2.0 * jnp.einsum("a,ja->", t1[i].astype(F32), X1)
    e += jnp.einsum("jab,jab->", t2w[i].astype(F32), X2)
    # the X2l term pairs t2w[i, l] with X2l[j, l]
    e -= jnp.einsum("lab,jlab->", t2w[i].astype(F32), X2l)
    return e


def t_vikings_pallas(Wvvvo_o, Wovoo_t, Evovv, Eooov, Loovv, Fov, eps,
                     t1, t2, no, cblk=None, interpret=False,
                     stream_dtype=jnp.float32):
    """(T) energy via the fused Pallas row kernel (host loop over i,
    matching the watchdog-safe dispatch granularity of
    triples.t_vikings_scan_core)."""
    e = jnp.asarray(0.0, F32)
    fin = jax.jit(t_row_finalize, static_argnums=0)
    for i in range(no):
        outs = t_energy_row_pallas(i, Wvvvo_o, Wovoo_t, Evovv, Eooov,
                                   Loovv, Fov, eps, t1, t2, no,
                                   cblk=cblk, interpret=interpret,
                                   stream_dtype=stream_dtype)
        e = e + fin(i, outs, t1, t2)
    return e
