"""ctypes bridge to the native C++ McMurchie-Davidson ERI engine.

Builds native/libmdints.so on first use (g++ -O3) and exposes
`eri_native(basis)` with the same output as integrals.eri().  Falls back to
the pure-Python engine if the toolchain or build is unavailable.
"""

import ctypes
import os
import subprocess

import numpy as np

_LIB = None
_ROOT = os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
_SRC = os.path.join(_ROOT, "native", "mdints.cpp")
_SO = os.path.join(_ROOT, "native", "libmdints.so")


def _load():
    global _LIB
    if _LIB is not None:
        return _LIB
    if not os.path.exists(_SO) or (os.path.exists(_SRC) and
                                   os.path.getmtime(_SRC) > os.path.getmtime(_SO)):
        subprocess.run(["g++", "-O3", "-march=native", "-shared", "-fPIC",
                        "-o", _SO, _SRC], check=True)
    lib = ctypes.CDLL(_SO)
    lib.md_eri.restype = ctypes.c_int
    lib.md_eri.argtypes = [
        ctypes.c_int,
        np.ctypeslib.ndpointer(np.int32), np.ctypeslib.ndpointer(np.int32),
        np.ctypeslib.ndpointer(np.int32),
        np.ctypeslib.ndpointer(np.float64), np.ctypeslib.ndpointer(np.float64),
        np.ctypeslib.ndpointer(np.float64),
        np.ctypeslib.ndpointer(np.int32), ctypes.c_int,
        np.ctypeslib.ndpointer(np.float64),
    ]
    _LIB = lib
    return lib


def available():
    try:
        _load()
        return True
    except Exception:
        return False


def eri_native(basis):
    """Full (ab|cd) tensor over final AO functions via the C++ engine."""
    from .integrals import shell_transform

    lib = _load()
    shells = basis.shells
    nsh = len(shells)
    ls = np.array([sh.l for sh in shells], dtype=np.int32)
    nprim = np.array([len(sh.exps) for sh in shells], dtype=np.int32)
    poff = np.zeros(nsh, dtype=np.int32)
    for i in range(1, nsh):
        poff[i] = poff[i - 1] + nprim[i - 1]
    exps = np.concatenate([sh.exps for sh in shells]).astype(np.float64)
    coefs = np.concatenate([sh.coefs for sh in shells]).astype(np.float64)
    centers = np.array([sh.center for sh in shells], dtype=np.float64).ravel()
    cart_off = np.zeros(nsh, dtype=np.int32)
    n = 0
    for i, sh in enumerate(shells):
        cart_off[i] = n
        n += sh.ncart
    out = np.zeros((n, n, n, n), dtype=np.float64)
    ret = lib.md_eri(nsh, ls, nprim, poff, exps, coefs, centers, cart_off,
                     n, out.reshape(-1))
    if ret != 0:
        raise RuntimeError("md_eri failed with code %d" % ret)

    # cartesian -> final AO functions per shell
    # build the block-diagonal transform (nbf x ncart_tot)
    T = np.zeros((basis.nbf, n))
    for sh, offf, offc in zip(shells, basis.offsets, cart_off):
        T[offf:offf + sh.nfunc, offc:offc + sh.ncart] = shell_transform(sh)
    out = np.einsum("ai,ijkl->ajkl", T, out, optimize=True)
    out = np.einsum("bj,ajkl->abkl", T, out, optimize=True)
    out = np.einsum("ck,abkl->abcl", T, out, optimize=True)
    out = np.einsum("dl,abcl->abcd", T, out, optimize=True)
    return out
