"""ctypes bindings for the C++ native tier (see bls12_381.cpp).

The shared library is compiled on first use with g++ (the environment has no
pybind11; plain C ABI + ctypes is the binding layer) and cached next to the
source, keyed by a source hash. If no toolchain is available, `lib()` raises
and callers fall back to the pure-Python oracle (utils/refmodel.py) — the
native tier is an accelerator, never a semantic dependency.

All array interfaces use standard-form little-endian 6x-u64 limbs per Fp.
"""

from __future__ import annotations

import ctypes
import hashlib
import os
import subprocess

import numpy as np

from ..utils import refmodel as rm

_DIR = os.path.dirname(os.path.abspath(__file__))
_LIB = None


def _source_hash() -> str:
    h = hashlib.sha256()
    with open(os.path.join(_DIR, "bls12_381.cpp"), "rb") as f:
        h.update(f.read())
    with open(os.path.join(_DIR, "gen_constants.py"), "rb") as f:
        h.update(f.read())
    return h.hexdigest()[:16]


def build(force: bool = False) -> str:
    """Compile the shared library (cached by source hash); returns its path."""
    so = os.path.join(_DIR, f"libbls_{_source_hash()}.so")
    if os.path.exists(so) and not force:
        return so
    from . import gen_constants

    inc = os.path.join(_DIR, "constants.inc")
    with open(inc, "w") as f:
        f.write(gen_constants.main())
    subprocess.run(
        [
            "g++", "-O3", "-std=c++17", "-shared", "-fPIC", "-pthread",
            "-o", so, os.path.join(_DIR, "bls12_381.cpp"),
        ],
        check=True,
        capture_output=True,
        cwd=_DIR,
    )
    return so


def lib() -> ctypes.CDLL:
    global _LIB
    if _LIB is None:
        _LIB = ctypes.CDLL(build())
    return _LIB


def available() -> bool:
    try:
        lib()
        return True
    except Exception:
        return False


# ---------------------------------------------------------------------------
# Limb packing helpers (standard form, little-endian u64 x 6)
# ---------------------------------------------------------------------------


def _ints_to_u64(vals, nper: int) -> np.ndarray:
    out = np.empty((len(vals), nper, 6), dtype=np.uint64)
    for i, row in enumerate(vals):
        for j, x in enumerate(row):
            for k in range(6):
                out[i, j, k] = (x >> (64 * k)) & 0xFFFFFFFFFFFFFFFF
    return out


def _u64_to_ints(arr: np.ndarray) -> list:
    arr = arr.reshape(-1, 6).astype(object)
    return [int(sum(int(r[k]) << (64 * k) for k in range(6))) for r in arr]


def _ptr(a: np.ndarray):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_uint64))


def _bptr(a: np.ndarray):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8))


# ---------------------------------------------------------------------------
# High-level API (mirrors utils/refmodel.py, returning the same types)
# ---------------------------------------------------------------------------


def pairing_batch(ps: list, qs: list) -> list:
    """[e(P_i, Q_i)] as refmodel.Fq12 values — the fast native oracle."""
    n = len(ps)
    g1 = _ints_to_u64([[p.x, p.y] for p in ps], 2)
    g2 = _ints_to_u64([[q.x.c0, q.x.c1, q.y.c0, q.y.c1] for q in qs], 4)
    g1i = np.array([1 if p.infinity else 0 for p in ps], dtype=np.uint8)
    g2i = np.array([1 if q.infinity else 0 for q in qs], dtype=np.uint8)
    out = np.zeros((n, 12, 6), dtype=np.uint64)
    rc = lib().pairing_batch(
        _ptr(g1), _bptr(g1i), _ptr(g2), _bptr(g2i), _ptr(out), ctypes.c_long(n)
    )
    assert rc == 0
    ints = _u64_to_ints(out)
    return [rm.Fq12.from_coeffs(ints[i * 12 : (i + 1) * 12]) for i in range(n)]


def multi_pairing_product(ps: list, qs: list) -> "rm.Fq12":
    """prod_i e(P_i, Q_i) via one fused Miller loop + one final exp."""
    n = len(ps)
    g1 = _ints_to_u64([[p.x, p.y] for p in ps], 2)
    g2 = _ints_to_u64([[q.x.c0, q.x.c1, q.y.c0, q.y.c1] for q in qs], 4)
    g1i = np.array([1 if p.infinity else 0 for p in ps], dtype=np.uint8)
    g2i = np.array([1 if q.infinity else 0 for q in qs], dtype=np.uint8)
    out = np.zeros((12, 6), dtype=np.uint64)
    rc = lib().multi_pairing_product(
        _ptr(g1), _bptr(g1i), _ptr(g2), _bptr(g2i), _ptr(out), ctypes.c_long(n)
    )
    assert rc == 0
    return rm.Fq12.from_coeffs(_u64_to_ints(out))


def _scalars_to_u64(ks: list) -> np.ndarray:
    out = np.empty((len(ks), 4), dtype=np.uint64)
    for i, k in enumerate(ks):
        assert 0 <= k < (1 << 256)
        for j in range(4):
            out[i, j] = (k >> (64 * j)) & 0xFFFFFFFFFFFFFFFF
    return out


def g1_mul_batch(ks: list, base: "rm.G1Affine | None" = None) -> list:
    """[k_i * G] as refmodel.G1Affine (fast batched input generation)."""
    base = base or rm.G1Affine.generator()
    b = _ints_to_u64([[base.x, base.y]], 2)
    s = _scalars_to_u64(ks)
    n = len(ks)
    out = np.zeros((n, 2, 6), dtype=np.uint64)
    inf = np.zeros(n, dtype=np.uint8)
    rc = lib().g1_mul_batch(_ptr(b), _ptr(s), _ptr(out), _bptr(inf), ctypes.c_long(n))
    assert rc == 0
    ints = _u64_to_ints(out)
    return [
        rm.G1Affine.identity()
        if inf[i]
        else rm.G1Affine(ints[2 * i], ints[2 * i + 1], False)
        for i in range(n)
    ]


def g2_mul_batch(ks: list, base: "rm.G2Affine | None" = None) -> list:
    base = base or rm.G2Affine.generator()
    b = _ints_to_u64([[base.x.c0, base.x.c1, base.y.c0, base.y.c1]], 4)
    s = _scalars_to_u64(ks)
    n = len(ks)
    out = np.zeros((n, 4, 6), dtype=np.uint64)
    inf = np.zeros(n, dtype=np.uint8)
    rc = lib().g2_mul_batch(_ptr(b), _ptr(s), _ptr(out), _bptr(inf), ctypes.c_long(n))
    assert rc == 0
    ints = _u64_to_ints(out)
    return [
        rm.G2Affine.identity()
        if inf[i]
        else rm.G2Affine(
            rm.Fq2(ints[4 * i], ints[4 * i + 1]),
            rm.Fq2(ints[4 * i + 2], ints[4 * i + 3]),
            False,
        )
        for i in range(n)
    ]


def fp_inv_batch(xs: list) -> list:
    a = _ints_to_u64([[x] for x in xs], 1)
    out = np.zeros((len(xs), 6), dtype=np.uint64)
    rc = lib().fp_inv_batch(_ptr(a), _ptr(out), ctypes.c_long(len(xs)))
    assert rc == 0
    return _u64_to_ints(out)


def fp_mul_batch(xs: list, ys: list) -> list:
    a = _ints_to_u64([[x] for x in xs], 1)
    b = _ints_to_u64([[y] for y in ys], 1)
    out = np.zeros((len(xs), 6), dtype=np.uint64)
    rc = lib().fp_mul_batch(_ptr(a), _ptr(b), _ptr(out), ctypes.c_long(len(xs)))
    assert rc == 0
    return _u64_to_ints(out)
