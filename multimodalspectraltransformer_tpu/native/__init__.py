"""Native (C++) chemistry runtime — ctypes bindings for chemkernel.cpp.

The pure-Python implementation in ``multimodalspectraltransformer_tpu.chem``
is the spec; this module is the speed. Both produce BIT-IDENTICAL canonical
SMILES, fingerprints, formulas and weights (asserted by tests/test_native.py),
so callers may mix them freely. The native path matters in the
generate->validity->canonicalize->fingerprint accept loop of fan-out
sampling (reference hot path: `mmt_result_test_functions_15_4.py:504-570`,
RDKit calls at `:1051,1250`), where the host must keep up with the TPU.

The shared library is compiled on demand with g++ (the image ships no
pybind11; we bind over a plain C ABI). If no compiler is available the
module reports ``available() == False`` and callers fall back to Python.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading
from typing import Optional, Sequence

import numpy as np

_HERE = os.path.dirname(os.path.abspath(__file__))
_SRC = os.path.join(_HERE, "chemkernel.cpp")
_SO = os.path.join(_HERE, "libmmtchem.so")

_lock = threading.Lock()
_lib: Optional[ctypes.CDLL] = None
_tried = False


def _build() -> bool:
    """(Re)build the shared library if missing or older than the source."""
    try:
        if os.path.exists(_SO) and os.path.getmtime(_SO) >= os.path.getmtime(_SRC):
            return True
        cmd = [
            "g++", "-O2", "-std=c++17", "-fPIC", "-shared", "-pthread",
            "-o", _SO + ".tmp", _SRC,
        ]
        proc = subprocess.run(cmd, capture_output=True, text=True, timeout=300)
        if proc.returncode != 0:
            raise RuntimeError(f"g++ failed:\n{proc.stderr[-2000:]}")
        os.replace(_SO + ".tmp", _SO)
        return True
    except FileNotFoundError:
        return False
    except subprocess.TimeoutExpired:
        return False


def _load() -> Optional[ctypes.CDLL]:
    global _lib, _tried
    with _lock:
        if _lib is not None or _tried:
            return _lib
        _tried = True
        if not _build():
            return None
        lib = ctypes.CDLL(_SO)
        c_char_pp = ctypes.POINTER(ctypes.c_char_p)
        lib.ck_version.restype = ctypes.c_int
        lib.ck_is_valid.argtypes = [ctypes.c_char_p]
        lib.ck_is_valid.restype = ctypes.c_int
        lib.ck_canonical.argtypes = [ctypes.c_char_p, ctypes.c_char_p, ctypes.c_int]
        lib.ck_canonical.restype = ctypes.c_int
        lib.ck_morgan_fp.argtypes = [
            ctypes.c_char_p, ctypes.c_int, ctypes.c_int,
            ctypes.POINTER(ctypes.c_ubyte),
        ]
        lib.ck_morgan_fp.restype = ctypes.c_int
        lib.ck_exact_mol_wt.argtypes = [ctypes.c_char_p]
        lib.ck_exact_mol_wt.restype = ctypes.c_double
        lib.ck_mol_wt.argtypes = [ctypes.c_char_p]
        lib.ck_mol_wt.restype = ctypes.c_double
        lib.ck_formula.argtypes = [ctypes.c_char_p, ctypes.c_char_p, ctypes.c_int]
        lib.ck_formula.restype = ctypes.c_int
        lib.ck_symmetry_classes.argtypes = [
            ctypes.c_char_p, ctypes.POINTER(ctypes.c_int), ctypes.c_int,
        ]
        lib.ck_symmetry_classes.restype = ctypes.c_int
        lib.ck_batch_validity.argtypes = [
            c_char_pp, ctypes.c_int, ctypes.POINTER(ctypes.c_ubyte), ctypes.c_int,
        ]
        lib.ck_batch_canonical.argtypes = [
            c_char_pp, ctypes.c_int, ctypes.c_char_p, ctypes.c_int,
            ctypes.POINTER(ctypes.c_int), ctypes.c_int,
        ]
        lib.ck_batch_morgan_fp.argtypes = [
            c_char_pp, ctypes.c_int, ctypes.c_int, ctypes.c_int,
            ctypes.POINTER(ctypes.c_ubyte), ctypes.POINTER(ctypes.c_ubyte),
            ctypes.c_int,
        ]
        lib.ck_batch_formula.argtypes = [
            c_char_pp, ctypes.c_int, ctypes.c_char_p, ctypes.c_int,
            ctypes.POINTER(ctypes.c_int), ctypes.c_int,
        ]
        lib.ck_batch_exact_mol_wt.argtypes = [
            c_char_pp, ctypes.c_int, ctypes.POINTER(ctypes.c_double), ctypes.c_int,
        ]
        lib.ck_hungarian.argtypes = [
            ctypes.POINTER(ctypes.c_double), ctypes.c_int, ctypes.c_int,
            ctypes.POINTER(ctypes.c_int),
        ]
        lib.ck_hungarian.restype = ctypes.c_double
        lib.ck_batch_hungarian.argtypes = [
            ctypes.POINTER(ctypes.c_double), ctypes.c_int, ctypes.c_int,
            ctypes.c_int, ctypes.POINTER(ctypes.c_int),
            ctypes.POINTER(ctypes.c_double), ctypes.c_int,
        ]
        _lib = lib
        return _lib


def available() -> bool:
    return _load() is not None


def _smiles_array(smiles: Sequence[str]):
    arr = (ctypes.c_char_p * len(smiles))()
    encoded = [s.encode("utf-8", errors="replace") for s in smiles]
    for i, b in enumerate(encoded):
        arr[i] = b
    return arr, encoded  # keep encoded alive


_CANON_CAP = 512


def is_valid(s: str) -> bool:
    lib = _load()
    assert lib is not None
    return bool(lib.ck_is_valid(s.encode("utf-8", errors="replace")))


def canonicalize(s: str) -> Optional[str]:
    lib = _load()
    assert lib is not None
    buf = ctypes.create_string_buffer(_CANON_CAP)
    rc = lib.ck_canonical(s.encode("utf-8", errors="replace"), buf, _CANON_CAP)
    return buf.value.decode() if rc >= 0 else None


def mol_formula(s: str) -> Optional[str]:
    lib = _load()
    assert lib is not None
    buf = ctypes.create_string_buffer(_CANON_CAP)
    rc = lib.ck_formula(s.encode("utf-8", errors="replace"), buf, _CANON_CAP)
    return buf.value.decode() if rc >= 0 else None


def exact_mol_wt(s: str) -> Optional[float]:
    lib = _load()
    assert lib is not None
    w = lib.ck_exact_mol_wt(s.encode("utf-8", errors="replace"))
    return None if np.isnan(w) else float(w)


def mol_wt(s: str) -> Optional[float]:
    lib = _load()
    assert lib is not None
    w = lib.ck_mol_wt(s.encode("utf-8", errors="replace"))
    return None if np.isnan(w) else float(w)


def morgan_fp(s: str, radius: int = 2, n_bits: int = 512) -> Optional[np.ndarray]:
    lib = _load()
    assert lib is not None
    out = np.zeros(n_bits, dtype=np.uint8)
    rc = lib.ck_morgan_fp(
        s.encode("utf-8", errors="replace"), radius, n_bits,
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_ubyte)),
    )
    return out if rc == 0 else None


def symmetry_classes(s: str, max_atoms: int = 1024) -> Optional[list[int]]:
    lib = _load()
    assert lib is not None
    out = np.zeros(max_atoms, dtype=np.int32)
    rc = lib.ck_symmetry_classes(
        s.encode("utf-8", errors="replace"),
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_int)), max_atoms,
    )
    return out[:rc].tolist() if rc >= 0 else None


def batch_validity(smiles: Sequence[str], nthreads: int = 0) -> np.ndarray:
    """Vector of 0/1 validity flags (parallel across threads)."""
    lib = _load()
    assert lib is not None
    if not smiles:
        return np.zeros(0, dtype=np.uint8)
    arr, _keep = _smiles_array(smiles)
    out = np.zeros(len(smiles), dtype=np.uint8)
    lib.ck_batch_validity(
        arr, len(smiles), out.ctypes.data_as(ctypes.POINTER(ctypes.c_ubyte)), nthreads
    )
    return out


def batch_canonicalize(smiles: Sequence[str], nthreads: int = 0) -> list[Optional[str]]:
    lib = _load()
    assert lib is not None
    if not smiles:
        return []
    arr, _keep = _smiles_array(smiles)
    n = len(smiles)
    out = ctypes.create_string_buffer(n * _CANON_CAP)
    lengths = np.zeros(n, dtype=np.int32)
    lib.ck_batch_canonical(
        arr, n, out, _CANON_CAP,
        lengths.ctypes.data_as(ctypes.POINTER(ctypes.c_int)), nthreads,
    )
    results: list[Optional[str]] = []
    raw = out.raw
    for i in range(n):
        ln = int(lengths[i])
        if ln < 0:
            results.append(None)
        else:
            start = i * _CANON_CAP
            results.append(raw[start : start + ln].decode())
    return results


def batch_formula(smiles: Sequence[str], nthreads: int = 0) -> list[Optional[str]]:
    """Molecular formula per item, None where invalid (parallel)."""
    lib = _load()
    assert lib is not None
    if not smiles:
        return []
    arr, _keep = _smiles_array(smiles)
    n = len(smiles)
    out = ctypes.create_string_buffer(n * _CANON_CAP)
    lengths = np.zeros(n, dtype=np.int32)
    lib.ck_batch_formula(
        arr, n, out, _CANON_CAP,
        lengths.ctypes.data_as(ctypes.POINTER(ctypes.c_int)), nthreads,
    )
    results: list[Optional[str]] = []
    raw = out.raw
    for i in range(n):
        ln = int(lengths[i])
        if ln < 0:
            results.append(None)
        else:
            start = i * _CANON_CAP
            results.append(raw[start : start + ln].decode())
    return results


def batch_morgan_fp(
    smiles: Sequence[str], radius: int = 2, n_bits: int = 512, nthreads: int = 0
) -> tuple[np.ndarray, np.ndarray]:
    """Returns (fps [n, n_bits] uint8, valid [n] uint8); invalid rows zeroed."""
    lib = _load()
    assert lib is not None
    n = len(smiles)
    fps = np.zeros((n, n_bits), dtype=np.uint8)
    valid = np.zeros(n, dtype=np.uint8)
    if n == 0:
        return fps, valid
    arr, _keep = _smiles_array(smiles)
    lib.ck_batch_morgan_fp(
        arr, n, radius, n_bits,
        fps.ctypes.data_as(ctypes.POINTER(ctypes.c_ubyte)),
        valid.ctypes.data_as(ctypes.POINTER(ctypes.c_ubyte)), nthreads,
    )
    return fps, valid


def batch_exact_mol_wt(smiles: Sequence[str], nthreads: int = 0) -> np.ndarray:
    """Exact MW per SMILES; NaN for invalid."""
    lib = _load()
    assert lib is not None
    n = len(smiles)
    out = np.full(n, np.nan, dtype=np.float64)
    if n == 0:
        return out
    arr, _keep = _smiles_array(smiles)
    lib.ck_batch_exact_mol_wt(
        arr, n, out.ctypes.data_as(ctypes.POINTER(ctypes.c_double)), nthreads
    )
    return out


def hungarian(cost: np.ndarray) -> tuple[np.ndarray, float]:
    """Exact min-cost assignment for an [n, m] matrix (n <= m). Returns
    (col index per row [n], total cost)."""
    lib = _load()
    assert lib is not None
    cost = np.ascontiguousarray(cost, dtype=np.float64)
    n, m = cost.shape
    if n > m:
        # transpose, solve, invert mapping
        assign_t, total = hungarian(cost.T)
        assign = np.full(n, -1, dtype=np.int32)
        for col, row in enumerate(assign_t):
            assign[row] = col
        return assign, total
    assign = np.zeros(n, dtype=np.int32)
    total = lib.ck_hungarian(
        cost.ctypes.data_as(ctypes.POINTER(ctypes.c_double)), n, m,
        assign.ctypes.data_as(ctypes.POINTER(ctypes.c_int)),
    )
    return assign, float(total)


def batch_hungarian(costs: np.ndarray, nthreads: int = 0) -> tuple[np.ndarray, np.ndarray]:
    """Batched exact assignment for [b, n, m] costs (n <= m). Returns
    (assignments [b, n] int32, totals [b] float64)."""
    lib = _load()
    assert lib is not None
    costs = np.ascontiguousarray(costs, dtype=np.float64)
    b, n, m = costs.shape
    assign = np.zeros((b, n), dtype=np.int32)
    totals = np.zeros(b, dtype=np.float64)
    if b == 0 or n == 0:
        return assign, totals
    lib.ck_batch_hungarian(
        costs.ctypes.data_as(ctypes.POINTER(ctypes.c_double)), b, n, m,
        assign.ctypes.data_as(ctypes.POINTER(ctypes.c_int)),
        totals.ctypes.data_as(ctypes.POINTER(ctypes.c_double)), nthreads,
    )
    return assign, totals
