"""Native (C++) host-side components, loaded via ctypes.

The clique-tree analysis is sequential graph preprocessing — the part of
the runtime the reference keeps in C++ — and is implemented in
clique_ordering.cc behind a plain C ABI.  The shared library is built
lazily with g++ on first use and cached next to this file; when the
toolchain is unavailable the pure-Python implementation in
conex_tpu/supernodal/ordering.py is used instead (same algorithm; it
doubles as the oracle in tests).
"""

from __future__ import annotations

import ctypes
import os
import subprocess
from typing import List, Optional, Sequence

import numpy as np

_DIR = os.path.dirname(os.path.abspath(__file__))
_SO = os.path.join(_DIR, "libconex_tpu_native.so")
_SRC = os.path.join(_DIR, "clique_ordering.cc")

_lib = None
_build_failed = False


def _load():
    global _lib, _build_failed
    if _lib is not None or _build_failed:
        return _lib
    try:
        if not os.path.exists(_SO) or os.path.getmtime(_SO) < os.path.getmtime(_SRC):
            subprocess.run(
                ["g++", "-O2", "-std=c++17", "-shared", "-fPIC", _SRC,
                 "-o", _SO],
                check=True,
                capture_output=True,
            )
        lib = ctypes.CDLL(_SO)
        i32p = ctypes.POINTER(ctypes.c_int32)
        lib.conex_tpu_clique_order.argtypes = [
            ctypes.c_int, i32p, i32p, i32p, ctypes.c_int,
            i32p, i32p, i32p, i32p, i32p, i32p, i32p,
        ]
        lib.conex_tpu_clique_order.restype = ctypes.c_int
        _lib = lib
    except Exception:
        _build_failed = True
        _lib = None
    return _lib


def available() -> bool:
    return _load() is not None


def clique_order_native(cliques: Sequence[Sequence[int]],
                        valid_leaf: Optional[Sequence[int]] = None,
                        root: int = -1):
    """Native clique ordering; returns (order, supernodes, separators,
    parent, height) or None if the native library is unavailable."""
    lib = _load()
    if lib is None:
        return None
    n = len(cliques)
    num_vars = max(max(c) for c in cliques) + 1
    offsets = np.zeros(n + 1, np.int32)
    for i, c in enumerate(cliques):
        offsets[i + 1] = offsets[i] + len(c)
    data = np.asarray(
        [v for c in cliques for v in c], dtype=np.int32
    )
    vl = (
        np.asarray(valid_leaf, np.int32)
        if valid_leaf is not None and len(valid_leaf)
        else None
    )
    order = np.zeros(n, np.int32)
    parent = np.zeros(n, np.int32)
    height = np.zeros(n, np.int32)
    cap = max(n * num_vars, offsets[-1] + 1)
    sup_off = np.zeros(n + 1, np.int32)
    sup_data = np.zeros(cap, np.int32)
    sep_off = np.zeros(n + 1, np.int32)
    sep_data = np.zeros(cap, np.int32)

    def p(a):
        return a.ctypes.data_as(ctypes.POINTER(ctypes.c_int32))

    lib.conex_tpu_clique_order(
        n, p(offsets), p(data),
        p(vl) if vl is not None else None, root,
        p(order), p(parent), p(height),
        p(sup_off), p(sup_data), p(sep_off), p(sep_data),
    )
    supernodes: List[List[int]] = [
        sup_data[sup_off[i]:sup_off[i + 1]].tolist() for i in range(n)
    ]
    separators: List[List[int]] = [
        sep_data[sep_off[i]:sep_off[i + 1]].tolist() for i in range(n)
    ]
    return (
        order.tolist(), supernodes, separators, parent.tolist(),
        height.tolist(),
    )
