"""Native (C++) host components: fast OBJ parsing and SAH BVH building.

The reference implements its host pipeline in C++17 (OBJ loader,
CLOBJloader.cpp; SAH builder, CLBVHnode.cpp). This framework keeps the
same split — device compute in JAX/Pallas, heavy host-side scene
preparation in C++ — with sources in ``native/`` compiled on demand with
g++ into a shared library loaded through ctypes (no pybind11 in the
image). Everything degrades gracefully to the pure-Python paths when no
compiler is available.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading
from typing import List, Optional, Tuple

import numpy as np

_REPO_NATIVE = os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), "native")
_CACHE_DIR = os.path.expanduser("~/.cache/moclrt_native")

_lock = threading.Lock()
_lib: Optional[ctypes.CDLL] = None
_lib_failed = False


def _build_library() -> Optional[str]:
    sources = [os.path.join(_REPO_NATIVE, f)
               for f in ("objparse.cpp", "sahbvh.cpp")]
    if not all(os.path.exists(s) for s in sources):
        return None
    os.makedirs(_CACHE_DIR, exist_ok=True)
    out = os.path.join(_CACHE_DIR, "libmoclrt.so")
    newest_src = max(os.path.getmtime(s) for s in sources)
    if os.path.exists(out) and os.path.getmtime(out) >= newest_src:
        return out
    cmd = ["g++", "-O3", "-march=native", "-shared", "-fPIC",
           "-std=c++17", "-o", out] + sources
    try:
        subprocess.run(cmd, check=True, capture_output=True, timeout=300)
    except (subprocess.SubprocessError, FileNotFoundError):
        return None
    return out


def get_library() -> Optional[ctypes.CDLL]:
    """Load (building if needed) the native library; None if unavailable."""
    global _lib, _lib_failed
    with _lock:
        if _lib is not None or _lib_failed:
            return _lib
        path = _build_library()
        if path is None:
            _lib_failed = True
            return None
        try:
            lib = ctypes.CDLL(path)
        except OSError:
            _lib_failed = True
            return None
        lib.obj_count.restype = ctypes.c_int64
        lib.obj_count.argtypes = [ctypes.c_char_p]
        lib.obj_num_materials.restype = ctypes.c_int
        lib.obj_material_name.restype = ctypes.c_int
        lib.obj_material_name.argtypes = [ctypes.c_int, ctypes.c_char_p,
                                          ctypes.c_int]
        lib.obj_fill.restype = ctypes.c_int
        lib.obj_fill.argtypes = [ctypes.POINTER(ctypes.c_float)] * 3 + [
            ctypes.POINTER(ctypes.c_int32)]
        lib.sah_build.restype = ctypes.c_int
        lib.sah_build.argtypes = [
            ctypes.c_int,
            ctypes.POINTER(ctypes.c_float), ctypes.POINTER(ctypes.c_float),
            ctypes.POINTER(ctypes.c_float), ctypes.c_int,
            ctypes.POINTER(ctypes.c_int32), ctypes.POINTER(ctypes.c_int32),
            ctypes.POINTER(ctypes.c_int32), ctypes.c_int,
        ]
        _lib = lib
        return _lib


def available() -> bool:
    return get_library() is not None


def _fptr(a: np.ndarray):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_float))


def _iptr(a: np.ndarray):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_int32))


def parse_obj_native(path: str) -> Optional[Tuple[np.ndarray, np.ndarray,
                                                  np.ndarray, np.ndarray,
                                                  List[str]]]:
    """Parse an OBJ with the C++ parser.

    Returns (v [3,T,3], n [3,T,3], uv [3,T,2], mat_idx [T], usemtl names)
    or None if the native library is unavailable / parse failed.
    """
    lib = get_library()
    if lib is None:
        return None
    T = lib.obj_count(path.encode())
    if T < 0:
        return None
    v = np.empty((3, T, 3), np.float32)
    n = np.empty((3, T, 3), np.float32)
    uv = np.empty((3, T, 2), np.float32)
    mat = np.empty((T,), np.int32)
    nm = lib.obj_num_materials()
    names = []
    buf = ctypes.create_string_buffer(512)
    for i in range(nm):
        lib.obj_material_name(i, buf, 512)
        names.append(buf.value.decode())
    if lib.obj_fill(_fptr(v), _fptr(n), _fptr(uv), _iptr(mat)) != 0:
        return None
    return v, n, uv, mat, names


def sah_order(v0: np.ndarray, v1: np.ndarray, v2: np.ndarray,
              leaf_size: int = 64) -> Optional[Tuple[np.ndarray, np.ndarray,
                                                     np.ndarray]]:
    """Binned-SAH build -> (order [T], leaf_starts [L], leaf_counts [L]).

    ``order`` is the depth-first triangle permutation; consecutive leaf
    ranges are spatially tight — used by the Pallas cluster kernel in
    place of the Morton grouping. None if native lib unavailable.
    """
    lib = get_library()
    if lib is None:
        return None
    T = int(v0.shape[0])
    if T == 0:
        return (np.zeros(0, np.int32),) * 3
    v0 = np.ascontiguousarray(v0, np.float32)
    v1 = np.ascontiguousarray(v1, np.float32)
    v2 = np.ascontiguousarray(v2, np.float32)
    order = np.empty((T,), np.int32)
    max_leaves = 2 * T + 8
    starts = np.empty((max_leaves,), np.int32)
    counts = np.empty((max_leaves,), np.int32)
    L = lib.sah_build(T, _fptr(v0), _fptr(v1), _fptr(v2), int(leaf_size),
                      _iptr(order), _iptr(starts), _iptr(counts), max_leaves)
    if L < 0:
        return None
    return order, starts[:L].copy(), counts[:L].copy()
