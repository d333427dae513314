"""ctypes loader for the native C++ IO parsers (native/io_native.cpp).

The reference's IO tier is C++ (ref:src/super4pcs/io/); this framework
keeps that tier native too: a prebuilt ``libsuper4pcs_io.so`` is loaded
if present, otherwise it is compiled once from the bundled source with
the system toolchain and cached. Everything degrades silently to the
pure-numpy parsers when no compiler is available — behavior is
identical, only slower (~3-4x on 30k-vertex assets).
"""

from __future__ import annotations

import ctypes
import os
import subprocess
from typing import Optional

import numpy as np

_LIB: Optional[ctypes.CDLL] = None
_TRIED = False

_SRC = os.path.join(os.path.dirname(os.path.dirname(
    os.path.dirname(os.path.abspath(__file__)))), "native", "io_native.cpp")
_CACHE = os.path.join(os.path.expanduser("~"), ".cache", "super4pcs_tpu")


def _candidate_paths():
    yield os.path.join(os.path.dirname(_SRC), "libsuper4pcs_io.so")
    yield os.path.join(_CACHE, "libsuper4pcs_io.so")


def _is_stale(path: str) -> bool:
    try:
        return (os.path.exists(_SRC)
                and os.path.getmtime(path) < os.path.getmtime(_SRC))
    except OSError:
        return True


def _build() -> Optional[str]:
    if not os.path.exists(_SRC):
        return None
    out = os.path.join(_CACHE, "libsuper4pcs_io.so")
    os.makedirs(_CACHE, exist_ok=True)
    cmd = ["g++", "-O2", "-fPIC", "-shared", "-std=c++17", _SRC, "-o", out]
    try:
        subprocess.run(cmd, check=True, capture_output=True, timeout=120)
        return out
    except (OSError, subprocess.SubprocessError):
        return None


def _bind(lib: ctypes.CDLL) -> ctypes.CDLL:
    P = ctypes.POINTER
    f32p, i32p = P(ctypes.c_float), P(ctypes.c_int32)
    i64p, charpp = P(ctypes.c_int64), P(ctypes.c_char_p)
    lib.s4p_free.argtypes = [ctypes.c_void_p]
    lib.s4p_free.restype = None
    lib.parse_obj.argtypes = [
        ctypes.c_char_p,
        P(f32p), i64p, P(f32p), i64p, P(f32p), i64p,
        P(i32p), i64p, charpp, i64p]
    lib.parse_obj.restype = ctypes.c_int
    lib.parse_ply.argtypes = [
        ctypes.c_char_p, P(f32p), P(f32p), P(f32p), i64p]
    lib.parse_ply.restype = ctypes.c_int
    return lib


def get_lib() -> Optional[ctypes.CDLL]:
    """The loaded native library, building it on first use; None when
    unavailable (callers fall back to the numpy parsers)."""
    global _LIB, _TRIED
    if _LIB is not None or _TRIED:
        return _LIB
    _TRIED = True
    if os.environ.get("SUPER4PCS_TPU_NO_NATIVE"):
        return None
    for path in _candidate_paths():
        # stale cached builds (older than the source) must not shadow
        # parser fixes — rebuild instead
        if os.path.exists(path) and not _is_stale(path):
            try:
                _LIB = _bind(ctypes.CDLL(path))
                return _LIB
            except OSError:
                pass
    built = _build()
    if built:
        try:
            _LIB = _bind(ctypes.CDLL(built))
        except OSError:
            _LIB = None
    return _LIB


def _take_f32(lib, ptr, n, cols) -> Optional[np.ndarray]:
    if not ptr or n == 0:
        return None
    arr = np.ctypeslib.as_array(ptr, shape=(n, cols)).copy()
    lib.s4p_free(ptr)
    return arr


def native_parse_obj(path: str):
    """(pos, normals, texcoords, faces(F,3,3), mtls) or None."""
    lib = get_lib()
    if lib is None:
        return None
    P = ctypes.POINTER
    v = P(ctypes.c_float)()
    vn = P(ctypes.c_float)()
    vt = P(ctypes.c_float)()
    f = P(ctypes.c_int32)()
    mtl = ctypes.c_char_p()
    nv = ctypes.c_int64()
    nvn = ctypes.c_int64()
    nvt = ctypes.c_int64()
    nf = ctypes.c_int64()
    nm = ctypes.c_int64()
    rc = lib.parse_obj(path.encode(), ctypes.byref(v), ctypes.byref(nv),
                       ctypes.byref(vn), ctypes.byref(nvn),
                       ctypes.byref(vt), ctypes.byref(nvt),
                       ctypes.byref(f), ctypes.byref(nf),
                       ctypes.byref(mtl), ctypes.byref(nm))
    if rc != 0:
        return None
    pos = _take_f32(lib, v, nv.value, 3)
    normals = _take_f32(lib, vn, nvn.value, 3)
    tex = _take_f32(lib, vt, nvt.value, 2)
    faces = None
    if f and nf.value:
        faces = np.ctypeslib.as_array(
            f, shape=(nf.value, 3, 3)).copy()
        lib.s4p_free(f)
    mtls = []
    if mtl.value:
        mtls = mtl.value.decode(errors="replace").split("\n")
        lib.s4p_free(mtl)
    return pos, normals, tex, faces, mtls


def native_parse_ply(path: str):
    """(pos, normals, rgb) or None."""
    lib = get_lib()
    if lib is None:
        return None
    P = ctypes.POINTER
    pos_p = P(ctypes.c_float)()
    nrm_p = P(ctypes.c_float)()
    rgb_p = P(ctypes.c_float)()
    n = ctypes.c_int64()
    rc = lib.parse_ply(path.encode(), ctypes.byref(pos_p),
                       ctypes.byref(nrm_p), ctypes.byref(rgb_p),
                       ctypes.byref(n))
    if rc != 0:
        return None
    pos = _take_f32(lib, pos_p, n.value, 3)
    nrm = _take_f32(lib, nrm_p, n.value, 3)
    rgb = _take_f32(lib, rgb_p, n.value, 3)
    if pos is None:
        return None
    return pos, nrm, rgb
