"""Native C++ host runtime, reached over ctypes.

The TPU compute path is JAX/XLA/Pallas; the *host* runtime around it —
BVH construction, mesh attribute computation, scene transforms — is
native C++ (src/native.cpp), mirroring the reference's host-side C++
(core-bvh-builder.cpp, core-trianglemesh.cpp). pybind11 is not in the
image, so the boundary is a C ABI + ctypes.

The shared library is compiled on first use with g++ (cached next to the
source, rebuilt when the source is newer). Every entry point has a numpy
fallback, so the package works even without a toolchain — the native
path is the production one (≈100× faster scene builds).
"""

from __future__ import annotations

import ctypes
import logging
import os
import subprocess
import threading

import numpy as np

log = logging.getLogger("dtpt.native")

_DIR = os.path.dirname(os.path.abspath(__file__))
_SRC = os.path.join(_DIR, "src", "native.cpp")
_LIB = os.path.join(_DIR, "_native.so")

_lock = threading.Lock()
_lib = None
_lib_tried = False


def _compile() -> bool:
    cmd = [
        "g++", "-O3", "-march=native", "-shared", "-fPIC", "-std=c++17",
        "-o", _LIB, _SRC,
    ]
    try:
        r = subprocess.run(cmd, capture_output=True, text=True, timeout=120)
    except (OSError, subprocess.TimeoutExpired) as e:
        log.warning("native build failed to run g++: %s", e)
        return False
    if r.returncode != 0:
        log.warning("native build failed:\n%s", r.stderr[-2000:])
        return False
    return True


def load() -> ctypes.CDLL | None:
    """The native library, compiling it if needed; None if unavailable."""
    global _lib, _lib_tried
    with _lock:
        if _lib is not None or _lib_tried:
            return _lib
        _lib_tried = True
        need = not os.path.exists(_LIB) or (
            os.path.exists(_SRC)
            and os.path.getmtime(_SRC) > os.path.getmtime(_LIB)
        )
        if need and not _compile():
            return None
        try:
            lib = ctypes.CDLL(_LIB)
        except OSError as e:
            log.warning("native library load failed: %s", e)
            return None

        f32p = np.ctypeslib.ndpointer(np.float32, flags="C_CONTIGUOUS")
        i32p = np.ctypeslib.ndpointer(np.int32, flags="C_CONTIGUOUS")
        lib.dtpt_bvh_build.restype = ctypes.c_void_p
        lib.dtpt_bvh_build.argtypes = [
            f32p, f32p, f32p, ctypes.c_int64, ctypes.c_int32, ctypes.c_int32,
            ctypes.POINTER(ctypes.c_int64),
        ]
        lib.dtpt_bvh_copy.restype = None
        lib.dtpt_bvh_copy.argtypes = [
            ctypes.c_void_p, f32p, f32p, i32p, i32p, i32p, i32p,
        ]
        lib.dtpt_bvh_free.restype = None
        lib.dtpt_bvh_free.argtypes = [ctypes.c_void_p]
        lib.dtpt_smooth_normals.restype = None
        lib.dtpt_smooth_normals.argtypes = [
            f32p, ctypes.c_int64, ctypes.c_float, f32p,
        ]
        lib.dtpt_transform_tris.restype = None
        lib.dtpt_transform_tris.argtypes = [
            f32p, ctypes.c_int64, f32p, f32p,
        ]
        _lib = lib
        return _lib


def bvh_build_native(v0, e0, e1, leaf_size: int, n_bins: int):
    """Native binned-SAH 8-wide build; None if the library is unavailable.

    Returns numpy (child_lo, child_hi, child_node, leaf_start, leaf_count,
    tri_order) in the ops/bvh.py BVHArrays layout.
    """
    lib = load()
    if lib is None:
        return None
    v0 = np.ascontiguousarray(v0, np.float32)
    e0 = np.ascontiguousarray(e0, np.float32)
    e1 = np.ascontiguousarray(e1, np.float32)
    t = v0.shape[0]
    n_nodes = ctypes.c_int64(0)
    h = lib.dtpt_bvh_build(
        v0, e0, e1, t, leaf_size, n_bins, ctypes.byref(n_nodes)
    )
    if not h:
        return None
    m = n_nodes.value
    child_lo = np.empty((m, 8, 3), np.float32)
    child_hi = np.empty((m, 8, 3), np.float32)
    child_node = np.empty((m, 8), np.int32)
    leaf_start = np.empty((m, 8), np.int32)
    leaf_count = np.empty((m, 8), np.int32)
    tri_order = np.empty((t,), np.int32)
    try:
        lib.dtpt_bvh_copy(
            h, child_lo, child_hi, child_node, leaf_start, leaf_count,
            tri_order,
        )
    finally:
        lib.dtpt_bvh_free(h)
    return child_lo, child_hi, child_node, leaf_start, leaf_count, tri_order


def smooth_normals(tris, crease_deg: float = 66.0) -> np.ndarray:
    """Per-corner smooth shading normals for a (T,3,3) triangle soup
    (reference computeSmoothNormals(66°), core-trianglemesh.cpp): weld
    identical positions; average area-weighted face normals per vertex,
    restricted per corner to faces within the crease angle."""
    tris = np.ascontiguousarray(tris, np.float32)
    t = tris.shape[0]
    out = np.empty_like(tris)
    lib = load()
    if lib is not None:
        lib.dtpt_smooth_normals(tris, t, float(crease_deg), out)
        return out
    return _smooth_normals_np(tris, crease_deg)


def _smooth_normals_np(tris: np.ndarray, crease_deg: float) -> np.ndarray:
    """numpy fallback (exact same welding/crease semantics)."""
    t = tris.shape[0]
    e0 = tris[:, 1] - tris[:, 0]
    e1 = tris[:, 2] - tris[:, 0]
    fn = np.cross(e0, e1)  # area-weighted
    ln = np.linalg.norm(fn, axis=1, keepdims=True)
    fnn = np.where(ln > 0, fn / np.maximum(ln, 1e-30), [[0.0, 0.0, 1.0]])
    flat = tris.reshape(-1, 3)
    _, vid = np.unique(
        flat.view([("x", np.float32), ("y", np.float32), ("z", np.float32)]),
        return_inverse=True,
    )
    vid = vid.reshape(t, 3)
    cos_crease = np.cos(np.deg2rad(crease_deg))
    out = np.empty_like(tris)
    by_vertex: dict[int, list[int]] = {}
    for f in range(t):
        for k in range(3):
            by_vertex.setdefault(int(vid[f, k]), []).append(f)
    for f in range(t):
        for k in range(3):
            inc = by_vertex[int(vid[f, k])]
            acc = np.zeros(3)
            for g in inc:
                if float(fnn[f] @ fnn[g]) >= cos_crease:
                    acc += fn[g]
            n = np.linalg.norm(acc)
            out[f, k] = acc / n if n > 1e-20 else fnn[f]
    return out


def transform_tris(tris, m) -> np.ndarray:
    """Affine-transform a (T,3,3) soup by a (4,4) matrix (native or numpy)."""
    tris = np.ascontiguousarray(tris, np.float32)
    m = np.ascontiguousarray(m, np.float32)
    lib = load()
    if lib is not None and tris.shape[0] > 0:
        out = np.empty_like(tris)
        lib.dtpt_transform_tris(tris, tris.shape[0], m, out)
        return out
    flat = tris.reshape(-1, 3)
    return (flat @ m[:3, :3].T + m[:3, 3]).astype(np.float32).reshape(tris.shape)
