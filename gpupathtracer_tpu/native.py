"""ctypes bindings for the native (C++) data path — native/firefly_native.cpp.

Fast OBJ parsing and BVH building run natively when the shared library is
present (``make -C native``, auto-built on first use when a toolchain is
available); the pure-Python implementations (models/obj.py, accel/bvh.py)
are the always-available fallback and the parity oracle — the two must and
do produce identical arrays (tests/test_native.py).
"""

from __future__ import annotations

import ctypes
import os
import subprocess

import numpy as np

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
_NATIVE_DIR = os.path.join(_REPO, "native")
_LIB_PATH = os.path.join(_NATIVE_DIR, "libfirefly_native.so")

_lib = None


def build_library(force: bool = False) -> bool:
    """Compile the shared library; returns success."""
    if os.path.exists(_LIB_PATH) and not force:
        return True
    try:
        subprocess.run(
            ["make", "-C", _NATIVE_DIR, "-s"], check=True, capture_output=True, timeout=300
        )
        return os.path.exists(_LIB_PATH)
    except Exception:
        return False


def _load():
    global _lib
    if _lib is not None:
        return _lib
    if not os.path.exists(_LIB_PATH) and not build_library():
        return None
    lib = ctypes.CDLL(_LIB_PATH)
    lib.obj_load.restype = ctypes.c_void_p
    lib.obj_load.argtypes = [ctypes.c_char_p]
    lib.obj_num_triangles.restype = ctypes.c_int
    lib.obj_num_triangles.argtypes = [ctypes.c_void_p]
    lib.obj_fill.argtypes = [ctypes.c_void_p] + [np.ctypeslib.ndpointer(np.float32)] * 3
    lib.obj_free.argtypes = [ctypes.c_void_p]
    lib.bvh_build.restype = ctypes.c_int
    lib.bvh_build.argtypes = [
        np.ctypeslib.ndpointer(np.float32),  # v0
        np.ctypeslib.ndpointer(np.float32),  # e1
        np.ctypeslib.ndpointer(np.float32),  # e2
        np.ctypeslib.ndpointer(np.uint8),  # valid
        ctypes.c_int,  # n
        ctypes.c_int,  # leaf_size
        np.ctypeslib.ndpointer(np.float32),  # box_lo
        np.ctypeslib.ndpointer(np.float32),  # box_hi
        np.ctypeslib.ndpointer(np.int32),  # first
        np.ctypeslib.ndpointer(np.int32),  # count
        np.ctypeslib.ndpointer(np.int32),  # miss
        np.ctypeslib.ndpointer(np.int32),  # order
        ctypes.c_int,  # max_nodes
    ]
    lib.edge_table_build.restype = ctypes.c_int
    lib.edge_table_build.argtypes = [
        np.ctypeslib.ndpointer(np.float32),  # v0
        np.ctypeslib.ndpointer(np.float32),  # e1
        np.ctypeslib.ndpointer(np.float32),  # e2
        np.ctypeslib.ndpointer(np.uint8),  # valid
        ctypes.c_int,  # n
        ctypes.c_double,  # quantization step
        np.ctypeslib.ndpointer(np.int32),  # tri1
        np.ctypeslib.ndpointer(np.int32),  # corner
        np.ctypeslib.ndpointer(np.int32),  # tri2
    ]
    _lib = lib
    return lib


def available() -> bool:
    return _load() is not None


def load_obj_native(path: str):
    """Native OBJ parse → MeshData; raises if the library is unavailable."""
    from gpupathtracer_tpu.models.obj import MeshData

    lib = _load()
    if lib is None:
        raise RuntimeError("native library unavailable; run `make -C native`")
    h = lib.obj_load(os.fspath(path).encode())
    if not h:
        raise FileNotFoundError(path)
    try:
        t = lib.obj_num_triangles(h)
        v = np.empty((t, 3, 3), np.float32)
        n = np.empty((t, 3, 3), np.float32)
        uv = np.empty((t, 3, 2), np.float32)
        if t:
            lib.obj_fill(h, v.reshape(-1), n.reshape(-1), uv.reshape(-1))
        return MeshData(vertices=v, normals=n, uvs=uv)
    finally:
        lib.obj_free(h)


def build_edge_table_native(scene):
    """Native edge-table build → grad.edges.EdgeTable; identical to the
    Python builder (same quantization, first-encounter order)."""
    from gpupathtracer_tpu.grad.edges import EdgeTable

    lib = _load()
    if lib is None:
        raise RuntimeError("native library unavailable; run `make -C native`")
    v0 = np.ascontiguousarray(np.asarray(scene.v0), np.float32)
    e1 = np.ascontiguousarray(np.asarray(scene.e1), np.float32)
    e2 = np.ascontiguousarray(np.asarray(scene.e2), np.float32)
    valid = np.ascontiguousarray(np.asarray(scene.valid), np.uint8)
    two = np.asarray(scene.two_sided)
    n = v0.shape[0]
    corners = np.stack([v0, v0 + e1, v0 + e2], axis=1)
    pts = corners[valid.astype(bool)].reshape(-1, 3)
    diag = float(np.linalg.norm(pts.max(0) - pts.min(0))) if pts.size else 1.0
    q = 1e-5 * max(diag, 1e-12)
    cap = 3 * max(n, 1)
    tri1 = np.empty((cap,), np.int32)
    corner = np.empty((cap,), np.int32)
    tri2 = np.empty((cap,), np.int32)
    m = lib.edge_table_build(
        v0.reshape(-1), e1.reshape(-1), e2.reshape(-1), valid, n, q,
        tri1, corner, tri2,
    )
    tri1, corner, tri2 = tri1[:m].copy(), corner[:m].copy(), tri2[:m].copy()
    return EdgeTable(tri1=tri1, corner=corner, tri2=tri2, two_sided=two[tri1])


def build_bvh_native(scene, leaf_size: int = 8):
    """Native BVH build → accel.bvh.Bvh, layout-identical to the numpy builder."""
    import jax.numpy as jnp

    from gpupathtracer_tpu.accel.bvh import Bvh

    lib = _load()
    if lib is None:
        raise RuntimeError("native library unavailable; run `make -C native`")
    v0 = np.ascontiguousarray(np.asarray(scene.v0), np.float32)
    e1 = np.ascontiguousarray(np.asarray(scene.e1), np.float32)
    e2 = np.ascontiguousarray(np.asarray(scene.e2), np.float32)
    valid = np.ascontiguousarray(np.asarray(scene.valid), np.uint8)
    n = v0.shape[0]
    n_real = max(int(valid.sum()), 1)
    max_nodes = 2 * n_real + 2
    box_lo = np.empty((max_nodes, 3), np.float32)
    box_hi = np.empty((max_nodes, 3), np.float32)
    first = np.empty((max_nodes,), np.int32)
    count = np.empty((max_nodes,), np.int32)
    miss = np.empty((max_nodes,), np.int32)
    order = np.empty((n_real,), np.int32)
    m = lib.bvh_build(
        v0.reshape(-1), e1.reshape(-1), e2.reshape(-1), valid, n, leaf_size,
        box_lo.reshape(-1), box_hi.reshape(-1), first, count, miss, order, max_nodes,
    )
    if m < 0:
        raise RuntimeError("bvh_build failed (node budget exceeded)")
    pad = (-order.size) % max(leaf_size, 1)
    if pad:
        order = np.concatenate([order, np.full((pad,), -1, np.int32)])
    return Bvh(
        box_lo=jnp.asarray(box_lo[:m]),
        box_hi=jnp.asarray(box_hi[:m]),
        first=jnp.asarray(first[:m]),
        count=jnp.asarray(count[:m]),
        miss=jnp.asarray(miss[:m]),
        tri_order=jnp.asarray(order),
        leaf_size=leaf_size,
    )
