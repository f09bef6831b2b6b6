"""Wavefront OBJ parser → SoA numpy triangle arrays.

Replaces the reference's vendored tinyobjloader + ``LoadMesh`` wrapper
(``utilities.h:781-840``) with a small pure-Python parser producing
structure-of-arrays output ready for device upload. Unlike the reference
loader — which unconditionally indexes ``attrib.normals``/``attrib.texcoords``
and crashes on OBJs without them (``utilities.h:822-824``, e.g.
``sceneResources/triangle.obj``) — this parser:

- handles ``f v``, ``f v/vt``, ``f v//vn``, ``f v/vt/vn`` forms,
- handles negative (relative) indices (``triangle.obj:7`` uses ``f -3 -2 -1``),
- fan-triangulates polygons with >3 vertices,
- synthesizes geometric normals when ``vn`` is absent and zero UVs when
  ``vt`` is absent,
- ignores materials/mtllib exactly as the reference does (``utilities.h:837``
  reads ``material_ids[f]`` and discards it).

An optional C++ fast path (see ``native/``) parses large OBJs natively; this
module is the always-available fallback and the test oracle.
"""

from __future__ import annotations

import dataclasses
import os

import numpy as np


@dataclasses.dataclass
class MeshData:
    """Triangle soup, SoA: (T, 3, 3) vertices, per-vertex normals and UVs."""

    vertices: np.ndarray  # (T, 3, 3) float32 — triangle corners v0, v1, v2
    normals: np.ndarray  # (T, 3, 3) float32 — per-corner shading normals
    uvs: np.ndarray  # (T, 3, 2) float32

    @property
    def num_triangles(self) -> int:
        return self.vertices.shape[0]


def subdivide_mesh(mesh: MeshData, levels: int = 1) -> MeshData:
    """Midpoint 1:4 subdivision of a triangle soup (×4 triangles per level).

    Purely per-triangle (no shared-vertex topology needed — soups stay
    soups): each triangle (a, b, c) splits at its edge midpoints into
    (a, ab, ca), (ab, b, bc), (ca, bc, c), (ab, bc, ca). Positions and UVs
    interpolate linearly; shading normals interpolate and renormalize.
    The surface is unchanged, so a subdivided scene renders identically up
    to fp — the large-scene scaling workloads (BASELINE.md) are built by
    subdividing the reference assets.
    """
    v, n, uv = mesh.vertices, mesh.normals, mesh.uvs
    for _ in range(levels):
        a, b, c = v[:, 0], v[:, 1], v[:, 2]
        ab, bc, ca = (a + b) / 2, (b + c) / 2, (c + a) / 2
        v = np.concatenate(
            [
                np.stack([a, ab, ca], axis=1),
                np.stack([ab, b, bc], axis=1),
                np.stack([ca, bc, c], axis=1),
                np.stack([ab, bc, ca], axis=1),
            ]
        )
        na, nb_, nc = n[:, 0], n[:, 1], n[:, 2]

        def mid_n(x, y):
            m = x + y
            norm = np.linalg.norm(m, axis=-1, keepdims=True)
            return np.where(norm > 1e-12, m / np.maximum(norm, 1e-12), x)

        nab, nbc, nca = mid_n(na, nb_), mid_n(nb_, nc), mid_n(nc, na)
        n = np.concatenate(
            [
                np.stack([na, nab, nca], axis=1),
                np.stack([nab, nb_, nbc], axis=1),
                np.stack([nca, nbc, nc], axis=1),
                np.stack([nab, nbc, nca], axis=1),
            ]
        )
        ta, tb, tc = uv[:, 0], uv[:, 1], uv[:, 2]
        tab, tbc, tca = (ta + tb) / 2, (tb + tc) / 2, (tc + ta) / 2
        uv = np.concatenate(
            [
                np.stack([ta, tab, tca], axis=1),
                np.stack([tab, tb, tbc], axis=1),
                np.stack([tca, tbc, tc], axis=1),
                np.stack([tab, tbc, tca], axis=1),
            ]
        )
    return MeshData(
        vertices=v.astype(np.float32), normals=n.astype(np.float32), uvs=uv.astype(np.float32)
    )


def _resolve_index(idx: int, count: int) -> int:
    """OBJ 1-based indexing; negative = relative to end of current list."""
    return idx - 1 if idx > 0 else count + idx


def load_obj(path: str | os.PathLike) -> MeshData:
    positions: list[tuple[float, float, float]] = []
    texcoords: list[tuple[float, float]] = []
    normals: list[tuple[float, float, float]] = []
    # Each face corner is (v_idx, vt_idx or -1, vn_idx or -1), already resolved.
    faces: list[list[tuple[int, int, int]]] = []

    with open(path, "r", encoding="utf-8", errors="replace") as f:
        for line in f:
            line = line.strip()
            if not line or line.startswith("#"):
                continue
            parts = line.split()
            tag = parts[0]
            if tag == "v":
                positions.append((float(parts[1]), float(parts[2]), float(parts[3])))
            elif tag == "vt":
                texcoords.append((float(parts[1]), float(parts[2]) if len(parts) > 2 else 0.0))
            elif tag == "vn":
                normals.append((float(parts[1]), float(parts[2]), float(parts[3])))
            elif tag == "f":
                corners = []
                for vert in parts[1:]:
                    comps = vert.split("/")
                    vi = _resolve_index(int(comps[0]), len(positions))
                    ti = -1
                    ni = -1
                    if len(comps) > 1 and comps[1]:
                        ti = _resolve_index(int(comps[1]), len(texcoords))
                    if len(comps) > 2 and comps[2]:
                        ni = _resolve_index(int(comps[2]), len(normals))
                    corners.append((vi, ti, ni))
                if len(corners) >= 3:
                    faces.append(corners)
            # o/g/s/usemtl/mtllib are ignored (parity with utilities.h:837).

    pos = np.asarray(positions, np.float32).reshape(-1, 3)
    tex = (
        np.asarray(texcoords, np.float32).reshape(-1, 2)
        if texcoords
        else np.zeros((0, 2), np.float32)
    )
    nrm = (
        np.asarray(normals, np.float32).reshape(-1, 3) if normals else np.zeros((0, 3), np.float32)
    )

    tri_v: list[np.ndarray] = []
    tri_t: list[np.ndarray] = []
    tri_n: list[np.ndarray] = []
    for corners in faces:
        # Fan triangulation for quads/ngons (tinyobj default triangulation).
        for k in range(1, len(corners) - 1):
            tri = [corners[0], corners[k], corners[k + 1]]
            v = np.stack([pos[c[0]] for c in tri])
            t = np.stack(
                [tex[c[1]] if c[1] >= 0 else np.zeros((2,), np.float32) for c in tri]
            )
            if all(c[2] >= 0 for c in tri):
                n = np.stack([nrm[c[2]] for c in tri])
            else:
                # Synthesize the geometric normal (fixes reference crash, §2.3.11).
                geo = np.cross(v[1] - v[0], v[2] - v[0])
                norm = np.linalg.norm(geo)
                geo = geo / norm if norm > 0 else np.asarray([0.0, 0.0, 1.0], np.float32)
                n = np.broadcast_to(geo, (3, 3)).astype(np.float32)
            tri_v.append(v)
            tri_t.append(t)
            tri_n.append(n)

    if not tri_v:
        return MeshData(
            vertices=np.zeros((0, 3, 3), np.float32),
            normals=np.zeros((0, 3, 3), np.float32),
            uvs=np.zeros((0, 3, 2), np.float32),
        )
    return MeshData(
        vertices=np.stack(tri_v).astype(np.float32),
        normals=np.stack(tri_n).astype(np.float32),
        uvs=np.stack(tri_t).astype(np.float32),
    )
