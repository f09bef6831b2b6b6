"""OBJ parser tests on all six bundled reference assets (SURVEY.md §4.1):
triangle counts, negative indices, synthesized normals, quad triangulation."""

import os

import numpy as np
import pytest

from gpupathtracer_tpu.models.obj import load_obj

ASSETS = "/root/reference/sceneResources"

EXPECTED_TRIS = {
    "triangle.obj": 1,
    "cube.obj": 12,
    "sphere.obj": 320,
    "sphereBlender.obj": 960,
    "wahoo.obj": 5172,
    "rocketman.obj": 6036,
}


@pytest.mark.parametrize("name,count", sorted(EXPECTED_TRIS.items()))
def test_asset_triangle_counts(name, count):
    mesh = load_obj(os.path.join(ASSETS, name))
    assert mesh.num_triangles == count
    assert mesh.vertices.shape == (count, 3, 3)
    assert mesh.normals.shape == (count, 3, 3)
    assert mesh.uvs.shape == (count, 3, 2)
    assert np.isfinite(mesh.vertices).all()


def test_negative_indices_and_synth_normals():
    """triangle.obj uses `f -3 -2 -1` with no vn/vt — the case that crashes
    the reference loader (utilities.h:822-824, SURVEY.md §2.3.11)."""
    mesh = load_obj(os.path.join(ASSETS, "triangle.obj"))
    np.testing.assert_allclose(
        mesh.vertices[0], [[0, 0, 0], [1, 0, 0], [0, 1, 0]], atol=1e-7
    )
    # Geometric normal synthesized: +z for this CCW triangle.
    np.testing.assert_allclose(mesh.normals[0], np.tile([0, 0, 1.0], (3, 1)), atol=1e-7)
    np.testing.assert_allclose(mesh.uvs[0], 0.0)


def test_quad_triangulation(tmp_path):
    p = tmp_path / "quad.obj"
    p.write_text("v 0 0 0\nv 1 0 0\nv 1 1 0\nv 0 1 0\nf 1 2 3 4\n")
    mesh = load_obj(p)
    assert mesh.num_triangles == 2
    # Fan: (v0,v1,v2), (v0,v2,v3)
    np.testing.assert_allclose(mesh.vertices[0], [[0, 0, 0], [1, 0, 0], [1, 1, 0]])
    np.testing.assert_allclose(mesh.vertices[1], [[0, 0, 0], [1, 1, 0], [0, 1, 0]])


def test_vn_vt_parsing(tmp_path):
    p = tmp_path / "full.obj"
    p.write_text(
        "v 0 0 0\nv 1 0 0\nv 0 1 0\n"
        "vt 0 0\nvt 1 0\nvt 0 1\n"
        "vn 0 0 1\nvn 0 0 1\nvn 0 0 1\n"
        "f 1/1/1 2/2/2 3/3/3\n"
    )
    mesh = load_obj(p)
    assert mesh.num_triangles == 1
    np.testing.assert_allclose(mesh.uvs[0], [[0, 0], [1, 0], [0, 1]])
    np.testing.assert_allclose(mesh.normals[0], np.tile([0, 0, 1.0], (3, 1)))


def test_v_double_slash_vn(tmp_path):
    p = tmp_path / "nouv.obj"
    p.write_text("v 0 0 0\nv 1 0 0\nv 0 1 0\nvn 1 0 0\nf 1//1 2//1 3//1\n")
    mesh = load_obj(p)
    np.testing.assert_allclose(mesh.normals[0], np.tile([1.0, 0, 0], (3, 1)))
    np.testing.assert_allclose(mesh.uvs[0], 0.0)
