"""Native (C++) data path: builds, and matches the Python oracle exactly."""

import os

import numpy as np
import pytest

from gpupathtracer_tpu import native
from gpupathtracer_tpu.models.obj import load_obj

ASSETS = "/root/reference/sceneResources"

pytestmark = pytest.mark.skipif(
    not native.build_library(), reason="no native toolchain available"
)


@pytest.mark.parametrize(
    "name", ["triangle.obj", "cube.obj", "sphere.obj", "sphereBlender.obj", "wahoo.obj", "rocketman.obj"]
)
def test_native_obj_matches_python(name):
    py = load_obj(os.path.join(ASSETS, name))
    nat = native.load_obj_native(os.path.join(ASSETS, name))
    assert nat.num_triangles == py.num_triangles
    np.testing.assert_allclose(nat.vertices, py.vertices, atol=1e-6)
    np.testing.assert_allclose(nat.normals, py.normals, atol=1e-6)
    np.testing.assert_allclose(nat.uvs, py.uvs, atol=1e-6)


def test_native_bvh_matches_python():
    from gpupathtracer_tpu.accel.bvh import build_bvh
    from gpupathtracer_tpu.models.obj import MeshData
    from gpupathtracer_tpu.models.scene import build_scene, mesh_spec

    rng = np.random.default_rng(5)
    tris = rng.normal(size=(200, 3, 3)).astype(np.float32)
    mesh = MeshData(
        vertices=tris,
        normals=np.zeros((200, 3, 3), np.float32),
        uvs=np.zeros((200, 3, 2), np.float32),
    )
    scene = build_scene([mesh_spec(mesh)], [{"type": "diffuse"}], pad_to_multiple=128)
    py = build_bvh(scene, leaf_size=8)
    nat = native.build_bvh_native(scene, leaf_size=8)
    assert nat.num_nodes == py.num_nodes
    np.testing.assert_allclose(np.asarray(nat.box_lo), np.asarray(py.box_lo), atol=1e-6)
    np.testing.assert_allclose(np.asarray(nat.box_hi), np.asarray(py.box_hi), atol=1e-6)
    np.testing.assert_array_equal(np.asarray(nat.first), np.asarray(py.first))
    np.testing.assert_array_equal(np.asarray(nat.count), np.asarray(py.count))
    np.testing.assert_array_equal(np.asarray(nat.miss), np.asarray(py.miss))
    np.testing.assert_array_equal(np.asarray(nat.tri_order), np.asarray(py.tri_order))


def test_native_bvh_usable_for_intersection():
    from gpupathtracer_tpu.accel.bvh import intersect_bvh
    from gpupathtracer_tpu.models.scene import build_scene, plane_spec
    import jax.numpy as jnp

    scene = build_scene(
        [plane_spec((0, 0, 0), (0, 0, 0), (5, 5, 5))], [{"type": "diffuse"}], pad_to_multiple=8
    )
    bvh = native.build_bvh_native(scene, leaf_size=4)
    o = jnp.asarray([[0.0, 0.0, 5.0]])
    d = jnp.asarray([[0.0, 0.0, -1.0]])
    h = intersect_bvh(o, d, scene, bvh)
    assert bool(h.hit[0])
    np.testing.assert_allclose(float(h.t[0]), 5.0, rtol=1e-5)


def test_edge_table_native_matches_python():
    """C++ edge-table builder == Python builder (order, adjacency, flags)."""
    import numpy as np
    import pytest

    from gpupathtracer_tpu import native
    from gpupathtracer_tpu.grad.edges import build_edge_table
    from gpupathtracer_tpu.models.scene import build_scene, icosphere, mesh_spec, plane_spec

    if not native.available():
        pytest.skip("native library unavailable")
    scene = build_scene(
        [
            mesh_spec("/root/reference/sceneResources/cube.obj"),
            mesh_spec(icosphere(2), position=(3.0, 0.0, 0.0)),
            plane_spec((0, 0, -2), (0, 0, 0), (5, 5, 5)),
        ],
        [{"type": "diffuse"}],
        pad_to_multiple=8,
    )
    py = build_edge_table(scene, native=False)
    nat = native.build_edge_table_native(scene)
    np.testing.assert_array_equal(nat.tri1, py.tri1)
    np.testing.assert_array_equal(nat.corner, py.corner)
    np.testing.assert_array_equal(nat.tri2, py.tri2)
    np.testing.assert_array_equal(nat.two_sided, py.two_sided)
