"""Intersection-core tests: Möller–Trumbore vs hand-computed hits including
backface/edge/parallel cases, plane bounds, cull semantics, tie-breaking,
occlusion ordering (SURVEY.md §4.1-4.2)."""

import jax.numpy as jnp
import numpy as np

from gpupathtracer_tpu.models.scene import build_scene, mesh_spec, plane_spec
from gpupathtracer_tpu.models.obj import MeshData
from gpupathtracer_tpu.ops.intersect import intersect_brute, mt_block, resolve_hits


def single_triangle_scene(v0, v1, v2, two_sided=False):
    mesh = MeshData(
        vertices=np.asarray([[v0, v1, v2]], np.float32),
        normals=np.tile(np.asarray([0, 0, 1.0], np.float32), (1, 3, 1)),
        uvs=np.zeros((1, 3, 2), np.float32),
    )
    spec = mesh_spec(mesh, two_sided=two_sided)
    return build_scene([spec], [{"type": "diffuse"}], pad_to_multiple=8)


def test_simple_hit():
    scene = single_triangle_scene([0, 0, 0], [1, 0, 0], [0, 1, 0])
    o = jnp.asarray([[0.2, 0.2, 5.0]])
    d = jnp.asarray([[0.0, 0.0, -1.0]])
    hit = intersect_brute(o, d, scene, tri_block=8)
    assert bool(hit.hit[0])
    np.testing.assert_allclose(float(hit.t[0]), 5.0, rtol=1e-5)
    attrs = resolve_hits(o, d, scene, hit.tri)
    np.testing.assert_allclose(np.asarray(attrs.point[0]), [0.2, 0.2, 0.0], atol=1e-5)
    np.testing.assert_allclose(np.asarray(attrs.gn[0]), [0, 0, 1.0], atol=1e-6)


def test_backface_cull():
    """Ray from behind (dir +z, same side as normal) must miss a one-sided
    triangle — the reference's double cull (kernel.cu:48-59)."""
    scene = single_triangle_scene([0, 0, 0], [1, 0, 0], [0, 1, 0])
    o = jnp.asarray([[0.2, 0.2, -5.0]])
    d = jnp.asarray([[0.0, 0.0, 1.0]])
    hit = intersect_brute(o, d, scene, tri_block=8)
    assert not bool(hit.hit[0])


def test_two_sided_hits_from_behind():
    scene = single_triangle_scene([0, 0, 0], [1, 0, 0], [0, 1, 0], two_sided=True)
    o = jnp.asarray([[0.2, 0.2, -5.0]])
    d = jnp.asarray([[0.0, 0.0, 1.0]])
    hit = intersect_brute(o, d, scene, tri_block=8)
    assert bool(hit.hit[0])
    np.testing.assert_allclose(float(hit.t[0]), 5.0, rtol=1e-5)


def test_parallel_ray_misses():
    scene = single_triangle_scene([0, 0, 0], [1, 0, 0], [0, 1, 0])
    o = jnp.asarray([[0.2, 0.2, 1.0]])
    d = jnp.asarray([[1.0, 0.0, 0.0]])  # parallel to the triangle plane
    hit = intersect_brute(o, d, scene, tri_block=8)
    assert not bool(hit.hit[0])


def test_outside_bounds_misses():
    scene = single_triangle_scene([0, 0, 0], [1, 0, 0], [0, 1, 0])
    o = jnp.asarray([[0.8, 0.8, 5.0]])  # outside the hypotenuse (u+v>1)
    d = jnp.asarray([[0.0, 0.0, -1.0]])
    hit = intersect_brute(o, d, scene, tri_block=8)
    assert not bool(hit.hit[0])


def test_edge_hit_inclusive():
    """Edge/vertex hits are inclusive (reference: u<0||u>det fails)."""
    scene = single_triangle_scene([0, 0, 0], [1, 0, 0], [0, 1, 0])
    o = jnp.asarray([[0.0, 0.0, 5.0], [0.5, 0.5, 5.0]])  # vertex and hypotenuse mid
    d = jnp.asarray([[0.0, 0.0, -1.0], [0.0, 0.0, -1.0]])
    hit = intersect_brute(o, d, scene, tri_block=8)
    assert bool(hit.hit[0]) and bool(hit.hit[1])


def test_behind_ray_misses():
    scene = single_triangle_scene([0, 0, 0], [1, 0, 0], [0, 1, 0])
    o = jnp.asarray([[0.2, 0.2, -5.0]])
    d = jnp.asarray([[0.0, 0.0, -1.0]])  # triangle is behind the origin
    hit = intersect_brute(o, d, scene, tri_block=8)
    assert not bool(hit.hit[0])


def test_plane_bounds_and_two_sidedness():
    """Reference plane: unit square at origin, both sides visible
    (kernel.cu:8-32), scaled 5x like the walls (kernel.cu:231-234)."""
    scene = build_scene(
        [plane_spec((0, 0, 0), (0, 0, 0), (5, 5, 5))], [{"type": "diffuse"}], pad_to_multiple=8
    )
    o = jnp.asarray(
        [
            [0.0, 0.0, 5.0],   # front center -> hit
            [2.4, 1.0, 5.0],   # inside 5x bounds -> hit (off the quad diagonal:
            # exactly-on-edge points are FMA-rounding sensitive)
            [2.6, 0.0, 5.0],   # outside bounds -> miss
            [0.0, 0.0, -5.0],  # back side -> hit (two-sided)
        ]
    )
    d = jnp.tile(jnp.asarray([[0.0, 0.0, -1.0]]), (4, 1))
    d = d.at[3].set(jnp.asarray([0.0, 0.0, 1.0]))
    hit = intersect_brute(o, d, scene, tri_block=8)
    assert np.asarray(hit.hit).tolist() == [True, True, False, True]
    attrs = resolve_hits(o, d, scene, hit.tri)
    # Normal is the +z plane normal on both sides (never flipped — reference behavior).
    np.testing.assert_allclose(np.asarray(attrs.gn[0]), [0, 0, 1], atol=1e-6)
    np.testing.assert_allclose(np.asarray(attrs.gn[3]), [0, 0, 1], atol=1e-6)


def test_closest_hit_ordering_occlusion():
    """Two stacked triangles: the nearer one must win (the bloopers
    see-through bug class, readme.md 'Bloopers')."""
    mesh = MeshData(
        vertices=np.asarray(
            [
                [[-5, -5, 0], [5, -5, 0], [0, 5, 0]],     # far, at z=0
                [[-5, -5, 2], [5, -5, 2], [0, 5, 2]],     # near, at z=2
            ],
            np.float32,
        ),
        normals=np.tile(np.asarray([0, 0, 1.0], np.float32), (2, 3, 1)),
        uvs=np.zeros((2, 3, 2), np.float32),
    )
    scene = build_scene([mesh_spec(mesh)], [{"type": "diffuse"}], pad_to_multiple=8)
    o = jnp.asarray([[0.0, 0.0, 10.0]])
    d = jnp.asarray([[0.0, 0.0, -1.0]])
    hit = intersect_brute(o, d, scene, tri_block=8)
    assert bool(hit.hit[0])
    assert int(hit.tri[0]) == 1  # the z=2 triangle
    np.testing.assert_allclose(float(hit.t[0]), 8.0, rtol=1e-5)


def test_tie_break_first_triangle_wins():
    """Identical coplanar triangles: the first in scene order wins
    (reference strict < at kernel.cu:115)."""
    tri = [[-5, -5, 0], [5, -5, 0], [0, 5, 0]]
    mesh = MeshData(
        vertices=np.asarray([tri, tri], np.float32),
        normals=np.tile(np.asarray([0, 0, 1.0], np.float32), (2, 3, 1)),
        uvs=np.zeros((2, 3, 2), np.float32),
    )
    scene = build_scene([mesh_spec(mesh)], [{"type": "diffuse"}], pad_to_multiple=8)
    o = jnp.asarray([[0.0, 0.0, 10.0]])
    d = jnp.asarray([[0.0, 0.0, -1.0]])
    hit = intersect_brute(o, d, scene, tri_block=8)
    assert int(hit.tri[0]) == 0


def test_mt_block_shapes_and_chunking():
    rng = np.random.default_rng(1)
    tris = rng.normal(size=(16, 3, 3)).astype(np.float32)
    mesh = MeshData(
        vertices=tris, normals=np.zeros((16, 3, 3), np.float32), uvs=np.zeros((16, 3, 2), np.float32)
    )
    scene = build_scene([mesh_spec(mesh, two_sided=True)], [{"type": "diffuse"}], pad_to_multiple=8)
    o = jnp.asarray(rng.normal(size=(37, 3)) * 5, jnp.float32)
    d_raw = rng.normal(size=(37, 3)).astype(np.float32)
    d = jnp.asarray(d_raw / np.linalg.norm(d_raw, axis=1, keepdims=True))
    # Chunked and unchunked agree.
    h1 = intersect_brute(o, d, scene, tri_block=8, ray_chunk=8)
    h2 = intersect_brute(o, d, scene, tri_block=8, ray_chunk=4096)
    np.testing.assert_array_equal(np.asarray(h1.tri), np.asarray(h2.tri))
    np.testing.assert_allclose(np.asarray(h1.t), np.asarray(h2.t), rtol=1e-6)


def test_transformed_mesh_matches_object_space_reference():
    """World-space pretransform == reference's object-space ray transform
    (kernel.cu:138): check a rotated+scaled+translated triangle hit point."""
    mesh = MeshData(
        vertices=np.asarray([[[0, 0, 0], [1, 0, 0], [0, 1, 0]]], np.float32),
        normals=np.tile(np.asarray([0, 0, 1.0], np.float32), (1, 3, 1)),
        uvs=np.zeros((1, 3, 2), np.float32),
    )
    spec = mesh_spec(mesh, position=(1, 2, 3), rotation_deg=(0, 90, 0), scale=(2, 2, 2))
    scene = build_scene([spec], [{"type": "diffuse"}], pad_to_multiple=8)
    # After Ry(90): x_local -> -z_world... verify via an explicit numpy transform.
    from gpupathtracer_tpu.core import mat4

    m = np.asarray(mat4.trs((1, 2, 3), (0, 90, 0), (2, 2, 2)))
    v_world = (np.asarray([[0, 0, 0], [1, 0, 0], [0, 1, 0.0]]) @ m[:3, :3].T) + m[:3, 3]
    centroid = v_world.mean(0)
    n = np.cross(v_world[1] - v_world[0], v_world[2] - v_world[0])
    n = n / np.linalg.norm(n)
    o = jnp.asarray([centroid + 4 * n], jnp.float32)
    d = jnp.asarray([-n], jnp.float32)
    hit = intersect_brute(o, d, scene, tri_block=8)
    assert bool(hit.hit[0])
    np.testing.assert_allclose(float(hit.t[0]), 4.0, rtol=1e-4)
    attrs = resolve_hits(o, d, scene, hit.tri)
    np.testing.assert_allclose(np.asarray(attrs.point[0]), centroid, atol=1e-4)
