"""Gradient validation: jax.grad vs central finite differences for material,
emitter, camera, and vertex parameters (SURVEY.md §4.3). The fixed-seed
renderer is a deterministic function, so FD is exact up to fp error."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from gpupathtracer_tpu.models.camera import Camera
from gpupathtracer_tpu.models.materials import material_table
from gpupathtracer_tpu.models.scene import GeometrySpec, build_scene, icosphere, plane_spec
from gpupathtracer_tpu.render.renderer import RenderSettings, render_frame

SETTINGS = RenderSettings(
    width=12, height=12, spp=2, bounces=2, tri_block=8,
    estimator="nee", intersector="brute", jitter=False,
)
CAMERA = Camera.create(position=(0.0, 0.0, 4.0), fov_deg=45.0, width=12, height=12)
SPHERE = icosphere(1)
LIGHT = plane_spec((0.0, 3.0, 0.0), (90.0, 0.0, 0.0), (4.0, 4.0, 4.0), mat_id=1)


_BASE_MATS = material_table(
    [
        {"type": "diffuse", "albedo": (0.6, 0.6, 0.6)},
        {"type": "emitter", "emissive_color": (1.0, 1.0, 1.0), "intensity": 4.0},
    ]
)


def scene_from(albedo=(0.6, 0.6, 0.6), intensity=4.0, offset=None):
    offset = jnp.zeros(3) if offset is None else offset
    spec = GeometrySpec(
        vertices=jnp.asarray(SPHERE.vertices) + offset,
        normals=jnp.asarray(SPHERE.normals),
        uvs=jnp.asarray(SPHERE.uvs),
        position=jnp.zeros(3),
        rotation_deg=jnp.zeros(3),
        scale=jnp.ones(3),
        mat_id=0,
    )
    # material_table is host-side (numpy); traced params go in via .replace.
    mats = _BASE_MATS.replace(
        albedo=_BASE_MATS.albedo.at[0].set(jnp.asarray(albedo, jnp.float32)),
        intensity=_BASE_MATS.intensity.at[1].set(jnp.asarray(intensity, jnp.float32)),
    )
    return build_scene([spec, LIGHT], mats, pad_to_multiple=8)


def central_fd(f, x0, eps):
    return (f(x0 + eps) - f(x0 - eps)) / (2 * eps)


def test_albedo_gradient_fd():
    def loss(a):
        return jnp.mean(
            render_frame(scene_from(albedo=jnp.stack([a, jnp.float32(0.5), jnp.float32(0.5)])), CAMERA, SETTINGS)
        )

    g = float(jax.grad(loss)(jnp.float32(0.6)))
    fd = float(central_fd(lambda a: loss(jnp.float32(a)), 0.6, 1e-2))
    assert g > 0
    np.testing.assert_allclose(g, fd, rtol=5e-2)


def test_intensity_gradient_fd():
    def loss(i):
        return jnp.mean(render_frame(scene_from(intensity=i), CAMERA, SETTINGS))

    g = float(jax.grad(loss)(jnp.float32(4.0)))
    fd = float(central_fd(lambda i: loss(jnp.float32(i)), 4.0, 1e-2))
    assert g > 0
    np.testing.assert_allclose(g, fd, rtol=5e-2)  # radiance is linear in Le


def test_vertex_offset_gradient_fd_with_silhouette_terms():
    """Per-vertex offset gradients vs central FD on a silhouette-dominated
    scene — the full first-order geometry gradient (interior detached term
    + edge-sampled boundary term, grad/edges.py). Replaces the round-1
    nonzero-only check: the FD here is dominated by visibility motion,
    which detached sampling alone misses entirely."""
    from gpupathtracer_tpu.grad.edges import build_edge_table, value_and_grad_with_edges

    quad = jnp.asarray(
        [
            [[-0.5, -0.5, 0.0], [0.5, -0.5, 0.0], [0.5, 0.5, 0.0]],
            [[-0.5, -0.5, 0.0], [0.5, 0.5, 0.0], [-0.5, 0.5, 0.0]],
        ],
        jnp.float32,
    )
    cam = Camera.create(position=(0.0, 0.0, 4.0), fov_deg=45.0, width=64, height=64)
    settings = dataclasses.replace(
        SETTINGS, width=64, height=64, spp=16, bounces=1, estimator="naive", jitter=True
    )
    black = material_table(
        [
            {"type": "diffuse", "albedo": (0.0, 0.0, 0.0)},
            {"type": "emitter", "emissive_color": (1.0, 1.0, 1.0), "intensity": 2.0},
        ]
    )

    def scene_fn(offsets):
        spec = GeometrySpec(
            vertices=quad + offsets,
            normals=jnp.broadcast_to(jnp.asarray([0.0, 0.0, 1.0]), (2, 3, 3)),
            uvs=jnp.zeros((2, 3, 2)),
            position=jnp.zeros(3),
            rotation_deg=jnp.zeros(3),
            scale=jnp.ones(3),
            mat_id=0,
        )
        backdrop = plane_spec((0.0, 0.0, -2.0), (0.0, 0.0, 0.0), (40.0, 40.0, 40.0), mat_id=1)
        return build_scene([spec, backdrop], black, pad_to_multiple=8)

    def image_loss(img):
        return jnp.mean(img)

    table = build_edge_table(scene_fn(jnp.zeros((2, 3, 3))))
    _, g = value_and_grad_with_edges(
        image_loss, scene_fn, jnp.zeros((2, 3, 3)), cam, settings,
        table, jax.random.PRNGKey(5), n_samples=2048, trace_spp=2,
    )

    # Directional FD along "grow the quad outward" (pure silhouette motion).
    direction = quad.at[:, :, 2].set(0.0)
    g_dir = float(jnp.sum(g * direction))
    h = 0.05

    def loss_at(t):
        return float(
            image_loss(render_frame(scene_fn(t * direction), cam, settings))
        )

    fd = (loss_at(h) - loss_at(-h)) / (2 * h)
    assert fd < 0 and g_dir < 0  # growing the black quad dims the image
    np.testing.assert_allclose(g_dir, fd, rtol=0.15)


def test_light_height_gradient_fd():
    """Smooth parameter (no visibility change): FD must match the analytic
    gradient through the NEE geometry term (cosθ·cosθ/r²)."""

    def loss(dy):
        light = plane_spec((0.0, 3.0 + dy, 0.0), (90.0, 0.0, 0.0), (4.0, 4.0, 4.0), mat_id=1)
        spec = GeometrySpec(
            vertices=jnp.asarray(SPHERE.vertices),
            normals=jnp.asarray(SPHERE.normals),
            uvs=jnp.asarray(SPHERE.uvs),
            position=jnp.zeros(3),
            rotation_deg=jnp.zeros(3),
            scale=jnp.ones(3),
            mat_id=0,
        )
        scene = build_scene([spec, light], _BASE_MATS, pad_to_multiple=8)
        return jnp.mean(render_frame(scene, CAMERA, SETTINGS))

    g = float(jax.grad(loss)(jnp.float32(0.0)))
    fd = float(central_fd(lambda v: loss(jnp.float32(v)), 0.0, 1e-2))
    assert g < 0  # raising the light dims the sphere (1/r²)
    np.testing.assert_allclose(g, fd, rtol=0.1)


def test_camera_gradient_nonzero_finite():
    def loss(dz):
        cam = CAMERA.replace(position=jnp.asarray([0.0, 0.0, 4.0 + dz]))
        return jnp.mean(render_frame(scene_from(), cam, SETTINGS))

    g = float(jax.grad(loss)(jnp.float32(0.0)))
    assert np.isfinite(g) and g != 0


def test_grads_with_pallas_intersector():
    """The Pallas backend must be gradient-transparent (fully detached
    search + differentiable resolve) — regression for tangents leaking into
    pallas_call through the cull-mask box arrays."""
    settings = dataclasses.replace(SETTINGS, intersector="pallas", tri_block=128)

    def loss(a):
        scene = scene_from(albedo=jnp.stack([a, jnp.float32(0.5), jnp.float32(0.5)]))
        return jnp.mean(render_frame(scene, CAMERA, settings))

    g = float(jax.grad(loss)(jnp.float32(0.6)))
    assert np.isfinite(g) and g > 0


def test_whole_param_tree_grads_finite():
    def loss(params):
        scene = scene_from(
            albedo=params["albedo"], intensity=params["intensity"], offset=params["offset"]
        )
        cam = CAMERA.replace(position=params["cam_pos"])
        return jnp.mean(render_frame(scene, cam, SETTINGS))

    params = {
        "albedo": jnp.asarray([0.6, 0.5, 0.4]),
        "intensity": jnp.float32(4.0),
        "offset": jnp.zeros(3),
        "cam_pos": jnp.asarray([0.0, 0.0, 4.0]),
    }
    grads = jax.grad(loss)(params)
    flat = jnp.concatenate([jnp.ravel(g) for g in jax.tree_util.tree_leaves(grads)])
    assert bool(jnp.isfinite(flat).all())
    assert float(jnp.abs(flat).max()) > 0
