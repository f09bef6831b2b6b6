"""Next-event estimation: unbiasedness vs the naive estimator, direct-hit
accounting, variance reduction, and geometry gradients (SURVEY.md §4.2-4.3)."""

import jax
import jax.numpy as jnp
import numpy as np

from gpupathtracer_tpu.models.camera import Camera
from gpupathtracer_tpu.models.scene import build_scene, plane_spec, icosphere
from gpupathtracer_tpu.render.renderer import RenderSettings, render_frame

EMITTER = {"type": "emitter", "emissive_color": (1.0, 1.0, 1.0), "intensity": 4.0}
GREY = {"type": "diffuse", "albedo": (0.6, 0.6, 0.6)}


def _floor_light_scene():
    return build_scene(
        [
            plane_spec((0, -1, 0), (90, 0, 0), (8, 8, 8), mat_id=0),  # floor
            plane_spec((0, 2.0, 0), (90, 0, 0), (2, 2, 2), mat_id=1),  # light overhead
        ],
        [GREY, EMITTER],
        pad_to_multiple=8,
    )


def _render(scene, estimator, spp, seed=0, width=24, height=24, bounces=2):
    cam = Camera.create(
        position=(0.0, 0.5, 5.0), pitch=-20.0, fov_deg=60.0, width=width, height=height
    )
    settings = RenderSettings(
        width=width, height=height, spp=spp, bounces=bounces, tri_block=8,
        estimator=estimator, jitter=False, seed=seed,
    )
    return np.asarray(render_frame(scene, cam, settings))


def test_nee_matches_naive_expectation():
    """Both estimators target the same integral; image means must agree."""
    scene = _floor_light_scene()
    naive = _render(scene, "naive", spp=256)
    nee = _render(scene, "nee", spp=32)
    lit = naive.mean(axis=-1) > 0.01
    assert lit.sum() > 50
    ratio = nee[lit].mean() / naive[lit].mean()
    assert 0.9 < ratio < 1.1, ratio


def test_nee_direct_emitter_hit_unchanged():
    """Camera-direct emitter hits count exactly once (specular-chain rule)."""
    scene = _floor_light_scene()
    cam = Camera.create(position=(0.0, 0.0, 0.0), pitch=89.0, fov_deg=20.0, width=8, height=8)
    for est in ("naive", "nee"):
        settings = RenderSettings(
            width=8, height=8, spp=2, bounces=1, tri_block=8, estimator=est, jitter=False
        )
        img = np.asarray(render_frame(scene, cam, settings))
        np.testing.assert_allclose(img[4, 4], 4.0, atol=1e-5)


def test_nee_lower_seed_dispersion():
    """At equal spp, NEE images fluctuate less across seeds than naive."""
    scene = _floor_light_scene()

    def dispersion(est):
        a = _render(scene, est, spp=8, seed=1)
        b = _render(scene, est, spp=8, seed=2)
        lit = (a.mean(-1) > 0.01) | (b.mean(-1) > 0.01)
        return np.mean((a[lit] - b[lit]) ** 2)

    assert dispersion("nee") < dispersion("naive")


def test_nee_geometry_gradient_nonzero():
    """dL/d(vertex) flows under NEE; zero under naive detached PT."""
    from gpupathtracer_tpu.models.scene import GeometrySpec

    sphere = icosphere(1)
    camera = Camera.create(position=(0.0, 0.0, 4.0), fov_deg=45.0, width=12, height=12)
    light = plane_spec((0.0, 3.0, 0.0), (90.0, 0.0, 0.0), (4.0, 4.0, 4.0), mat_id=1)

    def loss(offset, estimator):
        spec = GeometrySpec(
            vertices=jnp.asarray(sphere.vertices) + offset,
            normals=jnp.asarray(sphere.normals),
            uvs=jnp.asarray(sphere.uvs),
            position=jnp.zeros(3),
            rotation_deg=jnp.zeros(3),
            scale=jnp.ones(3),
            mat_id=0,
        )
        scene = build_scene([spec, light], [GREY, EMITTER], pad_to_multiple=8)
        settings = RenderSettings(
            width=12, height=12, spp=1, bounces=2, tri_block=8,
            estimator=estimator, intersector="brute", jitter=False,
        )
        return jnp.mean(render_frame(scene, camera, settings))

    g_nee = jax.grad(lambda o: loss(o, "nee"))(jnp.zeros(3))
    assert float(jnp.abs(g_nee).max()) > 0.0
    g_naive = jax.grad(lambda o: loss(o, "naive"))(jnp.zeros(3))
    # Naive detached PT: contributions are products of constants.
    np.testing.assert_allclose(np.asarray(g_naive), 0.0, atol=1e-7)
