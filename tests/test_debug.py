"""Sanitizer-mode coverage (SURVEY.md §5 race detection / sanitizers):
checkify-wrapped rendering reports no NaN/OOB on a healthy scene, catches an
injected NaN, and debug_mode round-trips cleanly."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gpupathtracer_tpu.models.camera import Camera
from gpupathtracer_tpu.models.scene import build_scene, mesh_spec, plane_spec
from gpupathtracer_tpu.render.renderer import RenderSettings, render_frame
from gpupathtracer_tpu.utils.debug import checkify_render, debug_mode


def _small_scene():
    scene = build_scene(
        [
            mesh_spec("/root/reference/sceneResources/triangle.obj", mat_id=0),
            plane_spec((0.5, 0.5, -1.5), (0, 0, 0), (8, 8, 8), mat_id=1),
        ],
        [
            {"type": "diffuse", "albedo": (1.0, 0.0, 0.0)},
            {"type": "emitter", "emissive_color": (1.0, 1.0, 1.0), "intensity": 2.0},
        ],
        pad_to_multiple=8,
    )
    cam = Camera.create(position=(0.5, 0.5, 3.0), width=16, height=16)
    settings = RenderSettings(width=16, height=16, spp=2, bounces=2, tri_block=8)
    return scene, cam, settings


def test_checkify_render_clean_scene():
    scene, cam, settings = _small_scene()

    def render(s):
        return render_frame(s, cam, settings)

    err, img = checkify_render(render)(scene)
    err.throw()  # no NaN/inf/OOB anywhere in the whole frame computation
    np.testing.assert_array_equal(np.asarray(img), np.asarray(render(scene)))


def test_checkify_catches_injected_nan():
    scene, cam, settings = _small_scene()
    bad = scene.replace(v0=scene.v0.at[0, 0].set(jnp.nan))

    def render(s):
        return render_frame(s, cam, settings)

    err, _ = checkify_render(render)(bad)
    with pytest.raises(Exception):
        err.throw()


def test_debug_mode_roundtrip():
    scene, cam, settings = _small_scene()
    with debug_mode():
        img = np.asarray(render_frame(scene, cam, settings))
    assert np.isfinite(img).all()
    assert not jax.config.jax_debug_nans  # restored on exit
