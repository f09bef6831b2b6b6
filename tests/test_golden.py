"""Golden-image regression (SURVEY.md §4.2): config-1 workload rendered on
the CPU oracle against a committed golden array. Guards the whole stack —
camera math, scene compile, intersection, estimator, RNG — against silent
behavior changes. Regenerate deliberately with:

    python tests/test_golden.py regenerate
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

from gpupathtracer_tpu.models.camera import Camera
from gpupathtracer_tpu.models.scene import build_scene, mesh_spec, plane_spec
from gpupathtracer_tpu.render.renderer import RenderSettings, render_frame

GOLDEN_PATH = os.path.join(os.path.dirname(__file__), "golden", "config1_64.npz")


def _render():
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
    cam = Camera.create(position=(0.5, 0.5, 3.0), width=64, height=64)
    settings = RenderSettings(
        width=64, height=64, spp=4, bounces=2, tri_block=8, intersector="brute"
    )
    return np.asarray(render_frame(scene, cam, settings))


def test_golden_config1():
    img = _render()
    with np.load(GOLDEN_PATH) as z:
        golden = z["image"]
    np.testing.assert_allclose(img, golden, atol=2e-5)


if __name__ == "__main__":
    import sys

    if len(sys.argv) > 1 and sys.argv[1] == "regenerate":
        import jax

        jax.config.update("jax_platforms", "cpu")
        os.makedirs(os.path.dirname(GOLDEN_PATH), exist_ok=True)
        np.savez_compressed(GOLDEN_PATH, image=_render())
        print(f"wrote {GOLDEN_PATH}")
