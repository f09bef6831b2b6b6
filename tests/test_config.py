"""Config system: all five BASELINE.json workload configs parse and build."""

import glob
import os

import numpy as np
import pytest

from gpupathtracer_tpu.utils.config import load_config, load_scene_file, parse_config

SCENES = sorted(glob.glob(os.path.join(os.path.dirname(__file__), "..", "scenes", "*.toml")))


def test_five_configs_present():
    assert len(SCENES) >= 5


@pytest.mark.parametrize("path", SCENES, ids=[os.path.basename(p) for p in SCENES])
def test_config_parses_and_builds(path):
    scene, camera, settings = load_scene_file(path)
    assert scene.num_triangles > 0
    assert scene.num_triangles % settings.tri_block == 0
    assert bool(np.asarray(scene.valid).any())
    assert camera.width == settings.width
    assert settings.spp >= 1 and settings.bounces >= 1
    # All finite geometry.
    assert np.isfinite(np.asarray(scene.v0)).all()
    assert np.isfinite(np.asarray(scene.gn)).all()


def test_material_name_resolution(tmp_path):
    cfg = {
        "render": {"width": 8, "height": 8},
        "materials": [
            {"name": "a", "type": "diffuse", "albedo": [1, 0, 0]},
            {"name": "b", "type": "emitter", "intensity": 5.0},
        ],
        "geometry": [
            {"kind": "plane", "material": "b"},
        ],
    }
    specs, materials, camera, settings, _tex = parse_config(cfg, str(tmp_path))
    assert specs[0].mat_id == 1


def test_glass_forces_two_sided(tmp_path):
    obj = tmp_path / "t.obj"
    obj.write_text("v 0 0 0\nv 1 0 0\nv 0 1 0\nf 1 2 3\n")
    cfg = {
        "materials": [{"name": "g", "type": "glass"}],
        "geometry": [{"kind": "mesh", "obj": "t.obj", "material": "g"}],
    }
    specs, *_ = parse_config(cfg, str(tmp_path))
    assert specs[0].two_sided
