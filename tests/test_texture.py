"""Textured diffuse albedo (checker + bilinear image lookup via hit UVs).

The reference stores per-vertex UVs and never shades with them
(utilities.h:156-166); this framework consumes them: a procedural checker
and differentiable image textures (models/materials.py::textured_albedo),
auto-enabled per scene by renderer.narrow_settings.
"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from gpupathtracer_tpu.models.camera import Camera
from gpupathtracer_tpu.models.materials import (
    TEX_CHECKER,
    TEX_IMAGE,
    TEX_NONE,
    material_table,
    textured_albedo,
)
from gpupathtracer_tpu.models.scene import build_scene, mesh_spec, plane_spec
from gpupathtracer_tpu.render.renderer import (
    RenderSettings,
    narrow_settings,
    render_frame,
)


def _quad_obj(tmp_path):
    """Unit quad in z=0 with full [0,1]² UVs (two triangles)."""
    p = tmp_path / "quad.obj"
    p.write_text(
        "v 0 0 0\nv 1 0 0\nv 1 1 0\nv 0 1 0\n"
        "vt 0 0\nvt 1 0\nvt 1 1\nvt 0 1\n"
        "vn 0 0 1\n"
        "f 1/1/1 2/2/1 3/3/1\nf 1/1/1 3/3/1 4/4/1\n"
    )
    return str(p)


def test_checker_albedo_values():
    uv = jnp.asarray([[0.05, 0.05], [0.55, 0.05], [0.55, 0.55], [0.05, 0.55]])
    base = jnp.tile(jnp.asarray([[1.0, 0.0, 0.0]]), (4, 1))
    c2 = jnp.tile(jnp.asarray([[0.0, 1.0, 0.0]]), (4, 1))
    kind = jnp.full((4,), TEX_CHECKER, jnp.int32)
    out = textured_albedo(
        base, kind, jnp.zeros((4,), jnp.int32), c2, jnp.full((4,), 2.0), uv, None
    )
    # scale 2: cell parity (0,0)=even→base, (1,0)=odd→c2, (1,1)=even, (0,1)=odd
    np.testing.assert_allclose(out, [base[0], c2[0], base[0], c2[0]])
    # TEX_NONE lanes keep the base albedo whatever the uv.
    out_none = textured_albedo(
        base, jnp.full((4,), TEX_NONE, jnp.int32), jnp.zeros((4,), jnp.int32),
        c2, jnp.full((4,), 2.0), uv, None,
    )
    np.testing.assert_allclose(out_none, base)


def test_image_albedo_bilinear_exact_at_texel_centers():
    # 2x2 texture with distinct colors; second row in the stack is a decoy.
    tex = np.zeros((2, 2, 2, 3), np.float32)
    tex[0, 0, 0] = (1, 0, 0)  # top-left in storage = v≈1 (flipped)
    tex[0, 0, 1] = (0, 1, 0)
    tex[0, 1, 0] = (0, 0, 1)
    tex[0, 1, 1] = (1, 1, 0)
    tex[1] = 0.5
    # Texel centers in UV (half-texel convention, v flipped): u ∈ {.25,.75},
    # storage row 1 (bottom) = v 0.25, storage row 0 (top) = v 0.75.
    uv = jnp.asarray([[0.25, 0.75], [0.75, 0.75], [0.25, 0.25], [0.75, 0.25]])
    r = uv.shape[0]
    out = textured_albedo(
        jnp.zeros((r, 3)), jnp.full((r,), TEX_IMAGE, jnp.int32),
        jnp.zeros((r,), jnp.int32), jnp.zeros((r, 3)), jnp.ones((r,)),
        uv, jnp.asarray(tex),
    )
    np.testing.assert_allclose(
        out, [(1, 0, 0), (0, 1, 0), (0, 0, 1), (1, 1, 0)], atol=1e-6
    )
    # Midpoint of the top two texels: exact average (bilinear).
    mid = textured_albedo(
        jnp.zeros((1, 3)), jnp.full((1,), TEX_IMAGE, jnp.int32),
        jnp.zeros((1,), jnp.int32), jnp.zeros((1, 3)), jnp.ones((1,)),
        jnp.asarray([[0.5, 0.75]]), jnp.asarray(tex),
    )
    np.testing.assert_allclose(mid, [(0.5, 0.5, 0.0)], atol=1e-6)
    # tex_id selects the row: id 1 = constant 0.5.
    other = textured_albedo(
        jnp.zeros((1, 3)), jnp.full((1,), TEX_IMAGE, jnp.int32),
        jnp.ones((1,), jnp.int32), jnp.zeros((1, 3)), jnp.ones((1,)),
        jnp.asarray([[0.3, 0.6]]), jnp.asarray(tex),
    )
    np.testing.assert_allclose(other, [(0.5, 0.5, 0.5)], atol=1e-6)


def _textured_scene(tmp_path, texture: dict, textures=None):
    quad = _quad_obj(tmp_path)
    return build_scene(
        [
            mesh_spec(quad, mat_id=0),
            plane_spec((0.5, 0.5, 2.0), (0.0, 0.0, 0.0), (4.0, 4.0, 4.0), mat_id=1),
        ],
        [
            {"type": "diffuse", "albedo": (0.9, 0.1, 0.1), **texture},
            {"type": "emitter", "emissive_color": (1.0, 1.0, 1.0), "intensity": 4.0},
        ],
        pad_to_multiple=8,
        textures=textures,
    )


def test_checker_render_spatial_pattern(tmp_path):
    """A camera-facing checkered quad renders cells of the two albedos at
    the right image positions (direct NEE lighting makes radiance ∝ albedo)."""
    scene = _textured_scene(
        tmp_path,
        {"texture": "checker", "checker_color": (0.1, 0.9, 0.1), "checker_scale": 2.0},
    )
    settings = RenderSettings(
        width=32, height=32, spp=8, bounces=2, tri_block=8, estimator="nee", seed=7
    )
    st = narrow_settings(scene, settings)
    assert st.textured  # auto-enabled
    cam = Camera.create(position=(0.5, 0.5, 1.8), width=32, height=32, fov_deg=40.0)
    img = np.asarray(render_frame(scene, cam, settings))
    # Quad spans the center; sample two points on opposite checker cells.
    # UV ≈ pixel position: u right, v up (image rows top-down → v flipped).
    h = img.shape[0]
    lower_left = img[int(h * 0.75), int(h * 0.25)]
    upper_left = img[int(h * 0.25), int(h * 0.25)]
    assert lower_left[0] > lower_left[1] * 2, lower_left  # red cell
    assert upper_left[1] > upper_left[0] * 2, upper_left  # green cell


def test_untextured_scene_stays_untextured(tmp_path):
    scene = _textured_scene(tmp_path, {})
    st = narrow_settings(scene, RenderSettings(width=8, height=8))
    assert not st.textured


def test_texture_gradients_flow(tmp_path):
    """dL/d(texels) through the bilinear lookup: FD check on one texel."""
    tex = np.full((1, 4, 4, 3), 0.5, np.float32)
    scene = _textured_scene(
        tmp_path, {"texture": "image", "texture_id": 0}, textures=tex
    )
    cam = Camera.create(position=(0.5, 0.5, 1.8), width=16, height=16, fov_deg=40.0)
    settings = RenderSettings(
        width=16, height=16, spp=2, bounces=2, tri_block=8, estimator="nee",
        textured=True,
    )

    def loss(textures):
        s = scene.replace(textures=textures)
        return jnp.mean(render_frame(s, cam, settings))

    g = np.asarray(jax.grad(loss)(scene.textures))
    assert np.isfinite(g).all()
    assert np.abs(g).sum() > 0
    # FD on the texel with the largest gradient.
    flat = np.argmax(np.abs(g))
    idx = np.unravel_index(flat, g.shape)
    eps = 1e-2
    tp = tex.copy(); tp[idx] += eps
    tm = tex.copy(); tm[idx] -= eps
    fd = (float(loss(jnp.asarray(tp))) - float(loss(jnp.asarray(tm)))) / (2 * eps)
    np.testing.assert_allclose(g[idx], fd, rtol=5e-2, atol=1e-7)


def test_config_texture_roundtrip(tmp_path):
    """TOML config with [[textures]] + image/checker materials loads and
    renders; texture file resolved relative to the config."""
    from gpupathtracer_tpu.utils.config import load_scene_file
    from gpupathtracer_tpu.utils.image import write_ppm

    quad = _quad_obj(tmp_path)
    img = np.zeros((2, 2, 3), np.uint8)
    img[:, :, 0] = 255
    write_ppm(str(tmp_path / "tex.ppm"), img)
    (tmp_path / "scene.toml").write_text(
        f"""
[render]
width = 8
height = 8
spp = 1
bounces = 2
tri_block = 8
estimator = "nee"

[camera]
position = [0.5, 0.5, 1.8]
fov_deg = 40.0

[[textures]]
file = "tex.ppm"

[[materials]]
name = "tex"
type = "diffuse"
texture = "image"
texture_id = 0

[[materials]]
name = "check"
type = "diffuse"
albedo = [0.2, 0.2, 0.8]
texture = "checker"
checker_scale = 4.0

[[materials]]
name = "light"
type = "emitter"
emissive_color = [1.0, 1.0, 1.0]
intensity = 3.0

[[geometry]]
kind = "mesh"
obj = "{quad}"
material = "tex"

[[geometry]]
kind = "plane"
position = [0.5, 0.5, 2.0]
scale = [4.0, 4.0, 4.0]
material = "light"
"""
    )
    scene, cam, settings = load_scene_file(str(tmp_path / "scene.toml"))
    assert scene.textures is not None and scene.textures.shape == (1, 2, 2, 3)
    assert int(scene.materials.tex_kind[0]) == TEX_IMAGE
    assert int(scene.materials.tex_kind[1]) == TEX_CHECKER
    img = np.asarray(render_frame(scene, cam, settings))
    assert np.isfinite(img).all()
    # The quad is lit and pure red ⇒ red dominates wherever it's visible.
    center = img[4, 4]
    assert center[0] > 0 and center[0] > center[1] * 3


def test_textured_distributed_bitmatches_single(tmp_path):
    """Textured scenes through shard_map: the texture stack rides along
    replicated; the sharded render is bit-identical to single-device."""
    from gpupathtracer_tpu.parallel.mesh import make_mesh
    from gpupathtracer_tpu.parallel.render import render_frame_distributed

    tex = np.zeros((1, 2, 2, 3), np.float32)
    tex[0, :, :, 0] = [[1.0, 0.2], [0.2, 1.0]]
    tex[0, :, :, 1] = 0.4
    scene = _textured_scene(
        tmp_path, {"texture": "image", "texture_id": 0}, textures=tex
    )
    cam = Camera.create(position=(0.5, 0.5, 1.8), width=16, height=16, fov_deg=40.0)
    settings = RenderSettings(
        width=16, height=16, spp=2, bounces=2, tri_block=8, estimator="nee"
    )
    single = np.asarray(render_frame(scene, cam, settings))
    mesh = make_mesh(n_data=8, n_scene=1)
    dist = np.asarray(render_frame_distributed(scene, cam, settings, mesh))
    np.testing.assert_array_equal(single, dist)


def test_texture_recovery_adam(tmp_path):
    """Inverse texture painting: recover a 2x2 texel stack from a rendered
    target through jax.grad + Adam — the texture-gradient path end-to-end."""
    import optax

    target_tex = np.zeros((1, 2, 2, 3), np.float32)
    target_tex[0] = [[[0.9, 0.1, 0.1], [0.1, 0.9, 0.1]],
                     [[0.1, 0.1, 0.9], [0.8, 0.8, 0.1]]]
    scene = _textured_scene(
        tmp_path, {"texture": "image", "texture_id": 0}, textures=target_tex
    )
    cam = Camera.create(position=(0.5, 0.5, 1.8), width=24, height=24, fov_deg=40.0)
    settings = RenderSettings(
        width=24, height=24, spp=4, bounces=2, tri_block=8, estimator="nee",
        textured=True, seed=3,
    )
    target = jax.lax.stop_gradient(render_frame(scene, cam, settings))

    def loss_fn(tex):
        s = scene.replace(textures=tex)
        return jnp.mean((render_frame(s, cam, settings) - target) ** 2)

    tex = jnp.full((1, 2, 2, 3), 0.5, jnp.float32)
    opt = optax.adam(0.1)
    state = opt.init(tex)
    grad_fn = jax.jit(jax.grad(loss_fn))
    for _ in range(60):
        g = grad_fn(tex)
        upd, state = opt.update(g, state, tex)
        tex = jnp.clip(optax.apply_updates(tex, upd), 0.0, 1.0)
    err = np.abs(np.asarray(tex) - target_tex).max()
    assert err < 0.15, (err, np.asarray(tex))


def test_factorized_matches_flat_take_paths():
    """The small-texture factorized MXU path and the wide-texture flat-take
    fallback (W*3 > 128 forces it) agree to float rounding on the same UV
    set: embed the same 32x32 pattern in a 64-px-wide texture (wrap columns
    so u-wrap taps also match) and compare lookups at u scaled onto the
    embedded half."""
    rng = np.random.default_rng(7)
    small = rng.uniform(size=(1, 32, 32, 3)).astype(np.float32)
    # 64 wide -> W*3 = 192 > _FACTORIZED_MAX_COLS: takes the flat-take path.
    wide = np.concatenate([small, small], axis=2)
    r = 4096
    uv = jnp.asarray(rng.uniform(size=(r, 2)), jnp.float32)
    kind = jnp.full((r,), TEX_IMAGE, jnp.int32)
    tid = jnp.zeros((r,), jnp.int32)
    zero3 = jnp.zeros((r, 3))
    ones = jnp.ones((r,))
    out_small = textured_albedo(zero3, kind, tid, zero3, ones, uv, jnp.asarray(small))
    # Same texel grid on the wide texture's left half: u' = u/2 hits the
    # same storage columns with the same du fractions.
    uv_wide = uv.at[:, 0].set(uv[:, 0] * 0.5)
    out_wide = textured_albedo(zero3, kind, tid, zero3, ones, uv_wide, jnp.asarray(wide))
    np.testing.assert_allclose(out_small, out_wide, atol=2e-6)
