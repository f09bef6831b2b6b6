"""Coverage for the Pallas kernel paths the round-1 suite missed:
the any-hit occlusion kernel (ops/pallas_intersect.py::_kernel_occlusion)
and the streaming non-VMEM-resident path (::_kernel_streamed — in-kernel
double-buffered cluster DMA). Both run interpret-mode on CPU against the
Möller–Trumbore oracle."""

import jax.numpy as jnp
import numpy as np
import pytest

from gpupathtracer_tpu.models.obj import MeshData
from gpupathtracer_tpu.models.scene import build_scene, mesh_spec, plane_spec
from gpupathtracer_tpu.ops import pallas_intersect
from gpupathtracer_tpu.ops.intersect import intersect_brute
from gpupathtracer_tpu.ops.pallas_intersect import (
    intersect_pallas,
    intersect_pallas_occluded,
    pack_scene,
)


def random_scene(seed=0, pad=128, n_one_sided=150, n_two_sided=50, rays=800):
    rng = np.random.default_rng(seed)

    def mk(n, s):
        t = rng.normal(size=(n, 3, 3)).astype(np.float32) * s
        return MeshData(
            vertices=t,
            normals=np.zeros((n, 3, 3), np.float32),
            uvs=np.zeros((n, 3, 2), np.float32),
        )

    scene = build_scene(
        [
            mesh_spec(mk(n_one_sided, 2)),
            mesh_spec(mk(n_two_sided, 2), two_sided=True),
            plane_spec((0, 0, 0), (10, 20, 0), (3, 3, 3)),
        ],
        [{"type": "diffuse"}],
        pad_to_multiple=pad,
    )
    o = jnp.asarray(rng.normal(size=(rays, 3)) * 4, jnp.float32)
    draw = rng.normal(size=(rays, 3)).astype(np.float32)
    d = jnp.asarray(draw / np.linalg.norm(draw, axis=1, keepdims=True))
    return scene, o, d


def test_occlusion_kernel_matches_thresholded_oracle():
    """occluded(o, d, max_t) ⇔ closest accepted hit has t < max_t — the
    exact predicate the NEE shadow path relies on (integrator
    make_occlusion_fn's two implementations must agree)."""
    scene, o, d = random_scene(seed=7)
    packed = pack_scene(scene, tri_block=128)
    h = intersect_brute(o, d, scene, tri_block=128)
    t_ref = np.asarray(h.t)
    hit_ref = np.asarray(h.hit)
    rng = np.random.default_rng(1)

    # Cutoffs straddling the true hit distance: some before (unoccluded),
    # some after (occluded), plus misses with finite cutoffs.
    scale = rng.uniform(0.3, 2.0, size=t_ref.shape).astype(np.float32)
    t_finite = np.where(hit_ref, t_ref, 1.0)  # miss lanes carry t = BIG; avoid overflow
    max_t = jnp.asarray(
        np.where(hit_ref, t_finite * scale, rng.uniform(0.5, 5.0, t_ref.shape)), jnp.float32
    )

    occ = np.asarray(
        intersect_pallas_occluded(o, d, max_t, packed, ray_tile=256, interpret=True)
    )
    expect = hit_ref & (t_ref < np.asarray(max_t))
    np.testing.assert_array_equal(occ, expect)
    # The cutoffs must actually exercise both outcomes.
    assert expect.sum() > 50 and (~expect).sum() > 50


def test_occlusion_kernel_dead_lanes_unoccluded():
    """max_t = 0 marks parked/dead lanes: they must report unoccluded and
    must not stop the early-exit loop for live lanes."""
    scene, o, d = random_scene(seed=8)
    packed = pack_scene(scene, tri_block=128)
    h = intersect_brute(o, d, scene, tri_block=128)
    live = np.zeros(o.shape[0], bool)
    live[::3] = True
    max_t = jnp.asarray(np.where(live, 1e6, 0.0), jnp.float32)
    occ = np.asarray(
        intersect_pallas_occluded(o, d, max_t, packed, ray_tile=256, interpret=True)
    )
    expect = np.asarray(h.hit) & live
    np.testing.assert_array_equal(occ, expect)
    assert not occ[~live].any()


def test_streaming_launch_matches_resident(monkeypatch):
    """Force the streaming path (_launch_streamed) — what any scene over
    the VMEM budget hits on TPU — and demand bit-equal hits vs the resident
    while_loop kernel and >99.9% agreement with the oracle."""
    scene, o, d = random_scene(seed=9)
    packed = pack_scene(scene, tri_block=128)
    h_res = intersect_pallas(o, d, packed, ray_tile=256, interpret=True)

    monkeypatch.setattr(pallas_intersect, "RESIDENT_BUDGET_BYTES", 0)
    h_str = intersect_pallas(o, d, packed, ray_tile=256, interpret=True)

    np.testing.assert_array_equal(np.asarray(h_str.tri), np.asarray(h_res.tri))
    np.testing.assert_array_equal(np.asarray(h_str.hit), np.asarray(h_res.hit))
    np.testing.assert_allclose(
        np.asarray(h_str.t)[np.asarray(h_str.hit)],
        np.asarray(h_res.t)[np.asarray(h_res.hit)],
        rtol=1e-6,
    )

    h_mt = intersect_brute(o, d, scene, tri_block=128)
    agree = np.asarray(h_str.tri) == np.asarray(h_mt.tri)
    assert agree.mean() > 0.999


def test_streaming_launch_in_frame_render(monkeypatch):
    """End-to-end: a full frame through the streaming path equals the
    resident-path frame exactly (the launch selection must be invisible)."""
    from gpupathtracer_tpu.models.camera import Camera
    from gpupathtracer_tpu.render.renderer import RenderSettings, render_frame

    scene = build_scene(
        [
            mesh_spec("/root/reference/sceneResources/triangle.obj", mat_id=0),
            plane_spec((0.5, 0.5, -1.5), (0, 0, 0), (8, 8, 8), mat_id=1),
        ],
        [
            {"type": "diffuse", "albedo": (1.0, 0.0, 0.0)},
            {"type": "emitter", "emissive_color": (1.0, 1.0, 1.0), "intensity": 2.0},
        ],
        pad_to_multiple=128,
    )
    cam = Camera.create(position=(0.5, 0.5, 3.0), width=16, height=16)
    settings = RenderSettings(
        width=16, height=16, spp=2, bounces=2, tri_block=128, intersector="pallas"
    )
    img_res = np.asarray(render_frame(scene, cam, settings))
    monkeypatch.setattr(pallas_intersect, "RESIDENT_BUDGET_BYTES", 0)
    import jax

    jax.clear_caches()  # launch selection happens at trace time — force retrace
    img_str = np.asarray(render_frame(scene, cam, settings))
    np.testing.assert_array_equal(img_str, img_res)


def test_high_precision_mode_near_parity():
    """kernel_precision="high" (manual 3-pass bf16 hi/lo dots) must agree
    with the f32-exact mode on essentially all hits (fp-boundary flips
    only). On-chip measurement: 99.997% tri agreement, 1.17x frame rate."""
    scene, o, d = random_scene(seed=12)
    packed = pack_scene(scene, tri_block=128)
    h_exact = intersect_pallas(o, d, packed, ray_tile=256, interpret=True)
    h_fast = intersect_pallas(
        o, d, packed, ray_tile=256, interpret=True, precision="high"
    )
    agree = np.asarray(h_fast.tri) == np.asarray(h_exact.tri)
    assert agree.mean() > 0.995
    same = agree & np.asarray(h_exact.hit)
    np.testing.assert_allclose(
        np.asarray(h_fast.t)[same], np.asarray(h_exact.t)[same], rtol=1e-2, atol=1e-2
    )


def test_mixed_precision_mode_exact_t_near_parity():
    """kernel_precision="mixed" (edge columns at 3-pass bf16, D|num f32-exact)
    agrees with the exact mode on essentially all hits, and — unlike "high" —
    returns EXACTLY the f32 t wherever the winning triangle agrees."""
    scene, o, d = random_scene(seed=12)
    packed = pack_scene(scene, tri_block=128)
    h_exact = intersect_pallas(o, d, packed, ray_tile=256, interpret=True)
    h_mixed = intersect_pallas(
        o, d, packed, ray_tile=256, interpret=True, precision="mixed"
    )
    agree = np.asarray(h_mixed.tri) == np.asarray(h_exact.tri)
    assert agree.mean() > 0.995
    same = agree & np.asarray(h_exact.hit)
    np.testing.assert_array_equal(
        np.asarray(h_mixed.t)[same], np.asarray(h_exact.t)[same]
    )


def test_auto_precision_resolves_by_backend():
    from gpupathtracer_tpu.ops.pallas_intersect import resolve_precision

    # Tests run on CPU (conftest): auto must resolve to the exact mode.
    assert resolve_precision("auto") == "highest"
    assert resolve_precision("mixed") == "mixed"
