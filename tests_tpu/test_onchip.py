"""On-chip (real TPU) parity tests for the compiled Pallas kernels.

The CPU suite (tests/) runs every kernel in interpret mode, where Mosaic
lowering, VMEM/SMEM budgets, and the TPU "mixed" default precision are
never exercised — exactly the holes ADVICE round-2 flagged. These tests run
the compiled kernels on the live chip against the Möller–Trumbore oracle
(ops/intersect.py — the reference algorithm, kernel.cu:35-125).

Covers:
- resident closest-hit kernel at precision "highest" (exact) and "mixed"
  (the TPU default resolved by kernel_precision="auto");
- the streamed cluster-DMA kernel (scenes past RESIDENT_BUDGET_BYTES) with
  multi-block clusters (bpc > 1) — the Mosaic layout-crash regression
  (BENCH_r02 config6 SIGABRT) stays fixed;
- the any-hit occlusion kernel vs thresholded closest hit.
"""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gpupathtracer_tpu.models.obj import load_obj, subdivide_mesh
from gpupathtracer_tpu.models.scene import build_scene, mesh_spec
from gpupathtracer_tpu.ops import pallas_intersect
from gpupathtracer_tpu.ops.intersect import intersect_brute
from gpupathtracer_tpu.ops.pallas_intersect import (
    intersect_pallas,
    intersect_pallas_occluded,
    pack_scene,
)

WAHOO = "/root/reference/sceneResources/wahoo.obj"


def _wahoo_scene(subdiv=0):
    mesh = load_obj(WAHOO)
    if subdiv:
        mesh = subdivide_mesh(mesh, subdiv)
    return build_scene(
        [mesh_spec(mesh, position=(0.0, -2.0, 0.0), scale=(0.55, 0.55, 0.55))],
        [{"type": "diffuse"}],
        pad_to_multiple=512,
    )


def _rays(scene, r, seed=0, coherent=True):
    rng = np.random.default_rng(seed)
    verts = np.asarray(scene.v0)[np.asarray(scene.valid)]
    lo, hi = verts.min(0), verts.max(0)
    targets = rng.uniform(lo, hi, size=(r, 3)).astype(np.float32)
    if coherent:
        o = np.tile(np.asarray([[0.0, 1.0, 12.0]], np.float32), (r, 1))
    else:
        o = rng.uniform(lo - 2, hi + 2, size=(r, 3)).astype(np.float32)
    d = targets - o
    d /= np.linalg.norm(d, axis=1, keepdims=True)
    return jnp.asarray(o), jnp.asarray(d)


@pytest.fixture(scope="module")
def wahoo():
    scene = _wahoo_scene()
    packed = pack_scene(scene, tri_block=512)
    return scene, packed


def test_resident_highest_matches_oracle(wahoo):
    scene, packed = wahoo
    o, d = _rays(scene, 4096)
    h = intersect_pallas(o, d, packed, precision="highest")
    h_ref = intersect_brute(o, d, scene, tri_block=512)
    assert np.asarray(h_ref.hit).mean() > 0.25
    np.testing.assert_array_equal(np.asarray(h.hit), np.asarray(h_ref.hit))
    agree = (np.asarray(h.tri) == np.asarray(h_ref.tri)).mean()
    assert agree > 0.9995  # fp-boundary winner flips only
    same = (np.asarray(h.tri) == np.asarray(h_ref.tri)) & np.asarray(h_ref.hit)
    np.testing.assert_allclose(
        np.asarray(h.t)[same], np.asarray(h_ref.t)[same], rtol=1e-5, atol=1e-5
    )


def test_resident_mixed_matches_highest(wahoo):
    """ADVICE r2: the TPU default ("auto" → "mixed") needs on-chip coverage.
    Contract (ops/pallas_intersect.py PRECISIONS): acceptance flips only at
    grazing-edge fp boundaries (measured 0.99997+), and t is EXACT wherever
    the winning triangle agrees (D|num columns stay f32-exact)."""
    scene, packed = wahoo
    for coherent, seed in ((True, 1), (False, 2)):
        o, d = _rays(scene, 8192, seed=seed, coherent=coherent)
        h_hi = intersect_pallas(o, d, packed, precision="highest")
        h_mx = intersect_pallas(o, d, packed, precision="mixed")
        agree = (np.asarray(h_mx.tri) == np.asarray(h_hi.tri)).mean()
        assert agree > 0.9995, f"coherent={coherent}: agreement {agree}"
        same = (np.asarray(h_mx.tri) == np.asarray(h_hi.tri)) & np.asarray(h_hi.hit)
        np.testing.assert_array_equal(
            np.asarray(h_mx.t)[same], np.asarray(h_hi.t)[same]
        )


def test_occlusion_kernel_matches_threshold(wahoo):
    scene, packed = wahoo
    o, d = _rays(scene, 4096, seed=3, coherent=False)
    h_ref = intersect_brute(o, d, scene, tri_block=512)
    max_t = jnp.where(jnp.arange(4096) % 3 == 0, 0.0, 7.5)  # some lanes dead
    occ = intersect_pallas_occluded(o, d, max_t, packed, precision="highest")
    want = np.asarray(h_ref.hit) & (np.asarray(h_ref.t) < np.asarray(max_t))
    got = np.asarray(occ)
    # Oracle min-t thresholding == any-hit except when the closest accepted
    # hit sits exactly at the cutoff fp boundary; demand 100% here.
    np.testing.assert_array_equal(got, want)


@pytest.mark.parametrize("precision", ["highest", "mixed"])
def test_streamed_kernel_matches_oracle_onchip(monkeypatch, precision):
    """Compiled streamed path with multi-block clusters (the BENCH_r02
    config6 crash shape class): parity vs the oracle on a 82k-tri scene
    forced past the resident budget."""
    scene = _wahoo_scene(subdiv=2)  # 82,752 tris → ~25 MB packed
    packed = pack_scene(scene, tri_block=512)
    assert packed.w.size * 4 > pallas_intersect.RESIDENT_BUDGET_BYTES
    # Raise the cluster target so bpc > 1 (multi-block clusters).
    monkeypatch.setattr(pallas_intersect, "CLUSTER_TARGET_BYTES", 512 * 1024)
    r = 8192
    o, d = _rays(scene, r, seed=4)
    h = intersect_pallas(o, d, packed, ray_tile=128, precision=precision)
    h_ref = intersect_brute(o, d, scene, tri_block=512)
    assert np.asarray(h_ref.hit).mean() > 0.25
    agree = (np.asarray(h.tri) == np.asarray(h_ref.tri)).mean()
    if precision == "highest":
        np.testing.assert_array_equal(np.asarray(h.hit), np.asarray(h_ref.hit))
        assert agree > 0.9995
    else:
        assert agree > 0.999
    same = (np.asarray(h.tri) == np.asarray(h_ref.tri)) & np.asarray(h_ref.hit)
    np.testing.assert_allclose(
        np.asarray(h.t)[same], np.asarray(h_ref.t)[same], rtol=1e-4, atol=1e-4
    )


def test_streamed_occlusion_onchip(monkeypatch):
    """Compiled streamed any-hit kernel (bpc > 1) vs thresholded brute
    closest hit on a >budget scene."""
    from gpupathtracer_tpu.ops.pallas_intersect import RESIDENT_BUDGET_BYTES

    scene = _wahoo_scene(subdiv=2)
    packed = pack_scene(scene, tri_block=512)
    assert packed.w.size * 4 > RESIDENT_BUDGET_BYTES
    monkeypatch.setattr(pallas_intersect, "CLUSTER_TARGET_BYTES", 512 * 1024)
    r = 4096
    o, d = _rays(scene, r, seed=9)
    h_ref = intersect_brute(o, d, scene, tri_block=512)
    t_ref = np.asarray(h_ref.t)
    rng = np.random.default_rng(11)
    cut = np.where(rng.uniform(size=r) < 0.5, t_ref * 0.9, t_ref * 1.1).astype(np.float32)
    cut = np.where(np.isfinite(cut) & (cut < 1e30), cut, 20.0)
    cut[::5] = 0.0
    occ = intersect_pallas_occluded(
        o, d, jnp.asarray(cut), packed, ray_tile=128, precision="highest"
    )
    want = np.asarray(h_ref.hit) & (t_ref < cut)
    np.testing.assert_array_equal(np.asarray(occ), want)


@pytest.mark.slow
def test_streamed_kernel_parity_config7_scale(monkeypatch):
    """Compiled streamed kernel at config7 scale (wahoo subdiv 4 =
    1,324,032 tris, ~420 MB packed) vs the Möller–Trumbore oracle on the
    live chip — VERDICT round-3 item 1's parity bar."""
    scene = _wahoo_scene(subdiv=4)
    assert scene.num_triangles >= 1_300_000
    packed = pack_scene(scene, tri_block=512)
    assert packed.w.size * 4 > 20 * pallas_intersect.RESIDENT_BUDGET_BYTES
    r = 4096
    o, d = _rays(scene, r, seed=21)
    h = intersect_pallas(o, d, packed, ray_tile=128, precision="highest")
    h_ref = intersect_brute(o, d, scene, tri_block=512, ray_chunk=1024)
    assert np.asarray(h_ref.hit).mean() > 0.25
    np.testing.assert_array_equal(np.asarray(h.hit), np.asarray(h_ref.hit))
    agree = (np.asarray(h.tri) == np.asarray(h_ref.tri)).mean()
    assert agree > 0.999
    same = (np.asarray(h.tri) == np.asarray(h_ref.tri)) & np.asarray(h_ref.hit)
    np.testing.assert_allclose(
        np.asarray(h.t)[same], np.asarray(h_ref.t)[same], rtol=1e-4, atol=1e-4
    )


GOLDEN_DIR = os.path.join(os.path.dirname(os.path.abspath(__file__)), "goldens")


def _shipping_render(config, width, height, spp):
    """Render a committed config under the SHIPPING on-chip defaults
    (kernel_precision auto→mixed, permute compaction, material-set
    narrowing, auto sort) at reduced size."""
    import dataclasses

    from gpupathtracer_tpu.render.renderer import render_frame
    from gpupathtracer_tpu.utils.config import load_scene_file

    scenes_dir = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "scenes"
    )
    scene, cam, st = load_scene_file(os.path.join(scenes_dir, config))
    st = dataclasses.replace(st, width=width, height=height, spp=spp)
    cam = dataclasses.replace(cam, width=width, height=height)
    return np.asarray(render_frame(scene, cam, st))


# (config, width, height, spp) — small enough to run per-round on chip.
GOLDEN_CASES = [
    ("config2_cornell.toml", 128, 128, 4),
    ("config6_bigscene.toml", 96, 96, 2),
]


@pytest.mark.parametrize("case", GOLDEN_CASES, ids=lambda c: c[0])
def test_onchip_image_golden(case):
    """Pin the on-chip shipping-pipeline output across rounds (VERDICT r3
    item 6): numeric drift becomes a test failure, not archaeology.
    Regenerate with tests_tpu/make_goldens.py after INTENDED changes."""
    cfg, w, h, spp = case
    path = os.path.join(GOLDEN_DIR, cfg.replace(".toml", f"_{w}x{h}_spp{spp}.npy"))
    img = _shipping_render(cfg, w, h, spp)
    assert np.isfinite(img).all()
    if not os.path.exists(path):
        pytest.skip(f"golden missing — generate with make_goldens.py ({path})")
    want = np.load(path)
    # Tolerance: the mixed-precision kernel may flip a handful of grazing
    # hits between compiler versions; bound both mean drift and the count
    # of meaningfully changed pixels.
    diff = np.abs(img - want)
    assert diff.mean() < 2e-3, diff.mean()
    assert (diff.max(axis=-1) > 3e-2).mean() < 5e-3


@pytest.mark.slow
def test_live_view_onchip_smoke(tmp_path):
    """The interactive progressive viewer on the compiled pallas backend
    (tests/ only ever runs it interpret/CPU — VERDICT r3 item 10)."""
    import dataclasses

    from gpupathtracer_tpu.render.live import live_view
    from gpupathtracer_tpu.utils.config import load_scene_file

    scenes_dir = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "scenes"
    )
    scene, cam, st = load_scene_file(os.path.join(scenes_dir, "config2_cornell.toml"))
    st = dataclasses.replace(st, width=96, height=96, spp=4)
    cam = dataclasses.replace(cam, width=96, height=96)
    sent = iter([[], ["w"], [], ["quit"]])

    def source():
        return next(sent, ["quit"])

    final_cam, spp_done = live_view(
        scene, cam, st, str(tmp_path), chunk_spp=2, max_spp=4, command_source=source
    )
    assert (tmp_path / "live.png").exists()
    assert spp_done >= 2
    assert float(final_cam.position[2]) != float(cam.position[2])  # W moved


def test_pallas_inside_shard_map_onchip():
    """The COMPILED Pallas kernel launched inside a shard_map body on a
    1-device mesh — the production multi-chip composition's on-chip smoke
    (VERDICT r4 missing 1; the CPU suite covers interpret mode + real
    multi-shard meshes in tests/test_parallel_pallas.py)."""
    import dataclasses

    from gpupathtracer_tpu.parallel.mesh import make_mesh
    from gpupathtracer_tpu.parallel.render import render_frame_distributed
    from gpupathtracer_tpu.render.renderer import render_frame
    from gpupathtracer_tpu.utils.config import load_scene_file

    scenes_dir = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "scenes"
    )
    scene, cam, st = load_scene_file(os.path.join(scenes_dir, "config2_cornell.toml"))
    st = dataclasses.replace(
        st, width=64, height=64, spp=2, estimator="nee", intersector="pallas"
    )
    cam = dataclasses.replace(cam, width=64, height=64)
    mesh = make_mesh(n_data=1, n_scene=1, devices=jax.devices()[:1])
    img_dist = np.asarray(render_frame_distributed(scene, cam, st, mesh))
    ref = np.asarray(render_frame(scene, cam, st))
    assert np.isfinite(img_dist).all()
    np.testing.assert_array_equal(img_dist, ref)
