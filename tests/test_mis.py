"""Multiple importance sampling (estimator="mis"): unbiasedness vs naive,
variance below pure NEE where NEE is weak (large/near lights), and the
per-vertex emitter accounting fix (diffuse→specular→emitter energy)."""

import jax
import jax.numpy as jnp
import numpy as np

from gpupathtracer_tpu.models.camera import Camera
from gpupathtracer_tpu.models.scene import (
    build_scene,
    icosphere,
    mesh_spec,
    plane_spec,
)
from gpupathtracer_tpu.render.integrator import IntegratorOptions, trace_paths
from gpupathtracer_tpu.render.renderer import RenderSettings, render_frame

EMITTER = {"type": "emitter", "emissive_color": (1.0, 1.0, 1.0), "intensity": 4.0}
GREY = {"type": "diffuse", "albedo": (0.6, 0.6, 0.6)}


def _big_near_light_scene():
    """A big light close to the floor: pure NEE's cos·cos/r² light-sample
    term is wild here (points sampled far across the light at grazing
    angles), while BSDF sampling is well-behaved — the regime MIS exists for."""
    return build_scene(
        [
            plane_spec((0, -1, 0), (90, 0, 0), (8, 8, 8), mat_id=0),  # floor
            plane_spec((0, 0.0, 0), (90, 0, 0), (10, 10, 10), mat_id=1),  # huge close light
        ],
        [GREY, EMITTER],
        pad_to_multiple=8,
    )


def _render(scene, estimator, spp, seed=0, width=24, height=24, bounces=2):
    cam = Camera.create(
        position=(0.0, -0.7, 5.0), pitch=-10.0, fov_deg=60.0, width=width, height=height
    )
    settings = RenderSettings(
        width=width, height=height, spp=spp, bounces=bounces, tri_block=8,
        estimator=estimator, jitter=False, seed=seed,
    )
    return np.asarray(render_frame(scene, cam, settings))


def test_mis_matches_naive_expectation():
    """All three estimators target the same integral."""
    scene = _big_near_light_scene()
    naive = _render(scene, "naive", spp=256)
    mis = _render(scene, "mis", spp=32)
    lit = naive.mean(axis=-1) > 0.05
    assert lit.sum() > 50
    ratio = mis[lit].mean() / naive[lit].mean()
    assert 0.92 < ratio < 1.08, ratio


def test_mis_matches_nee_expectation():
    scene = _big_near_light_scene()
    nee = _render(scene, "nee", spp=64)
    mis = _render(scene, "mis", spp=64)
    lit = nee.mean(axis=-1) > 0.05
    ratio = mis[lit].mean() / nee[lit].mean()
    assert 0.95 < ratio < 1.05, ratio


def test_mis_lower_dispersion_than_nee_on_big_near_light():
    """Seed-to-seed fluctuation at equal spp: MIS < pure NEE when the light
    is large and close (VERDICT round-1 item 6's acceptance criterion)."""
    scene = _big_near_light_scene()

    def dispersion(est):
        a = _render(scene, est, spp=8, seed=1)
        b = _render(scene, est, spp=8, seed=2)
        lit = (a.mean(-1) > 0.05) | (b.mean(-1) > 0.05)
        return np.mean((a[lit] - b[lit]) ** 2)

    assert dispersion("mis") < dispersion("nee")


def _furnace_mirror_scene(albedo=(0.5, 0.5, 0.5)):
    """Diffuse patch under a big mirror slab, all enclosed by a two-sided
    emitter dome: scatters reach Le directly or via the mirror (unit color),
    so radiance ≈ albedo·Le — minus the few percent of mirror paths folded
    back onto the patch (albedo² double-scatter paths). The exact value is
    estimator-independent; emitter hits arriving via the mirror (a non-NEE
    vertex) must count in full for nee/mis to reproduce it."""
    specs = [
        plane_spec((0, 0, 0), (0, 0, 0), (1, 1, 1), mat_id=0),  # patch, +z normal
        plane_spec((0, 0, 1.0), (0, 0, 0), (3, 3, 3), mat_id=2),  # mirror above
        mesh_spec(icosphere(1), scale=(25.0, 25.0, 25.0), mat_id=1, two_sided=True),
    ]
    return build_scene(
        specs,
        [
            {"type": "diffuse", "albedo": albedo},
            {"type": "emitter", "emissive_color": (1.0, 1.0, 1.0), "intensity": 2.0},
            {"type": "mirror", "specular_color": (1.0, 1.0, 1.0)},
        ],
        pad_to_multiple=8,
    )


def _patch_trace(scene, estimator, r=2048, bounces=8, seed=3):
    o = jnp.tile(jnp.asarray([[0.0, 0.0, 0.5]]), (r, 1))
    d = jnp.tile(jnp.asarray([[0.0, 0.0, -1.0]]), (r, 1))
    from gpupathtracer_tpu.ops import sampling

    opts = IntegratorOptions(bounces=bounces, tri_block=8, estimator=estimator)
    keys = sampling.path_keys(seed, jnp.arange(r, dtype=jnp.uint32), impl=opts.rng)
    return np.asarray(trace_paths(scene, o, d, keys, opts))


def test_diffuse_mirror_emitter_energy_counted():
    """diffuse→mirror→emitter paths are BSDF-only energy (the diffuse
    vertex's light sample is a different path); nee and mis must land on the
    same furnace value as the naive estimator — a whole-specular-chain rule
    (round-1 behavior) loses the mirror-occluded fraction. The analytic
    albedo·Le is only a ~4%-loose upper bound (mirror paths folded back onto
    the patch scatter twice), so the ground truth is the naive estimator's
    mean over several seeds — any estimator that drops or double-counts the
    mirror path class misses it by far more than the cross-seed noise."""
    albedo = np.asarray([0.5, 0.5, 0.5])
    scene = _furnace_mirror_scene(tuple(albedo))
    upper = albedo * 2.0

    truth = np.mean(
        [_patch_trace(scene, "naive", seed=s).mean(axis=0) for s in (3, 4, 5)], axis=0
    )
    # Sanity: within a few percent below the loose analytic bound.
    assert (truth <= upper * 1.02).all() and (truth >= upper * 0.90).all(), truth

    for est in ("nee", "mis"):
        out = _patch_trace(scene, est)
        np.testing.assert_allclose(out.mean(axis=0), truth, rtol=0.06, err_msg=est)


def test_mis_gradients_finite_and_flowing():
    """MIS must stay gradient-transparent (weights are differentiable but a
    partition of unity — the estimator's expectation is weight-independent)."""
    from gpupathtracer_tpu.models.materials import material_table
    from gpupathtracer_tpu.models.scene import GeometrySpec

    sphere = icosphere(1)
    camera = Camera.create(position=(0.0, 0.0, 4.0), fov_deg=45.0, width=12, height=12)
    light = plane_spec((0.0, 3.0, 0.0), (90.0, 0.0, 0.0), (4.0, 4.0, 4.0), mat_id=1)
    mats = material_table([GREY, EMITTER])

    def loss(a):
        spec = GeometrySpec(
            vertices=jnp.asarray(sphere.vertices),
            normals=jnp.asarray(sphere.normals),
            uvs=jnp.asarray(sphere.uvs),
            position=jnp.zeros(3),
            rotation_deg=jnp.zeros(3),
            scale=jnp.ones(3),
            mat_id=0,
        )
        m = mats.replace(albedo=mats.albedo.at[0].set(jnp.stack([a, a, a])))
        scene = build_scene([spec, light], m, pad_to_multiple=8)
        settings = RenderSettings(
            width=12, height=12, spp=2, bounces=2, tri_block=8,
            estimator="mis", intersector="brute", jitter=False,
        )
        return jnp.mean(render_frame(scene, camera, settings))

    g = float(jax.grad(loss)(jnp.float32(0.6)))
    assert np.isfinite(g) and g > 0
