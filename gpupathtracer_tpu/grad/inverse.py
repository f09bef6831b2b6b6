"""Inverse rendering (BASELINE.json config 5): recover scene parameters from
a target image via pixel gradients.

Demo task: a Lambertian icosphere lit by an emissive backdrop
(scenes/config5_invert_target.toml). The optimizer recovers
- per-material albedo,
- per-vertex offsets of the sphere's triangle soup,
from the target rendering, using Adam (optax) on an L2 image loss through
``render_frame`` — dL/d(vertex, material) flows through scene compile,
intersection attribute resolution, and the wavefront integrator.

Estimator notes: this demo's default loop uses detached sampling — the
sample directions and the discrete closest-hit selection are
stop_gradient'ed, so gradients are exact for shading-path parameters
(albedo, emission) and first-order correct for geometry within the fixed
visibility topology; for this smooth-coverage recovery task the omitted
boundary term is a small bias. When silhouette motion IS the signal,
compose the edge-sampled boundary estimator via
``grad.edges.value_and_grad_with_edges`` (FD-validated in
tests/test_edges.py; the occluder-scale recovery there is exactly the task
detached sampling cannot solve). FD validation for this loop's parameters
lives in tests/test_grad.py (SURVEY.md §4.3).
"""

from __future__ import annotations

import dataclasses
import os

import jax
import jax.numpy as jnp
import numpy as np
import optax

from gpupathtracer_tpu.models.camera import Camera
from gpupathtracer_tpu.models.materials import material_table
from gpupathtracer_tpu.models.scene import GeometrySpec, build_scene, icosphere, plane_spec
from gpupathtracer_tpu.render.renderer import RenderSettings, render_frame


@dataclasses.dataclass
class InverseResult:
    loss_history: list
    albedo_error: float
    vertex_error: float
    final_loss: float


def _demo_setup(width=96, height=96, spp=8, bounces=2, subdivisions=2):
    settings = RenderSettings(
        width=width, height=height, spp=spp, bounces=bounces, seed=1234,
        tri_block=512, intersector="auto", estimator="nee",
    )
    camera = Camera.create(position=(0.0, 0.0, 6.0), fov_deg=45.0, width=width, height=height)
    sphere_mesh = icosphere(subdivisions)
    backdrop = plane_spec((0.0, 0.0, 8.0), (0.0, 0.0, 0.0), (30.0, 30.0, 30.0), mat_id=1)

    def make_scene(albedo, vertex_offsets):
        sphere = GeometrySpec(
            vertices=jnp.asarray(sphere_mesh.vertices) * 1.2 + vertex_offsets,
            normals=jnp.asarray(sphere_mesh.normals),
            uvs=jnp.asarray(sphere_mesh.uvs),
            position=jnp.zeros(3),
            rotation_deg=jnp.zeros(3),
            scale=jnp.ones(3),
            mat_id=0,
        )
        materials = material_table(
            [
                {"type": "diffuse"},
                {"type": "emitter", "emissive_color": (1.0, 1.0, 1.0), "intensity": 3.0},
            ]
        )
        materials = materials.replace(albedo=materials.albedo.at[0].set(albedo))
        return build_scene([sphere, backdrop], materials, pad_to_multiple=512)

    return settings, camera, make_scene, sphere_mesh


def run_inverse_demo(
    steps: int = 100,
    out_dir: str | None = None,
    lr: float = 2e-2,
    checkpoint_path: str | None = None,
    checkpoint_every: int = 1,
    width: int = 96,
    height: int = 96,
    spp: int = 8,
    bounces: int = 2,
    subdivisions: int = 2,
):
    """Optimize albedo + vertex offsets to match the target image.

    With ``checkpoint_path``, (params, optimizer state, step) are saved
    atomically every ``checkpoint_every`` steps (utils/checkpoint.py) and a
    rerun resumes at the first missing step. Per-step RNG seeds are the
    global step index, so an interrupted-and-resumed optimization is
    bit-identical to an uninterrupted one (mirrors the film-checkpoint
    guarantee; tested in tests/test_inverse.py).
    """
    from gpupathtracer_tpu.utils import checkpoint as ckpt

    settings, camera, make_scene, sphere_mesh = _demo_setup(
        width=width, height=height, spp=spp, bounces=bounces, subdivisions=subdivisions
    )
    t_v = sphere_mesh.vertices.shape[0]

    true_albedo = jnp.asarray([0.2, 0.55, 0.85])
    # Target shape: sphere squashed along y by 15% (soup-level offsets).
    base = jnp.asarray(sphere_mesh.vertices) * 1.2
    true_offsets = base * jnp.asarray([0.0, -0.15, 0.0])
    target = render_frame(make_scene(true_albedo, true_offsets), camera, settings)
    target = jax.lax.stop_gradient(target)

    params = {
        "albedo_logit": jnp.zeros((3,)),  # sigmoid → albedo in (0,1)
        "offsets": jnp.zeros((t_v, 3, 3)),
    }
    opt = optax.adam(lr)
    opt_state = opt.init(params)

    start_step = 0
    if checkpoint_path:
        loaded = ckpt.load_train_state(checkpoint_path)
        if loaded is not None:
            params = jax.tree_util.tree_map(jnp.asarray, loaded["params"])
            opt_state = jax.tree_util.tree_map(jnp.asarray, loaded["opt_state"])
            start_step = int(loaded["step"])

    def loss_fn(p, seed):
        albedo = jax.nn.sigmoid(p["albedo_logit"])
        scene = make_scene(albedo, p["offsets"])
        img = render_frame(scene, camera, settings, seed=seed)
        return jnp.mean((img - target) ** 2)

    @jax.jit
    def step(p, s, seed):
        loss, grads = jax.value_and_grad(loss_fn)(p, seed)
        updates, s = opt.update(grads, s, p)
        return optax.apply_updates(p, updates), s, loss

    history = []
    for i in range(start_step, steps):
        params, opt_state, loss = step(params, opt_state, jnp.uint32(i))
        if i % 10 == 0 or i == steps - 1:
            history.append((i, float(loss)))
        if checkpoint_path and ((i + 1) % checkpoint_every == 0 or i == steps - 1):
            ckpt.save_train_state(checkpoint_path, params, opt_state, i + 1)
    if not history:  # fully resumed past the end — report the current loss
        history.append((steps - 1, float(loss_fn(params, jnp.uint32(max(steps - 1, 0))))))

    albedo = jax.nn.sigmoid(params["albedo_logit"])
    albedo_err = float(jnp.max(jnp.abs(albedo - true_albedo)))
    vert_err = float(jnp.mean(jnp.abs(params["offsets"] - true_offsets)))
    result = {
        "steps": steps,
        "final_loss": history[-1][1],
        "albedo_recovered": [round(float(x), 4) for x in albedo],
        "albedo_true": [float(x) for x in true_albedo],
        "albedo_max_err": round(albedo_err, 4),
        "vertex_offset_mae": round(vert_err, 5),
        "loss_history": history,
    }
    if out_dir:
        os.makedirs(out_dir, exist_ok=True)
        from gpupathtracer_tpu.render.film import to_u8
        from gpupathtracer_tpu.utils.image import write_png

        final = render_frame(make_scene(albedo, params["offsets"]), camera, settings)
        write_png(os.path.join(out_dir, "target.png"), to_u8(np.asarray(target)))
        write_png(os.path.join(out_dir, "recovered.png"), to_u8(np.asarray(final)))
    return result
