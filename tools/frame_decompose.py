"""Decompose the config-3 frame: which stage owns the wall time?

Times isolated jitted stages at 640k rays on the live backend:
  raygen     — pixel keys + jittered primary rays
  intersect  — one closest-hit call (coherent primary rays)
  bounce     — one full integrator bounce (intersect + resolve + shade)
  sample     — trace_paths, 4 bounces (with compaction)
  frame      — render_frame, spp=4 (the headline workload)

Every step varies a traced input and materializes a scalar (axon caching,
BASELINE.md round-1 notes).
"""

import dataclasses
import os
import statistics
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

import jax
import jax.numpy as jnp


def timeit(fn, iters=3):
    fn(0)
    ts = []
    for i in range(iters):
        t0 = time.perf_counter()
        fn(100 + i)
        ts.append(time.perf_counter() - t0)
    return statistics.median(ts)


def main():
    from gpupathtracer_tpu.models.camera import generate_rays_for_pixels
    from gpupathtracer_tpu.ops import pallas_intersect as pi
    from gpupathtracer_tpu.ops import sampling
    from gpupathtracer_tpu.render.integrator import (
        IntegratorOptions,
        init_path_state,
        make_bounce_fn,
        trace_paths,
    )
    from gpupathtracer_tpu.render.renderer import render_frame, _integrator_options
    from gpupathtracer_tpu.utils.config import load_scene_file
    from gpupathtracer_tpu.utils.debug import enable_compile_cache

    enable_compile_cache()
    scene, camera, settings = load_scene_file(
        os.path.join(REPO, "scenes", "config3_wahoo.toml")
    )
    settings = dataclasses.replace(settings, spp=4)
    opts = _integrator_options(settings)
    packed = pi.pack_scene(scene, tri_block=settings.tri_block)
    r = settings.width * settings.height
    pixel_idx = jnp.arange(r, dtype=jnp.uint32)
    sampler = sampling.make_sampler(settings.rng)
    interpret = jax.default_backend() != "tpu"

    @jax.jit
    def raygen(seed):
        keys = sampler.path_keys(jax.random.PRNGKey(seed), pixel_idx, 0)
        uv = sampler.uniform(sampler.fold(keys, 0xA11A), 2)
        o, d = generate_rays_for_pixels(camera, pixel_idx, uv)
        return jnp.sum(o.ravel()[::4096]) + jnp.sum(d.ravel()[::4096])

    keys0 = sampler.path_keys(jax.random.PRNGKey(0), pixel_idx, 0)
    uv0 = sampler.uniform(sampler.fold(keys0, 0xA11A), 2)
    o0, d0 = generate_rays_for_pixels(camera, pixel_idx, uv0)

    @jax.jit
    def intersect_only(eps):
        h = pi.intersect_pallas(
            o0 + eps, d0, packed, interpret=interpret, precision=settings.kernel_precision
        )
        return jnp.sum(h.t.ravel()[::4096])

    bounce = make_bounce_fn(scene, opts, packed=packed)

    @jax.jit
    def bounce_once(eps):
        st = init_path_state(o0 + eps, d0, keys0)
        st = bounce(st, jnp.int32(0), compact_now=False)
        return jnp.sum(st[3].ravel()[::4096])

    @jax.jit
    def bounce_compacted(eps):
        st = init_path_state(o0 + eps, d0, keys0)
        st = bounce(st, jnp.int32(1), compact_now=True)
        return jnp.sum(st[3].ravel()[::4096])

    @jax.jit
    def sample_once(seed):
        keys = sampler.path_keys(jax.random.PRNGKey(seed), pixel_idx, 0)
        rad = trace_paths(scene, o0, d0, keys, opts, packed=packed)
        return jnp.sum(rad.ravel()[::4096])

    def frame(i):
        img = render_frame(scene, camera, settings, seed=jnp.uint32(i))
        return float(jnp.sum(img))

    stages = [
        ("raygen+keys", lambda i: float(raygen(jnp.uint32(i)))),
        ("intersect x1", lambda i: float(intersect_only(jnp.float32(i * 1e-6)))),
        ("bounce0 (no compact)", lambda i: float(bounce_once(jnp.float32(i * 1e-6)))),
        ("bounce1 (compacted)", lambda i: float(bounce_compacted(jnp.float32(i * 1e-6)))),
        ("sample (4 bounces)", lambda i: float(sample_once(jnp.uint32(i)))),
        ("frame (spp=4)", frame),
    ]
    for name, fn in stages:
        dt = timeit(fn)
        print(f"{name:22s}: {dt * 1e3:8.1f} ms", flush=True)


if __name__ == "__main__":
    main()
