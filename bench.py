"""Benchmark harness: rays/sec/chip on the headline workload (BASELINE.md).

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

Workload: BASELINE.json config 3 (wahoo.obj, 800x800, 4 bounces) — the
reference's own default frame cost regime (kernel.cu:262-266 at 800x800;
SURVEY.md §6). "Rays" counts path segments: width*height*spp*bounces, the
same accounting as the reference's pixels*bounces SIMT launch.

The reference publishes no numbers (BASELINE.json "published": {}), so
vs_baseline is measured against this repo's own round-1 recorded figure
(ROUND1_RAYS_PER_SEC below) — progress across rounds is the meaningful ratio.
"""

from __future__ import annotations

import dataclasses
import json
import os
import statistics
import sys
import time

REPO = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, REPO)

# Round-1 first light (brute-force jnp intersector, single v5e chip).
ROUND1_RAYS_PER_SEC = 3.2e6


def run_benchmark(
    scene_path: str | None = None,
    warmup: int = 1,
    iters: int = 3,
    spp: int = 4,
    backward: bool = False,
):
    import jax

    from gpupathtracer_tpu.render.renderer import render_frame
    from gpupathtracer_tpu.utils.config import load_scene_file
    from gpupathtracer_tpu.utils.debug import enable_compile_cache

    enable_compile_cache()

    scene_path = scene_path or os.path.join(REPO, "scenes", "config3_wahoo.toml")
    scene, camera, settings = load_scene_file(scene_path)
    settings = dataclasses.replace(settings, spp=spp)

    import jax.numpy as jnp

    @jax.jit
    def _sum(img):
        return jnp.sum(img)

    def step(i):
        # Distinct seed per call: the axon PJRT layer caches identical
        # executions (same executable + same inputs). And block_until_ready
        # does not actually block over the axon tunnel — force execution by
        # materializing a scalar reduction of the frame.
        return float(_sum(render_frame(scene, camera, settings, seed=jnp.uint32(1000 + i))))

    t0 = time.perf_counter()
    for i in range(max(warmup, 1)):
        step(i)
    compile_s = time.perf_counter() - t0

    times = []
    for i in range(iters):
        t0 = time.perf_counter()
        step(100 + i)
        times.append(time.perf_counter() - t0)

    rays = settings.width * settings.height * settings.spp * settings.bounces
    dt = statistics.median(times)
    value = rays / dt

    result = {
        "metric": "rays_per_sec_chip_fwd",
        "value": round(value, 1),
        "unit": "rays/s",
        "vs_baseline": round(value / ROUND1_RAYS_PER_SEC, 3),
        "config": os.path.basename(scene_path),
        "spp": settings.spp,
        "bounces": settings.bounces,
        "resolution": [settings.width, settings.height],
        "median_s": round(dt, 4),
        "warmup_s": round(compile_s, 2),
        "device": str(jax.devices()[0]),
    }

    if backward:
        result["fwd_bwd"] = _backward_bench(scene, camera, settings, iters)
    return result


def _backward_bench(scene, camera, settings, iters: int):
    """Forward+backward rays/sec: grad of an image loss wrt materials +
    vertices through the full estimator (spp=1 workload, scaled metric)."""
    import dataclasses

    import jax
    import jax.numpy as jnp

    settings = dataclasses.replace(settings, spp=1)

    def loss(v0, albedo, seed):
        s = scene.replace(
            v0=v0, materials=scene.materials.replace(albedo=albedo)
        )
        from gpupathtracer_tpu.render.renderer import render_frame

        return jnp.mean(render_frame(s, camera, settings, seed=seed))

    grad_fn = jax.jit(jax.grad(loss, argnums=(0, 1)))

    def step(i):
        g0, g1 = grad_fn(scene.v0, scene.materials.albedo, jnp.uint32(i))
        return float(jnp.sum(g0.ravel()[0:1])) + float(jnp.sum(g1.ravel()[0:1]))

    t0 = time.perf_counter()
    step(0)
    compile_s = time.perf_counter() - t0
    times = []
    for i in range(iters):
        t0 = time.perf_counter()
        step(1 + i)
        times.append(time.perf_counter() - t0)
    dt = statistics.median(times)
    rays = settings.width * settings.height * 1 * settings.bounces
    return {
        "rays_per_sec": round(rays / dt, 1),
        "median_s": round(dt, 4),
        "warmup_s": round(compile_s, 2),
    }


def run_scaling_probe(n_devices: int = 8):
    """Mesh-scaling structure check on virtual CPU devices (no perf claim)."""
    import jax

    jax.config.update("jax_platforms", "cpu")
    import __graft_entry__ as ge

    ge.dryrun_multichip(n_devices)


if __name__ == "__main__":
    print(json.dumps(run_benchmark()))
