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
    return {
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


if __name__ == "__main__":
    print(json.dumps(run_benchmark()))
