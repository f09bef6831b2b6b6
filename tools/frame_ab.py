"""Frame-level A/B of intersect settings on the headline workload (config 3).

Each variant renders 800x800, spp=4, 4 bounces; prints median frame seconds.
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


def main():
    from gpupathtracer_tpu.render.renderer import render_frame
    from gpupathtracer_tpu.utils.config import load_scene_file
    from gpupathtracer_tpu.utils.debug import enable_compile_cache

    enable_compile_cache()
    scene, camera, settings = load_scene_file(os.path.join(REPO, "scenes", "config3_wahoo.toml"))
    settings = dataclasses.replace(settings, spp=4)

    import sys as _sys

    all_variants = {
        "coherent": ("tb128 coherent-compact", dict(tri_block=128, sort_rays=True, compact=True)),
        "permute": ("tb128 permute-compact", dict(tri_block=128, sort_rays=False, compact=True)),
        "hybrid": ("tb128 hybrid-compact", dict(tri_block=128, compact=True, compact_mode="hybrid")),
        "mask": ("tb128 mask-compact", dict(tri_block=128, compact=True, compact_mode="mask")),
        "off": ("tb128 no-compact", dict(tri_block=128, compact=False)),
    }
    names = _sys.argv[1:] or ["permute", "hybrid"]
    variants = [all_variants[n] for n in names]
    for name, kw in variants:
        s = dataclasses.replace(settings, **kw)

        def step(i):
            img = render_frame(scene, camera, s, seed=jnp.uint32(1000 + i))
            return float(jnp.sum(img))

        t0 = time.perf_counter()
        step(0)
        compile_s = time.perf_counter() - t0
        ts = []
        for i in range(3):
            t0 = time.perf_counter()
            step(100 + i)
            ts.append(time.perf_counter() - t0)
        print(f"{name:24s}: {statistics.median(ts):.3f} s  (compile {compile_s:.0f} s)", flush=True)


if __name__ == "__main__":
    main()
