"""Microbenchmark sweep of the Pallas closest-hit kernel: precision x tile sizes.

Measures per-call latency of intersect_pallas on the wahoo scene (config 3)
for coherent primary rays and incoherent (shuffled-direction) rays, and
checks hit parity against the current HIGHEST-precision kernel.

Usage: python tools/kernel_sweep.py [--precision HIGH|HIGHEST|DEFAULT] ...
"""

import argparse
import os
import statistics
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

import jax
import jax.numpy as jnp
import numpy as np


def make_rays(camera, shuffle_seed=None):
    from gpupathtracer_tpu.models.camera import generate_rays

    o, d = generate_rays(camera)
    if shuffle_seed is not None:
        perm = jax.random.permutation(jax.random.PRNGKey(shuffle_seed), d.shape[0])
        d = d[perm]
    return jax.device_put(o), jax.device_put(d)


def bench_call(fn, o, d, iters=5):
    # Force execution with a scalar materialization (axon caching: vary input
    # by a tiny per-iter jitter on origin that cannot change hits).
    times = []
    for i in range(iters + 1):
        oo = o + (i * 1e-9)
        t0 = time.perf_counter()
        h = fn(oo, d)
        s = float(jnp.sum(h.t[:16])) + float(jnp.sum(h.tri[:16]))
        dt = time.perf_counter() - t0
        if i > 0:
            times.append(dt)
    return statistics.median(times)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--tri-blocks", type=int, nargs="*", default=[256, 512])
    ap.add_argument("--ray-tiles", type=int, nargs="*", default=[256, 512])
    ap.add_argument("--iters", type=int, default=5)
    args = ap.parse_args()

    from gpupathtracer_tpu.ops import pallas_intersect as pi
    from gpupathtracer_tpu.utils.config import load_scene_file

    scene, camera, settings = load_scene_file(os.path.join(REPO, "scenes", "config3_wahoo.toml"))
    o, d = make_rays(camera)
    oi, di = make_rays(camera, shuffle_seed=7)

    ref_hit = {}
    for tb in args.tri_blocks:
        packed = pi.pack_scene(scene, tri_block=tb)
        nb = packed.num_blocks
        for rt in args.ray_tiles:
            fn = jax.jit(lambda o, d, p=packed, rt=rt: pi.intersect_pallas(o, d, p, ray_tile=rt))
            t_coh = bench_call(fn, o, d, args.iters)
            t_inc = bench_call(fn, oi, di, args.iters)
            h = fn(o, d)
            key = "ref"
            if key not in ref_hit:
                ref_hit[key] = (np.asarray(h.tri), np.asarray(h.t))
            tri_ref, t_ref = ref_hit[key]
            mism = int(np.sum(np.asarray(h.tri) != tri_ref))
            print(
                f"tb={tb:4d} nb={nb:3d} rt={rt:4d}: coherent {t_coh*1e3:7.1f} ms, "
                f"incoherent {t_inc*1e3:7.1f} ms, tri-mismatch {mism}"
            )


if __name__ == "__main__":
    main()
