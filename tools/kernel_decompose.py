"""Decompose intersect_pallas latency: pre-pass (mask/order) vs pallas launch.

Times three jitted stages separately on the wahoo scene at 640k rays:
  A. pack_rays only
  B. tile_block_mask + plan_block_order only
  C. _launch only (order/enter precomputed, fed back in)
  D. full intersect_pallas
"""

import os
import statistics
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

import jax
import jax.numpy as jnp


def timeit(fn, *a, iters=5):
    ts = []
    for i in range(iters + 1):
        t0 = time.perf_counter()
        out = fn(*a, jnp.float32(i * 1e-9))
        jax.tree.map(lambda x: x.block_until_ready(), out)
        s = float(jnp.sum(jax.tree.leaves(out)[0].ravel()[:4].astype(jnp.float32)))
        dt = time.perf_counter() - t0
        if i:
            ts.append(dt)
    return statistics.median(ts)


def main():
    from gpupathtracer_tpu.models.camera import generate_rays
    from gpupathtracer_tpu.ops import pallas_intersect as pi
    from gpupathtracer_tpu.ops.plucker import pack_rays
    from gpupathtracer_tpu.utils.config import load_scene_file

    scene, camera, settings = load_scene_file(os.path.join(REPO, "scenes", "config3_wahoo.toml"))
    packed = pi.pack_scene(scene, tri_block=512)
    o, d = generate_rays(camera)
    perm = jax.random.permutation(jax.random.PRNGKey(7), d.shape[0])
    oi, di = o, d[perm]
    rt = 256

    @jax.jit
    def stage_a(o, d, eps):
        return pack_rays(o + eps, d)

    @jax.jit
    def stage_b(o, d, eps):
        mask, enter = pi.tile_block_mask(o + eps, d, packed, rt)
        return pi.plan_block_order(mask, enter)

    order, enter_sorted = stage_b(o, d, jnp.float32(0))
    feats = stage_a(o, d, jnp.float32(0))

    @jax.jit
    def stage_c(order, enter_sorted, feats, eps):
        return pi._launch(order, enter_sorted, feats + eps, packed.w, rt, False)

    @jax.jit
    def stage_d(o, d, eps):
        h = pi.intersect_pallas(o + eps, d, packed, ray_tile=rt)
        return h.t, h.tri

    for name, rays in [("coherent", (o, d)), ("incoherent", (oi, di))]:
        oo, dd = rays
        ta = timeit(stage_a, oo, dd)
        tb = timeit(stage_b, oo, dd)
        ob, eb = stage_b(oo, dd, jnp.float32(0))
        fb = stage_a(oo, dd, jnp.float32(0))
        tc = timeit(lambda a1, a2, a3, eps: stage_c(a1, a2, a3, eps), ob, eb, fb)
        td = timeit(stage_d, oo, dd)
        print(
            f"{name:10s}: pack_rays {ta*1e3:6.1f} ms | mask+order {tb*1e3:6.1f} ms | "
            f"launch {tc*1e3:6.1f} ms | full {td*1e3:6.1f} ms"
        )


if __name__ == "__main__":
    main()
