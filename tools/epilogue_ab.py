"""A/B kernel epilogue variants on the wahoo 640k-ray workload.

Monkeypatches pallas_intersect._kernel_resident with experimental epilogues
and times coherent/incoherent closest-hit calls on the live backend:

  v0  — current epilogue (4 cmp + 3 and, exact div, where, min+argmin)
  v1  — folded compares (max-tree) + sign-space t>eps test, exact div
  v2  — v1 + approx reciprocal (t ordering ~2^-12 rel; values approximate)
  v3  — v1 + packed (t-bits | lane) single int min (argmin folded into min)
  v4  — v1 with split-precision dot: edge columns (s0|s1|s2) at 3-pass bf16,
        D|num at f32-exact — exact t, grazing-edge-only acceptance flips,
        (3·3 + 2·6)/(5·6) = 0.7x the MXU passes of HIGHEST

Also verifies hit agreement vs v0 for each variant.
"""

import functools
import os
import statistics
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl

from gpupathtracer_tpu.models.camera import Camera, generate_rays
from gpupathtracer_tpu.models.scene import build_scene, mesh_spec
from gpupathtracer_tpu.ops import pallas_intersect as pi
from gpupathtracer_tpu.ops.intersect import BIG, EPSILON

INF = float("inf")


def make_kernel(variant: str):
    def kernel(order_ref, enter_ref, feats_ref, alive_ref, w_ref, best_t_ref, best_i_ref,
               *, tb, nb, precision="highest"):
        i = pl.program_id(0)
        feats = feats_ref[:]
        lane_alive = alive_ref[0, 0, :] > 0

        def cond(state):
            j, _bt, _bi, worst = state
            return (j < nb) & (enter_ref[0, 0, j] < worst)

        def body(state):
            j, best_t, best_i, _worst = state
            blk = order_ref[j, i]
            if variant == "v4":
                se = pi._decision_dot(feats, w_ref[blk][:, : 3 * tb], "high")
                st = pi._decision_dot(feats, w_ref[blk][:, 3 * tb :], "highest")
                s0 = se[:, 0 * tb : 1 * tb]
                s1 = se[:, 1 * tb : 2 * tb]
                s2 = se[:, 2 * tb : 3 * tb]
                dd = st[:, 0 * tb : 1 * tb]
                num = st[:, 1 * tb : 2 * tb]
            else:
                s = pi._decision_dot(feats, w_ref[blk], precision)
                s0 = s[:, 0 * tb : 1 * tb]
                s1 = s[:, 1 * tb : 2 * tb]
                s2 = s[:, 2 * tb : 3 * tb]
                dd = s[:, 3 * tb : 4 * tb]
                num = s[:, 4 * tb : 5 * tb]
            if variant == "v0":
                ok = (dd <= -EPSILON) & (s0 <= 0.0) & (s1 <= 0.0) & (s2 <= 0.0)
                t = num / dd
                ok &= t > EPSILON
                t = jnp.where(ok, t, BIG)
                blk_min = jnp.min(t, axis=-1)
                blk_arg = jnp.argmin(t, axis=-1).astype(jnp.int32) + blk * tb
            elif variant == "v4":
                m = jnp.maximum(jnp.maximum(s0, s1), s2)
                ok = (m <= 0.0) & (dd <= -EPSILON) & (num <= EPSILON * dd)
                t = jnp.where(ok, num / dd, BIG)
                blk_min = jnp.min(t, axis=-1)
                blk_arg = jnp.argmin(t, axis=-1).astype(jnp.int32) + blk * tb
            else:
                m = jnp.maximum(jnp.maximum(s0, s1), s2)
                ok = (m <= 0.0) & (dd <= -EPSILON) & (num <= EPSILON * dd)
                if variant == "v2":
                    t = num * pl.reciprocal(dd, approx=True)
                else:
                    t = num / dd
                t = jnp.where(ok, t, BIG)
                if variant == "v3":
                    from jax.experimental.pallas import tpu as pltpu
                    # inf sentinel: low 8 bits are zero, so the masked min
                    # round-trips exactly (BIG's low bits would not).
                    t = jnp.where(ok, t, jnp.float32(INF))
                    tbits = pltpu.bitcast(t, jnp.int32)
                    lane = jax.lax.broadcasted_iota(jnp.int32, t.shape, 1)
                    key = (tbits & jnp.int32(~0xFF)) | lane
                    kmin = jnp.min(key, axis=-1, keepdims=True)  # bitcast needs 2D
                    blk_min = pltpu.bitcast(kmin & jnp.int32(~0xFF), jnp.float32)[:, 0]
                    blk_arg = (kmin[:, 0] & 0xFF) + blk * tb
                else:
                    blk_min = jnp.min(t, axis=-1)
                    blk_arg = jnp.argmin(t, axis=-1).astype(jnp.int32) + blk * tb
            upd = blk_min < best_t
            best_t = jnp.where(upd, blk_min, best_t)
            best_i = jnp.where(upd & (blk_min < BIG), blk_arg, best_i)
            return (j + 1, best_t, best_i, jnp.max(best_t))

        init = (
            jnp.int32(0),
            jnp.where(lane_alive, BIG, -INF),
            jnp.full((feats.shape[0],), -1, jnp.int32),
            jnp.float32(INF),
        )
        _, best_t, best_i, _ = jax.lax.while_loop(cond, body, init)
        best_t_ref[0, 0, :] = best_t
        best_i_ref[0, 0, :] = best_i

    return kernel


def main():
    from gpupathtracer_tpu.utils.debug import enable_compile_cache

    enable_compile_cache()
    scene = build_scene(
        [mesh_spec("/root/reference/sceneResources/wahoo.obj")],
        [{"type": "diffuse"}],
        pad_to_multiple=128,
    )
    packed = pi.pack_scene(scene, tri_block=128)
    cam = Camera.create(position=(0.0, 1.0, 12.0), fov_deg=50.0, width=800, height=800)
    o_c, d_c = generate_rays(cam)
    rng = np.random.default_rng(0)
    o_i = jnp.asarray(rng.uniform(-6, 6, (800 * 800, 3)), jnp.float32)
    di = rng.normal(size=(800 * 800, 3)).astype(np.float32)
    d_i = jnp.asarray(di / np.linalg.norm(di, axis=1, keepdims=True))
    interpret = jax.default_backend() != "tpu"

    base = {}
    for variant in ("v0", "v1", "v4"):
        pi._kernel_resident = make_kernel(variant)
        jax.clear_caches()  # the global jit cache would reuse the old kernel
        pi._launch_resident = jax.jit(
            pi._launch_resident.__wrapped__,
            static_argnames=("ray_tile", "interpret", "precision"),
        )

        for name, (o, d) in (("coh", (o_c, d_c)), ("inc", (o_i, d_i))):
            @jax.jit
            def _wit(h):
                return jnp.sum(h.t.ravel()[::4096])

            def step(i):
                oo = o + jnp.float32(i) * 1e-6
                return float(_wit(pi.intersect_pallas(oo, d, packed, interpret=interpret)))

            t0 = time.perf_counter()
            step(0)
            print(f"{variant} {name}: compiled in {time.perf_counter() - t0:.0f}s", flush=True)
            ts = []
            for i in range(3):
                t0 = time.perf_counter()
                step(100 + i)
                ts.append(time.perf_counter() - t0)
            dt = statistics.median(ts)
            h = pi.intersect_pallas(o, d, packed, interpret=interpret)
            t_arr, tri_arr = np.asarray(h.t), np.asarray(h.tri)
            if variant == "v0":
                base[name] = (t_arr, tri_arr)
                agree = 1.0
                terr = 0.0
            else:
                t0a, tri0 = base[name]
                agree = float((tri_arr == tri0).mean())
                sel = tri0 >= 0
                terr = float(np.abs(t_arr[sel] - t0a[sel]).max()) if sel.any() else 0.0
            print(
                f"{variant} {name}: {dt * 1e3:7.1f} ms  agree={agree:.6f}  max_t_err={terr:.2e}",
                flush=True,
            )


if __name__ == "__main__":
    main()
