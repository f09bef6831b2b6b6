"""On-chip repro/bisect harness for the streamed-kernel compile crash seen in
BENCH_r02 (config6 → tpu_compile_helper SIGABRT).

Builds the config6 scene (or a subdivision-level variant), packs it, and
calls intersect_pallas directly with camera-coherent rays, printing the
stream-plan shapes before launching so a compiler abort is attributable.

Usage: python tools/repro_streamed.py [--rays N] [--precision mixed|highest]
       [--subdiv 3] [--ray-tile 128]
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from gpupathtracer_tpu.models.obj import load_obj, subdivide_mesh
from gpupathtracer_tpu.models.scene import build_scene, mesh_spec
from gpupathtracer_tpu.ops import pallas_intersect
from gpupathtracer_tpu.ops.pallas_intersect import (
    _plan_stream_shape,
    intersect_pallas,
    pack_scene,
)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--rays", type=int, default=640_000)
    ap.add_argument("--precision", default="mixed")
    ap.add_argument("--subdiv", type=int, default=3)
    ap.add_argument("--ray-tile", type=int, default=128)
    ap.add_argument("--cluster-target", type=int, default=None)
    ap.add_argument("--interpret", action="store_true")
    args = ap.parse_args()

    if args.cluster_target is not None:
        pallas_intersect.CLUSTER_TARGET_BYTES = args.cluster_target

    mesh = subdivide_mesh(load_obj("/root/reference/sceneResources/wahoo.obj"), args.subdiv)
    scene = build_scene(
        [mesh_spec(mesh, position=(0.0, -2.0, 0.0), scale=(0.55, 0.55, 0.55))],
        [{"type": "diffuse"}],
        pad_to_multiple=512,
    )
    packed = pack_scene(scene, tri_block=512)
    nb = packed.num_blocks
    resident = packed.w.size * 4 <= pallas_intersect.RESIDENT_BUDGET_BYTES
    r = args.rays
    rt_planned, bpc = _plan_stream_shape(nb, r, args.ray_tile, packed.tri_block)
    nc = -(-((nb + (-nb) % bpc) // bpc) // 1)
    print(
        f"tris={scene.num_triangles} nb={nb} packed_mb={packed.w.size*4/2**20:.1f} "
        f"resident={resident} rays={r} ray_tile={rt_planned} bpc={bpc} "
        f"nclusters={(nb + (-nb) % bpc)//bpc} rt={-(-r//rt_planned)} "
        f"sched_row_kb={((nb + (-nb) % bpc)//bpc) * 4 / 1024:.1f} "
        f"scratch_mb={2*bpc*16*5*512*4/2**20:.2f} precision={args.precision}",
        flush=True,
    )

    rng = np.random.default_rng(0)
    o = jnp.tile(jnp.asarray([[0.0, 1.0, 12.0]], jnp.float32), (r, 1))
    verts = np.asarray(scene.v0)[np.asarray(scene.valid)]
    lo, hi = verts.min(0), verts.max(0)
    targets = rng.uniform(lo, hi, size=(r, 3)).astype(np.float32)
    dirs = targets - np.asarray(o)
    dirs /= np.linalg.norm(dirs, axis=1, keepdims=True)
    d = jnp.asarray(dirs)

    t0 = time.time()
    h = intersect_pallas(
        o, d, packed, ray_tile=args.ray_tile, interpret=args.interpret,
        precision=args.precision,
    )
    h.t.block_until_ready()
    t1 = time.time()
    hits = np.asarray(h.hit)
    print(f"OK compile+run={t1-t0:.1f}s hit_rate={hits.mean():.3f}", flush=True)
    # timed second call
    t0 = time.time()
    h = intersect_pallas(o, d, packed, ray_tile=args.ray_tile, interpret=args.interpret, precision=args.precision)
    h.t.block_until_ready()
    print(f"steady={time.time()-t0:.3f}s", flush=True)


if __name__ == "__main__":
    main()
