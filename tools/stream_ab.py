"""Round-5 streamed-kernel A/B ladder: frame time of config6 (and optionally
config7) under (STREAM_RAY_TILE, CLUSTER_TARGET_BYTES) combinations.

Constants are read from env at import, so each combination runs in a fresh
subprocess:

    setsid nohup python tools/stream_ab.py > /tmp/stream_ab.log 2>&1 &
"""

import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

CHILD = r"""
import dataclasses, json, os, statistics, sys, time
sys.path.insert(0, %(repo)r)
import jax, jax.numpy as jnp
from gpupathtracer_tpu.render.renderer import render_frame
from gpupathtracer_tpu.utils.config import load_scene_file
from gpupathtracer_tpu.utils.debug import enable_compile_cache
enable_compile_cache()
scene, camera, settings = load_scene_file(os.path.join(%(repo)r, "scenes", %(cfg)r))
settings = dataclasses.replace(settings, spp=%(spp)d, tri_block=%(tri_block)d)
@jax.jit
def _sum(img):
    return jnp.sum(img)
def step(i):
    return float(_sum(render_frame(scene, camera, settings, seed=jnp.uint32(1000 + i))))
t0 = time.perf_counter(); step(0); compile_s = time.perf_counter() - t0
ts = []
for i in range(2):
    t0 = time.perf_counter(); step(100 + i); ts.append(time.perf_counter() - t0)
dt = statistics.median(ts)
rays = settings.width * settings.height * settings.spp * settings.bounces
print("RESULT " + json.dumps({"median_s": round(dt, 3), "rays_per_sec": round(rays/dt, 1),
                              "compile_s": round(compile_s, 1)}))
"""


def run_one(cfg, spp, tile, cbytes, budget=0, subtiles=1, tri_block=512):
    env = dict(os.environ)
    env["FIREFLY_STREAM_RAY_TILE"] = str(tile)
    env["FIREFLY_CLUSTER_BYTES"] = str(cbytes)
    env["FIREFLY_STREAM_BUDGET"] = str(budget)
    env["FIREFLY_STREAM_SUBTILES"] = str(subtiles)
    code = CHILD % {"repo": REPO, "cfg": cfg, "spp": spp, "tri_block": tri_block}
    p = subprocess.run([sys.executable, "-c", code], env=env, capture_output=True, text=True,
                       timeout=1200)
    tag = {"cfg": cfg, "tile": tile, "cluster_kb": cbytes // 1024, "budget": budget,
           "subtiles": subtiles, "tri_block": tri_block}
    for line in p.stdout.splitlines():
        if line.startswith("RESULT "):
            print(json.dumps({**tag, **json.loads(line[7:])}), flush=True)
            return
    print(json.dumps({**tag, "error": (p.stderr or p.stdout)[-400:]}), flush=True)


if __name__ == "__main__":
    import ast

    combos = ast.literal_eval(sys.argv[1]) if len(sys.argv) > 1 else [
        (64, 1 << 20, 0, 1),
    ]
    for combo in combos:
        run_one("config6_bigscene.toml", 2, *combo)
