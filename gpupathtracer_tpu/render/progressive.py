"""Progressive, checkpointed, restartable rendering (SURVEY.md §5 failure
detection / checkpoint-resume).

Renders spp in chunks; after each chunk the accumulated (sum, count) film is
checkpointed. A preempted/killed job rerun with the same arguments resumes
at the first missing sample and produces a bit-identical final image
(sample-exact resume — global sample ids key the RNG). Per-chunk metrics
(rays/sec, samples done) stream to the metrics logger.
"""

from __future__ import annotations

import time

import jax
import jax.numpy as jnp
import numpy as np

from gpupathtracer_tpu.render.renderer import RenderSettings, render_samples
from gpupathtracer_tpu.utils import checkpoint as ckpt
from gpupathtracer_tpu.utils.metrics import log_event


def render_progressive(
    scene,
    camera,
    settings: RenderSettings,
    chunk_spp: int = 16,
    checkpoint_path: str | None = None,
    checkpoint_every: int = 1,
    metrics_path: str | None = None,
):
    """Render ``settings.spp`` samples in chunks; returns mean image (H,W,3)."""
    h, w = settings.height, settings.width
    film = np.zeros((h, w, 3), np.float32)
    done = 0

    if checkpoint_path:
        loaded = ckpt.load_film(checkpoint_path, settings)
        if loaded is not None:
            film, done = loaded
            film = np.array(film, np.float32)

    chunk_idx = 0
    while done < settings.spp:
        n = min(chunk_spp, settings.spp - done)
        t0 = time.perf_counter()
        chunk = render_samples(scene, camera, settings, jnp.uint32(done), n)
        chunk = np.asarray(jax.device_get(chunk))
        dt = time.perf_counter() - t0
        film = film + chunk
        done += n
        chunk_idx += 1
        if metrics_path:
            log_event(
                metrics_path,
                {
                    "event": "chunk",
                    "samples_done": done,
                    "chunk_spp": n,
                    "seconds": round(dt, 4),
                    "rays_per_sec": round(w * h * n * settings.bounces / max(dt, 1e-9), 1),
                },
            )
        if checkpoint_path and (chunk_idx % checkpoint_every == 0 or done >= settings.spp):
            ckpt.save_film(checkpoint_path, film, done, settings)

    return film / max(done, 1)
