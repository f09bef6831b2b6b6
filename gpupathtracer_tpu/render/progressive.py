"""Progressive, checkpointed, restartable rendering (SURVEY.md §5 failure
detection / checkpoint-resume).

Renders spp in chunks; after each chunk the accumulated (sum, count) film is
checkpointed. A preempted/killed job rerun with the same arguments resumes
at the first missing sample and produces a bit-identical final image
(sample-exact resume — global sample ids key the RNG). Per-chunk metrics
(rays/sec, samples done) stream to the metrics logger.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from gpupathtracer_tpu.render.film import Film
from gpupathtracer_tpu.render.renderer import RenderSettings, render_samples
from gpupathtracer_tpu.utils import checkpoint as ckpt
from gpupathtracer_tpu.utils.metrics import log_event
from gpupathtracer_tpu.utils.profiling import Timer


def render_progressive(
    scene,
    camera,
    settings: RenderSettings,
    chunk_spp: int = 16,
    checkpoint_path: str | None = None,
    checkpoint_every: int = 1,
    metrics_path: str | None = None,
    on_chunk=None,
):
    """Render ``settings.spp`` samples in chunks; returns mean image (H,W,3).

    ``on_chunk(film: Film) -> None`` is called after every chunk with the
    running accumulator — the hook the live progressive preview
    (cli.py::cmd_view --live) refreshes from.
    """
    h, w = settings.height, settings.width
    film = Film(
        radiance_sum=np.zeros((h, w, 3), np.float32), sample_count=np.float32(0.0)
    )

    if checkpoint_path:
        loaded = ckpt.load_film(checkpoint_path, settings)
        if loaded is not None:
            sum_, done_ = loaded
            film = Film(
                radiance_sum=np.array(sum_, np.float32), sample_count=np.float32(done_)
            )

    chunk_idx = 0
    while int(film.sample_count) < settings.spp:
        done = int(film.sample_count)
        n = min(chunk_spp, settings.spp - done)
        timer = Timer()
        chunk = render_samples(scene, camera, settings, jnp.uint32(done), n)
        chunk = np.asarray(jax.device_get(chunk))
        stats = timer.stop(rays=w * h * n * settings.bounces)
        film = film.add_samples(chunk, n)
        done += n
        chunk_idx += 1
        if metrics_path:
            log_event(
                metrics_path,
                {"event": "chunk", "samples_done": done, "chunk_spp": n, **stats},
            )
        if checkpoint_path and (chunk_idx % checkpoint_every == 0 or done >= settings.spp):
            ckpt.save_film(checkpoint_path, film.radiance_sum, done, settings)
        if on_chunk is not None:
            on_chunk(film)

    return np.asarray(film.to_image())
