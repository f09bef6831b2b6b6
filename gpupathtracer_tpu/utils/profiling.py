"""Tracing / profiling hooks (SURVEY.md §5).

- ``trace(dir)``: jax.profiler trace context (TensorBoard/Perfetto capture)
  around any render; wired to the CLI's ``--profile-dir``.
- ``scope(name)``: jax.named_scope for phase attribution (gen / intersect /
  shade / compact show up named in profiles).
- ``Timer``: wall-clock + rays/sec accounting with forced materialization
  (block_until_ready is not reliable over the axon tunnel — a scalar
  reduction transfer is).
"""

from __future__ import annotations

import contextlib
import time

import jax
import jax.numpy as jnp


@contextlib.contextmanager
def trace(profile_dir: str | None):
    if not profile_dir:
        yield
        return
    jax.profiler.start_trace(profile_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def scope(name: str):
    return jax.named_scope(name)


def force(x) -> float:
    """Force execution of x's computation; returns a scalar witness."""
    leaves = jax.tree_util.tree_leaves(x)
    return float(jnp.sum(leaves[0].astype(jnp.float32).ravel()[:1]))


class Timer:
    def __init__(self):
        self.t0 = time.perf_counter()

    def stop(self, rays: int | None = None) -> dict:
        dt = time.perf_counter() - self.t0
        out = {"seconds": round(dt, 4)}
        if rays:
            out["rays_per_sec"] = round(rays / max(dt, 1e-9), 1)
        return out
