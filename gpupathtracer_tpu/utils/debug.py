"""Debug / sanitizer modes (SURVEY.md §5 race detection & sanitizers).

Races are designed out by pure-functional JAX; what remains is numeric and
indexing hygiene:

- ``debug_mode()``: enables jax_debug_nans + disables jit for step-through.
- ``checkify_render``: wraps a render callable with jax.experimental.checkify
  (NaN + out-of-bounds index checks) and returns (error, result).
- Pallas kernels run under ``interpret=True`` on CPU in CI (see
  tests/test_plucker.py), which bounds-checks every ref access.
"""

from __future__ import annotations

import contextlib

import jax


@contextlib.contextmanager
def debug_mode(disable_jit: bool = False):
    jax.config.update("jax_debug_nans", True)
    try:
        if disable_jit:
            with jax.disable_jit():
                yield
        else:
            yield
    finally:
        jax.config.update("jax_debug_nans", False)


def checkify_render(fn):
    """fn(*args) -> (error, out); raise with error.throw() if desired."""
    from jax.experimental import checkify

    checked = checkify.checkify(fn, errors=checkify.float_checks | checkify.index_checks)

    def wrapper(*args, **kwargs):
        return checked(*args, **kwargs)

    return wrapper


def enable_compile_cache(path: str = "/root/.cache/jax_firefly"):
    """Persistent compilation cache — first compiles over the remote-compile
    tunnel cost minutes; cached reruns cost seconds."""
    try:
        jax.config.update("jax_compilation_cache_dir", path)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass
