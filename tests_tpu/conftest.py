"""On-chip test suite: runs against the REAL default backend (no CPU pin).

The main ``tests/`` suite pins JAX to CPU (+8 virtual devices) so it runs
anywhere; everything here instead requires a live TPU and is skipped
otherwise. Run on hardware with:  python -m pytest tests_tpu/ -q
"""

import jax
import pytest

from gpupathtracer_tpu.utils.debug import enable_compile_cache

enable_compile_cache()


def pytest_collection_modifyitems(config, items):
    if jax.default_backend() in ("tpu", "axon"):
        return
    skip = pytest.mark.skip(reason="requires a TPU backend")
    for item in items:
        item.add_marker(skip)
