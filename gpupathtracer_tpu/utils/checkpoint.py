"""Checkpoint / resume (SURVEY.md §5): sample-exact film checkpoints and
optimizer-state checkpoints.

The reference's only persistence is a broken PPM dump (utilities.h:842-856,
SURVEY.md §2.3.10). Here:

- **Film checkpoints**: (radiance_sum, samples_done, seed, config digest) as
  an .npz — resuming continues the *same* sample sequence (global sample ids
  key the RNG, render/renderer.py::accumulate_radiance), so an interrupted
  render finishes bit-identical to an uninterrupted one (fault-tolerance
  test in tests/test_checkpoint.py).
- **Train checkpoints**: params + optax state pytrees for the
  inverse-rendering loop.

Writes are atomic (tmp + rename) so a kill mid-write never corrupts the
latest checkpoint.
"""

from __future__ import annotations

import hashlib
import json
import os
import pickle

import numpy as np

FILM_VERSION = 1


def settings_digest(settings) -> str:
    """Stable digest of the render settings that define the sample sequence."""
    payload = json.dumps(
        {k: getattr(settings, k) for k in (
            "width", "height", "spp", "bounces", "seed", "jitter", "background",
            "estimator", "use_shading_normals",
        )},
        sort_keys=True,
        default=str,
    )
    return hashlib.sha256(payload.encode()).hexdigest()[:16]


def _atomic_save(path: str, save_fn):
    tmp = path + ".tmp"
    save_fn(tmp)
    os.replace(tmp, path)


def save_film(path: str, radiance_sum: np.ndarray, samples_done: int, settings) -> None:
    # np.savez appends .npz to names lacking it — keep the tmp name compliant.
    tmp = path + ".tmp.npz"
    np.savez_compressed(
        tmp,
        version=FILM_VERSION,
        radiance_sum=np.asarray(radiance_sum, np.float32),
        samples_done=np.int64(samples_done),
        digest=settings_digest(settings),
    )
    os.replace(tmp, path)


def load_film(path: str, settings):
    """Returns (radiance_sum, samples_done) or None if absent/mismatched."""
    if not os.path.exists(path):
        return None
    with np.load(path, allow_pickle=False) as z:
        if int(z["version"]) != FILM_VERSION:
            return None
        if str(z["digest"]) != settings_digest(settings):
            return None  # different workload — never mix sample sequences
        return np.asarray(z["radiance_sum"]), int(z["samples_done"])


def save_train_state(path: str, params, opt_state, step: int) -> None:
    import jax

    payload = {
        "step": step,
        "params": jax.tree_util.tree_map(lambda x: np.asarray(x), params),
        "opt_state": jax.tree_util.tree_map(lambda x: np.asarray(x), opt_state),
    }

    def write(p):
        with open(p, "wb") as f:
            pickle.dump(payload, f)

    _atomic_save(path, write)


def load_train_state(path: str):
    if not os.path.exists(path):
        return None
    with open(path, "rb") as f:
        return pickle.load(f)
