"""Material model: the reference's BXDF family as an SoA table.

The reference declares a tagged-union material struct with four types —
EMITTER / DIFFUSE / MIRROR / GLASS (``utilities.h:68-88``) — but implements
only emitter radiance and a half-finished diffuse sample (``utilities.h:90-139``).
This module carries the *full* capability: all four types with physically
consistent sampling (see render/integrator.py for the estimator):

- EMITTER: radiance ``emissive * intensity``, two-sided (utilities.h:96-103).
- DIFFUSE: Lambertian ``albedo/pi`` with cosine-weighted hemisphere sampling
  (the reference's warp, utilities.h:46-55, pdf cos/pi utilities.h:131-138).
- MIRROR: perfect specular reflection scaled by ``specular_color``.
- GLASS: dielectric with Schlick Fresnel reflect/refract, ``refractive_index``
  and ``transmittance_color`` (declared fields, utilities.h:85-88).

Parameters live in a flat SoA table indexed by material id; every float leaf
is differentiable (dL/d(albedo, emissive, intensity, ...) flows).
"""

from __future__ import annotations

import enum

import jax.numpy as jnp
import numpy as np
from flax import struct


class BxdfType(enum.IntEnum):
    """Reference BXDFTyp enum order (utilities.h:68-75)."""

    EMITTER = 0
    DIFFUSE = 1
    MIRROR = 2
    GLASS = 3


@struct.dataclass
class MaterialTable:
    """SoA material parameters; row i = material id i.

    Field set mirrors BXDF's members (utilities.h:83-88).
    """

    type: jnp.ndarray  # (M,) int32 — BxdfType
    albedo: jnp.ndarray  # (M,3)
    specular_color: jnp.ndarray  # (M,3)
    refractive_index: jnp.ndarray  # (M,)
    emissive_color: jnp.ndarray  # (M,3)
    intensity: jnp.ndarray  # (M,)
    transmittance_color: jnp.ndarray  # (M,3)

    @property
    def num_materials(self) -> int:
        return self.type.shape[0]


def material_table(materials: list[dict]) -> MaterialTable:
    """Build a MaterialTable from a list of dicts.

    Each dict: ``{"type": "diffuse"|"emitter"|"mirror"|"glass", "albedo": [r,g,b],
    "specular_color": ..., "refractive_index": f, "emissive_color": ...,
    "intensity": f, "transmittance_color": ...}`` — unspecified fields default
    to the reference's sentinel-free sensible values.
    """
    n = len(materials)
    typ = np.zeros((n,), np.int32)
    albedo = np.zeros((n, 3), np.float32)
    specular = np.ones((n, 3), np.float32)
    ior = np.full((n,), 1.5, np.float32)
    emissive = np.zeros((n, 3), np.float32)
    intensity = np.zeros((n,), np.float32)
    transmit = np.ones((n, 3), np.float32)
    for i, m in enumerate(materials):
        t = m["type"].upper() if isinstance(m.get("type"), str) else m.get("type", "DIFFUSE")
        typ[i] = int(BxdfType[t] if isinstance(t, str) else t)
        albedo[i] = np.asarray(m.get("albedo", (0.5, 0.5, 0.5)), np.float32)
        specular[i] = np.asarray(m.get("specular_color", (1.0, 1.0, 1.0)), np.float32)
        ior[i] = float(m.get("refractive_index", 1.5))
        emissive[i] = np.asarray(m.get("emissive_color", (0.0, 0.0, 0.0)), np.float32)
        intensity[i] = float(m.get("intensity", 0.0))
        transmit[i] = np.asarray(m.get("transmittance_color", (1.0, 1.0, 1.0)), np.float32)
    return MaterialTable(
        type=jnp.asarray(typ),
        albedo=jnp.asarray(albedo),
        specular_color=jnp.asarray(specular),
        refractive_index=jnp.asarray(ior),
        emissive_color=jnp.asarray(emissive),
        intensity=jnp.asarray(intensity),
        transmittance_color=jnp.asarray(transmit),
    )


def no_hit_color() -> jnp.ndarray:
    """The reference's miss color — pink (kernel.h:7-10).

    Note the committed reference path never actually writes it (misses stay at
    the cudaMemset 0 black, kernel.cu:340); we expose both behaviors via the
    render config's ``background`` field.
    """
    return jnp.asarray([1.0, 0.75, 0.79], jnp.float32)
