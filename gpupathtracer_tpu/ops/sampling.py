"""Sampling warps and shading-frame math.

Counter-based deterministic sampling replaces the reference's curand usage
(fixed seed 1234, re-seeded inside every bsdf call with a 1-D thread id —
``utilities.h:109-128``, a documented reference bug, SURVEY.md §2.3.5). Keys
are derived with ``jax.random.fold_in`` over (pixel, sample, bounce) so the
sample sequence is reproducible, layout-invariant, and shard-invariant.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def cosine_sample_hemisphere(u1, u2):
    """The reference's square→cosine-hemisphere warp (utilities.h:46-55).

    r = sqrt(u1), theta = 2*pi*u2 → (r cos θ, r sin θ, sqrt(1-u1)); local
    frame with +z = normal; pdf = cosθ/π (utilities.h:131-138).
    """
    r = jnp.sqrt(u1)
    theta = 2.0 * jnp.pi * u2
    x = r * jnp.cos(theta)
    y = r * jnp.sin(theta)
    z = jnp.sqrt(jnp.maximum(0.0, 1.0 - u1))
    return jnp.stack([x, y, z], axis=-1)


def cosine_hemisphere_pdf(cos_theta):
    return cos_theta / jnp.pi


def make_onb(n):
    """Branchless orthonormal basis around unit normal n (..., 3).

    Duff et al. 2017 "Building an Orthonormal Basis, Revisited" — no
    per-lane control flow, TPU-vectorizes cleanly.
    """
    z = n[..., 2]
    sign = jnp.where(z >= 0.0, 1.0, -1.0)
    a = -1.0 / (sign + z)
    b = n[..., 0] * n[..., 1] * a
    t = jnp.stack(
        [1.0 + sign * n[..., 0] * n[..., 0] * a, sign * b, -sign * n[..., 0]], axis=-1
    )
    bvec = jnp.stack([b, sign + n[..., 1] * n[..., 1] * a, -n[..., 1]], axis=-1)
    return t, bvec


def local_to_world(local, n):
    """Rotate local (+z = normal) directions into the world frame."""
    t, b = make_onb(n)
    return (
        local[..., 0:1] * t + local[..., 1:2] * b + local[..., 2:3] * n
    )


def normalize_dir(v):
    # Clamp inside the sqrt: zero-vector VJP must be 0, not NaN.
    return v / jnp.sqrt(jnp.maximum(jnp.sum(v * v, axis=-1, keepdims=True), 1e-24))


def reflect(d, n):
    """Mirror reflection of incident direction d about normal n."""
    return d - 2.0 * jnp.sum(d * n, axis=-1, keepdims=True) * n


def refract(d, n, eta):
    """Refraction of incident d through normal n with relative IOR eta.

    Returns (refracted_dir, total_internal_reflection_mask). d points into
    the surface; n faces against d (dot(d, n) <= 0).
    """
    cos_i = -jnp.sum(d * n, axis=-1, keepdims=True)
    sin2_t = eta * eta * jnp.maximum(0.0, 1.0 - cos_i * cos_i)
    tir = sin2_t[..., 0] >= 1.0
    # Clamp strictly above 0: sqrt'(0) = inf would NaN the VJP on TIR lanes
    # (inf × zero-cotangent); TIR lanes are masked out anyway.
    cos_t = jnp.sqrt(jnp.clip(1.0 - sin2_t, 1e-12, 1.0))
    refr = eta * d + (eta * cos_i - cos_t) * n
    return refr, tir


def fresnel_schlick(cos_i, eta_i, eta_t):
    """Schlick's Fresnel reflectance approximation."""
    r0 = ((eta_i - eta_t) / (eta_i + eta_t)) ** 2
    return r0 + (1.0 - r0) * (1.0 - cos_i) ** 5


def pixel_sample_key(base_key, pixel_idx, sample_idx):
    """Per-(pixel, sample) keys; bounce-level randomness folds in further.

    vmappable: pixel_idx (R,) int32, sample_idx scalar. Layout-invariant —
    the key depends only on logical pixel/sample ids, never on sharding,
    which is the basis of the multi-host determinism guarantee (SURVEY.md §4.5).
    """
    k = jax.random.fold_in(base_key, sample_idx)
    return jax.vmap(lambda p: jax.random.fold_in(k, p))(pixel_idx)
