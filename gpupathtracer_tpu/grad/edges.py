"""Silhouette (visibility) gradients via edge sampling — SURVEY.md §7.3's
"crux of differentiable".

The detached-sampling estimator (ops/intersect.py gradient design) treats the
visibility function as constant: pixel gradients are exact for shading
parameters but miss the BOUNDARY term — the motion of silhouettes — so
dL/d(vertex) is first-order wrong whenever occlusion changes (the round-1
VERDICT's top gap; the reference's latent differentiation target is the full
estimator over the visibility computed at kernel.cu:127-176).

This module estimates the primary-visibility boundary integral by explicit
edge sampling (the method of "Differentiable Monte Carlo Ray Tracing through
Edge Sampling", Li et al. 2018, re-derived for this renderer's box pixel
filter — no reference code consulted):

    dI_p/dθ  +=  ∫_{silhouette edges}  (f_in − f_out)(x) · (n̂ · dx_s/dθ) dl_s

where x_s is the edge point in SCREEN (pixel) coordinates, n̂ the screen
normal of the edge pointing away from the occluder, f_in/f_out the radiance
just inside/outside the silhouette, and the integral runs over screen arc
length within pixel p. Derivation: I_p = ∫_pixel f du dv (the spp-jittered
box filter); moving the edge by δ along n̂ sweeps a strip dl·δ whose
integrand jumps from f_out to f_in.

Estimator structure (all TPU-friendly, static shapes):
1. a host-side edge table (unique edges + face adjacency, built once per
   topology by hashing quantized endpoints);
2. silhouette classification against the camera (front ⊕ front, or boundary
   edges of front faces) — data, not shape;
3. importance sampling of edge points ∝ screen chord length (categorical
   over edges, uniform in the edge parameter, exact |dx_s/ds| Jacobian);
4. f_in/f_out traced with the regular wavefront estimator through screen
   points nudged ±ε pixels across the edge — occluded silhouettes
   contribute Δf ≈ 0 automatically, so no explicit visibility test;
5. the θ-dependence enters ONLY through the projected edge point
   x_s(θ) = screen(camera, (1−s)·v_a(θ) + s·v_b(θ)); a single jax.grad of
   the scalar Σ w·(n̂·x_s(θ)) with detached weights w yields dL/dθ for any
   parameter pytree feeding the scene build (vertices, TRS, ...).

Scope: PRIMARY visibility (camera silhouettes). Shadow (NEE) boundary terms
use the same table via ``shadow_edge_gradient`` (silhouettes classified per
shading point against sampled light points). Interior (shading) terms come
from the detached estimator; ``value_and_grad_with_edges`` composes both.
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from gpupathtracer_tpu.models.camera import (
    Camera,
    generate_rays_for_pixels,
    projection_matrix,
    view_matrix,
)
from gpupathtracer_tpu.models.scene import TriangleScene
from gpupathtracer_tpu.ops.sampling import make_sampler
from gpupathtracer_tpu.render.integrator import trace_paths
from gpupathtracer_tpu.render.renderer import (
    RenderSettings,
    _integrator_options,
    narrow_settings,
    render_frame,
)

# Above this edge count, shadow_edge_gradient switches to the two-level
# cluster hierarchy (EdgeClusters) automatically.
_HIER_EDGE_THRESHOLD = 8192


@dataclasses.dataclass(frozen=True)
class EdgeTable:
    """Unique mesh edges with face adjacency (host-built, topology-static).

    Edge e is corner ``corner[e]`` of triangle ``tri1[e]`` — endpoints
    (P_corner, P_corner+1 mod 3) of that triangle — shared with ``tri2[e]``
    (-1 for boundary edges). ``two_sided`` marks edges whose owner triangle
    is two-sided (silhouette rules differ, see silhouette_flags).
    """

    tri1: np.ndarray  # (E,) int32
    corner: np.ndarray  # (E,) int32 in {0,1,2}
    tri2: np.ndarray  # (E,) int32, -1 = boundary
    two_sided: np.ndarray  # (E,) bool

    @property
    def num_edges(self) -> int:
        return self.tri1.shape[0]


def build_edge_table(scene: TriangleScene, native: bool = True) -> EdgeTable:
    """Hash quantized endpoint pairs → unique edges + adjacency.

    Works on triangle soups (the scene format): duplicated vertices merge by
    position quantization (1e-5 of the bbox diagonal). Non-manifold extras
    (>2 faces on an edge) keep the first two faces. The C++ builder
    (native/firefly_native.cpp::edge_table_build) is used when available
    (identical output, tests/test_native.py); this Python loop is the
    always-available oracle.
    """
    if native:
        from gpupathtracer_tpu import native as native_mod

        if native_mod.available():
            return native_mod.build_edge_table_native(scene)
    v0 = np.asarray(scene.v0)
    e1 = np.asarray(scene.e1)
    e2 = np.asarray(scene.e2)
    valid = np.asarray(scene.valid)
    two = np.asarray(scene.two_sided)
    corners = np.stack([v0, v0 + e1, v0 + e2], axis=1)  # (T, 3, 3)

    live = np.where(valid)[0]
    pts = corners[live].reshape(-1, 3)
    diag = float(np.linalg.norm(pts.max(0) - pts.min(0))) if pts.size else 1.0
    q = 1e-5 * max(diag, 1e-12)
    qc = np.round(corners / q).astype(np.int64)  # (T, 3, 3) quantized

    edges: dict[tuple, list] = {}
    for t in live:
        for k in range(3):
            a = tuple(qc[t, k])
            b = tuple(qc[t, (k + 1) % 3])
            key = (a, b) if a <= b else (b, a)
            rec = edges.get(key)
            if rec is None:
                edges[key] = [t, k, -1]
            elif rec[2] == -1 and rec[0] != t:
                rec[2] = t
    tri1 = np.asarray([r[0] for r in edges.values()], np.int32)
    corner = np.asarray([r[1] for r in edges.values()], np.int32)
    tri2 = np.asarray([r[2] for r in edges.values()], np.int32)
    return EdgeTable(tri1=tri1, corner=corner, tri2=tri2, two_sided=two[tri1])


@dataclasses.dataclass(frozen=True)
class EdgeClusters:
    """Two-level edge hierarchy for per-shading-point silhouette sampling.

    Edges are Morton-sorted by midpoint and grouped into fixed-size
    clusters; each cluster carries conservative bounds sufficient to decide
    "can this cluster contain a silhouette edge wrt point x" in O(1):

    - componentwise bounds of the adjacent-face normals (``gn_lo``/``gn_hi``)
      and of their plane constants ``dot(gn, v0)`` (``c_lo``/``c_hi``):
      the sign interval of ``dot(gn_i, x) − c_i`` over the cluster's faces
      decides all-front / all-back / mixed — only mixed clusters (or ones
      holding boundary / two-sided-boundary edges) can silhouette;
    - an endpoint AABB (``box_lo``/``box_hi``) whose angular size from x
      proxies the cluster's total direction-chord for importance weighting.

    Replaces the flat O(points × edges) classification
    (``grad/edges.py`` round-3, VERDICT item 5) with
    O(points × clusters + points × cluster_size): per point, one cluster is
    sampled ∝ its conservative weight, then exact silhouette chords are
    computed for that cluster's edges only. Conservativeness ⇒ every edge
    with a nonzero true chord has nonzero pick probability ⇒ the estimator
    stays unbiased; the hierarchy affects variance only.
    """

    size: int  # edges per cluster (last cluster padded with -1)
    edge_ids: np.ndarray  # (C, size) int32, -1 padding
    gn_lo: np.ndarray  # (C, 3)
    gn_hi: np.ndarray  # (C, 3)
    c_lo: np.ndarray  # (C,)
    c_hi: np.ndarray  # (C,)
    box_lo: np.ndarray  # (C, 3) endpoint AABB
    box_hi: np.ndarray  # (C, 3)
    count: np.ndarray  # (C,) real edges
    has_boundary: np.ndarray  # (C,) bool — one-sided boundary edges present
    has_two_boundary: np.ndarray  # (C,) bool — two-sided boundary edges present

    @property
    def num_clusters(self) -> int:
        return self.edge_ids.shape[0]


def build_edge_clusters(
    scene: TriangleScene, table: EdgeTable, cluster_size: int = 256
) -> EdgeClusters:
    """Host-side cluster build (topology-static, like the edge table)."""
    v0 = np.asarray(scene.v0)
    e1 = np.asarray(scene.e1)
    e2 = np.asarray(scene.e2)
    gn = np.asarray(scene.gn)
    tri1, corner, tri2 = table.tri1, table.corner, table.tri2
    pts = np.stack([v0, v0 + e1, v0 + e2], axis=1)  # (T,3,3)
    e_idx = np.arange(table.num_edges)
    va = pts[tri1, corner]
    vb = pts[tri1, (corner + 1) % 3]
    mid = 0.5 * (va + vb)

    lo, hi = mid.min(0), mid.max(0)
    span = np.maximum(hi - lo, 1e-12)
    q = np.clip((mid - lo) / span * 1023.0, 0, 1023).astype(np.uint32)

    def spread(x):
        x = (x | (x << 16)) & 0x030000FF
        x = (x | (x << 8)) & 0x0300F00F
        x = (x | (x << 4)) & 0x030C30C3
        x = (x | (x << 2)) & 0x09249249
        return x

    codes = (spread(q[:, 0]) << 2) | (spread(q[:, 1]) << 1) | spread(q[:, 2])
    order = np.argsort(codes, kind="stable").astype(np.int32)

    e = table.num_edges
    c = -(-e // cluster_size)
    ids = np.full((c, cluster_size), -1, np.int32)
    ids.ravel()[:e] = order
    two = table.two_sided

    # Fully vectorized per-cluster reductions over the (C, size) id matrix
    # (a Python per-cluster loop would dominate table-build time at
    # config7-class edge counts — ~2M edges ⇒ ~8k clusters).
    valid = ids >= 0
    sel0 = np.maximum(ids, 0)
    t1 = tri1[sel0]  # (C, size)
    t2 = tri2[sel0]
    has2 = valid & (t2 >= 0)
    n1 = gn[t1]  # (C, size, 3)
    n2 = gn[np.maximum(t2, 0)]
    c1 = np.einsum("csk,csk->cs", n1, v0[t1])
    c2 = np.einsum("csk,csk->cs", n2, v0[np.maximum(t2, 0)])

    def mmin(x, mask, init):
        return np.where(mask[..., None] if x.ndim == 3 else mask, x, init)

    big = np.float32(np.inf)
    n_stack_lo = np.minimum(mmin(n1, valid, big), mmin(n2, has2, big)).min(axis=1)
    n_stack_hi = np.maximum(mmin(n1, valid, -big), mmin(n2, has2, -big)).max(axis=1)
    c_lo = np.minimum(mmin(c1, valid, big), mmin(c2, has2, big)).min(axis=1)
    c_hi = np.maximum(mmin(c1, valid, -big), mmin(c2, has2, -big)).max(axis=1)
    ep = np.concatenate([va[sel0], vb[sel0]], axis=1)  # (C, 2*size, 3)
    vmask = np.concatenate([valid, valid], axis=1)
    box_lo = np.where(vmask[..., None], ep, big).min(axis=1)
    box_hi = np.where(vmask[..., None], ep, -big).max(axis=1)
    count = valid.sum(axis=1).astype(np.int32)
    bnd = valid & (t2 < 0)
    has_b = (bnd & ~two[sel0]).any(axis=1)
    has_tb = (bnd & two[sel0]).any(axis=1)
    gn_lo, gn_hi = n_stack_lo.astype(np.float32), n_stack_hi.astype(np.float32)
    c_lo, c_hi = c_lo.astype(np.float32), c_hi.astype(np.float32)
    box_lo, box_hi = box_lo.astype(np.float32), box_hi.astype(np.float32)
    return EdgeClusters(
        size=cluster_size, edge_ids=ids, gn_lo=gn_lo, gn_hi=gn_hi,
        c_lo=c_lo, c_hi=c_hi, box_lo=box_lo, box_hi=box_hi, count=count,
        has_boundary=has_b, has_two_boundary=has_tb,
    )


def _pick_edges_hierarchical(scene, table, clusters: EdgeClusters, x, va, vb, key):
    """Sample one candidate silhouette edge per shading point through the
    cluster hierarchy. Returns ``(pick, q)``: edge ids (clamped ≥ 0) and
    the total pick probability (0 ⇒ wasted sample, masked by the caller).
    """
    m = x.shape[0]
    k_c, k_e = jax.random.split(key)
    gl = jnp.asarray(clusters.gn_lo)
    gh = jnp.asarray(clusters.gn_hi)
    # Sign interval of dot(gn_i, x) − c_i over the cluster's faces.
    prod_lo = jnp.sum(jnp.minimum(gl[None] * x[:, None], gh[None] * x[:, None]), -1)
    prod_hi = jnp.sum(jnp.maximum(gl[None] * x[:, None], gh[None] * x[:, None]), -1)
    lower = prod_lo - jnp.asarray(clusters.c_hi)[None]
    upper = prod_hi - jnp.asarray(clusters.c_lo)[None]
    # lower <= 0 (not < 0): the flat classifier calls dot(gn,x)-c == 0
    # back-facing (front ⇔ dot > 0), so an edge whose back face evaluates
    # exactly 0 is a silhouette and must keep nonzero pick probability —
    # the conservative interval must include that boundary.
    mixed = (lower <= 0) & (upper > 0)
    possible = (
        mixed
        | (jnp.asarray(clusters.has_boundary)[None] & (upper > 0))
        | jnp.asarray(clusters.has_two_boundary)[None]
    )
    center = jnp.asarray(0.5 * (clusters.box_lo + clusters.box_hi))
    radius = jnp.asarray(0.5 * np.linalg.norm(clusters.box_hi - clusters.box_lo, axis=-1))
    dist = jnp.linalg.norm(x[:, None] - center[None], axis=-1)
    ang = jnp.clip(radius[None] / jnp.maximum(dist, radius[None] + 1e-12), 1e-3, 1.0)
    w_c = possible * ang * jnp.asarray(clusters.count, jnp.float32)[None]  # (M,C)
    tot_c = jnp.sum(w_c, axis=-1)
    logits_c = jnp.where(w_c > 0, jnp.log(jnp.maximum(w_c, 1e-30)), -jnp.inf)
    logits_c = jnp.where(tot_c[:, None] > 0, logits_c, jnp.zeros_like(logits_c))
    ci = jax.random.categorical(k_c, logits_c, axis=-1)  # (M,)
    q_c = jnp.take_along_axis(w_c, ci[:, None], -1)[:, 0] / jnp.maximum(tot_c, 1e-30)

    # Exact silhouette chords for the chosen cluster's edges only.
    eid = jnp.asarray(clusters.edge_ids)[ci]  # (M, size)
    valid_e = eid >= 0
    e0 = jnp.maximum(eid, 0)
    tri1 = jnp.asarray(table.tri1)[e0]
    tri2 = jnp.asarray(table.tri2)[e0]
    two = jnp.asarray(table.two_sided)[e0]
    f1 = jnp.einsum("msk,msk->ms", scene.gn[tri1], x[:, None] - scene.v0[tri1]) > 0
    boundary = tri2 < 0
    t2c = jnp.maximum(tri2, 0)
    f2 = jnp.where(
        boundary, f1, jnp.einsum("msk,msk->ms", scene.gn[t2c], x[:, None] - scene.v0[t2c]) > 0
    )
    sil = jnp.where(boundary, f1 | two, f1 != f2) & valid_e
    wa = va[e0] - x[:, None]
    wb = vb[e0] - x[:, None]
    wa = wa / jnp.maximum(jnp.linalg.norm(wa, axis=-1, keepdims=True), 1e-12)
    wb = wb / jnp.maximum(jnp.linalg.norm(wb, axis=-1, keepdims=True), 1e-12)
    chord = jnp.linalg.norm(wa - wb, axis=-1) * sil  # (M, size)
    tot_e = jnp.sum(chord, axis=-1)
    logits_e = jnp.where(chord > 0, jnp.log(jnp.maximum(chord, 1e-30)), -jnp.inf)
    logits_e = jnp.where(tot_e[:, None] > 0, logits_e, jnp.zeros_like(logits_e))
    pe = jax.random.categorical(k_e, logits_e, axis=-1)  # (M,)
    q_e = jnp.take_along_axis(chord, pe[:, None], -1)[:, 0] / jnp.maximum(tot_e, 1e-30)
    pick = jnp.take_along_axis(e0, pe[:, None], -1)[:, 0]
    q = jnp.where((tot_c > 0) & (tot_e > 0), q_c * q_e, 0.0)
    return pick, q


def edge_endpoints(scene: TriangleScene, tri1, corner):
    """Differentiable endpoint gather: (va, vb) each (E, 3)."""
    v0 = scene.v0[tri1]
    p = jnp.stack([v0, v0 + scene.e1[tri1], v0 + scene.e2[tri1]], axis=1)  # (E,3,3)
    e = jnp.arange(tri1.shape[0])
    va = p[e, corner]
    vb = p[e, (corner + 1) % 3]
    return va, vb


def silhouette_flags(scene: TriangleScene, table: EdgeTable, viewpoint: jnp.ndarray):
    """(is_sil, interior_tri): silhouette classification wrt a viewpoint.

    One-sided faces: boundary edge of a front face, or shared edge with
    front(f1) ⊕ front(f2). Two-sided faces: boundary edges always (both
    sides render); shared two-sided edges are creases (radiance continuous
    to first order) — skipped, as are interior shading creases, which are
    not visibility events. ``interior_tri`` is the front-facing owner, whose
    screen interior defines the occluder side of the edge.
    """
    tri1 = jnp.asarray(table.tri1)
    tri2 = jnp.asarray(table.tri2)

    def front(t):
        # dot(gn, viewpoint - point_on_tri) > 0 — one-sided visibility.
        return jnp.sum(scene.gn[t] * (viewpoint[None, :] - scene.v0[t]), axis=-1) > 0

    f1 = front(tri1)
    boundary = tri2 < 0
    f2 = jnp.where(boundary, f1, front(jnp.maximum(tri2, 0)))
    two = jnp.asarray(table.two_sided)
    is_sil = jnp.where(
        boundary,
        f1 | two,  # two-sided boundary edges silhouette from either side
        f1 != f2,
    )
    interior = jnp.where(f1, tri1, jnp.where(boundary, tri1, jnp.maximum(tri2, 0)))
    return is_sil, interior


def screen_xy(cam: Camera, p: jnp.ndarray) -> jnp.ndarray:
    """World points (M,3) → float pixel coordinates (M,2).

    Consistent with the reference ray-gen NDC convention (kernel.cu:200-205):
    ray for jittered pixel coordinate (x, y) passes through NDC
    ((x/W)·2−1, 1−(y/H)·2), so forward projection = proj·view + divide,
    then x = (ndc_x+1)/2·W, y = (1−ndc_y)/2·H; pixel id = floor.
    """
    m = projection_matrix(cam) @ view_matrix(cam)
    ph = jnp.concatenate([p, jnp.ones_like(p[:, :1])], axis=-1)
    clip = ph @ m.T
    w = jnp.where(jnp.abs(clip[:, 3:4]) < 1e-12, 1e-12, clip[:, 3:4])
    ndc = clip[:, :2] / w
    x = (ndc[:, 0] + 1.0) * 0.5 * cam.width
    y = (1.0 - ndc[:, 1]) * 0.5 * cam.height
    return jnp.stack([x, y], axis=-1)


def _clip_w(cam: Camera, p: jnp.ndarray) -> jnp.ndarray:
    m = projection_matrix(cam) @ view_matrix(cam)
    ph = jnp.concatenate([p, jnp.ones_like(p[:, :1])], axis=-1)
    return (ph @ m.T)[:, 3]


def _trace_at_screen(scene, cam: Camera, settings: RenderSettings, xy, key, spp: int):
    """Mean radiance (M,3) of rays through float screen coords (M,2)."""
    m = xy.shape[0]
    opts = _integrator_options(settings)
    # generate_rays_for_pixels(idx=0, jitter=(x, y)) places the ray exactly
    # at screen coordinate (x, y) — the jitter convention is additive pixels.
    zero_idx = jnp.zeros((m,), jnp.uint32)
    o, d = generate_rays_for_pixels(cam, zero_idx, xy)
    sampler = make_sampler(opts.rng)
    lane_ids = jnp.arange(m, dtype=jnp.uint32)

    def one(s):
        keys = sampler.path_keys(key, lane_ids, s)
        return trace_paths(scene, o, d, keys, opts)

    acc = jnp.zeros((m, 3), jnp.float32)
    for s in range(spp):  # static, small
        acc = acc + one(jnp.uint32(s))
    return acc / spp


def primary_edge_gradient(
    scene_fn,
    params,
    camera: Camera,
    settings: RenderSettings,
    cot_image: jnp.ndarray,  # (H, W, 3) dL/dI — the loss cotangent
    table: EdgeTable,
    key,
    n_samples: int = 1024,
    trace_spp: int = 4,
    eps_px: float = 0.05,
    camera_fn=None,
):
    """Boundary-term gradient dL/d(params) from primary silhouettes.

    ``scene_fn(params) -> TriangleScene`` must be traceable; the edge table
    is topology-static (rebuild only when connectivity changes). Everything
    except the final jax.grad is detached — sampling, classification,
    radiance differences, and MIS-free pdf bookkeeping are all data.

    ``camera_fn(params) -> Camera`` (optional) makes the camera a
    differentiation target: ``boundary_scalar`` projects through the
    differentiable camera, so dL/d(camera) carries the silhouette-sweep
    boundary term — a camera pan moves every silhouette across the film
    (VERDICT r4 missing 4; previously the camera was closed over as a
    constant and dL/d(camera) was interior-only).
    """
    scene = jax.lax.stop_gradient(scene_fn(params))
    # Same auto-resolution as the interior estimator (textured albedo,
    # material narrowing) so f_in/f_out match what render_frame computes.
    settings = narrow_settings(scene, settings)
    tri1 = jnp.asarray(table.tri1)
    corner = jnp.asarray(table.corner)
    if camera_fn is not None:
        camera = camera_fn(params)
    cam_d = jax.lax.stop_gradient(camera)

    va, vb = edge_endpoints(scene, tri1, corner)  # detached endpoints
    is_sil, interior = silhouette_flags(scene, table, cam_d.position)
    # Drop edges with an endpoint at/behind the near plane (projection
    # undefined); a clipped-edge treatment is future work (documented bias
    # only for geometry crossing the camera plane).
    wa = _clip_w(cam_d, va)
    wb = _clip_w(cam_d, vb)
    usable = is_sil & (wa > cam_d.near_clip) & (wb > cam_d.near_clip)

    pa = screen_xy(cam_d, va)
    pb = screen_xy(cam_d, vb)
    chord = jnp.linalg.norm(pb - pa, axis=-1)
    weight_e = jnp.where(usable, chord, 0.0)
    total = jnp.sum(weight_e)

    k_pick, k_s, k_trace = jax.random.split(key, 3)
    logits = jnp.where(weight_e > 0, jnp.log(jnp.maximum(weight_e, 1e-30)), -jnp.inf)
    safe_logits = jnp.where(total > 0, logits, jnp.zeros_like(logits))
    pick = jax.random.categorical(k_pick, safe_logits, shape=(n_samples,))
    q_pick = weight_e[pick] / jnp.maximum(total, 1e-30)  # per-edge prob
    s = jax.random.uniform(k_s, (n_samples,))

    va_p, vb_p = va[pick], vb[pick]
    p_world = (1.0 - s[:, None]) * va_p + s[:, None] * vb_p

    # Screen tangent |dx_s/ds| (exact perspective Jacobian via jvp) and the
    # outward screen normal (away from the front-facing owner's interior).
    p_scr, t_scr = jax.jvp(lambda q: screen_xy(cam_d, q), (p_world,), (vb_p - va_p,))
    t_len = jnp.linalg.norm(t_scr, axis=-1)
    t_hat = t_scr / jnp.maximum(t_len, 1e-12)[:, None]
    int_tri = interior[pick]
    # The interior triangle's third corner, projected: the side to point AWAY from.
    v0i = scene.v0[int_tri]
    pts_i = jnp.stack([v0i, v0i + scene.e1[int_tri], v0i + scene.e2[int_tri]], axis=1)
    third = pts_i[jnp.arange(n_samples), (corner[pick] + 2) % 3]
    third_scr = screen_xy(cam_d, third)
    to_third = third_scr - p_scr
    perp = to_third - jnp.sum(to_third * t_hat, axis=-1, keepdims=True) * t_hat
    n_hat = -perp / jnp.maximum(jnp.linalg.norm(perp, axis=-1, keepdims=True), 1e-12)

    # Radiance just inside (occluder side) and outside the silhouette.
    f_in = _trace_at_screen(scene, cam_d, settings, p_scr - eps_px * n_hat, k_trace, trace_spp)
    f_out = _trace_at_screen(scene, cam_d, settings, p_scr + eps_px * n_hat, k_trace, trace_spp)

    # Loss cotangent at each sample's pixel (box filter support = the pixel).
    px = jnp.floor(p_scr[:, 0]).astype(jnp.int32)
    py = jnp.floor(p_scr[:, 1]).astype(jnp.int32)
    inside = (px >= 0) & (px < cam_d.width) & (py >= 0) & (py < cam_d.height)
    cot = cot_image[jnp.clip(py, 0, cam_d.height - 1), jnp.clip(px, 0, cam_d.width - 1)]
    cot = jnp.where(inside[:, None], cot, 0.0)

    w_m = jnp.sum(cot * (f_in - f_out), axis=-1) * t_len / jnp.maximum(q_pick, 1e-30) / n_samples
    w_m = jnp.where((q_pick > 0) & (total > 0), w_m, 0.0)
    w_m = jax.lax.stop_gradient(w_m)
    n_hat = jax.lax.stop_gradient(n_hat)
    s_d = jax.lax.stop_gradient(s)
    pick_d = jax.lax.stop_gradient(pick)

    def boundary_scalar(p):
        sc = scene_fn(p)
        cam_t = camera_fn(p) if camera_fn is not None else camera
        va_t, vb_t = edge_endpoints(sc, tri1, corner)
        pw = (1.0 - s_d[:, None]) * va_t[pick_d] + s_d[:, None] * vb_t[pick_d]
        xs = screen_xy(cam_t, pw)
        return jnp.sum(w_m * jnp.sum(n_hat * xs, axis=-1))

    return jax.grad(boundary_scalar)(params)


def shadow_edge_gradient(
    scene_fn,
    params,
    camera: Camera,
    settings: RenderSettings,
    cot_image: jnp.ndarray,
    table: EdgeTable,
    key,
    n_samples: int = 512,
    eps: float = 1e-3,
    chunk: int = 128,
    clusters: EdgeClusters | None = None,
    specular_depth: int = 2,
    diffuse_depth: int = 1,
    camera_fn=None,
):
    """Boundary-term gradient from SHADOW silhouettes at the first diffuse
    vertex — the NEE visibility discontinuity (SURVEY.md §7.3's second term).

    The direct-light integral at a shading point x,
    L(x) = ∫ (albedo/π)·Le·cosθ_x·V(x, ω) dω over the light's solid angle,
    jumps across blocker silhouettes *as seen from x*. Analogous to the
    primary estimator but in the unit-direction domain:

    1. sample camera pixels, trace the (detached) primary hit; follow up to
       ``specular_depth − 1`` MIRROR/GLASS bounces to the first diffuse
       vertex x (shadow silhouettes seen IN REFLECTIONS and THROUGH GLASS
       carry boundary gradient too, weighted by the accumulated specular
       throughput; glass segments freeze one Fresnel reflect/transmit
       sample per the interior estimator's split);
    2. classify every edge's silhouette-ness against x (front ⊕ front wrt
       x — per-(x, edge) data, chunked to bound the (M, E) intermediates);
    3. pick an edge ∝ direction-chord length, a point z on it;
    4. Δf between rays from x grazing either side of the edge: each traced
       one bounce — emitter hit ⇒ f = albedo/π·Le·cosθ_x, else 0 (partial
       blockers and non-occluding edges cancel automatically);
    5. the θ-dependence enters through ω(θ) = normalize(z(θ) − x(θ)); x(θ)
       re-derived differentiably through the frozen ray/triangle CHAIN
       (resolve_hits + reflect per mirror segment, so tilting a mirror
       moves its reflected shadows), and blockers AND receivers both carry
       gradient.

    The boundary of the integral is estimator-independent, so computing it
    in the solid-angle domain stays correct even though the interior NEE
    estimator samples light area.

    Scaling: the flat per-(x, edge) classification is O(M·E); above
    ``_HIER_EDGE_THRESHOLD`` edges (or when ``clusters`` is passed) the
    two-level hierarchy (:class:`EdgeClusters`) cuts it to
    O(M·C + M·cluster_size) — same estimator, unbiased by construction
    (conservative cluster tests), validated on a >10⁴-edge scene in
    tests/test_edges.py.

    ``diffuse_depth=2`` adds the SECOND diffuse vertex's shadow boundary
    (diffuse→diffuse, VERDICT r4 missing 3): after x₁ the walk scatters one
    cosine-weighted sample (the interior estimator's measure) with a
    DETACHED world direction to the next diffuse vertex x₂, whose NEE
    visibility jump is edge-sampled exactly like x₁'s with throughput
    spec_tp·albedo₁ (the Lambertian cosine-sampling factor). In
    ``boundary_scalar`` x₂(θ) is re-derived through the frozen chain
    extended by one segment: origin x₁(θ) + ε·n₁(θ), frozen direction,
    frozen hit triangle (a moving receiver OR blocker OR mirror upstream
    all move the bounce-2 shadow). Diffuse→mirror→diffuse continuations
    are not walked (the mirror-prefix machinery covers mirrors before the
    FIRST diffuse vertex only).

    ``camera_fn(params) -> Camera`` makes the camera itself a
    differentiation target (VERDICT r4 missing 4): the detached sampling
    uses ``stop_gradient(camera_fn(params))`` and ``boundary_scalar``
    re-generates the primary rays differentiably, so dL/d(camera) carries
    the shadow-boundary term (receivers move when the camera does).
    """
    from gpupathtracer_tpu.models.materials import BxdfType
    from gpupathtracer_tpu.ops.intersect import resolve_hits
    from gpupathtracer_tpu.render.integrator import RAY_OFFSET, make_intersect_fn

    scene = jax.lax.stop_gradient(scene_fn(params))
    settings = narrow_settings(scene, settings)
    if camera_fn is not None:
        camera = camera_fn(params)
    cam_d = jax.lax.stop_gradient(camera)
    opts = _integrator_options(settings)
    intersect = make_intersect_fn(scene, opts)
    h_pix, w_pix = settings.height, settings.width

    # Specular-free scenes cannot extend the prefix past the first hit —
    # clamp the walk to one segment so they don't pay extra full intersect
    # passes (ADVICE r4: specular_depth=2 default made every scene trace a
    # second pass). MIRROR and GLASS both continue the prefix.
    if not isinstance(scene.mat_id, jax.core.Tracer):
        live_mats = np.unique(np.asarray(scene.mat_id)[np.asarray(scene.valid)])
        live_types = np.asarray(scene.materials.type)[live_mats]
        if not np.isin(live_types, (BxdfType.MIRROR, BxdfType.GLASS)).any():
            specular_depth = 1

    tri1 = jnp.asarray(table.tri1)
    corner = jnp.asarray(table.corner)
    tri2 = jnp.asarray(table.tri2)
    two = jnp.asarray(table.two_sided)
    va, vb = edge_endpoints(scene, tri1, corner)  # (E,3) detached

    from gpupathtracer_tpu.ops.sampling import (
        fresnel_schlick as _fresnel,
        normalize_dir as _normalize_dir,
        reflect as _reflect,
        refract as _refract,
    )

    k_pix, k_jit, k_pick, k_s, k_d2, k_pick2, k_s2, k_gl = jax.random.split(key, 8)
    pix = jax.random.randint(k_pix, (n_samples,), 0, h_pix * w_pix).astype(jnp.uint32)
    jitter = jax.random.uniform(k_jit, (n_samples, 2))
    o, d = generate_rays_for_pixels(cam_d, pix, jitter)
    m = n_samples

    def textured_albedo_at(attrs):
        if opts.textured:
            # Textured receivers: the boundary term's f uses the SAME
            # effective albedo as the interior estimator (ADVICE r4 — the
            # flat table value was inconsistent on textured scenes).
            from gpupathtracer_tpu.models.materials import textured_albedo

            mt = scene.materials
            return textured_albedo(
                mt.albedo[attrs.mat_id], mt.tex_kind[attrs.mat_id],
                mt.tex_id[attrs.mat_id], mt.checker_color[attrs.mat_id],
                mt.checker_scale[attrs.mat_id], attrs.uv, scene.textures,
            )
        return scene.materials.albedo[attrs.mat_id]

    def spec_walk(o0, d0, active0, kw):
        """Walk a specular (MIRROR/GLASS) prefix to the next diffuse vertex,
        recording the frozen per-segment chain for the differentiable
        re-derivation below. specular_depth=1 reproduces the round-3
        primary-hit-only behavior. Glass segments sample the interior
        estimator's Fresnel reflect/transmit choice once (frozen), with
        the matching throughput factor (1 / transmittance) — the
        probability cancels exactly as in the integrator's split.

        Returns (x, n_x, albedo, tp_mult, found_diffuse, segs): the
        receiver point/normal/albedo, the accumulated specular throughput
        multiplier, the receiver mask, and the frozen segment chain."""
        o_cur, d_cur = o0, d0
        active = active0
        found = jnp.zeros((m,), bool)
        xw = o0
        n_w = jnp.tile(jnp.asarray([[0.0, 0.0, 1.0]], jnp.float32), (m, 1))
        alb_w = jnp.zeros((m, 3), jnp.float32)
        tp = jnp.ones((m, 3), jnp.float32)
        segs = []
        for _k in range(max(specular_depth, 1)):
            hit_k = intersect(o_cur, d_cur, scene)
            a_k = resolve_hits(o_cur, d_cur, scene, hit_k.tri, need_uv=opts.textured)
            mat_k = scene.materials.type[a_k.mat_id]
            facing_k = -jnp.sign(jnp.sum(d_cur * a_k.gn, axis=-1, keepdims=True))
            facing_k = jnp.where(facing_k == 0.0, 1.0, facing_k)
            n_k = a_k.gn * facing_k
            newly = active & hit_k.hit & (mat_k == BxdfType.DIFFUSE)
            xw = jnp.where(newly[:, None], a_k.point, xw)
            n_w = jnp.where(newly[:, None], n_k, n_w)
            alb_w = jnp.where(newly[:, None], textured_albedo_at(a_k), alb_w)
            found = found | newly
            cont_m = active & hit_k.hit & (mat_k == BxdfType.MIRROR)
            is_glass = active & hit_k.hit & (mat_k == BxdfType.GLASS)
            # Fresnel-weighted reflect/refract — the integrator's glass
            # rule (render/integrator.py) with one frozen sample/segment.
            cos_i = jnp.clip(-jnp.sum(d_cur * a_k.gn, axis=-1), -1.0, 1.0)
            entering = cos_i > 0.0
            ior = scene.materials.refractive_index[a_k.mat_id]
            eta_i = jnp.where(entering, 1.0, ior)
            eta_t = jnp.where(entering, ior, 1.0)
            eta = eta_i / eta_t
            fres = _fresnel(jnp.abs(cos_i), eta_i, eta_t)
            refr_k, tir = _refract(d_cur, n_k, eta[:, None])
            ug = jax.random.uniform(jax.random.fold_in(kw, _k), (m,))
            choice_refl = tir | (ug < fres)
            cont_gr = is_glass & choice_refl
            cont_gt = is_glass & ~choice_refl
            cont = cont_m | cont_gr | cont_gt
            segs.append(
                jax.lax.stop_gradient(
                    (hit_k.tri, newly, facing_k, cont_m, cont_gr, cont_gt, eta)
                )
            )
            tp_k = jnp.where(
                cont_m[:, None], scene.materials.specular_color[a_k.mat_id],
                jnp.where(
                    cont_gt[:, None], scene.materials.transmittance_color[a_k.mat_id], 1.0
                ),
            )
            tp = jnp.where(cont[:, None], tp * tp_k, tp)
            d_new = jnp.where(
                cont_gt[:, None], _normalize_dir(refr_k), _reflect(d_cur, n_k)
            )
            d_cur = jnp.where(cont[:, None], d_new, d_cur)
            off_n = jnp.where(cont_gt[:, None], -n_k, n_k)
            o_cur = jnp.where(cont[:, None], a_k.point + RAY_OFFSET * off_n, o_cur)
            active = cont
        return xw, n_w, alb_w, tp, found, segs

    def rederive(segs, o_t, d_t, sc):
        """Differentiable re-derivation of a frozen chain: each segment
        re-intersects its frozen triangle (resolve_hits); mirror/
        glass-reflect segments reflect and glass-transmit segments refract
        (frozen eta and branch) about the differentiable oriented normal —
        a tilted mirror or glass pane moves its reflected/refracted
        shadows. Returns (x_t, n_t) at the chain's diffuse stop."""
        x_t = o_t
        n1_t = jnp.tile(jnp.asarray([[0.0, 0.0, 1.0]], jnp.float32), (m, 1))
        for tri_k, stop_k, facing_k, m_k, gr_k, gt_k, eta_k in segs:
            a_t = resolve_hits(o_t, d_t, sc, tri_k)
            n_t = a_t.gn * facing_k
            x_t = jnp.where(stop_k[:, None], a_t.point, x_t)
            n1_t = jnp.where(stop_k[:, None], n_t, n1_t)
            cont_k = m_k | gr_k | gt_k
            refr_t, _ = _refract(d_t, n_t, eta_k[:, None])
            d_new = jnp.where(gt_k[:, None], _normalize_dir(refr_t), _reflect(d_t, n_t))
            off_n = jnp.where(gt_k[:, None], -n_t, n_t)
            d_t = jnp.where(cont_k[:, None], d_new, d_t)
            o_t = jnp.where(cont_k[:, None], a_t.point + RAY_OFFSET * off_n, o_t)
        return x_t, n1_t

    x, n_x, albedo, tp1, diffuse, segs1 = spec_walk(o, d, jnp.ones((m,), bool), k_gl)
    spec_tp = jax.lax.stop_gradient(tp1)

    # Optional second diffuse vertex (diffuse→diffuse shadow boundary): ONE
    # detached cosine-weighted scatter per sample — the interior
    # estimator's sampling measure, so weighting by albedo₁ (the Lambertian
    # cosine-sampling throughput factor) matches its bounce-2 term exactly.
    # The scatter ray runs the SAME specular walk, so
    # diffuse→mirror/glass→diffuse shadows carry gradient too.
    two_receivers = diffuse_depth >= 2 and settings.bounces >= 2
    if two_receivers:
        from gpupathtracer_tpu.ops import sampling as _sampling

        u2 = jax.random.uniform(k_d2, (m, 2))
        local2 = _sampling.cosine_sample_hemisphere(u2[:, 0], u2[:, 1])
        d2_frozen = jax.lax.stop_gradient(_sampling.local_to_world(local2, n_x))
        x2, n_x2, albedo2, tp2_mult, diffuse2, segs2 = spec_walk(
            x + RAY_OFFSET * n_x, d2_frozen, diffuse, jax.random.fold_in(k_gl, 0x5EC2)
        )
        tp2 = jax.lax.stop_gradient(spec_tp * albedo * tp2_mult)

    if clusters is None and table.num_edges > _HIER_EDGE_THRESHOLD:
        clusters = build_edge_clusters(scene, table)

    def pick_edges(xr, kp):
        if clusters is not None:
            return _pick_edges_hierarchical(scene, table, clusters, xr, va, vb, kp)
        # Flat per-(x, edge) silhouette classification + chord weights,
        # chunked to bound the (M, E) intermediates.
        def front_wrt(t, xs):  # (C, E)
            return jnp.einsum("ek,cek->ce", scene.gn[t], xs[:, None, :] - scene.v0[t][None]) > 0

        picks, qs = [], []
        for c0 in range(0, m, chunk):
            xs = xr[c0 : c0 + chunk]
            f1 = front_wrt(tri1, xs)
            boundary = (tri2 < 0)[None, :]
            f2 = jnp.where(boundary, f1, front_wrt(jnp.maximum(tri2, 0), xs))
            sil = jnp.where(boundary, f1 | two[None, :], f1 != f2)
            wa_dir = va[None] - xs[:, None]
            wb_dir = vb[None] - xs[:, None]
            wa_dir = wa_dir / jnp.maximum(jnp.linalg.norm(wa_dir, axis=-1, keepdims=True), 1e-12)
            wb_dir = wb_dir / jnp.maximum(jnp.linalg.norm(wb_dir, axis=-1, keepdims=True), 1e-12)
            chord_c = jnp.linalg.norm(wa_dir - wb_dir, axis=-1) * sil
            total_c = jnp.sum(chord_c, axis=-1, keepdims=True)
            logits = jnp.where(chord_c > 0, jnp.log(jnp.maximum(chord_c, 1e-30)), -jnp.inf)
            logits = jnp.where(total_c > 0, logits, jnp.zeros_like(logits))
            kc = jax.random.fold_in(kp, c0)
            pk = jax.random.categorical(kc, logits, axis=-1)
            q = jnp.take_along_axis(chord_c, pk[:, None], axis=-1)[:, 0] / jnp.maximum(
                total_c[:, 0], 1e-30
            )
            picks.append(pk)
            qs.append(q)
        return jnp.concatenate(picks), jnp.concatenate(qs)

    def omega_of(zq, xq):
        w_dir = zq - xq
        return w_dir / jnp.maximum(jnp.linalg.norm(w_dir, axis=-1, keepdims=True), 1e-12)

    def f_sa(w_dir, xr, nr, albr):
        w_dir = w_dir / jnp.maximum(jnp.linalg.norm(w_dir, axis=-1, keepdims=True), 1e-12)
        o2 = xr + RAY_OFFSET * nr
        h2 = intersect(o2, w_dir, scene)
        a2 = resolve_hits(o2, w_dir, scene, h2.tri)
        m2 = scene.materials.type[a2.mat_id]
        le = (
            scene.materials.emissive_color[a2.mat_id]
            * scene.materials.intensity[a2.mat_id][:, None]
        )
        emit = h2.hit & (m2 == BxdfType.EMITTER)
        cosx = jnp.maximum(jnp.sum(nr * w_dir, axis=-1), 0.0)
        return jnp.where(emit[:, None], albr / jnp.pi * le * cosx[:, None], 0.0)

    cot = cot_image.reshape(-1, 3)[pix]

    def receiver_samples(xr, nr, albr, tpr, validr, kp, ks):
        """Detached boundary-sample data (pick, s, n̂, weight) for one
        receiver set — the per-receiver half of steps 2-4."""
        pick, q_pick = pick_edges(xr, kp)
        s = jax.random.uniform(ks, (m,))
        va_p, vb_p = va[pick], vb[pick]
        z = (1.0 - s[:, None]) * va_p + s[:, None] * vb_p
        omega, tau = jax.jvp(lambda zq: omega_of(zq, xr), (z,), (vb_p - va_p,))
        t_len = jnp.linalg.norm(tau, axis=-1)
        tau_hat = tau / jnp.maximum(t_len, 1e-12)[:, None]

        # Outward normal in the tangent plane at ω (away from the front owner).
        f1_pick = jnp.einsum("mk,mk->m", scene.gn[tri1[pick]], xr - scene.v0[tri1[pick]]) > 0
        int_tri = jnp.where(f1_pick, tri1[pick], jnp.maximum(tri2[pick], 0))
        v0i = scene.v0[int_tri]
        pts_i = jnp.stack([v0i, v0i + scene.e1[int_tri], v0i + scene.e2[int_tri]], axis=1)
        third = pts_i[jnp.arange(m), (corner[pick] + 2) % 3]
        dir3 = omega_of(third, xr)
        v = dir3 - jnp.sum(dir3 * omega, axis=-1, keepdims=True) * omega
        v = v - jnp.sum(v * tau_hat, axis=-1, keepdims=True) * tau_hat
        n_hat = -v / jnp.maximum(jnp.linalg.norm(v, axis=-1, keepdims=True), 1e-12)

        f_in = f_sa(omega - eps * n_hat, xr, nr, albr)
        f_out = f_sa(omega + eps * n_hat, xr, nr, albr)
        w_m = (
            jnp.sum(cot * tpr * (f_in - f_out), axis=-1)
            * t_len
            / jnp.maximum(q_pick, 1e-30)
            * (h_pix * w_pix)
            / m
        )
        w_m = jnp.where(validr & (q_pick > 0), w_m, 0.0)
        return {
            "pick": jax.lax.stop_gradient(pick),
            "s": jax.lax.stop_gradient(s),
            "n_hat": jax.lax.stop_gradient(n_hat),
            "w_m": jax.lax.stop_gradient(w_m),
        }

    r1 = receiver_samples(x, n_x, albedo, spec_tp, diffuse, k_pick, k_s)
    if two_receivers:
        r2 = receiver_samples(x2, n_x2, albedo2, tp2, diffuse2, k_pick2, k_s2)

    o_d = jax.lax.stop_gradient(o)
    d_d = jax.lax.stop_gradient(d)
    pix_d = jax.lax.stop_gradient(pix)
    jit_d = jax.lax.stop_gradient(jitter)

    def boundary_scalar(p):
        sc = scene_fn(p)
        va_t, vb_t = edge_endpoints(sc, tri1, corner)

        def term(r, x_t):
            z_t = (1.0 - r["s"][:, None]) * va_t[r["pick"]] + r["s"][:, None] * vb_t[r["pick"]]
            om = omega_of(z_t, x_t)
            return jnp.sum(r["w_m"] * jnp.sum(r["n_hat"] * om, axis=-1))

        # Re-derive the receiver x(θ) through the frozen chains (see
        # ``rederive``). With ``camera_fn`` the primary rays themselves
        # re-derive from the differentiable camera.
        if camera_fn is not None:
            o_t, d_t = generate_rays_for_pixels(camera_fn(p), pix_d, jit_d)
        else:
            o_t, d_t = o_d, d_d
        x_t, n1_t = rederive(segs1, o_t, d_t, sc)
        total = term(r1, x_t)
        if two_receivers:
            # The scatter chain continues from x₁(θ) + ε·n₁(θ) along the
            # DETACHED sampled direction through its own frozen segments.
            x2_t, _ = rederive(segs2, x_t + RAY_OFFSET * n1_t, d2_frozen, sc)
            total = total + term(r2, x2_t)
        return total

    return jax.grad(boundary_scalar)(params)


def value_and_grad_with_edges(
    image_loss,
    scene_fn,
    params,
    camera: Camera,
    settings: RenderSettings,
    table: EdgeTable,
    key,
    seed=None,
    n_samples: int = 1024,
    trace_spp: int = 4,
    shadow_edges: bool = False,
    shadow_samples: int = 512,
    shadow_clusters: EdgeClusters | None = None,
    specular_depth: int = 2,
    shadow_diffuse_depth: int = 1,
    camera_fn=None,
):
    """(loss, dL/dparams) with the interior (detached estimator) term plus
    the edge-sampled boundary terms — the complete first-order geometry
    gradient the SURVEY's §7.3 asks for. ``shadow_edges=True`` adds the
    NEE shadow-silhouette term (first diffuse vertex, reached through up to
    ``specular_depth − 1`` mirror bounces; ``shadow_diffuse_depth=2`` adds
    the second diffuse vertex's term); ``shadow_clusters`` passes a
    prebuilt edge hierarchy (auto-built above _HIER_EDGE_THRESHOLD edges).

    ``image_loss(img) -> scalar``; ``scene_fn(params) -> TriangleScene``.
    ``camera_fn(params) -> Camera`` (optional) differentiates the camera
    too: the interior term flows through ray generation and the boundary
    terms through the differentiable projection — dL/d(position, yaw, ...)
    is first-order complete across silhouettes.
    """
    cam_of = camera_fn if camera_fn is not None else (lambda p: camera)
    img, vjp_fn = jax.vjp(
        lambda p: render_frame(scene_fn(p), cam_of(p), settings, seed=seed), params
    )
    loss, cot = jax.value_and_grad(image_loss)(img)
    interior = vjp_fn(cot)[0]
    k1, k2 = jax.random.split(key)
    boundary = primary_edge_gradient(
        scene_fn, params, camera, settings, cot, table, k1,
        n_samples=n_samples, trace_spp=trace_spp, camera_fn=camera_fn,
    )
    total = jax.tree_util.tree_map(lambda a, b: a + b, interior, boundary)
    if shadow_edges:
        shadow = shadow_edge_gradient(
            scene_fn, params, camera, settings, cot, table, k2,
            n_samples=shadow_samples, clusters=shadow_clusters,
            specular_depth=specular_depth, diffuse_depth=shadow_diffuse_depth,
            camera_fn=camera_fn,
        )
        total = jax.tree_util.tree_map(lambda a, b: a + b, total, shadow)
    return loss, total
