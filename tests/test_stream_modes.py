"""Streamed-kernel traversal modes (round-5 gating experiments).

Both mechanisms measured as perf dead ends on chip (BASELINE.md round-5
ladders) but kept behind default-off knobs: they must stay BIT-IDENTICAL
to the plain single-phase traversal so flipping a knob can never change an
image — these tests pin that, including the seeded-resume (init state)
path and the per-lane finality flags the two-phase host logic relies on.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import gpupathtracer_tpu.ops.pallas_intersect as pi
from gpupathtracer_tpu.models.obj import load_obj
from gpupathtracer_tpu.models.scene import build_scene, mesh_spec


@pytest.fixture(scope="module")
def streamed_case(request):
    mesh = load_obj("/root/reference/sceneResources/sphereBlender.obj")
    scene = build_scene([mesh_spec(mesh)], [{"type": "diffuse"}], pad_to_multiple=64)
    packed = pi.pack_scene(scene, tri_block=64)
    rng = np.random.default_rng(1)
    r = 512
    verts = np.asarray(scene.v0)[np.asarray(scene.valid)]
    lo, hi = verts.min(0), verts.max(0)
    targets = rng.uniform(lo, hi, (r, 3)).astype(np.float32)
    o = rng.uniform(lo - 3, hi + 3, (r, 3)).astype(np.float32)
    d = targets - o
    d /= np.linalg.norm(d, axis=1, keepdims=True)
    alive = jnp.asarray(rng.random(r) > 0.2)
    return packed, jnp.asarray(o), jnp.asarray(d), alive


def _with_overrides(monkeypatch, budget=0, subtiles=1, fresh=False):
    monkeypatch.setattr(pi, "RESIDENT_BUDGET_BYTES", 1024)  # force streamed
    monkeypatch.setattr(pi, "CLUSTER_TARGET_BYTES", 64 * 1024)
    monkeypatch.setattr(pi, "STREAM_PHASE1_BUDGET", budget)
    monkeypatch.setattr(pi, "STREAM_SUBTILES", subtiles)
    monkeypatch.setattr(pi, "STREAM_FRESH_WORST", fresh)


def _assert_same_hits(a, b):
    for f in ("t", "tri", "hit"):
        np.testing.assert_array_equal(np.asarray(getattr(a, f)), np.asarray(getattr(b, f)))


@pytest.mark.parametrize(
    "budget,subtiles,fresh",
    [(1, 1, False), (2, 1, False), (0, 2, False), (0, 4, False), (2, 4, False),
     (0, 1, True), (2, 1, True)],
)
def test_stream_modes_bit_identical(streamed_case, monkeypatch, budget, subtiles, fresh):
    packed, o, d, alive = streamed_case
    _with_overrides(monkeypatch)
    ref = pi.intersect_pallas(o, d, packed, interpret=True, alive=alive)
    _with_overrides(monkeypatch, budget=budget, subtiles=subtiles, fresh=fresh)
    got = pi.intersect_pallas(o, d, packed, interpret=True, alive=alive)
    _assert_same_hits(ref, got)


def test_phase1_done_flags_are_sound(streamed_case, monkeypatch):
    """Lanes the budgeted phase reports final must already hold their
    converged (single-phase) result — finality may be conservative (false
    negatives fine) but never wrong."""
    packed, o, d, alive = streamed_case
    _with_overrides(monkeypatch)
    ref = pi.intersect_pallas(o, d, packed, interpret=True, alive=alive)

    bpc = 1
    padded = packed
    ray_tile, bpc = pi._plan_stream_shape(packed.num_blocks, o.shape[0], 64, packed.tri_block)
    padded = pi._pad_blocks(packed, bpc)
    from gpupathtracer_tpu.ops.plucker import pack_rays

    feats = pack_rays(o, d)
    alive_i = alive.astype(jnp.int32)
    mask, enter = pi.tile_block_mask(o, d, padded, ray_tile, alive=alive)
    rt = mask.shape[0]
    enter_blk = jnp.where(mask > 0, enter, pi.INF)
    cmask = mask.reshape(rt, -1, bpc).max(axis=-1)
    center = jnp.min(enter_blk.reshape(rt, -1, bpc), axis=-1)
    order, es = pi.plan_block_order(cmask, center)
    init_t = jnp.where(alive_i > 0, pi.BIG, -pi.INF)
    init_i = jnp.full_like(alive_i, -1)
    bt, bi, done = pi._launch_streamed(
        order, es, enter_blk, feats, alive_i, init_t, init_i, padded.w,
        ray_tile, bpc, True, "highest", budget=1,
    )
    done_live = (np.asarray(done) > 0) & np.asarray(alive)
    tri_ref = np.asarray(ref.tri)
    tri_got = np.where(np.asarray(bi) >= 0,
                       np.asarray(packed.tri_map)[np.maximum(np.asarray(bi), 0)], -1)
    np.testing.assert_array_equal(tri_got[done_live], tri_ref[done_live])
    # And the budget genuinely left SOME lanes unfinished on this workload
    # (otherwise the soundness check above is vacuous).
    assert (~(np.asarray(done) > 0) & np.asarray(alive)).any()
