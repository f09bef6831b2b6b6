"""Structural verification of distributed-gradient communication (VERDICT
r3 missing item 3: nothing verified collective placement).

Real scaling-efficiency numbers need multi-chip hardware this environment
doesn't have; what CAN be pinned structurally, on the 8-virtual-device CPU
mesh, is the compiled HLO of a full distributed forward+backward step:

1. gradient all-reduces ARE present (XLA inserted psums for the data axis);
2. the per-bounce collectives (Ulysses all-to-alls / all-gathers) sit
   INSIDE while-loop bodies — i.e. communication is interleaved with the
   sample/bounce scans, per iteration, not hoisted into one serial
   epilogue. That is the structural prerequisite for XLA's latency-hiding
   scheduler to overlap collectives with compute on a real slice (the
   SURVEY §7.3 overlap goal).

Shapes matter: at spp=1/bounces=2 XLA fully unrolls the scans and the
premise is vacuous — the test uses spp=2/bounces=3 so real while loops
survive optimization.
"""

import jax
import jax.numpy as jnp
import numpy as np


def _ops_by_computation(hlo: str) -> dict:
    """{computation_header_token: [collective op kinds found inside]} from
    printed HLO — computations start at column 0 with a '{' on the line."""
    cur = None
    found = {}
    for line in hlo.splitlines():
        if line and not line[0].isspace() and "{" in line:
            cur = line.split()[0]
        for k in ("all-to-all", "all-reduce", "all-gather", "collective-permute"):
            if k in line and "=" in line:
                found.setdefault(cur, []).append(k)
    return found


def test_distributed_grad_collectives_inside_scan_bodies():
    import __graft_entry__ as ge
    from gpupathtracer_tpu.parallel.mesh import make_mesh
    from gpupathtracer_tpu.parallel.render import render_frame_distributed
    from gpupathtracer_tpu.render.renderer import RenderSettings

    mesh = make_mesh(n_data=4, n_scene=2)
    camera, make_scene, _ = ge._demo_parts(width=16, height=16, subdivisions=0, tri_pad=256)
    settings = RenderSettings(
        width=16, height=16, spp=2, bounces=3, tri_block=128,
        estimator="nee", intersector="plucker", jitter=False,
    )
    target = jax.lax.stop_gradient(
        render_frame_distributed(
            make_scene(jnp.asarray([0.2, 0.55, 0.85]), jnp.zeros(3)),
            camera, settings, mesh,
        )
    )

    def loss(p):
        img = render_frame_distributed(
            make_scene(p["albedo"], p["offsets"]), camera, settings, mesh,
            scene_strategy="ulysses",
        )
        return jnp.mean((img - target) ** 2)

    params = {"albedo": jnp.asarray([0.5, 0.5, 0.5]), "offsets": jnp.zeros(3)}
    hlo = jax.jit(jax.grad(loss)).lower(params).compile().as_text()

    # 1. Gradient all-reduces exist.
    assert hlo.count("all-reduce") >= 2, "no gradient all-reduce in compiled HLO"
    assert hlo.count("all-to-all") > 0, "ulysses strategy produced no all-to-all"

    # 2. Per-iteration collectives live inside while bodies.
    while_bodies = set()
    for line in hlo.splitlines():
        if "while(" in line and "body=" in line:
            while_bodies.add("%" + line.split("body=")[1].split(",")[0].split(")")[0].lstrip("%"))
    assert while_bodies, "no while loops survived optimization — shapes too small"
    by_comp = _ops_by_computation(hlo)
    inside = [
        k for comp, kinds in by_comp.items()
        if comp is not None and any(comp.startswith(b) for b in while_bodies)
        for k in kinds
    ]
    assert "all-to-all" in inside or "all-gather" in inside, (
        f"collectives hoisted out of scan bodies; inside={inside}, "
        f"bodies={sorted(while_bodies)[:4]}"
    )

    # And the gradient is real (finite, nonzero) on this mesh.
    g = jax.jit(jax.grad(loss))(params)
    flat = np.concatenate([np.ravel(np.asarray(v)) for v in jax.tree.leaves(g)])
    assert np.isfinite(flat).all() and np.abs(flat).sum() > 0
