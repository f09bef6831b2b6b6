"""Config-5 (inverse rendering) CI coverage: the demo actually optimizes,
and the train-state checkpoint makes interrupted runs bit-identical to
uninterrupted ones (the optimizer-side mirror of the film resume test)."""

import numpy as np
import pytest

from gpupathtracer_tpu.grad.inverse import run_inverse_demo
from gpupathtracer_tpu.utils.checkpoint import load_train_state

# Tiny-but-real workload: 32² image, 2 spp, icosphere(1) — each Adam step is
# a full fwd+bwd through the NEE estimator. Keeps the whole file under ~60 s.
SMALL = dict(width=32, height=32, spp=2, bounces=2, subdivisions=1)


def test_inverse_demo_loss_decreases(tmp_path):
    result = run_inverse_demo(steps=6, lr=5e-2, **SMALL)
    losses = [l for _, l in result["loss_history"]]
    first, last = losses[0], result["final_loss"]
    assert np.isfinite(last)
    assert last < first  # optimization is actually making progress
    # Channel ordering heads toward the truth (R < B) even this early; full
    # per-channel recovery needs ~100 steps (the CLI default) and is a demo,
    # not a smoke-test, property.
    rec = np.asarray(result["albedo_recovered"])
    true = np.asarray(result["albedo_true"])
    assert true[0] < true[2]
    assert rec[0] < rec[2]


def test_inverse_checkpoint_resume_bit_identical(tmp_path):
    ck_a = str(tmp_path / "train_a.pkl")
    ck_b = str(tmp_path / "train_b.pkl")

    run_inverse_demo(steps=4, lr=5e-2, checkpoint_path=ck_a, **SMALL)

    # "Interrupted" run: stop after 2 steps, then rerun to completion.
    run_inverse_demo(steps=2, lr=5e-2, checkpoint_path=ck_b, **SMALL)
    mid = load_train_state(ck_b)
    assert mid is not None and mid["step"] == 2
    run_inverse_demo(steps=4, lr=5e-2, checkpoint_path=ck_b, **SMALL)

    a = load_train_state(ck_a)
    b = load_train_state(ck_b)
    assert a["step"] == b["step"] == 4
    for pa, pb in zip(a["params"].values(), b["params"].values()):
        np.testing.assert_array_equal(np.asarray(pa), np.asarray(pb))


def test_invert_cli_smoke(tmp_path, capsys):
    """`firefly invert` end-to-end (the BASELINE config-5 CLI deliverable)."""
    import json

    from gpupathtracer_tpu.cli import main

    ck = str(tmp_path / "cli_train.pkl")
    rc = main(
        ["invert", "--steps", "2", "--checkpoint", ck,
         "--size", "24", "--spp", "2", "--subdivisions", "1"]
    )
    assert rc == 0
    out = capsys.readouterr().out.strip().splitlines()[-1]
    result = json.loads(out)
    assert result["steps"] == 2 and np.isfinite(result["final_loss"])
    assert load_train_state(ck)["step"] == 2


def test_invert_cli_silhouette_mode(capsys):
    """`firefly invert --mode silhouette`: the edge-gradient task moves
    while the detached gradient is identically zero."""
    import json

    from gpupathtracer_tpu.cli import main

    rc = main(["invert", "--mode", "silhouette", "--steps", "4", "--spp", "4"])
    assert rc == 0
    out = capsys.readouterr().out.strip().splitlines()[-1]
    result = json.loads(out)
    assert result["detached_gradient_at_init"] == 0.0
    # 4 Adam steps at lr 3e-2 move the scale strictly toward the truth.
    assert result["recovered_scale"] < 1.1
