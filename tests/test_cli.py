"""CLI end-to-end coverage: `firefly render` → image file → parse round
trip (the reference's Ctrl+S → saveToPPM path, utilities.h:842-893 — except
ours writes pixels the renderer actually produced, unlike the reference's
stale-buffer bug, SURVEY.md §2.3.10)."""

import json
import os

import numpy as np

from gpupathtracer_tpu.cli import main
from gpupathtracer_tpu.utils.image import read_ppm


def test_render_cli_ppm_roundtrip(tmp_path, capsys):
    out = str(tmp_path / "c1.ppm")
    rc = main(
        ["render", "/root/repo/scenes/config1_triangle.toml", "--out", out, "--spp", "2"]
    )
    assert rc == 0
    assert "rendered 256x256" in capsys.readouterr().out
    img = read_ppm(out)
    assert img.shape == (256, 256, 3) and img.dtype == np.uint8
    # Config 1: emitter backdrop (Le=2 clamps to white) with the black
    # triangle silhouette in front.
    assert (img == 255).mean() > 0.3
    assert (img == 0).all(axis=-1).mean() > 0.02


def test_render_cli_checkpointed_resume(tmp_path, capsys):
    """Progressive + checkpoint through the CLI: a rerun resumes (no-op)
    and produces the identical image file."""
    out1 = str(tmp_path / "a.ppm")
    out2 = str(tmp_path / "b.ppm")
    ck = str(tmp_path / "film.npz")
    args = [
        "render", "/root/repo/scenes/config1_triangle.toml",
        "--spp", "4", "--chunk-spp", "2", "--checkpoint", ck,
    ]
    assert main(args + ["--out", out1]) == 0
    assert os.path.exists(ck)
    assert main(args + ["--out", out2]) == 0  # fully resumed from checkpoint
    capsys.readouterr()
    np.testing.assert_array_equal(read_ppm(out1), read_ppm(out2))


def test_benchmark_cli_json(tmp_path, capsys):
    """`firefly benchmark` emits the driver-consumable JSON line."""
    rc = main(
        ["benchmark", "--scene", "/root/repo/scenes/config1_triangle.toml",
         "--iters", "1", "--warmup", "1"]
    )
    assert rc == 0
    line = capsys.readouterr().out.strip().splitlines()[-1]
    result = json.loads(line)
    assert {"metric", "value", "unit", "vs_baseline"} <= set(result)
    assert result["value"] > 0
