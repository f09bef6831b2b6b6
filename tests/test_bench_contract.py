"""Driver contract for `python bench.py`: stdout's LAST line must be one
compact JSON object with {"metric","value","unit","vs_baseline"} (BENCH_r02
showed the driver fails to parse multi-KB lines), and the full suite detail
must land in BENCH_DETAIL.json next to bench.py."""

import json
import os

import gpupathtracer_tpu.bench as bench


def test_bench_main_emits_compact_line(monkeypatch, capsys, tmp_path):
    fake = {
        "metric": "rays_per_sec_chip_fwd",
        "value": 6.2e6,
        "unit": "rays/s",
        "vs_baseline": 1.94,
        "config": "config3_wahoo.toml",
        "fwd_bwd": {"rays_per_sec": 5.6e6},
        "configs": {"config%d" % i: {"rays_per_sec": 1e6, "pad": "x" * 512} for i in range(6)},
    }
    monkeypatch.setattr(bench, "run_benchmark", lambda **kw: dict(fake))
    # Redirect the detail file into tmp_path.
    repo_root = os.path.dirname(os.path.dirname(os.path.abspath(bench.__file__)))
    detail = os.path.join(repo_root, "BENCH_DETAIL.json")
    had = os.path.exists(detail)
    before = open(detail).read() if had else None
    try:
        bench.main()
        out_lines = capsys.readouterr().out.strip().splitlines()
        line = out_lines[-1]
        assert len(line) < 1000, "driver-facing line must stay compact"
        parsed = json.loads(line)
        assert {"metric", "value", "unit", "vs_baseline"} <= set(parsed)
        assert parsed["value"] == fake["value"]
        assert parsed["fwd_bwd_rays_per_sec"] == 5.6e6
        # Full detail is preserved on disk for the judge.
        with open(detail) as f:
            assert json.load(f)["configs"]["config0"]["rays_per_sec"] == 1e6
    finally:
        if had:
            with open(detail, "w") as f:
                f.write(before)
        elif os.path.exists(detail):
            os.remove(detail)
