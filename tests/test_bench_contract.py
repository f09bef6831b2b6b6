"""Driver contract for `python bench.py`: stdout's LAST line must be one
compact JSON object with {"metric","value","unit","vs_baseline"} (BENCH_r02
showed the driver fails to parse multi-KB lines), and the full suite detail
must land in BENCH_DETAIL.json next to bench.py."""

import json
import os

import gpupathtracer_tpu.bench as bench

FAKE = {
    "metric": "rays_per_sec_chip_fwd",
    "value": 6.2e6,
    "unit": "rays/s",
    "vs_baseline": 1.94,
    "config": "config3_wahoo.toml",
    "fwd_bwd": {"rays_per_sec": 5.6e6},
    "configs": {"config%d" % i: {"rays_per_sec": 1e6, "pad": "x" * 512} for i in range(6)},
}


def test_bench_main_emits_compact_line(monkeypatch, capsys, tmp_path):
    monkeypatch.setattr(bench, "run_benchmark", lambda **kw: dict(FAKE))
    # Point the detail file into tmp_path — the real repo file is untouched.
    detail = str(tmp_path / "BENCH_DETAIL.json")
    monkeypatch.setattr(bench, "DETAIL_PATH", detail)
    bench.main()
    out_lines = capsys.readouterr().out.strip().splitlines()
    line = out_lines[-1]
    assert len(line) < 1000, "driver-facing line must stay compact"
    parsed = json.loads(line)
    assert {"metric", "value", "unit", "vs_baseline"} <= set(parsed)
    assert parsed["value"] == FAKE["value"]
    assert parsed["fwd_bwd_rays_per_sec"] == 5.6e6
    assert parsed["detail"] == "BENCH_DETAIL.json"
    # Full detail is preserved on disk for the judge.
    with open(detail) as f:
        assert json.load(f)["configs"]["config0"]["rays_per_sec"] == 1e6


def test_bench_main_detail_write_failure_is_flagged(monkeypatch, capsys, tmp_path):
    """An unwritable detail path must null the compact line's "detail" field
    and warn on stderr — a stale BENCH_DETAIL.json must never read as if it
    matched the printed headline (ADVICE r3)."""
    monkeypatch.setattr(bench, "run_benchmark", lambda **kw: dict(FAKE))
    monkeypatch.setattr(bench, "DETAIL_PATH", str(tmp_path / "no_such_dir" / "d.json"))
    bench.main()
    cap = capsys.readouterr()
    parsed = json.loads(cap.out.strip().splitlines()[-1])
    assert parsed["detail"] is None
    assert "could not write" in cap.err
