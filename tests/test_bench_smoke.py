"""bench.py driver-surface smoke: the recorded artifact must stay parseable.

Runs bench.py in-process (the forced-CPU conftest backend; a subprocess
would re-enter the TPU-tunnel sitecustomize) with the smoke env overrides,
and checks the one-JSON-line contract plus the --write payload.
"""

import json
import runpy
import sys

import pytest


SMOKE_ENV = {
    "BENCH_BATCH": "2",
    "BENCH_POINTS": "256",
    "BENCH_ITERS": "2",
    "BENCH_ICP_ITERS": "2",
    "BENCH_KITTI_ICP_ITERS": "2",
    "BENCH_DTYPE": "float32",
    "BENCH_RANDOM_PARAMS": "1",  # skip the d256 checkpoint load at d256 shapes
}


def _run_bench(monkeypatch, capsys, argv):
    for k, v in SMOKE_ENV.items():
        monkeypatch.setenv(k, v)
    monkeypatch.setattr(sys, "argv", ["bench.py"] + argv)
    runpy.run_path("bench.py", run_name="__main__")
    return capsys.readouterr()


class TestBenchSmoke:
    def test_headline_json_line_and_write(self, monkeypatch, capsys, tmp_path):
        out_path = tmp_path / "bench.json"
        captured = _run_bench(monkeypatch, capsys, ["--write", str(out_path)])
        # stdout carries the driver's one JSON line (stderr has the extras).
        lines = [ln for ln in captured.out.strip().splitlines() if ln.startswith("{")]
        assert len(lines) == 1
        rec = json.loads(lines[0])
        assert rec["metric"] == "3dmatch_registration_pairs_per_sec_per_chip"
        assert rec["value"] > 0 and rec["unit"] == "pairs/sec"
        assert "vs_baseline" in rec
        payload = json.loads(out_path.read_text())
        assert payload["backend"] == "cpu"
        metrics = {r["metric"] for r in payload["results"]}
        assert "3dmatch_registration_pairs_per_sec_per_chip" in metrics
        assert "3dmatch_registration_pairs_per_sec_icp_subsampled" in metrics

    def test_suite_rows_present(self, monkeypatch, capsys, tmp_path):
        """--suite wiring: every workload class emits its row (the suite
        classes have their own shape knobs; keep them above the hardcoded
        pool margins — KITTI subtracts 512)."""
        for k, v in {"BENCH_ITERS": "1", "BENCH_SUITE_KITTI_POINTS": "640",
                     "BENCH_SUITE_DEM_POINTS": "256",
                     "BENCH_SUITE_SERVE_POINTS": "256",
                     "BENCH_SUITE_GAN_POINTS": "384",
                     "BENCH_KITTI_ICP_ITERS": "4",
                     "BENCH_KITTI_ICP_CHUNK": "2"}.items():
            monkeypatch.setenv(k, v)
        out_path = tmp_path / "bench.json"
        _run_bench(monkeypatch, capsys,
                   ["--suite", "--write", str(out_path)])
        metrics = {r["metric"]
                   for r in json.loads(out_path.read_text())["results"]}
        assert {"kitti_registration_pairs_per_sec",
                "kitti_registration_pairs_per_sec_requeue",
                "opengf_dem_patches_per_sec",
                "gt_free_serving_pairs_per_sec",
                "adversarial_train_pairs_per_sec"} <= metrics

    def test_roofline_rows_present(self, monkeypatch, capsys, tmp_path):
        """--roofline wiring: per-stage rows plus a summary with floors.

        The MFU/floor numbers are v5e-peak-relative, meaningless on the CPU
        smoke backend — the test only checks structure and internal
        consistency (stage floors are positive, summary >= compute floor)."""
        out_path = tmp_path / "bench.json"
        _run_bench(monkeypatch, capsys, ["--roofline", "--write", str(out_path)])
        results = json.loads(out_path.read_text())["results"]
        stages = [r for r in results if r["metric"] == "roofline_stage"]
        assert {s["stage"] for s in stages} >= {
            "qkv_proj", "attn_einsums", "merge_proj", "layernorms", "ffn"}
        assert all(s["floor_ms"] > 0 and s["bound"] in ("compute", "memory")
                   for s in stages)
        (summary,) = [r for r in results
                      if r["metric"] == "roofline_forward_summary"]
        assert summary["stage_sum_floor_ms"] >= summary["compute_floor_ms"] > 0
        assert summary["measured_ms"] > 0
        assert 0 < summary["roofline_max_mfu_pct"] <= 100.0

    def test_watchdog_disarmed_after_run(self, monkeypatch, capsys):
        """The stall watchdog must be disarmed once the run completes: its
        thread hard-exits the HOST process (os._exit(4)), and these smoke
        tests execute bench.py inside the pytest process — a still-armed
        watchdog killed full suite runs ~20 min in on slow hosts."""
        for k, v in SMOKE_ENV.items():
            monkeypatch.setenv(k, v)
        monkeypatch.setattr(sys, "argv", ["bench.py"])
        ns = runpy.run_path("bench.py", run_name="__main__")
        capsys.readouterr()
        assert ns["_PROGRESS"][0] is None  # disarmed in the __main__ finally

    def test_unknown_flag_rejected_before_measuring(self, monkeypatch, capsys):
        for k, v in SMOKE_ENV.items():
            monkeypatch.setenv(k, v)
        monkeypatch.setattr(sys, "argv", ["bench.py", "--suit"])
        with pytest.raises(SystemExit) as e:
            runpy.run_path("bench.py", run_name="__main__")
        assert e.value.code == 2
        assert "unknown argument" in capsys.readouterr().err

    def test_write_requires_operand(self, monkeypatch, capsys):
        monkeypatch.setattr(sys, "argv", ["bench.py", "--write"])
        with pytest.raises(SystemExit) as e:
            runpy.run_path("bench.py", run_name="__main__")
        assert e.value.code == 2
