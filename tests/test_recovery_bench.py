"""Smoke test for tools/recovery_bench.py — the product-scale recovery
demonstration tool (BASELINE.md round 5, RECOVERY_r05.json).

Runs the FULL build → run → analyze contract at toy scale on CPU in a
subprocess (the tool pins its own backend via --platform; the build phase
always pins cpu). Guards the tool against rot: fixture generation with a
known true regressor, the shipped pipeline run with per-epoch snapshots,
and the analyze phase's prefix-lstsq / adam@k / on-refined-vertices report.
"""

import json
import os
import subprocess
import sys

import pytest

pytestmark = pytest.mark.slow

TOOL = os.path.join(os.path.dirname(__file__), "..", "tools", "recovery_bench.py")


def test_recovery_bench_toy(tmp_path):
    out = subprocess.run(
        [
            sys.executable, TOOL, "--phase", "all", "--root", str(tmp_path),
            "--train-frames", "8", "--heldout-frames", "4", "--epochs", "2",
            "--batch", "4", "--num-verts", "192", "--stage-a", "5",
            "--stage-b", "5", "--platform", "cpu",
        ],
        capture_output=True, text=True, timeout=1500,
    )
    assert out.returncode == 0, (out.stdout[-2000:], out.stderr[-2000:])

    # The run phase printed the product-loop throughput record.
    assert "product_pipeline_frames_per_sec_per_chip" in out.stdout

    rep = json.load(open(tmp_path / "run" / "recovery_analysis.json"))
    assert rep["n_shards"] == 4  # 2 epochs x (8 frames / batch 4)
    for split in ("heldout", "train"):
        rows = rep["splits"][split]
        assert rows["oracle (true)"]["weight_rel_dist_to_oracle"] == 0.0
        for name in ("init (perturbed)", "adam final", "lstsq@4"):
            assert name in rows and "mpjpe" in rows[name]
        assert "gap_closed_frac" in rows["adam final"]
        # Per-epoch Adam snapshots (JRegConfig.snapshot_interval) surfaced.
        assert any(k.startswith("adam@") for k in rows)
    # Circularity diagnostic present for all four reference regressors.
    assert set(rep["on_refined_vertices"]) == {"init", "adam", "lstsq", "oracle"}
    # Online accumulator vs replayed full-prefix solve: at toy scale the
    # quadratic is wildly under-determined and the solve amplifies ~1e-5
    # accumulation differences (same caveat as the resume test in
    # test_pipeline_spin.py), so only coarse agreement is asserted here —
    # the product-scale run recorded rel 0.0 at 256 shards (RECOVERY_r05.json).
    assert rep["run_lstsq_matches_replay_rel"] < 0.05
