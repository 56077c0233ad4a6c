"""Eval harness, checkpointing, logging, and end-to-end pipeline tests."""

import dataclasses
import json
import os

import numpy as np
import jax
import jax.numpy as jnp

from jrr_tpu.config import PipelineConfig, RefinerConfig, DataConfig
from jrr_tpu.evals import harness
from jrr_tpu.models import smpl as smpl_mod
from jrr_tpu.ops import jreg as jreg_lib, rotations
from jrr_tpu.utils import checkpoint as ckpt_lib
from jrr_tpu.utils.logging import MetricsLogger


def _model_and_regressors(num_verts=128, seed=0):
    model = smpl_mod.synthetic_smpl_model(seed=seed, num_verts=num_verts, num_faces=200)
    rng = np.random.default_rng(seed)
    j_true = np.zeros((17, num_verts), np.float32)
    for j in range(17):
        j_true[j, rng.choice(num_verts, 6, replace=False)] = rng.uniform(0.5, 1.0, 6)
    j_bad = j_true + np.abs(rng.normal(scale=0.2, size=j_true.shape)).astype(np.float32)
    return model, jnp.asarray(j_true), jnp.asarray(j_bad)


def _prediction_batches(model, j_true, n_batches=2, batch=4, seed=1):
    rng = np.random.default_rng(seed)
    out = []
    for i in range(n_batches):
        pose6d = rotations.rotmat_to_rot6d(
            rotations.random_rotmat(jax.random.PRNGKey(seed + i), (batch, 24))
        )
        betas = jnp.asarray(rng.normal(scale=0.3, size=(batch, 10)).astype(np.float32))
        rotm = rotations.rot6d_to_rotmat(pose6d)
        verts = smpl_mod.smpl_forward(model, betas, rotm[:, :1], rotm[:, 1:]).vertices
        gt = jreg_lib.apply_jreg(jreg_lib.normalize_jreg(j_true), verts) * 1000.0
        out.append(
            {"pose6d": np.asarray(pose6d), "betas": np.asarray(betas), "gt_j3d": np.asarray(gt)}
        )
    return out


class TestHarness:
    def test_regressor_pair_after_beats_before(self):
        model, j_true, j_bad = _model_and_regressors()
        preds = _prediction_batches(model, j_true)
        res = harness.evaluate_regressor_pair(model, preds, j_bad, j_true)
        assert res.after.mpjpe < res.before.mpjpe
        assert res.after.mpjpe < 1e-2  # the true regressor is exact
        assert res.before.num_frames == 8
        assert "MPJPE" in res.summary()

    def test_ragged_batches_use_reference_batch_mean(self):
        """Uniform mean of per-batch means (reference: scripts/test.py:125-138),
        NOT frame-weighted — a ragged last batch must match the reference's
        printed convention digit-for-digit."""
        model, j_true, j_bad = _model_and_regressors()
        big = _prediction_batches(model, j_true, n_batches=1, batch=6, seed=1)
        small = _prediction_batches(model, j_true, n_batches=1, batch=2, seed=9)
        res = harness.evaluate_regressor_pair(model, big + small, j_bad, j_true)

        def batch_mean(b):
            r = harness.evaluate_regressor_pair(model, [b], j_bad, j_true)
            return r.before.mpjpe

        expected = (batch_mean(big[0]) + batch_mean(small[0])) / 2.0
        assert res.before.num_frames == 8
        np.testing.assert_allclose(res.before.mpjpe, expected, rtol=1e-6)

    def test_consumer_adapter(self):
        model, j_true, j_bad = _model_and_regressors()
        preds = _prediction_batches(model, j_true, n_batches=1)

        # A consumer that ignores the image and regresses from stored pose.
        stored = preds[0]

        def consumer(spin_image, j_regressor):
            rotm = rotations.rot6d_to_rotmat(jnp.asarray(stored["pose6d"]))
            verts = smpl_mod.smpl_forward(
                model, jnp.asarray(stored["betas"]), rotm[:, :1], rotm[:, 1:]
            ).vertices
            return jreg_lib.apply_jreg(j_regressor, verts)

        batches = [
            {"spin_image": np.zeros((4, 3, 224, 224), np.float32), "gt_j3d": stored["gt_j3d"]}
        ]
        res = harness.evaluate_consumer(consumer, batches, j_bad, j_true)
        assert res.after.mpjpe < res.before.mpjpe


class TestCheckpoint:
    def test_pytree_npz_roundtrip(self, tmp_path):
        tree = {"a": jnp.arange(4.0), "b": {"c": jnp.ones((2, 3))}}
        p = str(tmp_path / "t.npz")
        ckpt_lib.save_pytree_npz(p, tree)
        back = ckpt_lib.restore_pytree_npz(p, jax.tree.map(jnp.zeros_like, tree))
        np.testing.assert_array_equal(np.asarray(back["a"]), np.arange(4.0))
        np.testing.assert_array_equal(np.asarray(back["b"]["c"]), np.ones((2, 3)))

    def test_train_state_roundtrip(self, tmp_path):
        from jrr_tpu.refine import trainer

        cfg = PipelineConfig()
        state = trainer.init_train_state(jax.random.PRNGKey(0), jnp.ones((17, 32)), cfg)
        path = ckpt_lib.save_train_state(str(tmp_path / "ck"), state, 7)
        restored = ckpt_lib.restore_train_state(path, jax.tree.map(jnp.zeros_like, state))
        np.testing.assert_array_equal(
            np.asarray(restored.j_reg_raw), np.asarray(state.j_reg_raw)
        )

    def test_shard_manifest(self, tmp_path):
        man = ckpt_lib.ShardManifest(str(tmp_path / "out"))
        assert man.completed() == []
        man.write_shard(0, {"x": np.arange(3)})
        man.write_shard(2, {"x": np.arange(3) * 2})
        assert man.completed() == [0, 2]
        assert man.is_done(2) and not man.is_done(1)
        np.testing.assert_array_equal(man.read_shard(2)["x"], [0, 2, 4])


def test_metrics_logger(tmp_path):
    p = str(tmp_path / "m.jsonl")
    log = MetricsLogger(path=p, echo=False)
    log.log({"mpjpe": jnp.asarray(3.5), "note": "x"}, step=2)
    log.close()
    with open(p) as f:
        rec = json.loads(f.readline())
    assert rec["step"] == 2 and abs(rec["mpjpe"] - 3.5) < 1e-6 and rec["note"] == "x"


def test_pipeline_demo_end_to_end(tmp_path):
    from jrr_tpu.pipeline import run_pipeline

    cfg = PipelineConfig(
        refiner=dataclasses.replace(
            RefinerConfig(), stage_a_steps=30, stage_b_steps=15,
            use_silhouette=False, use_discriminators=True,
        ),
        data=DataConfig(batch_size=4),
    )
    arts = run_pipeline(cfg, out_dir=str(tmp_path / "run"), demo=True)
    assert arts.j_reg_final.shape == arts.j_reg_initial.shape
    # Retraining recovers part of the regressor error on the fixtures.
    assert arts.eval_before_after.after.mpjpe < arts.eval_before_after.before.mpjpe
    assert os.path.exists(os.path.join(arts.out_dir, "retrained_j_regressor.npz"))
    # Resume skips completed shards: a second run reuses the manifest quickly.
    arts2 = run_pipeline(cfg, out_dir=str(tmp_path / "run"), demo=True)
    assert arts2.eval_before_after.before.num_frames > 0


def test_pipeline_requires_jreg_init_outside_demo(tmp_path):
    """Training must not silently start from the shipped *retrained* regressor
    (reference starts from J_regressor_h36m.npy, scripts/optimize.py:105-107)."""
    import pytest

    from jrr_tpu import pipeline

    with pytest.raises(ValueError, match="jreg-init"):
        pipeline.run_pipeline(
            PipelineConfig(), data_root=str(tmp_path), out_dir=str(tmp_path / "out"),
            demo=False, jreg_init_path=None,
        )
