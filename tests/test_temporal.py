"""Temporal (VIBE-style) consumer model."""

import numpy as np
import jax
import jax.numpy as jnp

from jrr_tpu.models import smpl as smpl_mod, temporal
from jrr_tpu.ops import jreg as jreg_lib
from jrr_tpu.evals import harness


def test_temporal_shapes_and_consumer():
    model, variables = temporal.init_temporal(jax.random.PRNGKey(0), seqlen=2, image_size=64)
    video = jnp.zeros((1, 2, 3, 64, 64))
    pose, betas, cam = model.apply(variables, video, train=False)
    assert pose.shape == (1, 2, 24, 6)
    assert betas.shape == (1, 2, 10)
    assert cam.shape == (1, 2, 3)

    smpl_model = smpl_mod.synthetic_smpl_model(seed=0, num_verts=96, num_faces=120)
    rng = np.random.default_rng(0)
    j = np.zeros((17, 96), np.float32)
    for k in range(17):
        j[k, rng.choice(96, 6, replace=False)] = 1.0
    j_norm = jreg_lib.normalize_jreg(jnp.asarray(j))

    consumer = temporal.make_temporal_consumer(smpl_model, model, variables, seqlen=2)
    kp3d = consumer(jnp.zeros((2, 3, 64, 64)), j_norm)
    assert kp3d.shape == (2, 17, 3)
    assert np.isfinite(np.asarray(kp3d)).all()

    # Through the before/after harness.
    batches = [{
        "spin_image": np.zeros((2, 3, 64, 64), np.float32),
        "gt_j3d": np.asarray(kp3d) * 1000.0,
    }]
    res = harness.evaluate_consumer(consumer, batches, jnp.asarray(j), jnp.asarray(j))
    assert res.after.mpjpe < 1e-3  # self-consistent by construction
