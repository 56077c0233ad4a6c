"""Temporal (video) pose model — a VIBE-style regressor-consumer.

The reference evaluates its retrained regressor through external video models
(VIBE/MEVA: per-frame CNN features → GRU → SMPL parameters; reference:
scripts/test.py:141-301 consumes them as black boxes that accept
`J_regressor=`). This is a native minimal realization of that model family so
the consumer-path evaluation (`evals/harness.py`) has an in-repo temporal
model: SPIN's ResNet-50 features per frame, a GRU over the sequence, and an
IEF-style head emitting per-frame (pose6d, betas, cam). Weights are
framework-native (no published checkpoint conversion is attempted — VIBE/MEVA
checkpoints live in external repos the reference reaches via sys.path hacks).
"""

from __future__ import annotations

from typing import Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from jrr_tpu.models import spin as spin_lib


class TemporalPoseModel(nn.Module):
    """(B, T, 3, 224, 224) → per-frame (pose6d (B,T,24,6), betas, cam)."""

    hidden_size: int = 1024
    n_iter: int = 3

    @nn.compact
    def __call__(self, video, train: bool = False):
        b, t = video.shape[:2]
        frames = video.reshape((b * t,) + video.shape[2:])
        feats = spin_lib.ResNet50(name="backbone")(frames, train=train)  # (B·T, 2048)
        feats = feats.reshape(b, t, -1)

        gru = nn.RNN(nn.GRUCell(self.hidden_size), name="gru")
        temporal = gru(feats)  # (B, T, H)
        # Residual connection as in VIBE's add_linear/use_residual path.
        temporal = feats + nn.Dense(2048, name="proj")(temporal)

        flat = temporal.reshape(b * t, 2048)
        init_pose = jnp.broadcast_to(
            self.param("init_pose", nn.initializers.zeros, (1, spin_lib.NUM_POSE_PARAMS)),
            (b * t, spin_lib.NUM_POSE_PARAMS),
        )
        init_shape = jnp.broadcast_to(self.param("init_shape", nn.initializers.zeros, (1, 10)), (b * t, 10))
        init_cam = jnp.broadcast_to(
            self.param("init_cam", lambda k, s: jnp.asarray([[0.9, 0.0, 0.0]]), (1, 3)),
            (b * t, 3),
        )
        pose, betas, cam = spin_lib.SPINRegressor(n_iter=self.n_iter, name="head")(
            flat, init_pose, init_shape, init_cam, train=train
        )
        return (
            pose.reshape(b, t, 24, 6),
            betas.reshape(b, t, 10),
            cam.reshape(b, t, 3),
        )


def init_temporal(key: jax.Array, seqlen: int = 4, image_size: int = 224):
    model = TemporalPoseModel()
    variables = model.init(key, jnp.zeros((1, seqlen, 3, image_size, image_size)))
    return model, variables


def make_temporal_consumer(smpl_model, model: TemporalPoseModel, variables, seqlen: int = 4):
    """Adapter: evaluates mid-sequence frames like the reference takes
    kp_3d[:, 0] of each chunk (scripts/test.py:258).

    Returns a RegressorConsumer over frame batches: frames are tiled into a
    length-`seqlen` sequence (single-frame eval mode), the first frame's
    parameters are used.
    """
    from jrr_tpu.evals import harness
    from jrr_tpu.ops import rotations
    from jrr_tpu.models import smpl as smpl_fwd
    from jrr_tpu.ops import jreg as jreg_lib

    @jax.jit
    def consumer(spin_image, j_regressor):
        video = jnp.repeat(spin_image[:, None], seqlen, axis=1)
        pose6d, betas, _ = model.apply(variables, video, train=False)
        pose6d = pose6d[:, 0]
        betas = betas[:, 0]
        rotm = rotations.rot6d_to_rotmat(pose6d)
        out = smpl_fwd.smpl_forward(smpl_model, betas, rotm[:, :1], rotm[:, 1:])
        return jreg_lib.apply_jreg(j_regressor, out.vertices)

    return consumer
