"""Temporal (video) pose model — a VIBE-style regressor-consumer.

The reference evaluates its retrained regressor through external video models
(VIBE/MEVA: per-frame CNN features → GRU → SMPL parameters; reference:
scripts/test.py:141-301 consumes them as black boxes that accept
`J_regressor=`). This is the native realization of that model family for the
consumer-path evaluation (`evals/harness.py`): SPIN's ResNet-50 features per
frame, a stacked (optionally bidirectional) GRU over the sequence with a
linear+residual projection, and the IEF head emitting per-frame
(pose6d, betas, cam).

Published VIBE checkpoints load via `convert_torch_vibe_checkpoint`, the
GRU/linear/regressor twin of `convert_torch_spin_checkpoint`
(models/spin.py:158-225): the reference builds
`VIBE_Demo(seqlen=16, n_layers=2, hidden_size=1024, add_linear=True,
use_residual=True)` and loads `ckpt['gen_state_dict']` with strict=False
(reference: scripts/test.py:146-166) — that state dict carries only
`encoder.*` (temporal GRU) and `regressor.*` (IEF head) tensors, with the
ResNet backbone coming from the SPIN pretrained checkpoint, which is exactly
the split this converter mirrors.
"""

from __future__ import annotations

from typing import Any, Dict, Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from jrr_tpu.models import convert_util, spin as spin_lib


class TemporalEncoder(nn.Module):
    """VIBE's TemporalEncoder semantics: stacked GRU → ReLU → linear →
    +residual.

    (B, T, D) features → (B, T, D). Torch's multi-layer `nn.GRU(n_layers=k)`
    is the chain of k single-layer GRUs, which is how it is expressed here
    (one `nn.RNN(GRUCell)` per layer; a reversed twin per layer when
    bidirectional, concatenated feature-wise like torch's packed layout).
    Matching the published VIBE TemporalEncoder exactly: when the linear
    projection exists, a ReLU is applied to the GRU output FIRST, and the
    projection exists whenever `add_linear` OR `bidirectional` (VIBE always
    creates it for bidirectional GRUs to map 2H back to the feature size).
    """

    hidden_size: int = 1024
    n_layers: int = 1
    bidirectional: bool = False
    out_size: int = 2048
    add_linear: bool = True
    use_residual: bool = True

    @nn.compact
    def __call__(self, feats):
        h = feats
        for k in range(self.n_layers):
            # Name the CELLS (they bind params to this module; nn.RNN is
            # transparent in the param tree).
            fwd = nn.RNN(nn.GRUCell(self.hidden_size, name=f"gru_l{k}"))(h)
            if self.bidirectional:
                bwd = nn.RNN(
                    nn.GRUCell(self.hidden_size, name=f"gru_l{k}_rev"),
                    reverse=True, keep_order=True,
                )(h)
                h = jnp.concatenate([fwd, bwd], axis=-1)
            else:
                h = fwd
        if self.add_linear or self.bidirectional:
            h = nn.Dense(self.out_size, name="linear")(nn.relu(h))
        if self.use_residual and h.shape[-1] == feats.shape[-1]:
            h = h + feats
        return h


class TemporalPoseModel(nn.Module):
    """(B, T, 3, 224, 224) → per-frame (pose6d (B,T,24,6), betas, cam)."""

    hidden_size: int = 1024
    n_layers: int = 1
    bidirectional: bool = False
    n_iter: int = 3

    @nn.compact
    def __call__(self, video, train: bool = False):
        b, t = video.shape[:2]
        frames = video.reshape((b * t,) + video.shape[2:])
        feats = spin_lib.ResNet50(name="backbone")(frames, train=train)  # (B·T, 2048)
        feats = feats.reshape(b, t, -1)

        temporal = TemporalEncoder(
            hidden_size=self.hidden_size, n_layers=self.n_layers,
            bidirectional=self.bidirectional, name="encoder",
        )(feats)

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


def init_temporal(
    key: jax.Array, seqlen: int = 4, image_size: int = 224, **model_kwargs
):
    model = TemporalPoseModel(**model_kwargs)
    variables = model.init(key, jnp.zeros((1, seqlen, 3, image_size, image_size)))
    return model, variables


def vibe_demo_model() -> TemporalPoseModel:
    """The exact configuration the reference instantiates
    (scripts/test.py:153-159): 2-layer unidirectional GRU, hidden 1024,
    add_linear + residual."""
    return TemporalPoseModel(hidden_size=1024, n_layers=2, bidirectional=False)


# ---------------------------------------------------------------------------
# Torch checkpoint conversion (VIBE `gen_state_dict` naming)
# ---------------------------------------------------------------------------


def _gru_cell_params(w_ih, w_hh, b_ih, b_hh, hidden: int):
    """torch GRU layer tensors → flax GRUCell param dict.

    Torch gate order along dim 0 of the (3H, ·) weights is (r, z, n); torch
    keeps separate input/hidden biases per gate while flax folds them:
    r/z gates take b_ih+b_hh (the sums are algebraically identical), and the
    candidate gate keeps them split exactly as torch does (b_in on the input
    Dense, b_hn inside the reset-gated hidden Dense).
    """
    h = hidden
    cut = lambda a, g: a[g * h:(g + 1) * h]
    return {
        "ir": {"kernel": cut(w_ih, 0).T, "bias": cut(b_ih, 0) + cut(b_hh, 0)},
        "iz": {"kernel": cut(w_ih, 1).T, "bias": cut(b_ih, 1) + cut(b_hh, 1)},
        "in": {"kernel": cut(w_ih, 2).T, "bias": cut(b_ih, 2)},
        "hr": {"kernel": cut(w_hh, 0).T},
        "hz": {"kernel": cut(w_hh, 1).T},
        "hn": {"kernel": cut(w_hh, 2).T, "bias": cut(b_hh, 2)},
    }


def convert_torch_vibe_checkpoint(
    gen_state_dict: Dict[str, np.ndarray],
    backbone_variables: Optional[Dict[str, Any]] = None,
    hidden_size: int = 1024,
    n_layers: int = 2,
    bidirectional: bool = False,
) -> Dict[str, Any]:
    """VIBE `ckpt['gen_state_dict']` → flax variables for TemporalPoseModel.

    Accepts the published VIBE naming: `encoder.gru.weight_ih_l{k}[_reverse]`,
    `encoder.linear.{weight,bias}`, `regressor.{fc1,fc2,decpose,decshape,
    deccam}.{weight,bias}`, `regressor.init_{pose,shape,cam}` (reference loads
    this dict at scripts/test.py:161-166). The ResNet backbone is NOT in the
    gen_state_dict (the reference's VIBE_Demo pulls it from the SPIN
    pretrained checkpoint); pass `backbone_variables` from
    `convert_torch_spin_checkpoint` to splice it in. Without it the returned
    tree has NO backbone entries and cannot drive TemporalPoseModel.apply —
    it is only useful for encoder/head-level work until a backbone is
    spliced in.

    Published checkpoints exist with and without the DataParallel `module.`
    prefix — both load; a layout mismatch raises `CheckpointLayoutError`
    with a key-diff report instead of a bare KeyError (VERDICT r3 item 8).
    """
    sd = convert_util.StateDictView(gen_state_dict, "VIBE gen_state_dict")

    encoder: Dict[str, Any] = {}
    for k in range(n_layers):
        encoder[f"gru_l{k}"] = _gru_cell_params(
            sd[f"encoder.gru.weight_ih_l{k}"],
            sd[f"encoder.gru.weight_hh_l{k}"],
            sd[f"encoder.gru.bias_ih_l{k}"],
            sd[f"encoder.gru.bias_hh_l{k}"],
            hidden_size,
        )
        if bidirectional:
            encoder[f"gru_l{k}_rev"] = _gru_cell_params(
                sd[f"encoder.gru.weight_ih_l{k}_reverse"],
                sd[f"encoder.gru.weight_hh_l{k}_reverse"],
                sd[f"encoder.gru.bias_ih_l{k}_reverse"],
                sd[f"encoder.gru.bias_hh_l{k}_reverse"],
                hidden_size,
            )
    if "encoder.linear.weight" in sd:
        encoder["linear"] = {
            "kernel": sd["encoder.linear.weight"].T,
            "bias": sd["encoder.linear.bias"],
        }

    head: Dict[str, Any] = {}
    for lin in ("fc1", "fc2", "decpose", "decshape", "deccam"):
        head[lin] = {
            "kernel": sd[f"regressor.{lin}.weight"].T,
            "bias": sd[f"regressor.{lin}.bias"],
        }

    params: Dict[str, Any] = {
        "encoder": encoder,
        "head": head,
        "init_pose": sd.get(
            "regressor.init_pose", np.zeros((1, spin_lib.NUM_POSE_PARAMS), np.float32)
        ).reshape(1, spin_lib.NUM_POSE_PARAMS),
        "init_shape": sd.get("regressor.init_shape", np.zeros((1, 10), np.float32)).reshape(1, 10),
        "init_cam": sd.get(
            "regressor.init_cam", np.asarray([[0.9, 0.0, 0.0]], np.float32)
        ).reshape(1, 3),
    }

    to_jnp = lambda tree: jax.tree.map(lambda x: jnp.asarray(x, jnp.float32), tree)
    variables: Dict[str, Any] = {"params": to_jnp(params), "batch_stats": {}}
    if backbone_variables is not None:
        variables["params"]["backbone"] = backbone_variables["params"]["backbone"]
        variables["batch_stats"]["backbone"] = backbone_variables["batch_stats"]["backbone"]
    return variables


def make_temporal_consumer(smpl_model, model: TemporalPoseModel, variables, seqlen: int = 4):
    """Adapter: evaluates mid-sequence frames like the reference takes
    kp_3d[:, 0] of each chunk (scripts/test.py:258).

    Returns a RegressorConsumer over frame batches: frames are tiled into a
    length-`seqlen` sequence (single-frame eval mode), the first frame's
    parameters are used. For TRUE video input use
    `make_sequence_consumer` + `harness.evaluate_consumer_sequences`.
    """
    from jrr_tpu.ops import rotations
    from jrr_tpu.models import smpl as smpl_fwd
    from jrr_tpu.ops import jreg as jreg_lib

    # Big arrays as jit ARGUMENTS (axon closure-capture rule, CLAUDE.md).
    @jax.jit
    def _consumer(vs, mdl, spin_image, j_regressor):
        video = jnp.repeat(spin_image[:, None], seqlen, axis=1)
        pose6d, betas, _ = model.apply(vs, video, train=False)
        pose6d = pose6d[:, 0]
        betas = betas[:, 0]
        rotm = rotations.rot6d_to_rotmat(pose6d)
        out = smpl_fwd.smpl_forward(mdl, betas, rotm[:, :1], rotm[:, 1:])
        return jreg_lib.apply_jreg(j_regressor, out.vertices)

    def consumer(spin_image, j_regressor):
        return _consumer(variables, smpl_model, spin_image, j_regressor)

    return consumer


def make_sequence_consumer(smpl_model, model, variables):
    """TRUE video-sequence adapter (reference: scripts/test.py:254-258): the
    model consumes real (C, T, 3, H, W) chunks — the GRU sees actual temporal
    context, not a tiled constant — and returns per-frame joints
    (C, T, 17, 3). Frame selection (the reference reads kp_3d[:, 0] per
    chunk) is the harness's job (`evaluate_consumer_sequences`).

    Works for any temporal model with the (video, train) → (pose6d, betas,
    cam) apply signature (VIBE-style TemporalPoseModel, MEVA-style
    MEVAPoseModel).
    """
    from jrr_tpu.ops import rotations
    from jrr_tpu.models import smpl as smpl_fwd
    from jrr_tpu.ops import jreg as jreg_lib

    # Big arrays (model variables, SMPL tables) ride as jit ARGUMENTS, not
    # closure captures — axon lowering re-fetches captured device arrays
    # through the tunnel on every compile (CLAUDE.md).
    @jax.jit
    def _consumer(vs, mdl, video, j_regressor):
        c, t = video.shape[:2]
        pose6d, betas, _ = model.apply(vs, video, train=False)
        rotm = rotations.rot6d_to_rotmat(pose6d.reshape(c * t, 24, 6))
        out = smpl_fwd.smpl_forward(
            mdl, betas.reshape(c * t, 10), rotm[:, :1], rotm[:, 1:]
        )
        joints = jreg_lib.apply_jreg(j_regressor, out.vertices)
        # A stacked (K, 17, V) regressor yields (K, c·t, 17, 3) — unfold the
        # chunk/time axes in place, keeping any leading regressor axis.
        return joints.reshape(joints.shape[:-3] + (c, t) + joints.shape[-2:])

    def consumer(video, j_regressor):
        return _consumer(variables, smpl_model, video, j_regressor)

    return consumer
