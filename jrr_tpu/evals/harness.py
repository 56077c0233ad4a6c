"""Protocol-2 evaluation harness and the regressor-consumer adapter.

Reproduces the reference's two eval paths:

- `evaluate_regressor_pair`: the SPIN-path before/after comparison
  (reference: scripts/test.py:33-138) — for each batch, run the initializer,
  regress joints with the original and the retrained regressor, and report
  mean MPJPE / PA-MPJPE for both.
- `RegressorConsumer` + `evaluate_consumer`: the VIBE/MEVA-style eval
  (reference: scripts/test.py:141-301) reduced to its actual interface — any
  model that accepts a (pre-normalized) J_regressor and returns 3D keypoints
  per frame. The reference reaches across repo boundaries with sys.path/chdir
  hacks; here consumers implement one callable.
"""

from __future__ import annotations

import dataclasses
from typing import Callable, Dict, Iterable, Optional, Protocol

import jax
import jax.numpy as jnp
import numpy as np

from jrr_tpu.evals import metrics as metrics_lib
from jrr_tpu.models import smpl as smpl_lib
from jrr_tpu.ops import jreg as jreg_lib, rotations


class RegressorConsumer(Protocol):
    """A model that consumes a row-stochastic (17, V) regressor.

    Called with an ImageNet-normalized (B, 3, 224, 224) crop batch and the
    pre-normalized regressor (reference: scripts/test.py:206-212 normalizes
    once up front); returns (B, 17, 3) joints in meters.
    """

    def __call__(self, spin_image: jax.Array, j_regressor: jax.Array) -> jax.Array: ...


@dataclasses.dataclass
class EvalResult:
    mpjpe: float
    pa_mpjpe: float
    num_frames: int


@dataclasses.dataclass
class BeforeAfter:
    before: EvalResult
    after: EvalResult

    def summary(self) -> str:
        # Same report structure as the reference printout (scripts/test.py:125-138).
        return (
            f"MPJPE\n{self.before.mpjpe:.4f}\nPAMPJPE\n{self.before.pa_mpjpe:.4f}\n\n"
            f"after\nMPJPE\n{self.after.mpjpe:.4f}\nPAMPJPE\n{self.after.pa_mpjpe:.4f}"
        )


class _MeanAccumulator:
    """Uniform mean of per-batch means, reference-exact: scripts/test.py
    accumulates `np.mean(error)` per batch and divides by the batch count
    (reference: scripts/test.py:125-138). Identical to frame-weighting when
    batches are equal-sized; for a ragged last batch the reference's
    convention is kept so printed numbers match digit-for-digit."""

    def __init__(self):
        self.mpjpe_sum = 0.0
        self.pampjpe_sum = 0.0
        self.n = 0
        self.batches = 0

    def add(self, errors: metrics_lib.PoseErrors, count: int):
        self.mpjpe_sum += float(jnp.mean(errors.per_frame_mpjpe))
        self.pampjpe_sum += float(jnp.mean(errors.per_frame_pa_mpjpe))
        self.n += count
        self.batches += 1

    def result(self) -> EvalResult:
        b = max(self.batches, 1)
        return EvalResult(self.mpjpe_sum / b, self.pampjpe_sum / b, self.n)


@jax.jit
def _joints_jit(model, pose6d, betas, j_reg_norm):
    rotmats = rotations.rot6d_to_rotmat(pose6d)
    out = smpl_lib.smpl_forward(model, betas, rotmats[:, :1], rotmats[:, 1:])
    return jreg_lib.apply_jreg(j_reg_norm, out.vertices)


def smpl_joint_fn(model: smpl_lib.SMPLModel):
    """jitted: (pose6d24, betas, j_reg_norm) → (B, 17, 3) joints in meters.

    The model rides as a jit *argument* (one shared compile cache; closure
    constants would also be re-fetched through the device tunnel at every
    lowering — see .claude/skills/verify/SKILL.md)."""

    def fn(pose6d, betas, j_reg_norm):
        return _joints_jit(model, pose6d, betas, j_reg_norm)

    return fn


def evaluate_regressor_pair(
    model: smpl_lib.SMPLModel,
    predictions: Iterable[Dict[str, np.ndarray]],
    j_reg_initial: jax.Array,
    j_reg_retrained: jax.Array,
    jreg_mask: Optional[jax.Array] = None,
) -> BeforeAfter:
    """SPIN-path protocol-2 eval (reference: scripts/test.py:76-138).

    `predictions` yields dicts with 'pose6d' (B, 24, 6), 'betas' (B, 10),
    'gt_j3d' (B, 17, 3) mm — i.e. initializer outputs per batch.
    """
    joints = smpl_joint_fn(model)
    norm_init = jreg_lib.normalize_jreg(j_reg_initial, jreg_mask)
    norm_retr = jreg_lib.normalize_jreg(j_reg_retrained, jreg_mask)

    acc_before, acc_after = _MeanAccumulator(), _MeanAccumulator()
    for batch in predictions:
        pose6d = jnp.asarray(batch["pose6d"])
        betas = jnp.asarray(batch["betas"])
        gt = jnp.asarray(batch["gt_j3d"])
        n = pose6d.shape[0]
        acc_before.add(metrics_lib.evaluate(joints(pose6d, betas, norm_init), gt), n)
        acc_after.add(metrics_lib.evaluate(joints(pose6d, betas, norm_retr), gt), n)
    return BeforeAfter(before=acc_before.result(), after=acc_after.result())


def evaluate_consumer(
    consumer: RegressorConsumer,
    batches: Iterable[Dict[str, np.ndarray]],
    j_reg_initial: jax.Array,
    j_reg_retrained: jax.Array,
    jreg_mask: Optional[jax.Array] = None,
) -> BeforeAfter:
    """VIBE/MEVA-style eval through the consumer adapter
    (reference: scripts/test.py:237-301): the regressors are normalized once,
    predictions are pelvis-centered, before/after compared on the same batches.
    """
    norm_init = jreg_lib.normalize_jreg(j_reg_initial, jreg_mask)
    norm_retr = jreg_lib.normalize_jreg(j_reg_retrained, jreg_mask)

    acc_before, acc_after = _MeanAccumulator(), _MeanAccumulator()
    for batch in batches:
        img = jnp.asarray(batch["spin_image"])
        gt = jnp.asarray(batch["gt_j3d"])
        n = img.shape[0]
        for norm, acc in ((norm_init, acc_before), (norm_retr, acc_after)):
            kp3d = consumer(img, norm)
            kp3d = jreg_lib.move_pelvis(kp3d)
            acc.add(metrics_lib.evaluate(kp3d, gt), n)
    return BeforeAfter(before=acc_before.result(), after=acc_after.result())


def evaluate_consumer_sequences(
    seq_consumer,
    batches: Iterable[Dict[str, np.ndarray]],
    j_reg_initial: jax.Array,
    j_reg_retrained: jax.Array,
    seqlen: int = 16,
    frame_index: int = 0,
    jreg_mask: Optional[jax.Array] = None,
) -> BeforeAfter:
    """TRUE video-sequence consumer eval (reference: scripts/test.py:254-273).

    The reference chunks the frame stream into seqlen-16 sequences, runs the
    video model on each chunk, and evaluates `kp_3d[:, 0]` of every chunk
    against that frame's GT. Here: each batch's frames (assumed in temporal
    order) are reshaped into (B//seqlen, seqlen) chunks, `seq_consumer`
    (from `temporal.make_sequence_consumer`) consumes the REAL sequences, and
    the `frame_index`-th frame of each chunk is scored. Leftover frames that
    don't fill a chunk are dropped (the reference's chunking drops them too).
    """
    norm_init = jreg_lib.normalize_jreg(j_reg_initial, jreg_mask)
    norm_retr = jreg_lib.normalize_jreg(j_reg_retrained, jreg_mask)

    acc_before, acc_after = _MeanAccumulator(), _MeanAccumulator()
    for batch in batches:
        img = np.asarray(batch["spin_image"])
        gt = np.asarray(batch["gt_j3d"])
        n_chunks = img.shape[0] // seqlen
        if n_chunks == 0:
            continue
        video = jnp.asarray(
            img[: n_chunks * seqlen].reshape((n_chunks, seqlen) + img.shape[1:])
        )
        gt_sel = jnp.asarray(
            gt[: n_chunks * seqlen].reshape((n_chunks, seqlen) + gt.shape[1:])[
                :, frame_index
            ]
        )
        for norm, acc in ((norm_init, acc_before), (norm_retr, acc_after)):
            kp3d = seq_consumer(video, norm)[:, frame_index]
            kp3d = jreg_lib.move_pelvis(kp3d)
            acc.add(metrics_lib.evaluate(kp3d, gt_sel), n_chunks)
    return BeforeAfter(before=acc_before.result(), after=acc_after.result())


def make_spin_consumer(model: smpl_lib.SMPLModel, spin_model, spin_variables):
    """The SPIN network as a RegressorConsumer (for consumer-path testing)."""
    from jrr_tpu.models import spin as spin_lib

    joints = smpl_joint_fn(model)

    def consumer(spin_image, j_regressor):
        pose6d, betas, _ = spin_lib.spin_apply(spin_model, spin_variables, spin_image)
        return joints(pose6d, betas, j_regressor)

    return consumer
