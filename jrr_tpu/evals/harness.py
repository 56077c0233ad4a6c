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
    once up front); returns (B, 17, 3) joints in meters. A stacked (K, 17, V)
    regressor must yield (K, B, 17, 3) — free for any consumer that ends in
    `jreg_lib.apply_jreg` (its einsum broadcasts leading regressor axes), and
    how the harness scores K regressors with ONE pass of the network trunk.
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
        self.add_means(
            float(jnp.mean(errors.per_frame_mpjpe)),
            float(jnp.mean(errors.per_frame_pa_mpjpe)),
            count,
        )

    def add_means(self, mpjpe_mean: float, pampjpe_mean: float, count: int):
        self.mpjpe_sum += float(mpjpe_mean)
        self.pampjpe_sum += float(pampjpe_mean)
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


@jax.jit
def _eval_regressors_jit(model, pose6d, betas, gt_j3d_mm, j_reg_norms):
    """One SMPL forward, K regressors scored on the same vertices.

    Returns (K, 2) batch-mean [MPJPE, PA-MPJPE]. The whole metric —
    including the per-frame Procrustes alignment — stays on device; the
    caller pulls ONE tiny array per batch (every host read on the axon
    backend is a tunnel round trip)."""
    rotmats = rotations.rot6d_to_rotmat(pose6d)
    out = smpl_lib.smpl_forward(model, betas, rotmats[:, :1], rotmats[:, 1:])
    vertices = out.vertices

    def per_reg(norm):
        errors = metrics_lib.evaluate(jreg_lib.apply_jreg(norm, vertices), gt_j3d_mm)
        return jnp.stack([
            jnp.mean(errors.per_frame_mpjpe), jnp.mean(errors.per_frame_pa_mpjpe)
        ])

    return jax.vmap(per_reg)(j_reg_norms)


def evaluate_regressors(
    model: smpl_lib.SMPLModel,
    predictions: Iterable[Dict[str, np.ndarray]],
    j_regs,
    jreg_mask: Optional[jax.Array] = None,
):
    """Score ANY number of regressors over one pass of the predictions.

    The reference's eval (scripts/test.py:76-138) re-runs the body model per
    regressor; here the vertices are computed once per batch and every
    regressor (initial / retrained / lstsq-fit) is applied to them inside one
    jitted program. Returns a list of EvalResult, one per entry of `j_regs`.
    """
    norms = jnp.stack(
        [jreg_lib.normalize_jreg(jnp.asarray(j), jreg_mask) for j in j_regs]
    )
    accs = [_MeanAccumulator() for _ in j_regs]
    for batch in predictions:
        pose6d = jnp.asarray(batch["pose6d"])
        betas = jnp.asarray(batch["betas"])
        gt = jnp.asarray(batch["gt_j3d"])
        means = np.asarray(
            _eval_regressors_jit(model, pose6d, betas, gt, norms)
        )  # (K, 2)
        n = pose6d.shape[0]
        for k, acc in enumerate(accs):
            acc.add_means(means[k, 0], means[k, 1], n)
    return [acc.result() for acc in accs]


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
    before, after = evaluate_regressors(
        model, predictions, [j_reg_initial, j_reg_retrained], jreg_mask
    )
    return BeforeAfter(before=before, after=after)


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
    norms = jnp.stack([
        jreg_lib.normalize_jreg(j_reg_initial, jreg_mask),
        jreg_lib.normalize_jreg(j_reg_retrained, jreg_mask),
    ])

    acc_before, acc_after = _MeanAccumulator(), _MeanAccumulator()
    for batch in batches:
        img = jnp.asarray(batch["spin_image"])
        gt = jnp.asarray(batch["gt_j3d"])
        n = img.shape[0]
        # ONE consumer call scores both regressors: the network trunk
        # (backbone + temporal model + SMPL) does not depend on the
        # regressor — `apply_jreg` broadcasts the stacked (2, 17, V) into
        # (2, B, 17, 3). The reference runs the video model per regressor.
        kp3d_all = consumer(img, norms)
        for kp3d, acc in zip(kp3d_all, (acc_before, acc_after)):
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
    norms = jnp.stack([
        jreg_lib.normalize_jreg(j_reg_initial, jreg_mask),
        jreg_lib.normalize_jreg(j_reg_retrained, jreg_mask),
    ])

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
        # One video-model pass scores both regressors (see evaluate_consumer):
        # stacked output is (2, C, T, 17, 3).
        kp3d_all = seq_consumer(video, norms)
        for kp3d, acc in zip(kp3d_all, (acc_before, acc_after)):
            kp3d = jreg_lib.move_pelvis(kp3d[:, frame_index])
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
