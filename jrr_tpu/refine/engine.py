"""The two-stage refinement engine, compiled as jitted `lax.scan` loops.

Reference behavior (scripts/optimize.py:187-265): per batch, (1) 1000 Adam
steps on the camera translation against the 2D reprojection loss, then (2) 100
Adam steps on (pose, orient, betas, cam) against the full five-term loss, with
fresh Adam states per batch (reference re-creates the optimizers per batch at
optimize.py:187-202 — here each scan simply starts from `optax.adam(...).init`).

TPU-first design decisions:
- Each stage compiles to `lax.scan`s under one `jit` — the entire 1100-step
  refinement of a frame batch is a single XLA program with no host
  round-trips (stage B nests scans when binning is amortized, see below).
- Stage A's SMPL forward is hoisted out of the loop: its loss depends on the
  camera only, so the 3D joints are constants of the scan. The reference
  recomputes the full SMPL forward+backward 1000× (optimize.py:190-199) for
  mathematically identical updates; we compute it once. This alone is a ~40×
  algorithmic saving on stage A.
- Frames are i.i.d.: everything is batch-first, and the same jitted function
  runs sharded over a device mesh (see jrr_tpu/parallel).
"""

from __future__ import annotations

from typing import NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import optax

from jrr_tpu import constants
from jrr_tpu.config import RefinerConfig
from jrr_tpu.models import smpl as smpl_lib
from jrr_tpu.ops import jreg as jreg_lib
from jrr_tpu.refine import losses
from jrr_tpu.refine.losses import FrameBatch, FrameParams, LossTerms


class RefineResult(NamedTuple):
    params: FrameParams
    stage_a_loss: jax.Array  # (stage_a_steps,)
    stage_b_terms: LossTerms  # each (stage_b_steps,)
    joints3d: jax.Array  # (B, 17, 3) final regressed joints (meters)
    vertices: jax.Array  # (B, V, 3) final vertices
    # Rasterizer capacity counters, max over rebin chunks (None when the
    # silhouette term is off or binning is per-step). Never-silent caps.
    bin_stats: Optional["object"] = None


def _hand_feet_grad_mask(grads: FrameParams) -> FrameParams:
    """Zero pose gradients of hand/feet joints (reference:
    scripts/create_smpl_gt.py:757 — legacy capability, off by default)."""
    idx = jnp.asarray(constants.HAND_FEET_ROT_INDICES)
    pose_g = grads.pose6d.at[:, idx, :].set(0.0)
    return grads._replace(pose6d=pose_g)


def _pool_mask(mask: jax.Array, factor: int) -> jax.Array:
    """(B, S, S) → (B, S/f, S/f) mean pooling (matches pipeline mask pooling)."""
    b, s, _ = mask.shape
    t = s // factor
    return mask.reshape(b, t, factor, t, factor).mean(axis=(2, 4))


def refine_batch(
    model: smpl_lib.SMPLModel,
    j_reg_raw: jax.Array,
    init: FrameParams,
    data: FrameBatch,
    cfg: RefinerConfig,
    pose_disc_params=None,
    shape_disc_params=None,
    jreg_mask: Optional[jax.Array] = None,
    freeze_hand_feet: bool = False,
) -> RefineResult:
    """Run stage A + stage B on a batch of frames. Pure; jit/shard at will.

    With `cfg.silhouette.coarse_frac > 0` (and a live silhouette term), stage
    B runs coarse-to-fine: the first floor(coarse_frac · stage_b_steps) steps
    rasterize at image_size/coarse_factor (tile size and bin margin divided
    by the same factor; mask mean-pooled on device, focal auto-scaled by
    losses.rasterizer_spec), the rest at full resolution — still ONE XLA
    program under jit (two chained scans), subject to the coarse_min_image
    quality floor. Quality-validated and measured in tools/c2f_probe.py /
    BASELINE.md round 3.
    """
    sil = cfg.silhouette
    coarse_steps = int(sil.coarse_frac * cfg.stage_b_steps)
    if (
        cfg.use_silhouette
        and data.mask is not None
        and sil.coarse_frac > 0.0
        and coarse_steps > 0
        # Quality floor: below coarse_min_image the coarse supervision is too
        # crude and HURTS (see SilhouetteConfig.coarse_min_image) — fall back
        # to single-resolution rather than degrade silently.
        and sil.image_size // sil.coarse_factor >= sil.coarse_min_image
    ):
        import dataclasses

        if not 0.0 < sil.coarse_frac < 1.0:
            raise ValueError(
                f"coarse_frac={sil.coarse_frac} must lie in [0, 1)"
            )
        factor = sil.coarse_factor
        if factor < 2 or sil.image_size % factor or sil.tile_size % factor:
            raise ValueError(
                f"coarse_factor={factor} must be >= 2 and divide both "
                f"image_size={sil.image_size} and tile_size={sil.tile_size}"
            )
        cfg_coarse = dataclasses.replace(
            cfg,
            stage_b_steps=coarse_steps,
            silhouette=dataclasses.replace(
                sil, coarse_frac=0.0, image_size=sil.image_size // factor,
                tile_size=sil.tile_size // factor,
                bin_margin_px=sil.bin_margin_px / factor,
                step_stride=(
                    sil.step_stride
                    if sil.coarse_step_stride is None
                    else sil.coarse_step_stride
                ),
                # Warm-stride scheduling is a FINE-phase feature; the coarse
                # phase already strides via coarse_step_stride.
                fine_warm_frac=0.0,
                fine_warm_stride=None,
            ),
        )
        cfg_fine = dataclasses.replace(
            cfg,
            stage_a_steps=0,
            stage_b_steps=cfg.stage_b_steps - coarse_steps,
            silhouette=dataclasses.replace(sil, coarse_frac=0.0),
        )
        res1 = refine_batch(
            model, j_reg_raw, init, data._replace(mask=_pool_mask(data.mask, factor)),
            cfg_coarse, pose_disc_params, shape_disc_params, jreg_mask,
            freeze_hand_feet,
        )
        res2 = refine_batch(
            model, j_reg_raw, res1.params, data, cfg_fine, pose_disc_params,
            shape_disc_params, jreg_mask, freeze_hand_feet,
        )
        terms = jax.tree.map(
            lambda a, b: jnp.concatenate([a, b], axis=0),
            res1.stage_b_terms, res2.stage_b_terms,
        )
        if res1.bin_stats is None or res2.bin_stats is None:
            stats = res1.bin_stats if res2.bin_stats is None else res2.bin_stats
        else:
            # Counters are already worst-chunk maxima; keep the worst phase.
            stats = jax.tree.map(jnp.maximum, res1.bin_stats, res2.bin_stats)
        return res2._replace(
            stage_a_loss=res1.stage_a_loss, stage_b_terms=terms, bin_stats=stats
        )

    j_reg_norm = jreg_lib.normalize_jreg(j_reg_raw, jreg_mask)

    # ---- Stage A: camera-only 2D alignment -------------------------------
    out0 = losses.forward_frame(model, init)
    joints3d_fixed = losses.joints_from_verts(j_reg_norm, out0.vertices)

    opt_a = optax.adam(cfg.stage_a_lr)

    def step_a(carry, _):
        cam_t, opt_state = carry

        def loss_fn(c):
            pred2d = losses.reproject_joints(joints3d_fixed, c, cfg)
            return jnp.mean(losses.j2d_loss(pred2d, data.gt_j2d))

        loss, g = jax.value_and_grad(loss_fn)(cam_t)
        updates, opt_state = opt_a.update(g, opt_state, cam_t)
        return (optax.apply_updates(cam_t, updates), opt_state), loss

    (cam_t, _), loss_a = jax.lax.scan(
        step_a, (init.cam_t, opt_a.init(init.cam_t)), None, length=cfg.stage_a_steps
    )
    params = init._replace(cam_t=cam_t)

    # ---- Stage B: full five-term refinement ------------------------------
    opt_b = optax.adam(cfg.stage_b_lr)
    stride = max(1, cfg.silhouette.step_stride)
    # Scheduled fine-phase striding (SilhouetteConfig.fine_warm_*): the first
    # `warm_steps` steps of THIS phase stride at fine_warm_stride, the rest at
    # step_stride. The per-step stride is a traced scalar inside the scan, so
    # both cadences live in ONE compiled program (no extra phase boundary, no
    # Adam reset).
    warm_stride = cfg.silhouette.fine_warm_stride
    if warm_stride is not None and cfg.silhouette.fine_warm_frac > 0.0:
        # Eager validation: a 0/negative stride would reach the traced
        # `step_idx % stride_here` below, and XLA integer mod-by-zero is
        # implementation-defined — it corrupts the schedule without raising.
        if warm_stride < 1:
            raise ValueError(
                f"fine_warm_stride={warm_stride} must be >= 1 when "
                f"fine_warm_frac={cfg.silhouette.fine_warm_frac} > 0"
            )
        if not 0.0 <= cfg.silhouette.fine_warm_frac <= 1.0:
            raise ValueError(
                f"fine_warm_frac={cfg.silhouette.fine_warm_frac} must lie in [0, 1]"
            )
        warm_steps = int(cfg.silhouette.fine_warm_frac * cfg.stage_b_steps)
    else:
        warm_steps = 0

    def step_b(carry, step_idx, bins=None):
        p, opt_state = carry
        # Silhouette step-striding: rasterize every `stride`-th step only
        # (weight × stride on active steps; lax.cond skips the kernel on the
        # rest). stride=1 → predicate None → unconditional (reference
        # behavior, no cond in the graph).
        if warm_steps > 0:
            stride_here = jnp.where(step_idx < warm_steps, warm_stride, stride)
            sil_active = (step_idx % stride_here) == 0
            sil_scale = stride_here.astype(jnp.float32)
        else:
            sil_active = None if stride == 1 else (step_idx % stride == 0)
            sil_scale = None

        def loss_fn(p_):
            return losses.stage_b_loss(
                model, j_reg_norm, pose_disc_params, shape_disc_params, p_, data,
                cfg, bins=bins, sil_active=sil_active, sil_scale=sil_scale,
            )

        (_, terms), grads = jax.value_and_grad(loss_fn, has_aux=True)(p)
        if freeze_hand_feet:
            grads = _hand_feet_grad_mask(grads)
        updates, opt_state = opt_b.update(grads, opt_state, p)
        return (optax.apply_updates(p, updates), opt_state), terms

    # Candidate-list (binning) amortization: vertices move by fractions of a
    # pixel per Adam step, so with bin_margin_px of bbox slack the face→tile
    # lists from the chunk start stay covering for `rebin_interval` steps —
    # binning+sort then costs 1/interval per step. interval=1 ⇒ exact
    # per-step binning (reference behavior either way: the lists only gate
    # which faces are *considered*, coverage is unchanged while within margin).
    inner = cfg.silhouette.rebin_interval if cfg.use_silhouette else 1
    inner = max(1, min(inner, cfg.stage_b_steps))
    while cfg.stage_b_steps % inner != 0:
        inner -= 1

    use_bins = (
        cfg.use_silhouette
        and data.mask is not None
        and inner > 1
    )
    bin_stats = None
    # interior_skip three-state (SilhouetteConfig.interior_skip): the skip
    # only exists on the fused amortized-bins path. None = AUTO (on exactly
    # when that path is active); True = REQUIRE — a probe labeled
    # "interior_skip" must not silently record baseline behavior, so raise
    # when the path is unavailable; False = off.
    _skip_path_active = (
        use_bins
        and losses.resolve_silhouette_backend(losses.rasterizer_spec(cfg))
        == "fused"
    )
    interior_skip = (
        _skip_path_active
        if cfg.silhouette.interior_skip is None
        else cfg.silhouette.interior_skip
    )
    if (
        interior_skip
        and cfg.use_silhouette
        and data.mask is not None
        and cfg.stage_b_steps > 0
        and not _skip_path_active
    ):
        raise ValueError(
            "interior_skip=True requires the fused silhouette backend and "
            "rebin amortization (rebin_interval > 1); got backend="
            f"{cfg.silhouette.backend!r}, rebin_interval="
            f"{cfg.silhouette.rebin_interval}"
        )
    if use_bins:
        from jrr_tpu.render import silhouette as sil_lib
        from jrr_tpu.render import silhouette_fused as sf

        spec = losses.rasterizer_spec(cfg)
        fused = losses.resolve_silhouette_backend(spec) == "fused"

        def outer_body(carry, chunk_idx):
            p, opt_state = carry
            out_now = losses.forward_frame(model, jax.lax.stop_gradient(p))
            cam_sg = jax.lax.stop_gradient(p.cam_t)
            if fused:
                bins = sf.compute_fused_bins(out_now.vertices, model, cam_sg, spec)
                if interior_skip:
                    # Amortized like binning itself: one extra forward render
                    # per rebin marks α-saturated tiles kernel-empty (see
                    # SilhouetteConfig.interior_skip).
                    bins = sf.apply_interior_skip(
                        bins, out_now.vertices, model, cam_sg, spec
                    )
                if cfg.silhouette.lane_pack:
                    # Lane-pack AFTER the skip so pairing works on the
                    # post-skip occupied set (SilhouetteConfig.lane_pack).
                    bins = sf.pack_bins(bins, model.num_verts)
                stats = bins.stats
            else:
                bins = sil_lib.compute_bins(
                    out_now.vertices, model.faces, cam_sg, spec
                )
                stats = None
            carry_out, terms = jax.lax.scan(
                lambda c, x: step_b(c, x, bins=bins), (p, opt_state),
                chunk_idx * inner + jnp.arange(inner),
            )
            return carry_out, (terms, stats)

        (params, _), (terms_b, stats_b) = jax.lax.scan(
            outer_body, (params, opt_b.init(params)),
            jnp.arange(cfg.stage_b_steps // inner),
        )
        terms_b = jax.tree.map(
            lambda x: x.reshape((cfg.stage_b_steps,) + x.shape[2:]), terms_b
        )
        if stats_b is not None:
            # Worst chunk is the representative per-batch figure.
            bin_stats = jax.tree.map(lambda x: jnp.max(x, axis=0), stats_b)
    else:
        (params, _), terms_b = jax.lax.scan(
            step_b, (params, opt_b.init(params)), jnp.arange(cfg.stage_b_steps)
        )

    out = losses.forward_frame(model, params)
    joints3d = losses.joints_from_verts(j_reg_norm, out.vertices)
    return RefineResult(
        params=params,
        stage_a_loss=loss_a,
        stage_b_terms=terms_b,
        joints3d=joints3d,
        vertices=out.vertices,
        bin_stats=bin_stats,
    )


def spin_prediction_to_params(
    spin_pose6d: jax.Array, spin_betas: jax.Array, spin_camera: jax.Array,
    image_size: int = constants.CROP_RES,
) -> FrameParams:
    """SPIN network outputs → initial refinement state
    (reference: scripts/optimize.py:170-182)."""
    from jrr_tpu.render import camera as camera_lib

    return FrameParams(
        pose6d=spin_pose6d[:, 1:],
        orient6d=spin_pose6d[:, :1],
        betas=spin_betas,
        cam_t=camera_lib.weak_perspective_to_translation(spin_camera, image_size),
    )
