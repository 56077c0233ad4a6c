"""Silhouette-supervision quality at production settings (VERDICT r2 item 2).

Asserts the flagship loss term actually HELPS — not just "does not blow up" —
at the reference's σ=1e-4 (reference: scripts/mesh_renderer.py:28 BlendParams),
and that the blur_radius default is justified by measurement, via the same
protocol as tools/silhouette_quality.py (which records the full-size TPU
numbers in BASELINE.md):

  GT params → hard GT mask; init perturbed with a deliberate SHAPE (betas)
  mismatch the 17 joints cannot pin down; refine under each config; score
  mean per-vertex error and silhouette MSE of the final vertices.

Physics being pinned:
  - blur_radius=0 → coverage (and gradient) exists only INSIDE faces: the
    mask can shrink overflowing regions but cannot pull the mesh outward.
    It still helps (production regime) — the inward gradient plus the
    parametric coupling of betas moves the whole shape.
  - blur_radius>0 opens an outside gradient band: in the mocap-less regime
    (j3d weight 0 — frames with no 3D supervision) outward pull is the only
    signal that can grow a too-thin body, so blur>0 must beat blur=0.
"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import __graft_entry__ as ge
from jrr_tpu.ops import jreg as jreg_lib
from jrr_tpu.refine import engine, losses
from jrr_tpu.render import silhouette_fused as sf


@pytest.fixture(scope="module")
def problem():
    model, j_reg, cfg, init, data, gt_params, gt_verts = ge._synthetic_problem(
        batch=4, num_verts=256, image_size=64, return_gt=True,
        perturb=(0.03, 0.02, 0.6, 0.05),
    )
    data = data._replace(mask=(data.mask > 0.5).astype(jnp.float32))
    return model, j_reg, cfg, init, data, gt_verts


def _run(problem, use_sil, blur, j3d_w, steps=(50, 60)):
    model, j_reg, cfg, init, data, gt_verts = problem
    r = cfg.refiner
    rcfg = dataclasses.replace(
        r,
        stage_a_steps=steps[0], stage_b_steps=steps[1],
        use_silhouette=use_sil, use_discriminators=False,
        silhouette=dataclasses.replace(r.silhouette, blur_radius=blur),
        loss_weights=dataclasses.replace(r.loss_weights, j3d=j3d_w),
    )
    res = engine.refine_batch(model, j_reg, init, data, rcfg)
    vert_mm = float(jnp.mean(jnp.linalg.norm(res.vertices - gt_verts, axis=-1))) * 1000.0

    # Fixed eval spec pinned to σ=1e-4, blur=0 — NOT inherited from the
    # shipped training default (blur 1e-4 since round 3), which would score
    # blur-trained configs on their own objective and bias the comparison.
    spec = losses.rasterizer_spec(r)._replace(blur_radius=0.0)
    tiles = sf.silhouette_tiles_fused(res.vertices, model, res.params.cam_t, spec)
    mask_t = sf.image_to_tiles(data.mask, spec.tile_size)
    sil_mse = float(jnp.mean((tiles - mask_t) ** 2))
    return vert_mm, sil_mse


@pytest.mark.slow
def test_silhouette_helps_at_production_sigma(problem):
    """Five-term production weights, σ=1e-4: adding the silhouette term must
    reduce BOTH the final vertex error and the silhouette error vs a
    no-silhouette run (measured pilot: vert 27.2 → ~22-23 mm)."""
    v_no, s_no = _run(problem, False, 0.0, 1e4)
    v_blur, s_blur = _run(problem, True, 1e-4, 1e4)
    assert v_blur < v_no, (v_blur, v_no)
    assert s_blur < s_no, (s_blur, s_no)


@pytest.mark.slow
def test_blur_band_enables_outward_pull(problem):
    """Mocap-less regime (j3d weight 0, discriminators off): at blur=0 the
    mask can only shrink the mesh (inside-band gradients); a positive blur
    band adds outward pull and must strictly improve BOTH the final vertex
    error and the silhouette error vs blur=0 (measured: vert 82.4 → 68.1 mm,
    sil MSE 0.0555 → 0.0332), and must close the silhouette gap vs having no
    silhouette term at all (0.0572 → 0.0332).

    Recorded caveat (BASELINE.md round 3): in THIS regime the silhouette term
    at the reference's raw weight (100) dominates the weak j2d counterweight
    and trades vertex accuracy for mask agreement — silhouettes are ambiguous
    supervision; the production five-term objective relies on the j3d anchor
    (see test_silhouette_helps_at_production_sigma for the production-regime
    win). So vertex error is asserted blur-vs-blur, not vs the no-sil run."""
    v_no, s_no = _run(problem, False, 0.0, 0.0)
    v_b0, s_b0 = _run(problem, True, 0.0, 0.0)
    v_b4, s_b4 = _run(problem, True, 1e-4, 0.0)
    assert v_b4 < v_b0, (v_b4, v_b0)
    assert s_b4 < s_b0, (s_b4, s_b0)
    assert s_b4 < s_no, (s_b4, s_no)
