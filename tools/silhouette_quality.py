"""Silhouette-supervision quality probe at production settings.

VERDICT r2 item 2: the default config is the reference's σ=1e-4 /
blur_radius=0 (reference: scripts/mesh_renderer.py:28-38 BlendParams +
raster blur), where coverage gradients exist only in a ~1-2 px band INSIDE
each edge — the mask cannot pull the mesh outward. This probe measures, on the
full-size body model, whether the silhouette term actually HELPS, and which
blur_radius to ship as the validated default.

Protocol (per supervision regime):
  GT params → GT mask (σ=1e-4/blur=0 render, thresholded to a hard mask like
  a Mask-RCNN output); init = GT + perturbation (incl. a deliberate shape
  mismatch the 17 joints alone cannot pin down). Run the two-stage engine
  under each config and report:
    - mpjpe_mm: final regressed-joint error vs GT joints;
    - vert_mm: final mean per-vertex error vs GT vertices (the SHAPE metric
      silhouette supervision is supposed to move);
    - sil_mse: mean sq. silhouette error of the final vertices, rendered at
      the FIXED evaluation spec (σ=1e-4, blur=0) for cross-config comparability;
    - iou: hard-silhouette IoU at threshold 0.5.

Regimes:
  production  — the reference's five-term weights (j3d 1e4 dominates; shows
                the term does not hurt, and what it adds on top);
  no_j3d      — j3d weight 0 (mocap-less frames): j2d + silhouette must carry
                the shape/depth signal; isolates the silhouette contribution.

Usage: python tools/silhouette_quality.py [--batch 32] [--image 224]
Writes one JSON line per (regime, config) and a final summary line.
"""

from __future__ import annotations

import argparse
import dataclasses
import json
import sys
import time

sys.path.insert(0, __file__.rsplit("/", 2)[0])


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=32)
    ap.add_argument("--image", type=int, default=224)
    ap.add_argument("--num-verts", type=int, default=6890)
    ap.add_argument("--stage-a", type=int, default=200)
    ap.add_argument("--stage-b", type=int, default=100)
    ap.add_argument("--betas-perturb", type=float, default=0.6)
    ap.add_argument(
        "--seed", type=int, default=0,
        help="problem-instance seed (body geometry + poses + init noise); "
             "vary to quantify gate variance across scene instances — the "
             "round-5 thin-vs-standard-body discrepancy showed config deltas "
             "are scene-dependent (BASELINE.md round 5)",
    )
    ap.add_argument(
        "--thin-appendage-radius", type=float, default=0.0,
        help="meters; >0 builds the THIN-STRUCTURE gate body (finger-scale "
             "tubes on hands/feet, ~2 px wide at 0.01 — VERDICT r4 item 5) "
             "and adds a vert_mm_thin column restricted to those vertices",
    )
    ap.add_argument("--platform", default=None)
    ap.add_argument("--configs", nargs="+", default=None,
                    help="subset of sweep configs to run (default: all)")
    ap.add_argument("--regimes", nargs="+", default=None,
                    help="subset of regimes (production, no_j3d)")
    args = ap.parse_args()

    import jax

    if args.platform:
        jax.config.update("jax_platforms", args.platform)

    import jax.numpy as jnp
    import numpy as np

    import __graft_entry__ as ge
    from jrr_tpu.models import discriminator as disc_lib
    from jrr_tpu.refine import engine, losses
    from jrr_tpu.render import silhouette_fused as sf

    from jrr_tpu.models import smpl as smpl_mod

    appendage_verts = None
    model_override = None
    if args.thin_appendage_radius > 0.0:
        model_override, aux = smpl_mod.synthetic_smpl_model(
            seed=args.seed, num_verts=args.num_verts,
            thin_appendage_radius=args.thin_appendage_radius, return_aux=True,
        )
        appendage_verts = jnp.asarray(aux["appendage_verts"])
    model, j_reg, cfg0, init, data, gt_params, gt_verts = ge._synthetic_problem(
        batch=args.batch, num_verts=args.num_verts, image_size=args.image,
        return_gt=True, model=model_override, seed=args.seed,
        # Deliberate SHAPE mismatch: betas off by a lot — 17 joints cannot
        # pin down limb girth; the silhouette can.
        perturb=(0.03, 0.02, args.betas_perturb, 0.05),
    )
    # Hard GT mask (like Mask-RCNN output): threshold the soft render.
    data = data._replace(mask=(data.mask > 0.5).astype(jnp.float32))

    from jrr_tpu.ops import jreg as jreg_lib

    j_norm = jreg_lib.normalize_jreg(j_reg)
    gt_joints = jreg_lib.apply_jreg(j_norm, gt_verts)
    pose_disc = disc_lib.init_pose_discriminator(jax.random.PRNGKey(7))
    shape_disc = disc_lib.init_shape_discriminator(jax.random.PRNGKey(8))

    # FIXED eval spec, pinned explicitly: σ=1e-4, blur=0 — the hard-edge
    # objective every config is scored against, independent of what
    # SilhouetteConfig ships as the *training* default (which is blur 1e-4
    # since round 3; inheriting it here would score blur-trained configs on
    # their own training objective and bias the comparison).
    eval_spec = losses.rasterizer_spec(cfg0.refiner)._replace(blur_radius=0.0)

    def make_run(rcfg):
        # rcfg is a static closure (configs aren't pytrees); each config is
        # its own compile regardless. Big arrays all ride as jit arguments.
        return jax.jit(
            lambda mdl, jr, i, d, pd, sd: engine.refine_batch(
                mdl, jr, i, d, rcfg, pd, sd
            )
        )

    # j_norm rides as a jit argument (axon closure-capture rule, CLAUDE.md).
    @jax.jit
    def _score(jn, mdl, verts, cam_t, gt_v, gt_j, mask):
        vert_mm = jnp.mean(jnp.linalg.norm(verts - gt_v, axis=-1)) * 1000.0
        joints = jreg_lib.apply_jreg(jn, verts)
        mpjpe = jnp.mean(jnp.linalg.norm(joints - gt_j, axis=-1)) * 1000.0
        tiles = sf.silhouette_tiles_fused(verts, mdl, cam_t, eval_spec)
        mask_t = sf.image_to_tiles(mask, eval_spec.tile_size)
        sil_mse = jnp.mean((tiles - mask_t) ** 2)
        hard = tiles > 0.5
        hm = mask_t > 0.5
        iou = jnp.sum(hard & hm) / jnp.maximum(jnp.sum(hard | hm), 1)
        return mpjpe, vert_mm, sil_mse, iou

    def score(mdl, verts, cam_t, gt_v, gt_j, mask):
        return _score(j_norm, mdl, verts, cam_t, gt_v, gt_j, mask)

    @jax.jit
    def _thin_err(verts, gt_v, idx):
        return jnp.mean(
            jnp.linalg.norm(verts[:, idx] - gt_v[:, idx], axis=-1)
        ) * 1000.0

    def thin_err(verts):
        if appendage_verts is None:
            return None
        return round(float(_thin_err(verts, gt_verts, appendage_verts)), 3)

    def config(use_sil, blur, j3d_w, stride=1, **sil_extra):
        r = cfg0.refiner
        return dataclasses.replace(
            r,
            stage_a_steps=args.stage_a, stage_b_steps=args.stage_b,
            use_silhouette=use_sil,
            silhouette=dataclasses.replace(
                r.silhouette, blur_radius=blur, step_stride=stride, **sil_extra
            ),
            loss_weights=dataclasses.replace(r.loss_weights, j3d=j3d_w),
        )

    all_sweeps = [
        # Reference-exact semantics: blur 0, every-step silhouette,
        # single-resolution, near-per-step binning, no interior skip — the
        # r3_perf "ref_exact_full" configuration (scripts/mesh_renderer.py:34-38
        # raster settings), the comparison anchor for the thin-structure gate.
        ("ref_exact_full", True, 0.0, 1,
         dict(rebin_interval=20, bin_margin_px=6.0, coarse_frac=0.0,
              interior_skip=False, coarse_step_stride=None)),
        ("no_sil", False, 0.0, 1, {}), ("blur_0", True, 0.0, 1, {}),
        ("blur_1e-5", True, 1e-5, 1, {}), ("blur_1e-4", True, 1e-4, 1, {}),
        ("blur_1e-3", True, 1e-3, 1, {}),
        # Step-striding / rebin-interval quality probes (perf wins measured
        # in tools/r3_perf.py).
        ("stride2", True, 0.0, 2, {}), ("stride4", True, 0.0, 4, {}),
        ("stride2_blur_1e-4", True, 1e-4, 2, {}),
        ("stride2_blur_1e-4_i50", True, 1e-4, 2,
         dict(rebin_interval=50, bin_margin_px=8.0)),
        # stride 4 measured 68 frames/s/chip in r3_perf but was only ever
        # quality-gated at blur 0; this decides whether the 1.6x is shippable.
        ("stride4_blur_1e-4_i50", True, 1e-4, 4,
         dict(rebin_interval=50, bin_margin_px=8.0)),
        ("stride2_blur_1e-4_i100", True, 1e-4, 2,
         dict(rebin_interval=100, bin_margin_px=12.0)),
        # Interior-saturated-tile skip quality gate vs the shipped r3 config
        # (gradient-neutral by design — tests/test_interior_skip.py — but the
        # full-size TPU run is the shipping criterion, like every default).
        ("stride2_blur_1e-4_i50_iskip", True, 1e-4, 2,
         dict(rebin_interval=50, bin_margin_px=8.0, interior_skip=True)),
        # Round-4 lane-packing gate: the FULL shipped config ± lane_pack
        # (identical otherwise). Exact at bin time by construction; the
        # quality delta, if any, comes from packed tiles' thinner
        # nearest-first margin slack across the rebin window (ADVICE r3).
        ("r4_shipped", True, 1e-4, 2,
         dict(rebin_interval=50, bin_margin_px=8.0, interior_skip=True)),
        ("r4_lanepack", True, 1e-4, 2,
         dict(rebin_interval=50, bin_margin_px=8.0, interior_skip=True,
              lane_pack=True)),
        # Round-4 stride refinements vs the shipped config (r4_shipped):
        # stride 3 sits between the shipped 2 and the quality-rejected 4;
        # coarse_step_stride=4 strides only the basin-widening coarse phase,
        # leaving the fine phase's band-scale polish at stride 2.
        ("r4_stride3", True, 1e-4, 3,
         dict(rebin_interval=50, bin_margin_px=8.0, interior_skip=True)),
        ("r4_coarse_stride4", True, 1e-4, 2,
         dict(rebin_interval=50, bin_margin_px=8.0, interior_skip=True,
              coarse_step_stride=4)),
        ("r4_stride3_coarse4", True, 1e-4, 3,
         dict(rebin_interval=50, bin_margin_px=8.0, interior_skip=True,
              coarse_step_stride=4)),
        # Round-4 scheduled fine-phase striding gate: the shipped config
        # (incl. coarse_step_stride=4) ± fine_warm_* — early fine steps at
        # the coarse cadence (4), final polish kept at stride 2
        # (SilhouetteConfig.fine_warm_*; perf in tools/r3_perf.py
        # fine_warm4_*). r4_shipped_c4 is the same-session baseline.
        ("r4_shipped_c4", True, 1e-4, 2,
         dict(rebin_interval=50, bin_margin_px=8.0, interior_skip=True,
              coarse_step_stride=4)),
        ("r4_warm4_half", True, 1e-4, 2,
         dict(rebin_interval=50, bin_margin_px=8.0, interior_skip=True,
              coarse_step_stride=4, fine_warm_frac=0.5, fine_warm_stride=4)),
        ("r4_warm4_60", True, 1e-4, 2,
         dict(rebin_interval=50, bin_margin_px=8.0, interior_skip=True,
              coarse_step_stride=4, fine_warm_frac=0.6, fine_warm_stride=4)),
    ]
    sweeps = [s for s in all_sweeps if args.configs is None or s[0] in args.configs]
    all_regimes = [("production", 1e4), ("no_j3d", 0.0)]
    regimes = [r for r in all_regimes if args.regimes is None or r[0] in args.regimes]

    # Init-state scores for context.
    out0 = losses.forward_frame(model, init)
    m0 = score(model, out0.vertices, init.cam_t, gt_verts, gt_joints, data.mask)
    rec0 = {
        "config": "init", "mpjpe_mm": float(m0[0]), "vert_mm": float(m0[1]),
        "sil_mse": float(m0[2]), "iou": float(m0[3]),
    }
    if appendage_verts is not None:
        rec0["vert_mm_thin"] = thin_err(out0.vertices)
    print(json.dumps(rec0), flush=True)

    results = {}
    for regime, j3d_w in regimes:
        for name, use_sil, blur, stride, sil_extra in sweeps:
            rcfg = config(use_sil, blur, j3d_w, stride, **sil_extra)
            run = make_run(rcfg)
            t0 = time.perf_counter()
            res = run(model, j_reg, init, data, pose_disc, shape_disc)
            jax.block_until_ready(res.params)
            dt = time.perf_counter() - t0
            mp, vm, sm, iou = score(
                model, res.vertices, res.params.cam_t, gt_verts, gt_joints,
                data.mask,
            )
            rec = {
                "regime": regime, "config": name, "blur_radius": blur,
                "mpjpe_mm": round(float(mp), 3), "vert_mm": round(float(vm), 3),
                "sil_mse": round(float(sm), 6), "iou": round(float(iou), 4),
                "seconds": round(dt, 1),
            }
            if appendage_verts is not None:
                rec["vert_mm_thin"] = thin_err(res.vertices)
            results[(regime, name)] = rec
            print(json.dumps(rec), flush=True)

    # Summary: does silhouette help, and which blur wins on vert_mm?
    for regime, _ in regimes:
        if (regime, "no_sil") not in results:
            continue
        base = results[(regime, "no_sil")]
        best = min(
            (r for (rg, n), r in results.items() if rg == regime and n != "no_sil"),
            key=lambda r: r["vert_mm"],
        )
        print(json.dumps({
            "summary": regime,
            "no_sil_vert_mm": base["vert_mm"],
            "best_config": best["config"],
            "best_vert_mm": best["vert_mm"],
            "helps": best["vert_mm"] < base["vert_mm"],
        }), flush=True)


if __name__ == "__main__":
    main()
