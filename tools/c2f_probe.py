"""Coarse-to-fine silhouette schedule probe.

Hypothesis: the first half of stage B does not need full-resolution
silhouette supervision — rendering at image/2 with tile/2 keeps the
occupied-tile count and per-tile candidate counts of the full-resolution
setup while cutting pixel rows per tile 4× (64 → 16 sublanes), so the coarse
phase's rasterizer cost drops ~2-4×. Quality is scored on the FIXED
σ=1e-4 / blur-0 / 224² objective, same protocol as
tools/silhouette_quality.py.

Protocol: same synthetic shape-mismatch problem as the quality sweep
(batch 32, betas +0.6). Control = single-resolution (coarse_frac=0).
C2F = the engine-native coarse_frac path (engine.refine_batch chains the
coarse and fine scans inside ONE jitted program; mask mean-pooled on
device, focal auto-scaled by losses.rasterizer_spec). Adam state is fresh
per phase — the same per-batch-fresh semantics the reference applies.

First measured (2026-08-17, TPU v5e, batch 32, stage 200+100, coarse half
@112²/tile 4/margin 4): control MPJPE 9.39 mm / vertex 20.15 mm /
IoU 0.696 → c2f 7.87 / 18.11 / 0.696. Coarse-to-fine is a QUALITY win
at lower cost (wider coarse basin). Re-verified through the engine-native
coarse_frac path before shipping it as the config default (BASELINE.md
round-3 table).

Usage: python tools/c2f_probe.py [--batch 32] [--coarse-frac 0.5]
       python tools/c2f_probe.py --sweep   # frac {0.5, 0.7} x factor {2, 4}
Writes one JSON line per run. `seconds` = first call (compile+run);
`exec_seconds` = second call (steady-state execution only).
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
    ap.add_argument("--coarse-frac", type=float, default=0.5)
    ap.add_argument("--coarse-factor", type=int, default=2)
    ap.add_argument("--sweep", action="store_true",
                    help="run frac {0.5, 0.7} x factor {2, 4} variants")
    ap.add_argument("--betas-perturb", type=float, default=0.6)
    ap.add_argument("--platform", default=None)
    args = ap.parse_args()

    import jax

    if args.platform:
        jax.config.update("jax_platforms", args.platform)

    import jax.numpy as jnp

    import __graft_entry__ as ge
    from jrr_tpu.models import discriminator as disc_lib
    from jrr_tpu.ops import jreg as jreg_lib
    from jrr_tpu.refine import engine, losses
    from jrr_tpu.render import silhouette_fused as sf

    model, j_reg, cfg0, init, data, gt_params, gt_verts = ge._synthetic_problem(
        batch=args.batch, num_verts=args.num_verts, image_size=args.image,
        return_gt=True, perturb=(0.03, 0.02, args.betas_perturb, 0.05),
    )
    data = data._replace(mask=(data.mask > 0.5).astype(jnp.float32))

    j_norm = jreg_lib.normalize_jreg(j_reg)
    gt_joints = jreg_lib.apply_jreg(j_norm, gt_verts)
    pose_disc = disc_lib.init_pose_discriminator(jax.random.PRNGKey(7))
    shape_disc = disc_lib.init_shape_discriminator(jax.random.PRNGKey(8))

    eval_spec = losses.rasterizer_spec(cfg0.refiner)._replace(blur_radius=0.0)

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

    def score(name, res, seconds, extra=None):
        mp, vm, sm, iou = _score(
            j_norm, model, res.vertices, res.params.cam_t, gt_verts, gt_joints,
            data.mask,
        )
        rec = {
            "run": name, "mpjpe_mm": round(float(mp), 3),
            "vert_mm": round(float(vm), 3), "sil_mse": round(float(sm), 6),
            "iou": round(float(iou), 4), "seconds": round(seconds, 1),
        }
        if extra:
            rec.update(extra)
        print(json.dumps(rec), flush=True)
        return rec

    def rcfg(stage_a, stage_b, **sil):
        r = cfg0.refiner
        return dataclasses.replace(
            r, stage_a_steps=stage_a, stage_b_steps=stage_b,
            silhouette=dataclasses.replace(r.silhouette, **sil),
        )

    def jit_run(cfg):
        return jax.jit(
            lambda mdl, jr, i, d, pd, sd: engine.refine_batch(
                mdl, jr, i, d, cfg, pd, sd
            )
        )

    def stats_dict(res):
        st = res.bin_stats
        if st is None:
            return {}
        return {
            "truncated_tiles": int(st.truncated_tiles),
            "span_clipped": int(st.span_clipped_faces),
            "dropped_slots": int(st.dropped_slots),
            "max_faces_per_tile": int(st.max_faces_per_tile),
        }

    def measure(name, cfg):
        fn = jit_run(cfg)
        t0 = time.perf_counter()
        res = fn(model, j_reg, init, data, pose_disc, shape_disc)
        jax.block_until_ready(res.params)
        t_first = time.perf_counter() - t0
        t0 = time.perf_counter()
        res = fn(model, j_reg, init, data, pose_disc, shape_disc)
        jax.block_until_ready(res.params)
        t_exec = time.perf_counter() - t0
        extra = stats_dict(res)
        extra["exec_seconds"] = round(t_exec, 2)
        score(name, res, t_first, extra)

    # ---- control: single-resolution (round-2 behavior) ---------------------
    measure("control_single_res", rcfg(args.stage_a, args.stage_b, coarse_frac=0.0))

    # ---- c2f: the engine-native coarse-to-fine path (ONE jitted program) ---
    if args.sweep:
        variants = [(0.5, 2), (0.7, 2), (0.5, 4)]
    else:
        variants = [(args.coarse_frac, args.coarse_factor)]
    for frac, factor in variants:
        measure(
            f"c2f_frac{frac}_f{factor}",
            rcfg(
                args.stage_a, args.stage_b, coarse_frac=frac,
                coarse_factor=factor,
                # Let sweep variants below the shipped floor run: the sweep
                # is exactly the experiment that LOCATES the floor.
                coarse_min_image=min(112, args.image // factor),
            ),
        )

    if args.sweep:
        # Three-level schedule (manual chain: 35% at image/4, 35% at image/2,
        # 30% at full res). Each phase is a single-resolution engine run with
        # the mask pooled host-side — semantically what a multi-level
        # coarse_schedule would compile, used here to decide whether one is
        # worth productizing.
        s1 = int(0.35 * args.stage_b)
        s2 = int(0.35 * args.stage_b)
        s3 = args.stage_b - s1 - s2
        phases = [
            (args.stage_a, s1, 4), (0, s2, 2), (0, s3, 1),
        ]
        cur = init
        t_first = 0.0
        last = None
        for sa, sb, factor in phases:
            c = rcfg(
                sa, sb, coarse_frac=0.0,
                image_size=args.image // factor,
                tile_size=max(cfg0.refiner.silhouette.tile_size // factor, 1),
                bin_margin_px=cfg0.refiner.silhouette.bin_margin_px / factor,
            )
            d = data if factor == 1 else data._replace(
                mask=engine._pool_mask(data.mask, factor)
            )
            fn = jit_run(c)
            t0 = time.perf_counter()
            last = fn(model, j_reg, cur, d, pose_disc, shape_disc)
            jax.block_until_ready(last.params)
            t_first += time.perf_counter() - t0
            cur = last.params
        score("c2f_3level_56_112_224", last, t_first, stats_dict(last))


if __name__ == "__main__":
    main()
