"""Round-3 perf experiments: full bench-shaped program under config variants.

Times the SAME workload as bench.py (one jitted 1000 stage-A + 100 five-term
stage-B program, full-size model, batch 256) for a list of rasterizer config
variants, so each optimization lands with a measured number (BASELINE.md
round-3 table):

  baseline            — the shipped defaults (r3: blur 1e-4, stride 2, i50)
  ref_exact           — blur 0, stride 1 (reference-exact rasterization)
  cap3 / cap3_margin4 — smaller binning sort (F·cap² keys)
  interval25          — rebin every 25 steps
  stride2 / stride4   — silhouette term every k-th stage-B step (weight ×k)
  stride{2,4}_interval50, interval100_margin12 — rebin-amortization combos
(the exact table lives in `variants()`; an unknown name raises KeyError)

Also prints the final-step mean silhouette loss per variant as a first-order
quality tripwire (full quality probing: tools/silhouette_quality.py).

Usage: python tools/r3_perf.py [--batch 256] [--variants baseline stride2 ...]
"""

from __future__ import annotations

import argparse
import dataclasses
import json
import sys
import time

sys.path.insert(0, __file__.rsplit("/", 2)[0])

BATCH = 256
STAGE_A = 1000
STAGE_B = 100


def variants(r):
    sil = r.silhouette
    return {
        "baseline": r,  # the shipped defaults (r3: blur 1e-4, stride 2)
        "ref_exact": dataclasses.replace(
            r, silhouette=dataclasses.replace(
                sil, blur_radius=0.0, step_stride=1
            )
        ),
        # Semantics-parity configuration: EVERY shipped deviation off — blur 0,
        # silhouette every step, single resolution, no interior skip, the
        # round-2 rebin cadence. This is the number behind the "reference-exact
        # is one flag away" claim (VERDICT r3 item 6).
        "ref_exact_full": dataclasses.replace(
            r, silhouette=dataclasses.replace(
                sil, blur_radius=0.0, step_stride=1, rebin_interval=20,
                bin_margin_px=6.0, coarse_frac=0.0, interior_skip=False,
            )
        ),
        "cap3": dataclasses.replace(
            r, silhouette=dataclasses.replace(sil, max_tiles_per_face=3)
        ),
        "cap3_margin4": dataclasses.replace(
            r, silhouette=dataclasses.replace(
                sil, max_tiles_per_face=3, bin_margin_px=4.0, rebin_interval=10
            )
        ),
        "interval25": dataclasses.replace(
            r, silhouette=dataclasses.replace(sil, rebin_interval=25)
        ),
        "stride2": dataclasses.replace(
            r, silhouette=dataclasses.replace(sil, step_stride=2)
        ),
        "stride4": dataclasses.replace(
            r, silhouette=dataclasses.replace(sil, step_stride=4)
        ),
        # Round-4 stride refinements (quality gate: tools/silhouette_quality
        # --extra-stride-variants): the r3 decision tested only 2 and 4;
        # stride 3 sits between the shipped 2 (9.4 mm) and the rejected 4
        # (11.6 mm), and coarse-only striding leaves the fine phase's
        # band-scale polish untouched.
        "stride3": dataclasses.replace(
            r, silhouette=dataclasses.replace(sil, step_stride=3)
        ),
        "coarse_stride4": dataclasses.replace(
            r, silhouette=dataclasses.replace(sil, coarse_step_stride=4)
        ),
        "stride3_coarse4": dataclasses.replace(
            r, silhouette=dataclasses.replace(
                sil, step_stride=3, coarse_step_stride=4
            )
        ),
        "stride2_interval50": dataclasses.replace(
            r, silhouette=dataclasses.replace(
                sil, step_stride=2, rebin_interval=50, bin_margin_px=8.0
            )
        ),
        "stride4_interval50": dataclasses.replace(
            r, silhouette=dataclasses.replace(
                sil, step_stride=4, rebin_interval=50, bin_margin_px=8.0
            )
        ),
        # Single rebin for the whole stage-B schedule (margin must absorb the
        # full 100-step drift).
        "interval100_margin12": dataclasses.replace(
            r, silhouette=dataclasses.replace(
                sil, rebin_interval=100, bin_margin_px=12.0
            )
        ),
        # Coarse-to-fine ablations (quality gate: tools/c2f_probe.py).
        # "baseline" already includes the shipped coarse_frac=0.5/factor 2.
        "single_res": dataclasses.replace(
            r, silhouette=dataclasses.replace(sil, coarse_frac=0.0)
        ),
        # Interior-saturated-tile skip (the "fewer occupied tiles" lever;
        # see SilhouetteConfig.interior_skip / tests/test_interior_skip.py).
        "interior_skip": dataclasses.replace(
            r, silhouette=dataclasses.replace(sil, interior_skip=True)
        ),
        "interior_skip_single_res": dataclasses.replace(
            r, silhouette=dataclasses.replace(
                sil, interior_skip=True, coarse_frac=0.0
            )
        ),
        "c2f_frac0.7": dataclasses.replace(
            r, silhouette=dataclasses.replace(sil, coarse_frac=0.7)
        ),
        "c2f_factor4": dataclasses.replace(
            r, silhouette=dataclasses.replace(
                sil, coarse_factor=4, coarse_min_image=56
            )
        ),
        # Scheduled fine-phase striding (round 4;
        # SilhouetteConfig.fine_warm_*): early fine steps at the coarse
        # cadence, final polish at step_stride. Quality gate:
        # tools/silhouette_quality.py --configs fine_warm*.
        "fine_warm4_half": dataclasses.replace(
            r, silhouette=dataclasses.replace(
                sil, fine_warm_frac=0.5, fine_warm_stride=4
            )
        ),
        "fine_warm4_60": dataclasses.replace(
            r, silhouette=dataclasses.replace(
                sil, fine_warm_frac=0.6, fine_warm_stride=4
            )
        ),
        # Round-5 cost-decomposition probes (VERDICT r4 item 3): each variant
        # moves ONE phase's invocation count so the per-invocation cost falls
        # out of end-to-end deltas against baseline —
        #   no_sil:        silhouette term off → the non-silhouette floor;
        #   interval25:    (above) 2x the rebins → per-rebin (binning) cost;
        #   fine_stride1:  2x the fine kernel launches → per-fine-launch cost;
        #   coarse_stride2: 2x the coarse kernel launches → per-coarse-launch.
        "no_sil": dataclasses.replace(r, use_silhouette=False),
        "fine_stride1": dataclasses.replace(
            r, silhouette=dataclasses.replace(sil, step_stride=1)
        ),
        "coarse_stride2": dataclasses.replace(
            r, silhouette=dataclasses.replace(sil, coarse_step_stride=None)
        ),
        # Lane-packed tile pairs (round 4; SilhouetteConfig.lane_pack).
        "lane_pack": dataclasses.replace(
            r, silhouette=dataclasses.replace(sil, lane_pack=True)
        ),
        "lane_pack_single_res": dataclasses.replace(
            r, silhouette=dataclasses.replace(
                sil, lane_pack=True, coarse_frac=0.0
            )
        ),
    }


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=BATCH)
    ap.add_argument("--variants", nargs="+", default=["baseline", "cap3", "stride2"])
    args = ap.parse_args()

    import jax

    import __graft_entry__ as ge
    from jrr_tpu.models import discriminator as disc_lib
    from jrr_tpu.refine import engine

    model, j_reg, cfg, init, data = ge._synthetic_problem(
        batch=args.batch, num_verts=6890, image_size=224
    )
    pose_disc = disc_lib.init_pose_discriminator(jax.random.PRNGKey(7))
    shape_disc = disc_lib.init_shape_discriminator(jax.random.PRNGKey(8))

    base = dataclasses.replace(
        cfg.refiner, stage_a_steps=STAGE_A, stage_b_steps=STAGE_B
    )
    table = variants(base)

    unknown = [n for n in args.variants if n not in table]
    if unknown:
        raise SystemExit(
            f"unknown variant(s) {unknown}; choose from {sorted(table)}"
        )
    for name in args.variants:
        rcfg = table[name]
        fn = jax.jit(
            lambda mdl, jr, i, d, pd, sd, _r=rcfg: engine.refine_batch(
                mdl, jr, i, d, _r, pd, sd
            )
        )
        t0 = time.perf_counter()
        out = fn(model, j_reg, init, data, pose_disc, shape_disc)
        jax.block_until_ready(out)
        compile_s = time.perf_counter() - t0

        # Time over DISTINCT inputs: axon dedups re-runs of one executable on
        # bit-identical args (~0.4 ms return — the CLAUDE.md artifact), which
        # produced a bogus 0.0 s lane_pack "measurement" on 2026-08-19. A
        # per-run 1e-6 nudge on the init params changes bits, not workload.
        import jax.numpy as jnp

        times = []
        for run in range(1, 3):
            init_r = jax.tree.map(
                lambda x, _r=run: x + jnp.asarray(_r * 1e-6, x.dtype)
                if jnp.issubdtype(x.dtype, jnp.floating) else x,
                init,
            )
            t0 = time.perf_counter()
            out = fn(model, j_reg, init_r, data, pose_disc, shape_disc)
            jax.block_until_ready(out)
            times.append(time.perf_counter() - t0)
        dt = sorted(times)[len(times) // 2]  # median (2 runs → the slower)

        import numpy as np

        # Last ACTIVE silhouette step (striding zeroes inactive steps; active
        # ones carry weight ×stride — undo it for comparability).
        sil_t = np.asarray(out.stage_b_terms.silhouette)
        nz = np.nonzero(sil_t)[0]
        stride = max(1, rcfg.silhouette.step_stride)
        sil_final = float(sil_t[nz[-1]]) / stride if len(nz) else 0.0
        dropped = (
            int(out.bin_stats.total_dropped()) if out.bin_stats is not None else -1
        )
        skipped = (
            int(out.bin_stats.interior_skipped_tiles)
            if out.bin_stats is not None else -1
        )
        print(json.dumps({
            "variant": name,
            "frames_per_sec": round(args.batch / dt, 3),
            "seconds": round(dt, 2),
            "compile_s": round(compile_s - dt, 1),
            "sil_loss_final": round(sil_final, 6),
            "bin_dropped": dropped,
            "interior_skipped": skipped,
        }), flush=True)


if __name__ == "__main__":
    main()
