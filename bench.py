"""Benchmark harness: end-to-end pseudo-GT generation throughput on one chip.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}

Workload measured: the reference pipeline's per-batch refinement schedule —
1000 camera-only stage-A steps + 100 genuinely-five-term stage-B steps (SMPL
forward, joint regression, 2D reprojection, 224² tile-binned soft-silhouette
render, and REAL pose+shape adversarial priors with live discriminator
parameters) on the full-size (6890-vertex, 13776-face) body model at the
reference's production batch of 256 (reference: scripts/args.py:8,
scripts/optimize.py:190,220) — reported as frames fully refined per second per
chip. The entire 1100-step schedule is ONE jitted program executed end-to-end
and wall-clock timed; there is no per-step extrapolation.

Baseline: the reference implementation publishes no throughput numbers
(BASELINE.md); tqdm-level accounting of its loop (1000 SMPL fwd+bwd + 100
[3×SMPL + pytorch3d rasterize + discriminators] fwd+bwd per 256-frame batch on
a single CUDA GPU, scripts/optimize.py:190,220) puts it at ~1 frame/s. We use
REFERENCE_FRAMES_PER_SEC_EST = 1.0 as the vs_baseline denominator; the
BASELINE.md table records the derivation.
"""

from __future__ import annotations

import dataclasses
import json
import time

REFERENCE_FRAMES_PER_SEC_EST = 1.0  # single-GPU reference estimate (BASELINE.md)

BATCH = 256  # reference production batch (scripts/args.py:8)
STAGE_A_STEPS = 1000
STAGE_B_STEPS = 100


def main() -> None:
    import argparse

    import jax

    import __graft_entry__ as ge
    from jrr_tpu.models import discriminator as disc_lib
    from jrr_tpu.refine import engine

    ap = argparse.ArgumentParser()
    ap.add_argument(
        "--scene", choices=["drift", "realistic"], default="drift",
        help="drift = the historical synthetic problem (small-angle poses, "
             "constant init offset). realistic = fixture-statistics scene "
             "(fully random joint rotations, gaussian init noise) whose "
             "rasterizer candidate load is 4-6x higher — the first-class "
             "second row of BASELINE.md round 5 (VERDICT r4 item 4).",
    )
    args = ap.parse_args()

    model, j_reg, cfg, init, data = ge._synthetic_problem(
        batch=BATCH, num_verts=6890, image_size=224, scene=args.scene
    )
    pose_disc = disc_lib.init_pose_discriminator(jax.random.PRNGKey(7))
    shape_disc = disc_lib.init_shape_discriminator(jax.random.PRNGKey(8))

    rcfg = dataclasses.replace(
        cfg.refiner, stage_a_steps=STAGE_A_STEPS, stage_b_steps=STAGE_B_STEPS
    )

    # The model rides as a jit ARGUMENT (axon lowering re-fetches
    # closure-captured device arrays through the tunnel — CLAUDE.md).
    @jax.jit
    def refine(mdl, i, d, jr, pd, sd):
        return engine.refine_batch(mdl, jr, i, d, rcfg, pd, sd)

    # Compile + warm-up execution (not timed).
    out = refine(model, init, data, j_reg, pose_disc, shape_disc)
    jax.block_until_ready(out)

    # The real composed program, end-to-end: one device dispatch covering all
    # 1000 stage-A + 100 stage-B steps. Timed THREE times with numerically
    # DISTINCT init params each run (same shapes ⇒ same executable) and the
    # median reported: a repeat execution of one executable on bit-identical
    # arguments was once observed returning in ~0.4 ms on the experimental
    # axon backend (675K "frames/s" — a result-dedup/caching artifact, not a
    # measurement), and a median over distinct-input runs is robust to any
    # such hazard in either direction.
    times = []
    for k in range(3):
        init_k = jax.tree.map(lambda x, _k=k: x + 1e-7 * (_k + 1), init)
        t0 = time.perf_counter()
        out = refine(model, init_k, data, j_reg, pose_disc, shape_disc)
        jax.block_until_ready(out)
        times.append(time.perf_counter() - t0)
    t_total = sorted(times)[1]

    frames_per_sec = BATCH / t_total

    result = {
        "metric": "pseudo_gt_frames_per_sec_per_chip",
        "value": round(frames_per_sec, 4),
        "unit": "frames/s/chip (one jitted 1000 stage-A + 100 five-term stage-B program, batch %d, 224^2 silhouette, live discriminators%s)"
        % (BATCH, "" if args.scene == "drift" else ", scene=" + args.scene),
        "vs_baseline": round(frames_per_sec / REFERENCE_FRAMES_PER_SEC_EST, 4),
    }
    if args.scene != "drift":
        result["scene"] = args.scene
    print(json.dumps(result))


if __name__ == "__main__":
    main()
