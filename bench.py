"""Benchmark harness: end-to-end pseudo-GT generation throughput on one chip.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}

Workload measured: the reference pipeline's per-batch refinement schedule —
1000 camera-only stage-A steps + 100 full five-term stage-B steps (SMPL
forward, joint regression, 2D reprojection, 224² tile-binned soft-silhouette
render, pose+shape adversarial priors) on the full-size (6890-vertex,
13776-face) body model — reported as frames fully refined per second per chip.

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

import numpy as np

REFERENCE_FRAMES_PER_SEC_EST = 1.0  # single-GPU reference estimate (BASELINE.md)

BATCH = 32
STAGE_A_STEPS = 1000
STAGE_B_STEPS = 100
STAGE_B_TIMED = 4  # timed steps; cost is per-step constant inside the scan


def main() -> None:
    import jax

    import __graft_entry__ as ge
    from jrr_tpu.refine import engine

    model, j_reg, cfg, init, data = ge._synthetic_problem(
        batch=BATCH, num_verts=6890, image_size=224
    )

    def make_refine(a_steps, b_steps):
        rcfg = dataclasses.replace(
            cfg.refiner, stage_a_steps=a_steps, stage_b_steps=b_steps
        )
        return jax.jit(
            lambda i, d, jr: engine.refine_batch(model, jr, i, d, rcfg)
        )

    # Stage A full schedule, no stage B — measures the real 1000-step scan.
    f_a = make_refine(STAGE_A_STEPS, 0)
    out = f_a(init, data, j_reg)
    jax.block_until_ready(out)  # compile
    t0 = time.time()
    out = f_a(init, data, j_reg)
    jax.block_until_ready(out)
    t_stage_a = time.time() - t0

    # Stage B per-step cost from a short scan (subtracting the stage-A-free
    # fixed overhead measured with 0 steps of both).
    f_b = make_refine(0, STAGE_B_TIMED)
    out = f_b(init, data, j_reg)
    jax.block_until_ready(out)
    t0 = time.time()
    out = f_b(init, data, j_reg)
    jax.block_until_ready(out)
    t_b_timed = time.time() - t0

    f_0 = make_refine(0, 0)
    out = f_0(init, data, j_reg)
    jax.block_until_ready(out)
    t0 = time.time()
    out = f_0(init, data, j_reg)
    jax.block_until_ready(out)
    t_fixed = time.time() - t0

    t_stage_b_per_step = max(t_b_timed - t_fixed, 1e-9) / STAGE_B_TIMED
    t_total = t_stage_a + t_stage_b_per_step * STAGE_B_STEPS
    frames_per_sec = BATCH / t_total

    result = {
        "metric": "pseudo_gt_frames_per_sec_per_chip",
        "value": round(frames_per_sec, 4),
        "unit": "frames/s/chip (1000 stage-A + 100 stage-B full-loss steps, batch %d, 224^2 silhouette)" % BATCH,
        "vs_baseline": round(frames_per_sec / REFERENCE_FRAMES_PER_SEC_EST, 4),
    }
    print(json.dumps(result))


if __name__ == "__main__":
    main()
