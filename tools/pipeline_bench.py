"""End-to-end PRODUCT throughput on the chip (VERDICT r3 item 2).

`bench.py` times the inner refinement program only (one jitted 1000+100-step
schedule). This tool measures the SHIPPED pipeline as a whole — host pack
load → device put → sharded outer step (two-stage refinement + discriminator
updates + J-regressor step) → per-shard manifest writes → lstsq accumulation
→ checkpoint → protocol-2 before/after eval — by driving
`run_pipeline(loader="native")` on full-size geometry (6890-vert synthetic
body, 13776 faces, 224² silhouette) at the reference's production batch 256,
SPIN-free init path (stored precomputed estimates, reference:
scripts/optimize.py:105-182 without the live network).

One-time costs (fixture PNG generation, pack build) are timed separately and
excluded from the steady-state product rate. Prints one JSON line per phase
and a final headline line shaped like bench.py's.

Usage: python tools/pipeline_bench.py [--batches 4] [--batch 256] [--out DIR]
"""

from __future__ import annotations

import argparse
import json
import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batches", type=int, default=4)
    ap.add_argument("--batch", type=int, default=256)
    ap.add_argument("--out", default="/tmp/jrr_pipeline_bench")
    ap.add_argument("--stage-a", type=int, default=1000)
    ap.add_argument("--stage-b", type=int, default=100)
    ap.add_argument("--fresh", action="store_true", help="rebuild fixtures+pack")
    ap.add_argument(
        "--oversized-bodies", action="store_true",
        help="use the historical fixture camera (z 18-28: bodies 1.6-2.5× "
             "crop height — a rasterizer stress scene). Default is the "
             "SPIN-crop-realistic z 36-60 (weak-persp s 0.75-1.25, the same "
             "scale statistics bench.py and real SPIN crops have).",
    )
    ap.add_argument(
        "--optimize-only", action="store_true",
        help="time run_optimize alone (skip the eval tail) — for iterating "
             "on the per-batch loop; set JRR_PHASE_TIMING=1 to decompose",
    )
    args = ap.parse_args()

    import dataclasses

    import numpy as np

    from jrr_tpu import config as cfg_lib
    from jrr_tpu.data import fixtures, native_pipeline
    from jrr_tpu.models import smpl as smpl_lib
    from jrr_tpu.pipeline import run_pipeline
    from jrr_tpu.utils.logging import MetricsLogger

    n_frames = args.batches * args.batch
    data_root = os.path.join(args.out, "fixtures")
    out_dir = os.path.join(args.out, "run")
    if args.fresh and os.path.exists(args.out):
        shutil.rmtree(args.out)
    # Every run starts from a clean output dir (resume would skip the work).
    if os.path.exists(out_dir):
        shutil.rmtree(out_dir)
    os.makedirs(out_dir, exist_ok=True)

    model = smpl_lib.synthetic_smpl_model(seed=0)  # full-size body
    rng = np.random.default_rng(0)
    j_reg_raw = np.zeros((17, model.num_verts), np.float32)
    for j in range(17):
        j_reg_raw[j, rng.choice(model.num_verts, 6, replace=False)] = rng.uniform(
            0.5, 1.0, 6
        )

    # --- one-time costs (excluded from the steady-state product rate) -------
    depth_range = (18.0, 28.0) if args.oversized_bodies else (36.0, 60.0)
    stamp_path = os.path.join(args.out, "scene.json")
    if os.path.exists(os.path.join(data_root, "precomputed_val")):
        stamp = None
        if os.path.exists(stamp_path):
            with open(stamp_path) as f:
                stamp = json.load(f)
        if stamp is None or tuple(stamp.get("depth_range", ())) != depth_range or (
            stamp.get("frames") != n_frames
        ):
            raise SystemExit(
                f"cached fixtures at {args.out} were built with "
                f"{stamp} (None = pre-stamp cache) — pass --fresh to rebuild "
                f"for depth_range={depth_range}, frames={n_frames}"
            )
    if not os.path.exists(os.path.join(data_root, "precomputed_val")):
        t0 = time.perf_counter()
        fixtures.write_fixture_dataset(
            data_root, num_frames=n_frames, seed=0, model=model,
            j_reg_raw=j_reg_raw, depth_range=depth_range,
        )
        os.makedirs(args.out, exist_ok=True)
        with open(stamp_path, "w") as f:
            json.dump({"depth_range": list(depth_range), "frames": n_frames}, f)
        print(json.dumps({
            "phase": "fixture_build_once", "seconds": round(time.perf_counter() - t0, 1),
            "frames": n_frames,
        }), flush=True)
    pack_path = os.path.join(data_root, "precomputed_val", "frames.jrrpack")
    if not os.path.exists(pack_path):
        t0 = time.perf_counter()
        native_pipeline.pack_dataset(data_root, "validation")
        print(json.dumps({
            "phase": "pack_build_once", "seconds": round(time.perf_counter() - t0, 1),
        }), flush=True)
    pack2_path = os.path.join(data_root, "precomputed_val", "frames.jrrpack2")
    if not os.path.exists(pack2_path):
        # Pre-warped pack: the shipped best host path (BASELINE.md round 4);
        # PackedH36MDataset(prewarped="auto") picks it up inside run_pipeline.
        t0 = time.perf_counter()
        native_pipeline.build_pack2(data_root, "validation")
        print(json.dumps({
            "phase": "pack2_build_once", "seconds": round(time.perf_counter() - t0, 1),
        }), flush=True)

    cfg = cfg_lib.PipelineConfig(
        refiner=dataclasses.replace(
            cfg_lib.RefinerConfig(),
            stage_a_steps=args.stage_a, stage_b_steps=args.stage_b,
        ),
        data=dataclasses.replace(cfg_lib.DataConfig(), batch_size=args.batch),
    )

    metrics_path = os.path.join(out_dir, "metrics.jsonl")
    logger = MetricsLogger(path=metrics_path)
    t0 = time.perf_counter()
    if args.optimize_only:
        from jrr_tpu.pipeline import run_optimize

        packed = native_pipeline.PackedH36MDataset(data_root, "validation")

        def epoch_batches():
            yield from packed.batches(
                args.batch, seed=cfg.data.shuffle_seed, epoch=0, drop_last=True
            )

        run_optimize(
            cfg, model, j_reg_raw, epoch_batches(), out_dir, logger=logger,
            use_mesh=True, resume=False,
        )
    else:
        run_pipeline(
            cfg, data_root=data_root, out_dir=out_dir, demo=True,
            logger=logger, loader="native", model=model, demo_frames=n_frames,
        )
    total_s = time.perf_counter() - t0
    logger.close()

    with open(metrics_path) as f:
        recs = [json.loads(line) for line in f if line.strip()]
    shard_recs = [r for r in recs if "batch_seconds" in r]
    per_batch = [r["batch_seconds"] for r in shard_recs]
    optimize_s = sum(per_batch)
    frames = args.batch * len(per_batch)
    # First batch carries every compile (axon: 10-400 s); the steady-state
    # product rate is what a long production run converges to. With the
    # async writer + staged inputs, `batch_seconds` no longer covers queue
    # waits — steady-state pacing is the WALL time between consecutive
    # record timestamps, which includes every stall wherever it hides.
    steady = per_batch[1:] or per_batch
    if len(shard_recs) >= 2:
        steady_s = shard_recs[-1]["ts"] - shard_recs[0]["ts"]
    else:
        steady_s = sum(steady)
    steady_frames = args.batch * len(steady)

    print(json.dumps({
        "phase": "product",
        "batches": len(per_batch),
        "optimize_wall_s": round(optimize_s, 2),
        "first_batch_s_incl_compile": round(per_batch[0], 2),
        "steady_per_batch_s": round(steady_s / max(len(steady), 1), 2),
        "eval_and_misc_s": round(total_s - optimize_s, 2),
        "end_to_end_s": round(total_s, 2),
    }), flush=True)
    print(json.dumps({
        "metric": "product_pipeline_frames_per_sec_per_chip",
        "value": round(steady_frames / steady_s, 4),
        "unit": "frames/s/chip (run_pipeline: native host load + put + "
                "sharded outer step + shard writes + lstsq accumulate, "
                "steady-state batches, batch %d)" % args.batch,
        "end_to_end_incl_eval_frames_per_sec": round(frames / total_s, 4),
    }), flush=True)


if __name__ == "__main__":
    main()
