"""Host input-pipeline throughput: native C++ pack loader vs Python loader.

VERDICT r2 item 3: the device side refines ~21 frames/s/chip (×8 chips ≈ 169
frames/s demanded of the host at pod scale); this tool measures what the two
host pipelines actually deliver on the same data, so BASELINE.md can record a
measured host rate against the device demand.

- python:  H36MDataset.__getitem__ (imageio PNG decode + two JAX-CPU warps)
  through the prefetching BatchLoader (replaces torch DataLoader workers;
  reference: scripts/optimize.py:136-139, scripts/data.py:90-160).
- native:  PackedH36MDataset — one mmap'd .jrrpack blob, decode+crop+warp in
  the C++ thread pool (jrr_tpu/runtime/jrr_runtime.cc), batch assembly with
  no Python in the per-frame loop.

Usage: python tools/host_loader_bench.py [--frames 256] [--batch 64] [--threads N]
Prints one JSON line per pipeline and a ratio summary.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import tempfile
import time

sys.path.insert(0, __file__.rsplit("/", 2)[0])


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--frames", type=int, default=256)
    ap.add_argument("--batch", type=int, default=64)
    ap.add_argument("--threads", type=int, default=0, help="0 = hardware count")
    ap.add_argument("--root", default=None, help="existing dataset root (else fixtures)")
    ap.add_argument("--repeats", type=int, default=3)
    ap.add_argument("--device-rate", type=float, default=41.3,
                    help="benched frames/s/chip the host must feed (BASELINE.md)")
    args = ap.parse_args()

    import jax

    jax.config.update("jax_platforms", "cpu")  # host-side benchmark
    import numpy as np

    from jrr_tpu.data import fixtures, h36m, native_pipeline

    root = args.root
    tmp = None
    if root is None:
        tmp = tempfile.mkdtemp(prefix="jrr_loaderbench_")
        root = fixtures.write_fixture_dataset(tmp, num_frames=args.frames, seed=0)

    results = {}

    # --- python loader -----------------------------------------------------
    ds = h36m.H36MDataset(root, "validation")
    loader = h36m.BatchLoader(ds, args.batch, shuffle=True, drop_last=True, prefetch=4)
    # Warm-up (jit of the crop path).
    next(iter(loader))
    best = 0.0
    for _ in range(args.repeats):
        t0 = time.perf_counter()
        n = 0
        for b in loader:
            n += b["spin_image"].shape[0]
        dt = time.perf_counter() - t0
        best = max(best, n / dt)
    results["python"] = best
    print(json.dumps({
        "pipeline": "python(BatchLoader)", "frames_per_sec": round(best, 2),
        "frames": args.frames, "batch": args.batch,
    }), flush=True)

    # --- native pack loader ------------------------------------------------
    t0 = time.perf_counter()
    packed = native_pipeline.PackedH36MDataset(root, "validation", num_threads=args.threads)
    pack_s = time.perf_counter() - t0
    best = 0.0
    for _ in range(args.repeats):
        t0 = time.perf_counter()
        n = 0
        for b in packed.batches(args.batch, shuffle=True, drop_last=True):
            n += b["spin_image"].shape[0]
        dt = time.perf_counter() - t0
        best = max(best, n / dt)
    results["native"] = best
    print(json.dumps({
        "pipeline": "native(PackedH36MDataset)", "frames_per_sec": round(best, 2),
        "pack_build_seconds": round(pack_s, 1),
        "frames": args.frames, "batch": args.batch,
    }), flush=True)

    # --- pre-warped pack loader (v2: load ≈ memcpy; VERDICT r3 item 7) ------
    t0 = time.perf_counter()
    pre = native_pipeline.PackedH36MDataset(
        root, "validation", num_threads=args.threads, prewarped=True
    )
    pack2_s = time.perf_counter() - t0
    best = 0.0
    for _ in range(args.repeats):
        t0 = time.perf_counter()
        n = 0
        for b in pre.batches(args.batch, shuffle=True, drop_last=True):
            n += b["spin_image"].shape[0]
        dt = time.perf_counter() - t0
        best = max(best, n / dt)
    results["prewarped"] = best
    print(json.dumps({
        "pipeline": "prewarped(Pack2Reader)", "frames_per_sec": round(best, 2),
        "pack2_build_seconds": round(pack2_s, 1),
        "frames": args.frames, "batch": args.batch,
    }), flush=True)

    # Device rate per chip = the CURRENT bench.py number (BASELINE.md);
    # override with --device-rate when the bench moves so this gate never
    # silently compares against a stale figure.
    demand = 8 * args.device_rate
    print(json.dumps({
        "summary": "host_loader",
        "native_over_python": round(results["native"] / max(results["python"], 1e-9), 1),
        "prewarped_over_native": round(
            results["prewarped"] / max(results["native"], 1e-9), 1
        ),
        "device_rate_frames_per_sec_per_chip": args.device_rate,
        "device_demand_frames_per_sec_v5e8": round(demand, 1),
        "native_meets_demand": results["native"] >= demand,
        "prewarped_meets_demand": results["prewarped"] >= demand,
    }), flush=True)

    if tmp:
        import shutil

        shutil.rmtree(tmp, ignore_errors=True)


if __name__ == "__main__":
    main()
