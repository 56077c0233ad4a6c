"""Data-parallel scaling curve on the virtual CPU mesh.

Usage:
  XLA_FLAGS=--xla_force_host_platform_device_count=8 \
      python tools/scaling_curve.py [--devices 1 2 4 8] [--full-size]

For each device count D, jits the FULL sharded outer training step over a
D-device mesh (frames sharded, shared state replicated — the same program the
TPU pod would run, minus real ICI) and reports compile time, step time, and
per-device throughput. On virtual CPU devices the absolute numbers measure the
sharding machinery, not TPU speed; the point is that the program compiles,
executes, and partitions at every width (driver multi-chip contract,
`__graft_entry__.dryrun_multichip` runs the 8-wide case).
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--devices", type=int, nargs="+", default=[1, 2, 4, 8])
    ap.add_argument("--full-size", action="store_true",
                    help="6890-vert / 224px frames (slow on CPU) instead of toy shapes")
    args = ap.parse_args()

    import jax

    jax.config.update("jax_platforms", "cpu")
    avail = len(jax.devices())

    import __graft_entry__ as ge
    from jrr_tpu.parallel import data_parallel, mesh as mesh_lib
    from jrr_tpu.refine import trainer

    for n in args.devices:
        if n > avail:
            print(json.dumps({"devices": n, "skipped": f"only {avail} available"}))
            continue
        # Constant per-device load → flat curve = ideal scaling. Full-size
        # drops to 1 frame/device: the point there is compile+execute+partition
        # at real shapes, and a virtual CPU mesh is far too slow for more.
        batch = n if args.full_size else 4 * n
        size = dict(num_verts=6890, image_size=224) if args.full_size else dict(
            num_verts=96, image_size=32
        )
        model, j_reg, cfg, init, data = ge._synthetic_problem(batch=batch, **size)
        mesh = mesh_lib.make_mesh(n)
        step = data_parallel.make_sharded_outer_step(mesh, cfg)
        state = trainer.init_train_state(jax.random.PRNGKey(0), j_reg, cfg)

        t0 = time.perf_counter()
        out = step(
            mesh_lib.replicate(mesh, state),
            mesh_lib.replicate(mesh, model),
            mesh_lib.shard_batch(mesh, init),
            mesh_lib.shard_batch(mesh, data),
        )
        jax.block_until_ready(out)
        t_compile = time.perf_counter() - t0

        t0 = time.perf_counter()
        out = step(
            mesh_lib.replicate(mesh, state),
            mesh_lib.replicate(mesh, model),
            mesh_lib.shard_batch(mesh, init),
            mesh_lib.shard_batch(mesh, data),
        )
        jax.block_until_ready(out)
        t_step = time.perf_counter() - t0

        print(json.dumps({
            "devices": n,
            "batch": batch,
            "compile_s": round(t_compile - t_step, 2),
            "step_s": round(t_step, 3),
            "frames_per_s": round(batch / t_step, 3),
            "frames_per_s_per_device": round(batch / t_step / n, 3),
        }), flush=True)


if __name__ == "__main__":
    main()
