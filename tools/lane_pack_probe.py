"""Lane-packing cost attribution on the real chip.

Times the three pieces the end-to-end number mixes together, on the
bench-shaped scene at full size:

  1. rebin-time costs: compute_fused_bins / apply_interior_skip / pack_bins
     (per frame, amortized over rebin_interval in production);
  2. per-step kernel cost: fused_sq_err vs fused_sq_err_packed under
     value_and_grad (the one-pass loss+grad kernel, the stage-B hot path);
  3. the achieved pack fraction (pairs vs occupied tiles).

Usage: python tools/lane_pack_probe.py [--batch 32] [--reps 10]
"""

from __future__ import annotations

import argparse
import functools
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp


def timeit(fn, *args, reps=10):
    """Times over DISTINCT inputs: axon dedups re-runs of one executable on
    bit-identical args (~0.4 ms return — CLAUDE.md), so each rep nudges the
    first float argument by rep·1e-6 (workload-identical, bit-distinct)."""
    def nudge(a, eps):
        done = [False]

        def leaf(x):
            if not done[0] and hasattr(x, "dtype") and jnp.issubdtype(
                x.dtype, jnp.floating
            ):
                done[0] = True
                return x + jnp.asarray(eps, x.dtype)
            return x

        return jax.tree.map(leaf, a)

    out = fn(*args)
    jax.block_until_ready(out)
    variants = [
        (nudge(args[0], (r + 1) * 1e-6), *args[1:]) for r in range(reps)
    ]
    jax.block_until_ready(variants)
    t0 = time.perf_counter()
    for v in variants:
        out = fn(*v)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / reps, out


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=32)
    ap.add_argument("--reps", type=int, default=10)
    args = ap.parse_args()

    import numpy as np

    import __graft_entry__ as ge
    from jrr_tpu.refine import losses
    from jrr_tpu.render import camera as camera_lib
    from jrr_tpu.render import silhouette_fused as sf

    model, j_reg, cfg, init, data = ge._synthetic_problem(
        batch=args.batch, num_verts=6890, image_size=224
    )
    spec = losses.rasterizer_spec(cfg.refiner)
    out = losses.forward_frame(model, init)
    verts, cam_t = out.vertices, init.cam_t
    b = args.batch

    bins_f = jax.jit(lambda v, c: sf.compute_fused_bins(v, model, c, spec))
    t_bins, bins = timeit(bins_f, verts, cam_t, reps=args.reps)

    skip_f = jax.jit(
        lambda bn, v, c: sf.apply_interior_skip(bn, v, model, c, spec)
    )
    t_skip, bins_s = timeit(skip_f, bins, verts, cam_t, reps=args.reps)

    pack_f = jax.jit(lambda bn: sf.pack_bins(bn, model.num_verts))
    t_pack, packed = timeit(pack_f, bins_s, reps=args.reps)

    occupied = int(jnp.sum(packed.pages[:, :, 0] != sf.dump_page_id(model.num_verts)))
    pairs = int(jnp.sum(packed.p_num_pairs))
    print(json.dumps({
        "phase": "rebin_costs_ms_per_frame",
        "compute_bins": round(1e3 * t_bins / b, 3),
        "interior_skip": round(1e3 * t_skip / b, 3),
        "pack_bins": round(1e3 * t_pack / b, 3),
        "occupied_tiles": occupied,
        "packed_pairs": pairs,
        "pack_frac_of_occupied": round(2 * pairs / max(occupied, 1), 3),
    }), flush=True)

    # Per-step one-pass loss+grad cost, unpacked vs packed.
    verts_screen = camera_lib.project_points_screen(
        verts, cam_t, spec.image_size, spec.focal_length
    )
    tx, ty = sf.build_tables(verts_screen, model.vertex_perm)
    px_to_ndc2 = (2.0 / spec.image_size) ** 2
    inv_sigma = px_to_ndc2 / spec.sigma
    blur_px2 = spec.blur_radius / px_to_ndc2
    g2 = bins.pages.shape[1]
    mask = jnp.asarray(
        np.random.default_rng(0).uniform(0, 1, (b, g2, spec.tile_size**2)
                                         ).astype(np.float32)
    )
    dump = sf.dump_page_id(model.num_verts)

    @jax.jit
    def step_unpacked(tx_, ty_, bn, m):
        def loss(a, bvar):
            return jnp.sum(sf.fused_sq_err(
                a, bvar, bn.pages, bn.idx, bn.origin, m,
                spec.tile_size, inv_sigma, blur_px2, dump, spec.pallas_chunk,
                False,
            ))
        return jax.value_and_grad(loss, argnums=(0, 1))(tx_, ty_)

    @jax.jit
    def step_packed(tx_, ty_, bn, m):
        def loss(a, bvar):
            return jnp.sum(sf.fused_sq_err_packed(
                a, bvar,
                (bn.origin, bn.p_pages, bn.p_idx, bn.p_origin_b, bn.p_flags,
                 bn.p_buddy),
                m, spec.tile_size, inv_sigma, blur_px2, dump,
                spec.pallas_chunk, False,
            ))
        return jax.value_and_grad(loss, argnums=(0, 1))(tx_, ty_)

    t_u, (vu, _) = timeit(step_unpacked, tx, ty, bins_s, mask, reps=args.reps)
    t_p, (vp, _) = timeit(step_packed, tx, ty, packed, mask, reps=args.reps)
    print(json.dumps({
        "phase": "per_step_ms_per_frame",
        "unpacked_lossgrad": round(1e3 * t_u / b, 3),
        "packed_lossgrad": round(1e3 * t_p / b, 3),
        "loss_rel_diff": float(abs(vu - vp) / (abs(vu) + 1e-9)),
    }), flush=True)


if __name__ == "__main__":
    main()
