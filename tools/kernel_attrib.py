"""Cost attribution inside the fused loss+grad kernel (real TPU).

Times `fused_sq_err` fwd+bwd at full size, then re-times with individual
cost centers stubbed out (WRONG results, correct shapes/layouts) to measure
each one's share of the 0.39 ms/frame kernel:

  full        — the shipped kernel
  no_gather   — `_gather_corner_rows` returns page row 0 (kills the 6
                per-tile (P̂,128) dynamic_gathers + one-hot page selects)
  no_transc   — sigmoid → linear clamp and exp(Σlog) → Σ (kills the
                per-element transcendentals; keeps every layout)
  no_scatter  — gradient scatter-accumulate tables written as constants
                (kills the split-bf16 MXU scatter in the bwd pass)

Each stub changes ONLY the targeted cost center; everything else (loads,
iota/selects, accumulation) stays, so full − variant ≈ that center's cost.
Shares guide optimization; they do not compose exactly (fusion effects).

Usage: python tools/kernel_attrib.py [--batch 32] [--reps 20]
Prints one JSON line per variant.
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


def timeit(fn, *args, reps):
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(reps):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / reps


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=32)
    ap.add_argument("--reps", type=int, default=20)
    args = ap.parse_args()

    import __graft_entry__ as ge
    from jrr_tpu.refine import losses
    from jrr_tpu.render import silhouette_fused as sf
    from jrr_tpu.render import silhouette_pallas as sp

    B = args.batch
    model, j_reg, cfg, init, data = ge._synthetic_problem(
        batch=B, num_verts=6890, image_size=224
    )
    spec = losses.rasterizer_spec(cfg.refiner)
    out0 = losses.forward_frame(model, init)
    verts, cam_t = out0.vertices, init.cam_t
    g_size = spec.image_size // spec.tile_size
    mask = jnp.zeros((B, g_size * g_size, spec.tile_size * spec.tile_size))
    # Bins fixed outside the timed region — this probe attributes the KERNEL
    # cost, not binning (binning is timed separately in tools/fused_probe.py).
    bins = sf.compute_fused_bins(verts, model, cam_t, spec)

    def lossgrad(v, c, m, b):
        def f(vv):
            return jnp.sum(
                sf.silhouette_sq_err_fused(vv, model, c, m, spec, bins=b)
            )
        return jax.value_and_grad(f)(v)

    orig_gather = sf._gather_corner_rows
    orig_prod = sp._lane_prod
    orig_split = sf._split_hi_lo

    def no_gather(ws_x, ws_y, idx_row, *, p_hat, k_pad):
        return ws_x[0:1, :], ws_y[0:1, :]

    def lin_sigmoid(x):  # linear clamp with matched range, no exp
        return jnp.clip(0.5 + 0.25 * x, 0.0, 1.0)

    def sum_prod(x, *, keepdims=False):  # Σ instead of exp(Σlog)
        return jnp.sum(x, axis=-1, keepdims=keepdims)

    def const_split(v):  # kills the hi/lo decomposition feeding the scatter
        z = jnp.zeros_like(v)
        return z, z

    variants = {}
    variants["full"] = {}
    variants["no_gather"] = {"gather": no_gather}
    variants["no_transc"] = {"sigmoid": lin_sigmoid, "prod": sum_prod}
    variants["no_scatter"] = {"split": const_split}

    for name, mods in variants.items():
        sf._gather_corner_rows = mods.get("gather", orig_gather)
        sp._lane_prod = mods.get("prod", orig_prod)
        sf._split_hi_lo = mods.get("split", orig_split)
        if "sigmoid" in mods:
            real_sig = jax.nn.sigmoid
            jax.nn.sigmoid = mods["sigmoid"]
        # Fresh function object per variant: jax.jit's executable cache is
        # keyed on the wrapped function's identity, so re-jitting the same
        # `lossgrad` would silently reuse the unpatched compilation.
        fn = jax.jit(lambda v, c, m, b: lossgrad(v, c, m, b))
        try:
            sec = timeit(fn, verts, cam_t, mask, bins, reps=args.reps)
            print(json.dumps({
                "name": name, "ms": round(sec * 1e3, 3),
                "ms_per_frame": round(sec * 1e3 / B, 4),
            }), flush=True)
        finally:
            if "sigmoid" in mods:
                jax.nn.sigmoid = real_sig
            sf._gather_corner_rows = orig_gather
            sp._lane_prod = orig_prod
            sf._split_hi_lo = orig_split


if __name__ == "__main__":
    main()
