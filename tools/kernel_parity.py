"""On-TPU Mosaic-kernel parity probe (driver-runnable, one JSON line).

VERDICT r2 item 4: the interpret-mode tests (tests/test_silhouette_fused.py)
gate the kernels on CPU, but a Mosaic COMPILATION difference (layout choices,
FMA contraction, the split-bf16 MXU scatter) would ship silently. This probe
runs the real compiled kernels against their XLA twins on the actual chip at
full production size and reports max errors for:

  - fwd:        fused_tiles_alpha (Pallas) vs fused_tiles_alpha_xla
  - grad:       d/d(tx, ty) of Σ(α−mask)² through the custom-VJP backward
                kernel vs XLA autodiff of the twin
  - lossgrad:   the one-pass fused_sq_err loss value + gradient tables vs the
                same twin quantities (the production value_and_grad path)

Tolerances: forward is the same f32 math modulo fusion order (tol 1e-4);
gradients route through the split-bf16 scatter (exact to ~2⁻¹⁷ relative) and
tolerance-band min-routing, so 2e-3 relative on the max-magnitude scale.

Usage: python tools/kernel_parity.py [--batch 8] [--out KERNELPAR.json]
"""

from __future__ import annotations

import argparse
import json
import sys

sys.path.insert(0, __file__.rsplit("/", 2)[0])


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--image", type=int, default=224)
    ap.add_argument("--blur", type=float, default=0.0)
    ap.add_argument("--out", default=None)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    import numpy as np

    import __graft_entry__ as ge
    from jrr_tpu.refine import losses
    from jrr_tpu.render import silhouette_fused as sf

    on_tpu = jax.default_backend() == "tpu"

    model, j_reg, cfg, init, data, gt_params, gt_verts = ge._synthetic_problem(
        batch=args.batch, num_verts=6890, image_size=args.image, return_gt=True
    )
    import dataclasses

    rcfg = dataclasses.replace(
        cfg.refiner,
        silhouette=dataclasses.replace(cfg.refiner.silhouette, blur_radius=args.blur),
    )
    spec = losses.rasterizer_spec(rcfg)
    out0 = losses.forward_frame(model, init)
    verts, cam_t = out0.vertices, init.cam_t
    mask_tiles = sf.image_to_tiles((data.mask > 0.5).astype(jnp.float32), spec.tile_size)

    bins, tx, ty, inv_sigma, blur_px2 = sf._prep_kernel_inputs(
        verts, model, cam_t, spec, None
    )
    dump = sf.dump_page_id(model.num_verts)
    tile = spec.tile_size

    # --- forward ----------------------------------------------------------
    kern_fwd = jax.jit(
        lambda tx, ty: sf.fused_tiles_alpha(
            tx, ty, bins.pages, bins.idx, bins.origin, tile, inv_sigma,
            blur_px2, dump, spec.pallas_chunk, False,
        )
    )
    twin_fwd = jax.jit(
        lambda tx, ty: sf.fused_tiles_alpha_xla(
            tx, ty, bins.pages, bins.idx, bins.origin, tile, inv_sigma, blur_px2
        )
    )
    a_k = np.asarray(kern_fwd(tx, ty)) if on_tpu else None
    a_x = np.asarray(twin_fwd(tx, ty))
    fwd_max = float(np.abs(a_k - a_x).max()) if on_tpu else float("nan")

    # --- gradient through the standalone backward kernel ------------------
    def loss_kern(tx, ty):
        t = sf.fused_tiles_alpha(
            tx, ty, bins.pages, bins.idx, bins.origin, tile, inv_sigma,
            blur_px2, dump, spec.pallas_chunk, False,
        )
        return jnp.sum((t - mask_tiles) ** 2)

    def loss_twin(tx, ty):
        t = sf.fused_tiles_alpha_xla(
            tx, ty, bins.pages, bins.idx, bins.origin, tile, inv_sigma, blur_px2
        )
        return jnp.sum((t - mask_tiles) ** 2)

    g_twin = jax.jit(jax.grad(loss_twin, argnums=(0, 1)))(tx, ty)
    gscale = max(float(jnp.abs(g_twin[0]).max()), float(jnp.abs(g_twin[1]).max()), 1e-12)
    if on_tpu:
        g_kern = jax.jit(jax.grad(loss_kern, argnums=(0, 1)))(tx, ty)
        grad_max_rel = max(
            float(jnp.abs(g_kern[0] - g_twin[0]).max()),
            float(jnp.abs(g_kern[1] - g_twin[1]).max()),
        ) / gscale
    else:
        grad_max_rel = float("nan")

    # --- one-pass loss+grad kernel (the production path) ------------------
    def sqerr_kern(tx, ty):
        return jnp.sum(sf.fused_sq_err(
            tx, ty, bins.pages, bins.idx, bins.origin, mask_tiles,
            tile, inv_sigma, blur_px2, dump, spec.pallas_chunk, False,
        ))

    if on_tpu:
        (v_k, g_k2) = jax.jit(jax.value_and_grad(sqerr_kern, argnums=(0, 1)))(tx, ty)
        v_x = jax.jit(loss_twin)(tx, ty)
        loss_rel = abs(float(v_k) - float(v_x)) / max(abs(float(v_x)), 1e-12)
        lossgrad_max_rel = max(
            float(jnp.abs(g_k2[0] - g_twin[0]).max()),
            float(jnp.abs(g_k2[1] - g_twin[1]).max()),
        ) / gscale
    else:
        loss_rel = lossgrad_max_rel = float("nan")

    alpha_ok = on_tpu and fwd_max < 1e-4
    grad_ok = on_tpu and grad_max_rel < 2e-3
    lg_ok = on_tpu and loss_rel < 1e-4 and lossgrad_max_rel < 2e-3
    rec = {
        "metric": "mosaic_kernel_parity",
        "on_tpu": on_tpu,
        "batch": args.batch,
        "image": args.image,
        "blur_radius": args.blur,
        "fwd_max_abs": fwd_max,
        "grad_max_rel": grad_max_rel,
        "lossgrad_value_rel": loss_rel,
        "lossgrad_max_rel": lossgrad_max_rel,
        "grad_scale": gscale,
        "pass": bool(alpha_ok and grad_ok and lg_ok),
    }
    print(json.dumps(rec), flush=True)
    if args.out:
        with open(args.out, "w") as f:
            json.dump(rec, f)


if __name__ == "__main__":
    main()
