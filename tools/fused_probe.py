"""TPU probe: fused page-gather rasterizer at full size (batch 32, 6890 verts,
224², 13776 faces). Reports bin stats and fwd / fwd+bwd timing vs round 1."""

from __future__ import annotations

import functools
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np


def timeit(fn, *args, reps=20):
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(reps):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / reps


def report(name, seconds, batch):
    print(json.dumps({"name": name, "ms": round(seconds * 1e3, 3),
                      "ms_per_frame": round(seconds * 1e3 / batch, 4)}), flush=True)


def main():
    import __graft_entry__ as ge
    from jrr_tpu.refine import losses
    from jrr_tpu.render import camera as camera_lib
    from jrr_tpu.render import silhouette_fused as sf

    B = 32
    model, j_reg, cfg, init, data = ge._synthetic_problem(
        batch=B, num_verts=6890, image_size=224
    )
    spec = losses.rasterizer_spec(cfg.refiner)._replace(bin_margin_px=4.0)
    out0 = losses.forward_frame(model, init)
    verts = out0.vertices
    cam_t = init.cam_t

    bins_fn = jax.jit(
        lambda v, c: sf.compute_fused_bins(v, model, c, spec)
    )
    bins = bins_fn(verts, cam_t)
    stats = jax.device_get(bins.stats)
    print(json.dumps({"name": "bin_stats",
                      "max_faces_per_tile": int(stats.max_faces_per_tile),
                      "truncated_tiles": int(stats.truncated_tiles),
                      "span_clipped_faces": int(stats.span_clipped_faces),
                      "page_overflow_tiles": int(stats.page_overflow_tiles),
                      "dropped_slots": int(stats.dropped_slots)}), flush=True)
    report("compute_fused_bins", timeit(bins_fn, verts, cam_t), B)

    mask_tiles = sf.image_to_tiles(data.mask, spec.tile_size)

    @jax.jit
    def fwd(v, c, bins):
        return sf.silhouette_tiles_fused(v, model, c, spec, bins=bins)

    out = fwd(verts, cam_t, bins)
    print(json.dumps({"name": "fwd_finite", "ok": bool(jnp.all(jnp.isfinite(out)))}), flush=True)
    report("fused_fwd", timeit(fwd, verts, cam_t, bins), B)

    @jax.jit
    def loss_grad(v, c, bins, mt):
        def f(v_, c_):
            tiles = sf.silhouette_tiles_fused(v_, model, c_, spec, bins=bins)
            return jnp.mean((tiles - mt) ** 2)
        l, g = jax.value_and_grad(f, argnums=(0, 1))(v, c)
        return l, g[0], g[1]

    l, gv, gc = loss_grad(verts, cam_t, bins, mask_tiles)
    print(json.dumps({"name": "grad_finite",
                      "ok": bool(jnp.all(jnp.isfinite(gv)) and jnp.all(jnp.isfinite(gc))),
                      "gv_absmax": float(jnp.abs(gv).max())}), flush=True)
    report("fused_fwd_bwd", timeit(loss_grad, verts, cam_t, bins, mask_tiles), B)

    # correctness vs round-1 pallas path on TPU (same spec)
    from jrr_tpu.render import silhouette as sil

    @jax.jit
    def old_fwd(v, c):
        return sil.render_mesh_silhouette(v, model.faces, c, spec._replace(backend="pallas"))

    img_old = old_fwd(verts, cam_t)
    img_new = sf.tiles_to_image(fwd(verts, cam_t, bins), spec.image_size, spec.tile_size)
    diff = float(jnp.abs(img_old - img_new).max())
    print(json.dumps({"name": "vs_round1_pallas", "max_abs_diff": diff}), flush=True)
    report("round1_pallas_fwd", timeit(old_fwd, verts, cam_t), B)


if __name__ == "__main__":
    print(json.dumps({"backend": jax.default_backend()}), flush=True)
    main()
