"""Round-2 perf probe: decompose the stage-B step cost on the real TPU.

Measures (batch 32, full-size model, 224² silhouette):
  1. current composed stage-B grad step (3-term and 5-term)
  2. Pallas kernel fwd / fwd+bwd alone on packed inputs
  3. the XLA glue: slot_gather + pack_tri fwd / fwd+bwd (current row layout)
  4. candidate planar gather: lane-axis take from (8, F_pad) → (8, N)
  5. tiles_to_image + MSE fwd+bwd
  6. SMPL forward + projection fwd+bwd
  7. compute_bins (sort binning)
Prints one JSON line per measurement.
"""

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


def timeit(fn, *args, reps=20, warmup=2):
    for _ in range(warmup):
        out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(reps):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / reps


def report(name, seconds, batch=None):
    rec = {"name": name, "ms": round(seconds * 1e3, 4)}
    if batch:
        rec["ms_per_frame"] = round(seconds * 1e3 / batch, 4)
    print(json.dumps(rec), flush=True)


def main():
    import __graft_entry__ as ge
    from jrr_tpu.ops import jreg as jreg_lib
    from jrr_tpu.refine import losses, engine
    from jrr_tpu.render import silhouette as sil_lib
    from jrr_tpu.render import silhouette_pallas as sp
    from jrr_tpu.models import discriminator as disc_lib

    B = 32
    model, j_reg, cfg, init, data = ge._synthetic_problem(
        batch=B, num_verts=6890, image_size=224
    )
    rcfg = cfg.refiner
    spec = losses.rasterizer_spec(rcfg)
    j_reg_norm = jreg_lib.normalize_jreg(j_reg)

    # ---- 1. composed stage-B grad step --------------------------------------
    @jax.jit
    def stepgrad3(p, jr, d):
        (_, terms), g = jax.value_and_grad(
            lambda p_: losses.stage_b_loss(model, jr, None, None, p_, d, rcfg),
            has_aux=True,
        )(p)
        return g.pose6d.sum(), terms.total

    report("stageB_grad_3term", timeit(stepgrad3, init, j_reg_norm, data), B)

    key = jax.random.PRNGKey(0)
    pd = disc_lib.init_pose_discriminator(key)
    sd = disc_lib.init_shape_discriminator(key)

    @jax.jit
    def stepgrad5(p, jr, d, pd, sd):
        (_, terms), g = jax.value_and_grad(
            lambda p_: losses.stage_b_loss(model, jr, pd, sd, p_, d, rcfg),
            has_aux=True,
        )(p)
        return g.pose6d.sum(), terms.total

    report("stageB_grad_5term", timeit(stepgrad5, init, j_reg_norm, data, pd, sd), B)

    # ---- pieces --------------------------------------------------------------
    out0 = losses.forward_frame(model, init)
    verts = out0.vertices
    from jrr_tpu.render import camera as camera_lib

    @jax.jit
    def smpl_fwd(p):
        return losses.forward_frame(model, p).vertices

    report("smpl_fwd", timeit(smpl_fwd, init), B)

    @jax.jit
    def smpl_grad(p):
        def f(p_):
            return jnp.sum(losses.forward_frame(model, p_).vertices ** 2)
        return jax.grad(f)(p).pose6d.sum()

    report("smpl_fwd_bwd", timeit(smpl_grad, init), B)

    @jax.jit
    def proj(v, c):
        return camera_lib.project_points_screen(v, c, 224, 5000.0)

    verts_screen = proj(verts, init.cam_t)
    report("projection_fwd", timeit(proj, verts, init.cam_t), B)

    # binning
    bins_fn = jax.jit(
        functools.partial(sil_lib.compute_bins, faces=model.faces, spec=spec)
    )
    bins = bins_fn(verts, cam_t=init.cam_t)
    report("compute_bins", timeit(lambda v, c: bins_fn(v, cam_t=c), verts, init.cam_t), B)

    # gather+pack chain (current): xy rows → slot_gather → pack_tri
    faces = model.faces
    b = B
    g2 = bins.sel_face.shape[1]
    k = bins.sel_face.shape[2]

    @jax.jit
    def gather_pack(vs, bins):
        xy, _ = jax.vmap(functools.partial(sil_lib._face_screen_verts, faces=faces))(vs)
        sel_xy = jax.vmap(sil_lib._slot_gather)(
            xy.reshape(b, -1, 6), bins.sel_face, bins.slot_of_pair
        ).reshape(bins.sel_face.shape + (3, 2))
        tri, valid, _ = jax.vmap(sp.pack_tri)(sel_xy, bins.sel_valid)
        return tri

    tri_packed = gather_pack(verts_screen, bins)
    report("gather_pack_fwd", timeit(gather_pack, verts_screen, bins), B)

    @jax.jit
    def gather_pack_grad(vs, bins):
        def f(vs_):
            return jnp.sum(gather_pack(vs_, bins) ** 2)
        return jax.grad(f)(vs).sum()

    report("gather_pack_fwd_bwd", timeit(gather_pack_grad, verts_screen, bins), B)

    # kernel alone on packed inputs
    valid_packed = jax.vmap(sp.pack_tri)(
        jax.vmap(sil_lib._slot_gather)(
            jax.vmap(functools.partial(sil_lib._face_screen_verts, faces=faces))(verts_screen)[0].reshape(b, -1, 6),
            bins.sel_face, bins.slot_of_pair,
        ).reshape(bins.sel_face.shape + (3, 2)),
        bins.sel_valid,
    )[1]
    flat = lambda x: x.reshape((b * g2,) + x.shape[2:])
    origin_f = flat(bins.origin)
    tri_f = flat(tri_packed)
    valid_f = flat(valid_packed)
    px_to_ndc2 = (2.0 / 224) ** 2
    inv_sigma = px_to_ndc2 / spec.sigma

    @jax.jit
    def kernel_fwd(o, t, v):
        return sp.tiles_alpha_pallas(o, t, v, spec.tile_size, inv_sigma, 0.0, 8, False)

    report("kernel_fwd", timeit(kernel_fwd, origin_f, tri_f, valid_f), B)

    @jax.jit
    def kernel_grad(o, t, v):
        def f(t_):
            return jnp.sum(kernel_fwd(o, t_, v) ** 2)
        return jax.grad(f)(t).sum()

    report("kernel_fwd_bwd", timeit(kernel_grad, origin_f, tri_f, valid_f), B)

    # tiles_to_image + mse
    alphas = kernel_fwd(origin_f, tri_f, valid_f)
    g = 224 // spec.tile_size

    @jax.jit
    def img_mse(a, m):
        img = sil_lib._tiles_to_image(a.reshape(b, g * g, -1), g, spec.tile_size)
        return jnp.mean((img - m) ** 2)

    report("tiles_to_image_mse_fwd", timeit(img_mse, alphas, data.mask), B)

    @jax.jit
    def img_mse_grad(a, m):
        return jax.grad(lambda a_: img_mse(a_, m))(a).sum()

    report("tiles_to_image_mse_fwd_bwd", timeit(img_mse_grad, alphas, data.mask), B)

    # ---- candidate planar gather ---------------------------------------------
    F = faces.shape[0]
    f_pad = ((F + 127) // 128) * 128
    n = g2 * 128  # per-frame gather width (K padded to 128)
    sel128 = jnp.pad(bins.sel_face, ((0, 0), (0, 0), (0, 128 - k))).reshape(b, n)
    xy_t = jnp.zeros((b, 8, f_pad), jnp.float32)

    @jax.jit
    def planar_gather(xy_t, sel):
        return jax.vmap(lambda x, s: jnp.take(x, s, axis=1))(xy_t, sel)

    out = planar_gather(xy_t, sel128)
    report("planar_gather_fwd_8xN", timeit(planar_gather, xy_t, sel128), B)

    @jax.jit
    def planar_gather_grad(xy_t, sel):
        def f(x):
            return jnp.sum(planar_gather(x, sel) ** 2)
        return jax.grad(f)(xy_t).sum()

    report("planar_gather_fwd_bwd_8xN", timeit(planar_gather_grad, xy_t, sel128), B)

    # candidate: planar gather from vertex table (2 rows x V) with vertex indices
    v_pad = ((6890 + 127) // 128) * 128
    vx = jnp.zeros((b, 8, v_pad), jnp.float32)
    vidx = jnp.asarray(
        np.random.default_rng(0).integers(0, 6890, size=(b, 6, n)), jnp.int32
    ).reshape(b, 6 * n)

    @jax.jit
    def vert_gather(vx, vidx):
        return jax.vmap(lambda x, s: jnp.take(x[0], s, axis=0))(vx, vidx)

    out = vert_gather(vx, vidx)
    report("vert_gather_1d_fwd", timeit(vert_gather, vx, vidx), B)

    @jax.jit
    def vert_gather_grad(vx, vidx):
        def f(x):
            return jnp.sum(vert_gather(x, vidx) ** 2)
        return jax.grad(f)(vx).sum()

    report("vert_gather_1d_fwd_bwd", timeit(vert_gather_grad, vx, vidx), B)


if __name__ == "__main__":
    print(json.dumps({"backend": jax.default_backend(), "device": str(jax.devices()[0])}), flush=True)
    main()
