"""Lane-packed tile pairs (round 4): pack_bins invariants and the packed
one-pass loss+grad kernel vs the unpacked kernel / XLA twin (interpret mode).

Exactness contract (pack_bins docstring): at bin-time geometry the packed
layout computes IDENTICAL loss and gradients — packed tiles keep all core
candidates (margin-only candidates carry zero coverage and zero gradient at
bin time), pairs never drop candidates (page-union-overflow pairs stay
unpacked), and unpacked entries go through an identity remap."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from jrr_tpu.models import smpl as smpl_mod
from jrr_tpu.render import camera as camera_lib
from jrr_tpu.render import silhouette as sil
from jrr_tpu.render import silhouette_fused as sf

NUM_VERTS = 96


def _problem(batch=2, num_verts=NUM_VERTS, image=32, seed=0, **spec_kw):
    model = smpl_mod.synthetic_smpl_model(seed=seed, num_verts=num_verts, num_faces=160)
    rng = np.random.default_rng(seed)
    verts = model.v_template[None] + jnp.asarray(
        rng.normal(scale=0.01, size=(batch, num_verts, 3)).astype(np.float32)
    )
    cam_t = jnp.asarray(
        np.stack(
            [rng.uniform(-0.05, 0.05, batch), rng.uniform(-0.05, 0.05, batch),
             rng.uniform(18, 25, batch)], axis=-1,
        ).astype(np.float32)
    )
    spec = sil.RasterizerSpec(
        image_size=image, tile_size=8, faces_per_tile=64,
        sigma=1e-4, blur_radius=2e-4, **spec_kw,
    )
    return model, verts, cam_t, spec


def _bins_and_tables(model, verts, cam_t, spec):
    bins = sf.compute_fused_bins(verts, model, cam_t, spec)
    verts_screen = camera_lib.project_points_screen(
        verts, cam_t, spec.image_size, spec.focal_length
    )
    tx, ty = sf.build_tables(verts_screen, model.vertex_perm)
    px_to_ndc2 = (2.0 / spec.image_size) ** 2
    return bins, tx, ty, px_to_ndc2 / spec.sigma, spec.blur_radius / px_to_ndc2


def _decode_global(idx_row, pages_row, p_hat):
    """idx entries (page_slot·128 + lane) → global vertex table positions;
    -1 for dump-slot entries."""
    ps = idx_row >> 7
    lane = idx_row & 127
    gpid = np.asarray(pages_row)[ps]
    out = gpid * 128 + lane
    return np.where(ps == p_hat - 1, -1, out)


def test_pack_bins_invariants():
    model, verts, cam_t, spec = _problem()
    bins = sf.compute_fused_bins(verts, model, cam_t, spec)
    packed = sf.pack_bins(bins, model.num_verts)

    assert packed.p_num_pairs is not None
    assert int(packed.p_num_pairs.sum()) > 0, "scene produced no packable pairs"

    p_hat = bins.pages.shape[2]
    dump = sf.dump_page_id(model.num_verts)
    for b in range(bins.pages.shape[0]):
        flags = np.asarray(packed.p_flags[b])
        buddy = np.asarray(packed.p_buddy[b])
        pages_o = np.asarray(bins.pages[b])
        pages_p = np.asarray(packed.p_pages[b])
        idx_o = np.asarray(bins.idx[b])
        idx_p = np.asarray(packed.p_idx[b])

        assert (flags == 1).sum() == (flags == 2).sum() == int(packed.p_num_pairs[b])
        for t in np.nonzero(flags == 1)[0]:
            j = buddy[t]
            assert flags[j] == 2
            # Buddy row is kernel-empty.
            assert (pages_p[j] == dump).all()
            # Primary lanes [0, 64): own first-64 candidates, identically
            # decoded; lanes [64, 128): buddy's first-64.
            for corner in range(3):
                own_new = _decode_global(idx_p[t, corner, :64], pages_p[t], p_hat)
                own_old = _decode_global(idx_o[t, corner, :64], pages_o[t], p_hat)
                np.testing.assert_array_equal(own_new, own_old)
                bud_new = _decode_global(idx_p[t, corner, 64:], pages_p[t], p_hat)
                bud_old = _decode_global(idx_o[j, corner, :64], pages_o[j], p_hat)
                np.testing.assert_array_equal(bud_new, bud_old)
            # Buddy origin rides with the primary.
            np.testing.assert_array_equal(
                np.asarray(packed.p_origin_b[b, t]), np.asarray(bins.origin[b, j])
            )
        # Unpacked entries: identity remap end to end.
        for t in np.nonzero(flags == 0)[0]:
            for corner in range(3):
                np.testing.assert_array_equal(
                    _decode_global(idx_p[t, corner], pages_p[t], p_hat),
                    _decode_global(idx_o[t, corner], pages_o[t], p_hat),
                )


def test_packed_kernel_matches_unpacked_interpret():
    """fused_sq_err_packed == fused_sq_err at bin-time geometry: value and
    both gradient tables (reassociated lane product ⇒ tiny fp tolerance)."""
    model, verts, cam_t, spec = _problem(seed=3)
    bins, tx, ty, inv_sigma, blur_px2 = _bins_and_tables(model, verts, cam_t, spec)
    packed = sf.pack_bins(bins, model.num_verts)
    g2 = bins.pages.shape[1]
    mask = jnp.asarray(
        np.random.default_rng(9).uniform(
            0, 1, size=(tx.shape[0], g2, spec.tile_size**2)
        ).astype(np.float32)
    )
    dump = sf.dump_page_id(model.num_verts)
    w = jnp.asarray(
        np.random.default_rng(11).uniform(0.5, 1.5, (tx.shape[0],)).astype(np.float32)
    )

    def loss_unpacked(tx_, ty_):
        err = sf.fused_sq_err(
            tx_, ty_, bins.pages, bins.idx, bins.origin, mask,
            spec.tile_size, inv_sigma, blur_px2, dump, 8, True,
        )
        return jnp.sum(err * w), err

    def loss_packed(tx_, ty_):
        err = sf.fused_sq_err_packed(
            tx_, ty_,
            (packed.origin, packed.p_pages, packed.p_idx,
             packed.p_origin_b, packed.p_flags, packed.p_buddy),
            mask, spec.tile_size, inv_sigma, blur_px2, dump, 8, True,
        )
        return jnp.sum(err * w), err

    (vu, erru), gu = jax.value_and_grad(loss_unpacked, argnums=(0, 1), has_aux=True)(tx, ty)
    (vp, errp), gp = jax.value_and_grad(loss_packed, argnums=(0, 1), has_aux=True)(tx, ty)
    np.testing.assert_allclose(np.asarray(errp), np.asarray(erru), rtol=2e-5)
    np.testing.assert_allclose(float(vp), float(vu), rtol=2e-5)
    for a, b in zip(gp, gu):
        scale = np.abs(np.asarray(b)).max() + 1e-12
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=5e-5 * scale)


def test_packed_kernel_after_drift_interpret():
    """With k == k_half nothing is ever dropped by packing, so packed ==
    unpacked even on DRIFTED vertex tables (the rebin-amortization regime:
    bins from step 0, coverage evaluated steps later)."""
    model, verts, cam_t, spec = _problem(seed=5)
    bins, tx, ty, inv_sigma, blur_px2 = _bins_and_tables(model, verts, cam_t, spec)
    packed = sf.pack_bins(bins, model.num_verts)
    rng = np.random.default_rng(7)
    tx = tx + jnp.asarray(rng.normal(scale=0.5, size=tx.shape).astype(np.float32))
    ty = ty + jnp.asarray(rng.normal(scale=0.5, size=ty.shape).astype(np.float32))
    g2 = bins.pages.shape[1]
    mask = jnp.asarray(
        rng.uniform(0, 1, size=(tx.shape[0], g2, spec.tile_size**2)).astype(np.float32)
    )
    dump = sf.dump_page_id(model.num_verts)
    erru = sf.fused_sq_err(
        tx, ty, bins.pages, bins.idx, bins.origin, mask,
        spec.tile_size, inv_sigma, blur_px2, dump, 8, True,
    )
    errp = sf.fused_sq_err_packed(
        tx, ty,
        (packed.origin, packed.p_pages, packed.p_idx,
         packed.p_origin_b, packed.p_flags, packed.p_buddy),
        mask, spec.tile_size, inv_sigma, blur_px2, dump, 8, True,
    )
    np.testing.assert_allclose(np.asarray(errp), np.asarray(erru), rtol=2e-5)


def test_engine_lane_pack_runs_cpu():
    """lane_pack=True traces through the engine (pack_bins inside the rebin
    scan); off-TPU the loss routes to the XLA twin on the unpacked fields, so
    the trajectory matches lane_pack=False exactly."""
    import jax

    from jrr_tpu import config as cfg_lib
    from jrr_tpu.refine import engine, losses
    from jrr_tpu.data import fixtures
    from jrr_tpu.ops import jreg as jreg_lib

    model = smpl_mod.synthetic_smpl_model(seed=0, num_verts=128, num_faces=200)
    j_reg = np.zeros((17, 128), np.float32)
    rng = np.random.default_rng(0)
    for j in range(17):
        j_reg[j, rng.choice(128, 4, replace=False)] = 1.0
    gt, data = fixtures.make_synthetic_frames(model, j_reg, 4, seed=1, image_size=64)
    init = jax.tree.map(lambda x: x + 0.02, gt)

    sil_cfg = cfg_lib.SilhouetteConfig(
        image_size=64, tile_size=8, rebin_interval=5, coarse_frac=0.0,
        interior_skip=False,
    )
    base = cfg_lib.RefinerConfig(
        stage_a_steps=5, stage_b_steps=10, silhouette=sil_cfg,
        use_discriminators=False,
    )
    out_off = engine.refine_batch(
        model, jnp.asarray(j_reg), init, data, base
    )
    out_on = engine.refine_batch(
        model, jnp.asarray(j_reg), init, data,
        dataclasses.replace(
            base, silhouette=dataclasses.replace(sil_cfg, lane_pack=True)
        ),
    )
    np.testing.assert_allclose(
        np.asarray(out_on.joints3d), np.asarray(out_off.joints3d), atol=1e-6
    )
