"""MEVA-family (motion-VAE) consumer model: shape checks + gate-level torch
parity for the checkpoint converter (same test style as the VIBE converter in
tests/test_temporal.py; reference consumer path: scripts/test.py:167-195)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from jrr_tpu.models import meva, smpl as smpl_mod, temporal
from jrr_tpu.ops import jreg as jreg_lib
from jrr_tpu.evals import harness


def test_meva_shapes_and_consumer():
    model, variables = meva.init_meva(
        jax.random.PRNGKey(0), seqlen=3, image_size=64,
        latent_dim=32, vae_hidden=32, hidden_size=32,
    )
    video = jnp.zeros((1, 3, 3, 64, 64))
    pose, betas, cam = model.apply(variables, video, train=False)
    assert pose.shape == (1, 3, 24, 6)
    assert betas.shape == (1, 3, 10)
    assert cam.shape == (1, 3, 3)

    smpl_model = smpl_mod.synthetic_smpl_model(seed=0, num_verts=96, num_faces=120)
    j = np.eye(17, 96, dtype=np.float32)
    consumer = temporal.make_temporal_consumer(smpl_model, model, variables, seqlen=3)
    kp3d = consumer(jnp.zeros((2, 3, 64, 64)), jreg_lib.normalize_jreg(jnp.asarray(j)))
    assert kp3d.shape == (2, 17, 3)
    assert np.isfinite(np.asarray(kp3d)).all()

    # Through the before/after harness — the MEVA-style model runs as a
    # RegressorConsumer exactly like the reference's
    # test_pose_refiner_model_VIBE_MEVA(vibe=False) path.
    batches = [{
        "spin_image": np.zeros((2, 3, 64, 64), np.float32),
        "gt_j3d": np.asarray(kp3d) * 1000.0,
    }]
    res = harness.evaluate_consumer(consumer, batches, jnp.asarray(j), jnp.asarray(j))
    assert res.after.mpjpe < 1e-3


def _torch_motion_vae(torch, d_in, hidden, latent, out_dim, n_layers=1):
    torch.manual_seed(7)
    import torch.nn as tnn

    mods = {
        "enc_gru": tnn.GRU(d_in, hidden, num_layers=n_layers, batch_first=True),
        "e_mu": tnn.Linear(hidden, latent),
        "e_logvar": tnn.Linear(hidden, latent),
        "d_init": tnn.Linear(latent, hidden),
        "d_gru": tnn.GRU(latent, hidden, num_layers=1, batch_first=True),
        "d_out": tnn.Linear(hidden, out_dim),
    }
    return mods


def _torch_vae_forward(torch, mods, x):
    """Deterministic autoencode twin: z = μ; decoder h0 = tanh(d_init(z)),
    inputs = z tiled."""
    with torch.no_grad():
        h, _ = mods["enc_gru"](x)
        mu = mods["e_mu"](h[:, -1])
        h0 = torch.tanh(mods["d_init"](mu))[None]  # (1, B, H)
        z_seq = mu[:, None].repeat(1, x.shape[1], 1)
        dec, _ = mods["d_gru"](z_seq, h0)
        return mods["d_out"](dec), mu


def _vae_state_dict(mods, prefix="vae_model"):
    sd = {}
    for name, mod in mods.items():
        for k, v in mod.state_dict().items():
            sd[f"{prefix}.{name}.{k}"] = v.detach().numpy()
    return sd


def test_motion_vae_converter_parity():
    """Converted vae_model.* tensors == live torch GRU-VAE, encode + decode."""
    torch = pytest.importorskip("torch")

    D, H, L, OUT, B, T = 24, 16, 8, 12, 2, 5
    mods = _torch_motion_vae(torch, D, H, L, OUT)
    sd = _vae_state_dict(mods)

    # Convert just the VAE subtree through the full converter by fabricating
    # the other components minimally.
    gru = temporal._gru_cell_params
    vae_params = {
        "enc_gru_l0": gru(
            sd["vae_model.enc_gru.weight_ih_l0"], sd["vae_model.enc_gru.weight_hh_l0"],
            sd["vae_model.enc_gru.bias_ih_l0"], sd["vae_model.enc_gru.bias_hh_l0"], H,
        ),
        "d_gru": gru(
            sd["vae_model.d_gru.weight_ih_l0"], sd["vae_model.d_gru.weight_hh_l0"],
            sd["vae_model.d_gru.bias_ih_l0"], sd["vae_model.d_gru.bias_hh_l0"], H,
        ),
    }
    for lin in ("e_mu", "e_logvar", "d_init", "d_out"):
        vae_params[lin] = {
            "kernel": sd[f"vae_model.{lin}.weight"].T,
            "bias": sd[f"vae_model.{lin}.bias"],
        }
    vae_params = jax.tree.map(lambda x: jnp.asarray(x, jnp.float32), vae_params)

    x = np.random.default_rng(3).normal(size=(B, T, D)).astype(np.float32)
    t_dec, t_mu = _torch_vae_forward(torch, mods, torch.from_numpy(x))

    vae = meva.MotionVAE(latent_dim=L, hidden_size=H, n_layers=1, out_dim=OUT)
    dec, mu, logvar = vae.apply({"params": vae_params}, jnp.asarray(x))
    np.testing.assert_allclose(np.asarray(mu), t_mu.numpy(), atol=2e-5)
    np.testing.assert_allclose(np.asarray(dec), t_dec.numpy(), atol=2e-5)


def test_meva_checkpoint_converter_end_to_end():
    """A full fabricated gen_state_dict (encoder.* + vae_model.* +
    feat_to_latent.* + regressor.*) converts into a tree that drives
    MEVAPoseModel.apply with a spliced SPIN backbone, and the coarse-pose
    seeding path is live (different VAE weights → different head output)."""
    torch = pytest.importorskip("torch")
    from jrr_tpu.models import spin as spin_lib
    from tests.test_temporal import _torch_head_modules

    torch.manual_seed(9)
    H, D, L = 32, 2048, 16
    gru_t = torch.nn.GRU(D, H, num_layers=2, batch_first=True)
    linear = torch.nn.Linear(H, D)
    head = _torch_head_modules(torch, D)
    feat_to_latent = torch.nn.Linear(D, L)
    vae_mods = _torch_motion_vae(torch, 144, H, L, 144)

    sd = {}
    for k, v in gru_t.state_dict().items():
        sd[f"encoder.gru.{k}"] = v.detach().numpy()
    sd["encoder.linear.weight"] = linear.weight.detach().numpy()
    sd["encoder.linear.bias"] = linear.bias.detach().numpy()
    for name, mod in head.items():
        sd[f"regressor.{name}.weight"] = mod.weight.detach().numpy()
        sd[f"regressor.{name}.bias"] = mod.bias.detach().numpy()
    sd["regressor.init_shape"] = np.zeros((1, 10), np.float32)
    sd["regressor.init_cam"] = np.asarray([[0.9, 0.0, 0.0]], np.float32)
    sd["feat_to_latent.weight"] = feat_to_latent.weight.detach().numpy()
    sd["feat_to_latent.bias"] = feat_to_latent.bias.detach().numpy()
    sd.update(_vae_state_dict(vae_mods))

    _, spin_vars = spin_lib.init_spin(jax.random.PRNGKey(0))
    variables = meva.convert_torch_meva_checkpoint(
        sd, backbone_variables=spin_vars, hidden_size=H, n_layers=2,
        vae_hidden=H, vae_n_layers=1,
    )
    model = meva.MEVAPoseModel(
        hidden_size=H, n_layers=2, latent_dim=L, vae_hidden=H,
    )
    video = jnp.asarray(
        np.random.default_rng(1).normal(size=(1, 2, 3, 64, 64)).astype(np.float32)
    )
    pose, betas, cam = model.apply(variables, video, train=False)
    assert pose.shape == (1, 2, 24, 6) and np.isfinite(np.asarray(pose)).all()

    # Perturbing ONLY the VAE decoder output layer changes the head output —
    # proving the IEF is genuinely seeded by the decoded coarse pose
    # (MEVA's structural difference from VIBE).
    import copy

    variables2 = copy.deepcopy(jax.device_get(variables))
    variables2["params"]["vae_model"]["d_out"]["bias"] = (
        variables2["params"]["vae_model"]["d_out"]["bias"] + 0.5
    )
    pose2, _, _ = model.apply(
        jax.tree.map(jnp.asarray, variables2), video, train=False
    )
    assert float(jnp.abs(pose2 - pose).max()) > 1e-4
