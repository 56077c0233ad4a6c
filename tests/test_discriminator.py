"""Discriminator parity vs an independent torch realization of the reference architecture."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from jrr_tpu.models import discriminator as disc


def test_shapes():
    p = disc.init_pose_discriminator(jax.random.PRNGKey(0))
    out = disc.pose_discriminator(p, jnp.zeros((5, 24, 6)))
    assert out.shape == (5, 25, 1)
    sp = disc.init_shape_discriminator(jax.random.PRNGKey(1))
    out_s = disc.shape_discriminator(sp, jnp.zeros((5, 10)))
    assert out_s.shape == (5, 1)
    assert np.all((np.asarray(out) > 0) & (np.asarray(out) < 1))


def test_pose_disc_matches_torch_conv_formulation():
    # Independent torch model with 1x1 Conv2d exactly as the reference builds it
    # (scripts/discriminator.py:14-54); copy weights across and compare.
    torch = pytest.importorskip("torch")
    import torch.nn as nn

    params = jax.tree.map(
        lambda x: np.asarray(x), disc.init_pose_discriminator(jax.random.PRNGKey(2))
    )

    conv1 = nn.Conv2d(6, 32, 1)
    conv2 = nn.Conv2d(32, 32, 1)
    conv1.weight.data = torch.from_numpy(params["w1"].T[:, :, None, None].copy())
    conv1.bias.data = torch.from_numpy(params["b1"].copy())
    conv2.weight.data = torch.from_numpy(params["w2"].T[:, :, None, None].copy())
    conv2.bias.data = torch.from_numpy(params["b2"].copy())

    linears = [nn.Linear(32, 1) for _ in range(24)]
    for i, lin in enumerate(linears):
        lin.weight.data = torch.from_numpy(params["wj"][i][None].copy())
        lin.bias.data = torch.from_numpy(params["bj"][i : i + 1].copy())

    g1, g2, g3 = nn.Linear(768, 1024), nn.Linear(1024, 1024), nn.Linear(1024, 1)
    g1.weight.data = torch.from_numpy(params["wg1"].T.copy())
    g1.bias.data = torch.from_numpy(params["bg1"].copy())
    g2.weight.data = torch.from_numpy(params["wg2"].T.copy())
    g2.bias.data = torch.from_numpy(params["bg2"].copy())
    g3.weight.data = torch.from_numpy(params["wg3"].T.copy())
    g3.bias.data = torch.from_numpy(params["bg3"].copy())

    rot6d = np.random.default_rng(3).normal(size=(4, 24, 6)).astype(np.float32)

    with torch.no_grad():
        x = torch.from_numpy(rot6d).permute(0, 2, 1).unsqueeze(-1)  # (B, 6, 24, 1)
        h = torch.relu(conv2(torch.relu(conv1(x))))  # (B, 32, 24, 1)
        h = h.permute(0, 2, 1, 3)  # (B, 24, 32, 1)
        preds = [g3(torch.relu(g2(torch.relu(g1(h.reshape(-1, 768))))))]
        for i in range(24):
            preds.append(linears[i](h[:, i].reshape(-1, 32)))
        expected = torch.sigmoid(torch.stack(preds, dim=1)).numpy()

    got = np.asarray(
        disc.pose_discriminator(jax.tree.map(jnp.asarray, params), jnp.asarray(rot6d))
    )
    np.testing.assert_allclose(got, expected, atol=1e-5)


def test_lsgan_losses():
    real = jnp.full((4, 25, 1), 0.9)
    fake = jnp.full((4, 25, 1), 0.2)
    d = disc.discriminator_loss(real, fake)
    np.testing.assert_allclose(float(d), 0.2**2 + 0.1**2, rtol=1e-5)
    g = disc.generator_realism_loss(fake)
    np.testing.assert_allclose(float(g), 0.8**2, rtol=1e-5)
