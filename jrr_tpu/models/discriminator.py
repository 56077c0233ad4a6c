"""Adversarial pose/shape priors (LSGAN discriminators).

Re-implements the reference's KCMR/HMR-style discriminators
(reference: scripts/discriminator.py:7-74) as pure-pytree functional modules —
no framework Module machinery; params are nested dicts of arrays, so they jit,
vmap, shard, and checkpoint like any other pytree.

Architecture parity:
- Pose discriminator: input (B, 24, 6) rot6d. A 1×1 Conv2d stack 6→32→32 over
  the joint axis is exactly a per-joint shared MLP — implemented here as two
  batched matmuls (reference: scripts/discriminator.py:14-19). Heads: one
  global MLP 24·32→1024→1024→1 plus 24 per-joint Linear(32, 1) (realized as a
  single batched einsum). Output order [global, joint0..joint23], sigmoid
  (reference: scripts/discriminator.py:39-54 — the global head is appended
  first).
- Shape discriminator: β(10)→10→5→1 MLP, sigmoid
  (reference: scripts/discriminator.py:57-74).

Init matches torch nn.Linear/Conv2d defaults (kaiming-uniform a=√5 ⇒
U(±1/√fan_in) for weights, U(±1/√fan_in) for biases) so training dynamics are
comparable.
"""

from __future__ import annotations

from typing import Dict

import jax
import jax.numpy as jnp

Params = Dict[str, jax.Array]

NUM_JOINTS = 24
ROT6D = 6
HIDDEN = 32
GLOBAL_HIDDEN = 1024


def _torch_linear_init(key, fan_in: int, shape_w, shape_b):
    kw, kb = jax.random.split(key)
    bound = 1.0 / jnp.sqrt(fan_in)
    w = jax.random.uniform(kw, shape_w, minval=-bound, maxval=bound)
    b = jax.random.uniform(kb, shape_b, minval=-bound, maxval=bound)
    return w, b


def init_pose_discriminator(key: jax.Array) -> Params:
    keys = jax.random.split(key, 6)
    # conv1: 6→32, conv2: 32→32 (1×1 convs over joints = shared per-joint MLP).
    w1, b1 = _torch_linear_init(keys[0], ROT6D, (ROT6D, HIDDEN), (HIDDEN,))
    w2, b2 = _torch_linear_init(keys[1], HIDDEN, (HIDDEN, HIDDEN), (HIDDEN,))
    # per-joint heads: (24, 32, 1) realized as (24, 32) weight + (24,) bias.
    wj, bj = _torch_linear_init(keys[2], HIDDEN, (NUM_JOINTS, HIDDEN), (NUM_JOINTS,))
    # global head MLP.
    wg1, bg1 = _torch_linear_init(
        keys[3], NUM_JOINTS * HIDDEN, (NUM_JOINTS * HIDDEN, GLOBAL_HIDDEN), (GLOBAL_HIDDEN,)
    )
    wg2, bg2 = _torch_linear_init(keys[4], GLOBAL_HIDDEN, (GLOBAL_HIDDEN, GLOBAL_HIDDEN), (GLOBAL_HIDDEN,))
    wg3, bg3 = _torch_linear_init(keys[5], GLOBAL_HIDDEN, (GLOBAL_HIDDEN, 1), (1,))
    return dict(
        w1=w1, b1=b1, w2=w2, b2=b2, wj=wj, bj=bj,
        wg1=wg1, bg1=bg1, wg2=wg2, bg2=bg2, wg3=wg3, bg3=bg3,
    )


def pose_discriminator(params: Params, rot6d: jax.Array) -> jax.Array:
    """rot6d: (B, 24, 6) → (B, 25, 1) sigmoid scores, [global, per-joint×24]."""
    h = jax.nn.relu(jnp.einsum("bjc,ch->bjh", rot6d, params["w1"]) + params["b1"])
    h = jax.nn.relu(jnp.einsum("bjh,hk->bjk", h, params["w2"]) + params["b2"])  # (B,24,32)

    flat = h.reshape(h.shape[0], NUM_JOINTS * HIDDEN)
    g = jax.nn.relu(flat @ params["wg1"] + params["bg1"])
    g = jax.nn.relu(g @ params["wg2"] + params["bg2"])
    g = g @ params["wg3"] + params["bg3"]  # (B, 1)

    per_joint = jnp.einsum("bjh,jh->bj", h, params["wj"]) + params["bj"]  # (B, 24)

    logits = jnp.concatenate([g, per_joint], axis=1)[..., None]  # (B, 25, 1)
    return jax.nn.sigmoid(logits)


def init_shape_discriminator(key: jax.Array) -> Params:
    keys = jax.random.split(key, 3)
    w1, b1 = _torch_linear_init(keys[0], 10, (10, 10), (10,))
    w2, b2 = _torch_linear_init(keys[1], 10, (10, 5), (5,))
    w3, b3 = _torch_linear_init(keys[2], 5, (5, 1), (1,))
    return dict(w1=w1, b1=b1, w2=w2, b2=b2, w3=w3, b3=b3)


def shape_discriminator(params: Params, betas: jax.Array) -> jax.Array:
    """betas: (B, 10) → (B, 1) sigmoid score."""
    h = jax.nn.relu(betas @ params["w1"] + params["b1"])
    h = jax.nn.relu(h @ params["w2"] + params["b2"])
    return jax.nn.sigmoid(h @ params["w3"] + params["b3"])


# --- LSGAN objectives (MSE to 1/0 targets; reference: scripts/optimize.py:246-293) ---


def generator_realism_loss(scores: jax.Array) -> jax.Array:
    """MSE(D(fake), 1) — pushes refined params toward 'real'."""
    return jnp.mean((scores - 1.0) ** 2)


def discriminator_loss(real_scores: jax.Array, fake_scores: jax.Array) -> jax.Array:
    """MSE(D(fake), 0) + MSE(D(real), 1) (reference: scripts/optimize.py:279-281)."""
    return jnp.mean(fake_scores**2) + jnp.mean((real_scores - 1.0) ** 2)
