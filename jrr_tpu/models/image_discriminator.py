"""Image-conditioned silhouette discriminator (optional capability).

The reference carries a fully commented-out StyleGAN2 discriminator over
(image ⊕ rendered silhouette) (reference: scripts/img_disc.py:1-85 — dead
code; SURVEY §2a: "capability to note"). This is a working, minimal
TPU-friendly realization: a small strided-conv patch discriminator over the
4-channel (RGB ⊕ silhouette) stack, pure-pytree like the other priors, with
the same LSGAN objectives. Off by default in the pipeline.
"""

from __future__ import annotations

from typing import Dict, List, Tuple

import jax
import jax.numpy as jnp

Params = Dict[str, jax.Array]

# (out_channels, stride) per layer; input 4×224² → 1-logit patch map.
_LAYERS: Tuple[Tuple[int, int], ...] = ((32, 2), (64, 2), (128, 2), (128, 2))


def init_image_discriminator(key: jax.Array, in_channels: int = 4) -> Params:
    params: Params = {}
    c_in = in_channels
    keys = jax.random.split(key, len(_LAYERS) + 1)
    for i, (c_out, _) in enumerate(_LAYERS):
        fan_in = c_in * 9
        bound = 1.0 / jnp.sqrt(fan_in)
        params[f"w{i}"] = jax.random.uniform(
            keys[i], (3, 3, c_in, c_out), minval=-bound, maxval=bound
        )
        params[f"b{i}"] = jnp.zeros((c_out,))
        c_in = c_out
    bound = 1.0 / jnp.sqrt(c_in)
    params["w_out"] = jax.random.uniform(keys[-1], (1, 1, c_in, 1), minval=-bound, maxval=bound)
    params["b_out"] = jnp.zeros((1,))
    return params


def image_discriminator(params: Params, image: jax.Array, silhouette: jax.Array) -> jax.Array:
    """image (B, 3, S, S) + silhouette (B, S, S) → (B,) mean patch score (sigmoid)."""
    x = jnp.concatenate([image, silhouette[:, None]], axis=1)
    x = jnp.transpose(x, (0, 2, 3, 1))  # NHWC for TPU conv layout
    for i, (_, stride) in enumerate(_LAYERS):
        x = jax.lax.conv_general_dilated(
            x, params[f"w{i}"], (stride, stride), "SAME",
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        ) + params[f"b{i}"]
        x = jax.nn.leaky_relu(x, 0.2)
    x = jax.lax.conv_general_dilated(
        x, params["w_out"], (1, 1), "SAME",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    ) + params["b_out"]
    return jax.nn.sigmoid(jnp.mean(x, axis=(1, 2, 3)))
