"""Microbenchmark: is packed-bf16 elementwise VPU math faster than f32 here?

Gate for any bf16 rewrite of the rasterizer coverage chain (the in-kernel
cost attribution shows ~60% of kernel compute is coordinate/edge elementwise
math — tools/kernel_attrib.py). TPU generations differ on whether bf16
vector arithmetic is packed 2-per-word (≈2× VPU throughput) or widened to
f32 internally (no win, only VMEM/bandwidth savings). Rather than guess —
the pltpu.roll lane-product experiment showed intuition fails here
(BASELINE.md round 3) — this times the same FMA-heavy elementwise chain in
both dtypes inside one Pallas kernel shape.

Prints one JSON line: {"f32_ms": ..., "bf16_ms": ..., "speedup": ...}.
"""

from __future__ import annotations

import functools
import json
import sys
import time

sys.path.insert(0, __file__.rsplit("/", 2)[0])

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

ROWS = 512          # sublanes per block (64 f32 vregs worth)
LANES = 128
REPS = 200          # FMA-chain length inside the kernel
GRID = 64           # blocks per launch
TRIALS = 30


def _kernel(x_ref, o_ref, *, reps, dtype):
    x = x_ref[...].astype(dtype)
    c1 = jnp.asarray(1.0009765625, dtype)   # exactly representable in bf16
    c2 = jnp.asarray(-0.001953125, dtype)
    acc = x
    for _ in range(reps):
        # The rasterizer's inner shape: mul + add dependent chain with a
        # second independent stream (models cross/t/r/d² ILP).
        acc = acc * c1 + c2
        x = x * c2 + c1
    o_ref[...] = (acc + x).astype(jnp.float32)


def _build(dtype):
    kernel = functools.partial(_kernel, reps=REPS, dtype=dtype)
    f = pl.pallas_call(
        kernel,
        grid=(GRID,),
        in_specs=[pl.BlockSpec((ROWS, LANES), lambda i: (i, 0), memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((ROWS, LANES), lambda i: (i, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((GRID * ROWS, LANES), jnp.float32),
    )
    return jax.jit(lambda x: f(x))


def main():
    x = jax.random.uniform(jax.random.PRNGKey(0), (GRID * ROWS, LANES), jnp.float32)
    out = {}
    for name, dtype in (("f32", jnp.float32), ("bf16", jnp.bfloat16)):
        f = _build(dtype)
        r = f(x)
        jax.block_until_ready(r)
        t0 = time.perf_counter()
        for _ in range(TRIALS):
            r = f(x)
        jax.block_until_ready(r)
        out[f"{name}_ms"] = round((time.perf_counter() - t0) / TRIALS * 1e3, 4)
    out["speedup"] = round(out["f32_ms"] / out["bf16_ms"], 3)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
